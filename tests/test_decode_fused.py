"""Fused T=1 decode prologue kernels (ops/decode_fused.py) vs the
unfused jnp chains in models/decode.py.

The kernels compute LN/lerp arithmetic in fp32 (matching the fused
training prologue ops/ddlerp_pallas.py); the unfused decode chain runs in
bf16, so parity tolerances are bf16-rounding sized. Kernels run in
interpret mode here (CPU CI); the same code path compiles on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu.config import ModelConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.decode import rwkv_decode_step, decode_supported
from rwkv_lm_ext_tpu.models.state import init_model_state
from rwkv_lm_ext_tpu.ops.decode_fused import (
    _att_prep_ref,
    _ffn_prep_ref,
    att_prep_fused,
    ffn_prep_fused,
)


def _att_inputs(key, B=16, C=256, D=8, Dd=16, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    mk = lambda i, sh, s=1.0: (jax.random.normal(ks[i], sh) * s).astype(
        jnp.float32
    )
    x = mk(0, (B, C)).astype(dtype)
    shift = mk(1, (B, C))
    ln_scale = 1.0 + 0.1 * mk(2, (C,))
    ln_bias = 0.1 * mk(3, (C,))
    maas = mk(4, (6, C), 0.5)
    w1 = mk(5, (C, 5 * D), 0.2)
    w2 = mk(6, (5, D, C), 0.2)
    dw1 = mk(7, (C, Dd), 0.2)
    dw2 = mk(8, (Dd, C), 0.2)
    td = mk(9, (C,))
    return x, shift, ln_scale, ln_bias, maas, w1, w2, dw1, dw2, td


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_att_prep_kernel_matches_ref(dtype):
    args = _att_inputs(jax.random.PRNGKey(0), dtype=dtype)
    ref = _att_prep_ref(*args, 1e-5)
    got = att_prep_fused(*args, 1e-5, interpret=True)
    assert len(ref) == len(got) == 6
    # bf16 outputs may differ by one ulp at rounding ties (the kernel's
    # LN uses E[x^2]-mu^2; the ref uses jnp.var)
    tol = dict(atol=2e-5, rtol=2e-5) if dtype == jnp.float32 else dict(
        atol=1e-4, rtol=1e-2
    )
    for r, g in zip(ref, got):
        assert r.dtype == g.dtype and r.shape == g.shape
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32), **tol
        )


def test_att_prep_multi_block_grid():
    """B larger than the VMEM row cap exercises the B-block grid."""
    args = _att_inputs(jax.random.PRNGKey(3), B=48, C=4096)
    ref = _att_prep_ref(*args, 1e-5)
    got = att_prep_fused(*args, 1e-5, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            atol=2e-5, rtol=2e-5,
        )


def test_att_prep_unaligned_batch_falls_back():
    """B not divisible by 8 routes to the jnp composition (exact)."""
    args = _att_inputs(jax.random.PRNGKey(4), B=6)
    ref = _att_prep_ref(*args, 1e-5)
    got = att_prep_fused(*args, 1e-5, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g))


def test_ffn_prep_kernel_matches_ref():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    B, C = 16, 256
    x = jax.random.normal(ks[0], (B, C), jnp.float32)
    shift = jax.random.normal(ks[1], (B, C), jnp.float32)
    sc = 1.0 + 0.1 * jax.random.normal(ks[2], (C,))
    bi = 0.1 * jax.random.normal(ks[3], (C,))
    mk = jax.random.uniform(ks[4], (C,))
    mr = jax.random.uniform(ks[5], (C,))
    ref = _ffn_prep_ref(x, shift, sc, bi, mk, mr, 1e-5)
    got = ffn_prep_fused(x, shift, sc, bi, mk, mr, 1e-5, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), atol=2e-5, rtol=2e-5
        )


def test_att_prep_grad_flows():
    """custom_vjp recomputes through the jnp composition."""
    args = _att_inputs(jax.random.PRNGKey(2), B=8, C=128, D=4, Dd=8)

    def loss(x, w1):
        out = att_prep_fused(
            x, *args[1:5], w1, *args[6:], 1e-5, interpret=True
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)

    g_x, g_w1 = jax.grad(loss, argnums=(0, 1))(args[0], args[5])
    assert np.isfinite(np.asarray(g_x)).all()
    assert np.isfinite(np.asarray(g_w1)).all()
    assert float(jnp.abs(g_w1).sum()) > 0


def test_decode_step_fused_matches_unfused():
    """End-to-end: rwkv_decode_step(fused_prep=True) == the unfused path
    on a tiny model (kernels in interpret mode on CPU)."""
    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=97, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
    assert decode_supported(cfg, params)
    B = 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 97)
    state = init_model_state(cfg, B)
    # seed non-trivial state
    state = jax.tree.map(
        lambda s: s + 0.01 * jax.random.normal(
            jax.random.PRNGKey(2), s.shape, s.dtype
        ),
        state,
    )
    lo_f, st_f = rwkv_decode_step(params, cfg, tokens, state,
                                  fused_prep=True)
    lo_u, st_u = rwkv_decode_step(params, cfg, tokens, state,
                                  fused_prep=False)
    np.testing.assert_allclose(
        np.asarray(lo_f), np.asarray(lo_u), atol=3e-4, rtol=3e-4
    )
    for k in ("att_shift", "ffn_shift", "wkv"):
        np.testing.assert_allclose(
            np.asarray(st_f[k]), np.asarray(st_u[k]), atol=3e-4, rtol=3e-4
        )


def test_ffn_block_kernel_matches_ref():
    """Whole-block channel mix (ln2+mix+3 GEMMs+gated residual) in one
    phase-gridded program == the jnp composition; exercises the
    weight-tile streaming grid (F, C multiples of 512)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    B, C, F = 16, 1024, 3584
    from rwkv_lm_ext_tpu.ops.decode_fused import (
        _ffn_block_ref,
        ffn_block_fused,
    )

    x = jax.random.normal(ks[0], (B, C), jnp.float32)
    shift = jax.random.normal(ks[1], (B, C), jnp.float32)
    sc = 1.0 + 0.1 * jax.random.normal(ks[2], (C,))
    bi = 0.1 * jax.random.normal(ks[3], (C,))
    mk = jax.random.uniform(ks[4], (C,))
    mr = jax.random.uniform(ks[5], (C,))
    wk = jax.random.normal(ks[6], (C, F)) * 0.03
    wv = jax.random.normal(ks[7], (F, C)) * 0.03
    wr = jax.random.normal(ks[8], (C, C)) * 0.03
    ref = _ffn_block_ref(x, shift, sc, bi, mk, mr, wk, wv, wr, 1e-5)
    got = ffn_block_fused(x, shift, sc, bi, mk, mr, wk, wv, wr, 1e-5,
                          interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            atol=3e-5, rtol=3e-5,
        )


def test_ffn_block_grad_flows():
    from rwkv_lm_ext_tpu.ops.decode_fused import ffn_block_fused

    ks = jax.random.split(jax.random.PRNGKey(8), 9)
    B, C, F = 8, 512, 1024
    args = [
        jax.random.normal(ks[0], (B, C), jnp.float32),
        jax.random.normal(ks[1], (B, C), jnp.float32),
        1.0 + 0.1 * jax.random.normal(ks[2], (C,)),
        0.1 * jax.random.normal(ks[3], (C,)),
        jax.random.uniform(ks[4], (C,)),
        jax.random.uniform(ks[5], (C,)),
        jax.random.normal(ks[6], (C, F)) * 0.05,
        jax.random.normal(ks[7], (F, C)) * 0.05,
        jax.random.normal(ks[8], (C, C)) * 0.05,
    ]

    def loss(x, wk):
        a = list(args)
        a[0], a[6] = x, wk
        out, xn = ffn_block_fused(*a, 1e-5, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, gwk = jax.grad(loss, argnums=(0, 1))(args[0], args[6])
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gwk).sum()) > 0
