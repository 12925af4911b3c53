"""Fused WKV+GroupNorm+gate kernel vs the unfused composition."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, wkv6_fused_output
from rwkv_lm_ext_tpu.ops import wkv_reference

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _inputs(B=2, T=24, H=2, N=8, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 9)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    scale = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,))
    bias = 0.1 * jax.random.normal(ks[7], (H * N,))
    s0 = 0.1 * jax.random.normal(ks[8], (B, H, N, N))
    return r, k, v, w, u, g, scale, bias, s0


def _unfused(r, k, v, w, u, g, scale, bias, s0, eps):
    B, T, H, N = r.shape
    y, sT = wkv_reference(r, k, v, w, u, s0)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = ((y - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, H * N)
    out = (yn * scale + bias) * g.reshape(B, T, H * N)
    return out, sT


def test_fused_matches_unfused_interpret():
    r, k, v, w, u, g, scale, bias, s0 = _inputs()
    eps = 64e-5
    out_f, s_f = wkv6_fused_output(
        r, k, v, w, u, g, scale, bias, s0, eps=eps, chunk_size=8,
        interpret=True,
    )
    out_u, s_u = _unfused(r, k, v, w, u, g, scale, bias, s0, eps)
    np.testing.assert_allclose(out_f, out_u, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s_f, s_u, rtol=2e-4, atol=2e-4)


def test_fused_grads_flow():
    r, k, v, w, u, g, scale, bias, s0 = _inputs(T=16)

    def loss(args):
        out, sT = wkv6_fused_output(
            *args[:5], args[5], args[6], args[7], args[8],
            eps=64e-5, chunk_size=8, interpret=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) + jnp.sum(sT**2)

    args = (r, k, v, w, u, g, scale, bias, s0)
    grads = jax.grad(loss)(args)

    def loss_u(args):
        out, sT = _unfused(*args[:9], 64e-5)
        return jnp.sum(out.astype(jnp.float32) ** 2) + jnp.sum(sT**2)

    grads_u = jax.grad(loss_u)(args)
    for a, b in zip(grads, grads_u):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_pallas_backward_matches_autodiff():
    """The hand-written two-pass Pallas backward must match autodiff of the
    reference composition for every input (interpret mode; N=64 so the
    head-packed path engages)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, _wkv_fused

    B, T, H, N = 2, 32, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 9)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    scale = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,))
    bias = 0.1 * jax.random.normal(ks[7], (H * N,))
    s0 = 0.1 * jax.random.normal(ks[8], (B, H, N, N))
    args = (r, k, v, w, u, s0, g, scale, bias)

    def loss_fused(a):
        out, sT = _wkv_fused(*a, 64e-5, 16, True, True)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    def loss_ref(a):
        out, sT = _fused_ref(*a, 64e-5, 16)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    gp = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gp, gr):
        scale_ref = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale_ref < 1e-5


def test_pallas_fwd_bwd_extreme_decay():
    """Exact tiled A in the fused kernel AND its hand-written adjoint at
    w up to +3 (per-step decay ~ e^-20): forward and gradients must match
    the reference composition with no chunk-size guard (VERDICT r1 #4)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, _wkv_fused

    B, T, H, N = 2, 64, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(13), 9)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=1.5, maxval=3.0)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    scale = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,))
    bias = 0.1 * jax.random.normal(ks[7], (H * N,))
    s0 = 0.1 * jax.random.normal(ks[8], (B, H, N, N))
    args = (r, k, v, w, u, s0, g, scale, bias)

    out_f, s_f = _wkv_fused(*args, 64e-5, 64, True, True)
    out_u, s_u = _fused_ref(*args, 64e-5, 64)
    # tolerances are wider than the mild-decay test: with per-step decay
    # e^-20 the pre-GN y is near-degenerate, so GroupNorm's rsqrt(var)
    # amplifies fp32 accumulation-order differences (~3e-4 observed)
    np.testing.assert_allclose(out_f, out_u, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(s_f, s_u, rtol=2e-4, atol=2e-4)

    def loss_fused(a):
        out, sT = _wkv_fused(*a, 64e-5, 64, True, True)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    def loss_ref(a):
        out, sT = _fused_ref(*a, 64e-5, 64)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    gp = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gp, gr):
        scale_ref = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale_ref < 1e-3


def test_v5_gn_scale_invariance_equivalence():
    """GN(y/d, 1e-5) == GN(y, d^2 * 1e-5): the identity that lets RWKV-5
    ride the fused kernel (models/rwkv.py time_mix_v5 pallas branch)."""
    d = 8.0
    y = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 64)) * 5

    def gn(x, eps):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps)

    np.testing.assert_allclose(
        gn(y / d, 1e-5), gn(y, d * d * 1e-5), rtol=1e-5, atol=1e-6
    )


def test_fused_kernel_v5_constant_decay():
    """Fused kernel with broadcast constant w == v5 unfused pipeline."""
    from rwkv_lm_ext_tpu.ops import wkv_reference
    from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv6_fused_output

    B, T, H, N = 2, 20, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w5 = jax.random.uniform(ks[3], (H, N), minval=-6.0, maxval=-0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    s0 = 0.1 * jax.random.normal(ks[6], (B, H, N, N))
    w_full = jnp.broadcast_to(w5[None, None], (B, T, H, N))
    scale = jnp.ones(H * N)
    bias = jnp.zeros(H * N)
    eps = 64e-5

    out_f, s_f = wkv6_fused_output(
        r, k, v, w_full, u, g, scale, bias, s0,
        eps=eps, chunk_size=8, interpret=True,
    )
    # unfused v5 pipeline: wkv -> /8 -> GN(1e-5) -> *g
    y, s_u = wkv_reference(r, k, v, w_full, u, s0)
    y = y / 8.0
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    z = ((y - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, T, H * N)
    out_u = z * g.reshape(B, T, H * N)
    np.testing.assert_allclose(out_f, out_u, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(s_f, s_u, rtol=2e-4, atol=2e-4)


def test_kernel_knobs_env_override(monkeypatch):
    """Kernel-path knobs live on ModelConfig; RWKV_* env vars override at
    config construction only (no os.environ reads in model hot paths)."""
    from rwkv_lm_ext_tpu import ModelConfig

    cfg = ModelConfig(n_layer=1, n_embd=64, vocab_size=100, head_size=16)
    assert cfg.fused_chunk == 128 and cfg.fused_prologue
    assert cfg.packed_decode and not cfg.fused_decode
    monkeypatch.setenv("RWKV_FUSED_CHUNK", "64")
    monkeypatch.setenv("RWKV_FUSED_PROLOGUE", "0")
    monkeypatch.setenv("RWKV_PACKED_DECODE", "0")
    monkeypatch.setenv("RWKV_FUSED_DECODE", "1")
    cfg2 = ModelConfig(n_layer=1, n_embd=64, vocab_size=100, head_size=16)
    assert cfg2.fused_chunk == 64 and not cfg2.fused_prologue
    assert not cfg2.packed_decode and cfg2.fused_decode
    # models/ hot paths read the knobs from cfg, never from the env
    import rwkv_lm_ext_tpu.models.rwkv as m

    import inspect

    assert "os.environ" not in inspect.getsource(m)


def test_fused_kernel_p8_geometry_interpret():
    """head_size 16 -> 8 heads packed per program: the lane-slicing paths
    of the packed kernel at a different geometry (interpret mode runs the
    real kernel since the jnp short-circuit was removed)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, wkv6_fused_output

    B, T, H, N = 2, 24, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(4), 9)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    scale = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,))
    bias = 0.1 * jax.random.normal(ks[7], (H * N,))
    s0 = 0.1 * jax.random.normal(ks[8], (B, H, N, N))
    out_k, s_k = wkv6_fused_output(
        r, k, v, w, u, g, scale, bias, s0, eps=64e-5, chunk_size=8,
        interpret=True,
    )
    out_r, s_r = _fused_ref(r, k, v, w, u, s0, g, scale, bias, 64e-5, 8)
    np.testing.assert_allclose(out_k, out_r, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(s_k, s_r, rtol=2e-4, atol=2e-4)


def test_fused_prologue_time_mix_matches_unfused():
    """time_mix_v6_fused (Pallas ln1+shift+ddlerp prologue + fused WKV, all
    interpreted) == layer_norm + time_mix_v6 (jnp), including the carried
    shift/WKV state contract."""
    from rwkv_lm_ext_tpu import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import (
        layer_norm,
        time_mix_v6,
        time_mix_v6_fused,
    )

    cfg = ModelConfig(
        n_layer=2, n_embd=128, vocab_size=100, head_size=64,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    bp = params["blocks"][1]
    bp["att"]["output"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), bp["att"]["output"].shape
    )
    B, T, C = 2, 32, 128
    H, N = cfg.n_head, cfg.head_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    shift = jax.random.normal(jax.random.PRNGKey(2), (B, C))
    wkv0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (B, H, N, N))
    o_ref, s_ref, w_ref = time_mix_v6(
        bp["att"], cfg, layer_norm(x, bp["ln1"]), shift, wkv0,
        wkv_backend="chunked",
    )
    o_f, s_f, w_f = time_mix_v6_fused(bp, cfg, x, shift, wkv0, interpret=True)
    np.testing.assert_allclose(o_f, o_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(s_f, s_ref, atol=1e-6)
    np.testing.assert_allclose(w_f, w_ref, rtol=2e-4, atol=2e-4)


def test_unfused_pallas_backward_matches_reference():
    """The UNFUSED wkv_pallas backward (two-pass kernels with gn=False)
    vs reference autodiff, incl. a T that forces time padding."""
    import numpy as np
    from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_reference
    from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv_pallas

    rng = np.random.default_rng(3)
    for T in (64, 41):  # 41: pads to the TB boundary inside the bwd
        B, H, N = 2, 2, 64  # P=2 -> W=128, Pallas backward engages
        mk = lambda: jnp.asarray(rng.normal(size=(B, T, H, N)).astype(np.float32))
        r, k, v = mk(), mk(), mk()
        w = jnp.asarray(rng.uniform(-6, 0.4, size=(B, T, H, N)).astype(np.float32))
        u = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32))
        s0 = jnp.asarray(rng.normal(size=(B, H, N, N)).astype(np.float32))

        def loss(fn, r, k, v, w, u, s0, **kw):
            y, sT = fn(r, k, v, w, u, s0, **kw)
            c = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape)
            return jnp.sum(y * c) + jnp.sum(sT * 0.1)

        g_ref = jax.grad(
            lambda *a: loss(wkv_reference, *a), argnums=(0, 1, 2, 3, 4, 5)
        )(r, k, v, w, u, s0)
        g_pl = jax.grad(
            lambda *a: loss(wkv_pallas, *a, chunk_size=16, interpret=True),
            argnums=(0, 1, 2, 3, 4, 5),
        )(r, k, v, w, u, s0)
        for name, a, b in zip("rkvwus", g_ref, g_pl):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
            assert rel < 2e-4, (T, name, rel)


def test_prologue_pallas_backward_matches_reference():
    """The hand-written Pallas adjoint of the fused prologue (reverse grid,
    cross-block dprev carry, accumulated weight grads) vs autodiff through
    the jnp composition. T=128 with TB=64 exercises the block-boundary
    coupling; grads checked for every input."""
    from rwkv_lm_ext_tpu.ops.ddlerp_pallas import (
        _prologue,
        _prologue_ref,
    )

    rng = np.random.default_rng(11)
    B, T, C, D = 2, 128, 256, 16
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    sc = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bi = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    maa = jnp.asarray(rng.uniform(0, 1, size=(6, C)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(C, 5 * D)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(5, D, C)) * 0.1).astype(np.float32))

    def loss(fn, *args):
        outs = fn(*args)
        tot = 0.0
        for j, o in enumerate(outs):
            c = jnp.cos(jnp.arange(o.size, dtype=jnp.float32) + j).reshape(
                o.shape
            )
            tot = tot + jnp.sum(o * c)
        return tot

    args = (x, shift, sc, bi, maa, w1, w2)
    g_ref = jax.grad(
        lambda *a: loss(_prologue_ref, *a, 1e-5), argnums=tuple(range(7))
    )(*args)
    g_pl = jax.grad(
        lambda *a: loss(_prologue, *a, 1e-5, True), argnums=tuple(range(7))
    )(*args)
    names = ["x", "shift", "scale", "bias", "maa", "w1", "w2"]
    for name, a, b in zip(names, g_ref, g_pl):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert rel < 5e-4, (name, rel)


def test_decode_step_kernel_matches_reference():
    """wkv6_decode_step_packed_pallas (single-pass packed-state kernel,
    interpret) vs the jnp composition, over the supported geometries."""
    from rwkv_lm_ext_tpu.models.state import pack_wkv, unpack_wkv
    from rwkv_lm_ext_tpu.ops.wkv_decode import (
        _decode_ref, wkv6_decode_step_packed_pallas,
    )

    rng = np.random.default_rng(7)
    for B, H, N in ((3, 4, 64), (2, 3, 16), (4, 2, 32)):
        C = H * N
        mk = lambda sh: jnp.asarray(rng.normal(size=sh).astype(np.float32))
        r, k, v, g = mk((B, C)), mk((B, C)), mk((B, C)), mk((B, C))
        w = jnp.asarray(rng.uniform(-6, 0.5, size=(B, C)).astype(np.float32))
        u = mk((H, N)) * 0.5
        scale = 1.0 + 0.1 * mk((C,))
        bias = 0.1 * mk((C,))
        state = mk((B, H, N, N)) * 0.3
        out_k, s_k = wkv6_decode_step_packed_pallas(
            r, k, v, w, g, u, scale, bias, pack_wkv(state), 64e-5, True
        )
        out_r, s_r = _decode_ref(
            r.reshape(B, H, N), k.reshape(B, H, N), v.reshape(B, H, N),
            w.reshape(B, H, N), g.reshape(B, H, N), u, scale, bias,
            state, 64e-5,
        )
        np.testing.assert_allclose(out_k, out_r, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            unpack_wkv(s_k, N), s_r, rtol=2e-4, atol=2e-4
        )


def test_pick_bt_packed_alignment():
    """_pick_bt_packed must never return a row blocking that violates the
    kernel's 8-alignment (Mosaic would reject it on real TPU); shapes
    with no aligned divisor return None and the pallas entry falls back
    to the XLA packed path (ADVICE r1 low)."""
    from rwkv_lm_ext_tpu.ops.wkv_decode import _pick_bt_packed

    for B in (1, 2, 3, 4, 8, 12, 64):
        for H, N in ((3, 16), (4, 64), (2, 32), (7, 16), (32, 64)):
            bt = _pick_bt_packed(B, H, N)
            if bt is not None:
                P = (N * N) // 128
                assert B % bt == 0
                assert (bt * H) % 8 == 0 and (bt * H * P) % 8 == 0
    # the ADVICE repro: B=2, H=3 has no aligned blocking
    assert _pick_bt_packed(2, 3, 16) is None


def test_decode_step_packed_matches_reference():
    """wkv6_decode_step_packed (pure-XLA T=1 step on the tile-packed
    state) vs the logical jnp composition, over the supported geometries."""
    from rwkv_lm_ext_tpu.models.state import pack_wkv, unpack_wkv
    from rwkv_lm_ext_tpu.ops.wkv_decode import (
        _decode_ref, decode_packable, wkv6_decode_step_packed,
    )

    rng = np.random.default_rng(11)
    for H, N in ((4, 64), (3, 16), (2, 32), (2, 128)):
        assert decode_packable(N)
        B, C = 3, H * N
        mk = lambda sh: jnp.asarray(rng.normal(size=sh).astype(np.float32))
        r, k, v, g = mk((B, C)), mk((B, C)), mk((B, C)), mk((B, C))
        w = jnp.asarray(rng.uniform(-6, 0.5, size=(B, C)).astype(np.float32))
        u = mk((H, N)) * 0.5
        scale = 1.0 + 0.1 * mk((C,))
        bias = 0.1 * mk((C,))
        state = mk((B, H, N, N)) * 0.3
        out_p, s_p = wkv6_decode_step_packed(
            r, k, v, w, g, u, scale, bias, pack_wkv(state), eps=64e-5
        )
        out_r, s_r = _decode_ref(
            r.reshape(B, H, N), k.reshape(B, H, N), v.reshape(B, H, N),
            w.reshape(B, H, N), g.reshape(B, H, N), u, scale, bias,
            state, 64e-5,
        )
        np.testing.assert_allclose(out_p, out_r, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            unpack_wkv(s_p, N), s_r, rtol=2e-5, atol=2e-5
        )


def test_decode_step_time_mix_matches_sequential():
    """time_mix_v6 at T=1 with wkv_backend='pallas' (fused decode kernel,
    interpreted on CPU) == wkv_backend='reference' (sequential scan +
    unfused GroupNorm/gate), including the carried state contract."""
    from rwkv_lm_ext_tpu import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import layer_norm, time_mix_v6

    cfg = ModelConfig(
        n_layer=2, n_embd=128, vocab_size=100, head_size=64,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    att = params["blocks"][1]["att"]
    B, C = 2, 128
    H, N = cfg.n_head, cfg.head_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, C))
    shift = jax.random.normal(jax.random.PRNGKey(2), (B, C))
    wkv0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (B, H, N, N))
    o_ref, sh_ref, w_ref = time_mix_v6(
        att, cfg, x, shift, wkv0, wkv_backend="reference"
    )
    o_f, sh_f, w_f = time_mix_v6(
        att, cfg, x, shift, wkv0, wkv_backend="pallas"
    )
    from rwkv_lm_ext_tpu.models.state import unpack_wkv

    np.testing.assert_allclose(o_f, o_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(sh_f, sh_ref, atol=1e-6)
    # T=1 pallas routes through the packed-state kernel -> packed carry
    np.testing.assert_allclose(
        unpack_wkv(w_f, N), w_ref, rtol=2e-4, atol=2e-4
    )


def test_layer_norm_pallas_kernel_matches_reference():
    """ln_pallas kernel (interpret) vs the jnp composition, fwd + grads —
    the tiled path only engages on TPU shapes (C%128==0, rows%256==0), so
    CPU runs otherwise never execute the kernel."""
    from rwkv_lm_ext_tpu.ops.ln_pallas import _ln_ref, layer_norm_pallas

    rng = np.random.default_rng(3)
    B, T, C = 2, 256, 256   # M = 512 rows: tiles
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    sc = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    bi = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    y_k = layer_norm_pallas(x, sc, bi, 1e-5, interpret=True)
    y_r = _ln_ref(x.reshape(-1, C), sc, bi, 1e-5).reshape(x.shape)
    np.testing.assert_allclose(y_k, y_r, rtol=2e-5, atol=2e-5)

    def loss_k(x, sc, bi):
        return jnp.sum(layer_norm_pallas(x, sc, bi, 1e-5, interpret=True) ** 2)

    def loss_r(x, sc, bi):
        return jnp.sum(_ln_ref(x.reshape(-1, C), sc, bi, 1e-5) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, sc, bi)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a).reshape(b.shape), b, rtol=2e-4, atol=2e-4
        )

    # non-tiling shapes fall back (odd rows) and still match
    x2 = x[:, :100]
    np.testing.assert_allclose(
        layer_norm_pallas(x2, sc, bi, 1e-5, interpret=True),
        _ln_ref(x2.reshape(-1, C), sc, bi, 1e-5).reshape(x2.shape),
        rtol=2e-5, atol=2e-5,
    )


def test_decode_step_packed_bf16_inputs_fp32_products():
    """bf16 activations take the bf16-spread path (halved intermediate
    traffic); products must still accumulate in fp32 — parity vs the
    reference composition on the same bf16 inputs is fp32-tight."""
    from rwkv_lm_ext_tpu.models.state import pack_wkv, unpack_wkv
    from rwkv_lm_ext_tpu.ops.wkv_decode import (
        _decode_ref, wkv6_decode_step_packed,
    )

    rng = np.random.default_rng(17)
    B, H, N = 3, 4, 64
    C = H * N
    mk = lambda sh: jnp.asarray(rng.normal(size=sh).astype(np.float32))
    r, k, v, g = (mk((B, C)).astype(jnp.bfloat16) for _ in range(4))
    w = jnp.asarray(rng.uniform(-6, 0.5, size=(B, C)).astype(np.float32))
    u = mk((H, N)) * 0.5
    scale = 1.0 + 0.1 * mk((C,))
    bias = 0.1 * mk((C,))
    state = mk((B, H, N, N)) * 0.3
    out_p, s_p = wkv6_decode_step_packed(
        r, k, v, w, g, u, scale, bias, pack_wkv(state), eps=64e-5
    )
    out_r, s_r = _decode_ref(
        r.reshape(B, H, N), k.reshape(B, H, N), v.reshape(B, H, N),
        w.reshape(B, H, N), g.reshape(B, H, N), u, scale, bias,
        state, 64e-5,
    )
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out_p.astype(np.float32), out_r.astype(np.float32),
        rtol=2e-2, atol=2e-2,  # out itself is bf16
    )
    np.testing.assert_allclose(
        unpack_wkv(s_p, N), s_r, rtol=2e-5, atol=2e-5  # fp32 state math
    )


def test_rescale_fast_path_matches_reference_bounded_decay():
    """The dispatcher-selected midpoint-rescale path (exact=False) must be
    numerically indistinguishable from the exact path whenever the decay
    bound suggest_wkv_dispatch checks holds (here w <= -0.5 at L=8:
    (L/2)e^{w_max} ~ 2.4 << MAX_EXP)."""
    r, k, v, w, u, g, scale, bias, s0 = _inputs()
    w = jnp.minimum(w, -0.5)
    eps = 64e-5
    out_f, s_f = wkv6_fused_output(
        r, k, v, w, u, g, scale, bias, s0, eps=eps, chunk_size=8,
        interpret=True, exact=False,
    )
    out_u, s_u = _unfused(r, k, v, w, u, g, scale, bias, s0, eps)
    np.testing.assert_allclose(out_f, out_u, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s_f, s_u, rtol=2e-4, atol=2e-4)


def test_rescale_backward_matches_autodiff():
    """Hand-written adjoint of the rescale A (head-packed geometry)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, _wkv_fused

    B, T, H, N = 2, 32, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=-0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    scale = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,))
    bias = 0.1 * jax.random.normal(ks[7], (H * N,))
    s0 = 0.1 * jax.random.normal(ks[8], (B, H, N, N))
    args = (r, k, v, w, u, s0, g, scale, bias)

    def loss_fused(a):
        out, sT = _wkv_fused(*a, 64e-5, 16, True, False)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    def loss_ref(a):
        out, sT = _fused_ref(*a, 64e-5, 16)
        return jnp.sum(out**2) + jnp.sum(sT**2)

    gp = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gp, gr):
        scale_ref = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale_ref < 1e-5


def test_suggest_wkv_dispatch_bounds():
    """Small decay bound -> rescale at the largest chunk; pathological
    checkpoint decay -> exact-A fallback."""
    import jax as _jax
    from rwkv_lm_ext_tpu.config import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import (
        apply_wkv_dispatch,
        suggest_wkv_dispatch,
    )

    cfg = ModelConfig(
        n_layer=2, n_embd=128, vocab_size=256, head_size=32,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(_jax.random.PRNGKey(0), cfg)
    # r4: 256 offered when the decay bound proves it (margin 0)
    exact, chunk = suggest_wkv_dispatch(params, margin=0.0)
    assert exact is False and chunk == 256

    # push one layer's decay bound into the unsafe regime
    params["blocks"][1]["att"]["time_decay"] = (
        params["blocks"][1]["att"]["time_decay"] + 6.0
    )
    exact, chunk = suggest_wkv_dispatch(params, margin=0.0)
    assert exact is True

    cfg2 = apply_wkv_dispatch(cfg, params)
    assert cfg2.wkv_exact is True


def test_verify_wkv_dispatch_guards_decay_shift():
    """VERDICT r4 #6: merging a LoRA that shifts time_decay_w2 past the
    proven rescale bound must flip the engine back to the exact-A path
    (with a warning) instead of running silently-inexact numerics. Also:
    suggest_wkv_dispatch must see THROUGH adapter leaves (unfused LoRA
    keeps the factors separate — the bound must include the delta)."""
    import warnings as _warnings

    import jax as _jax
    import jax.numpy as _jnp

    from rwkv_lm_ext_tpu.adapters.lora import (
        LoraConfig,
        apply_lora_unfused,
        merge_lora,
    )
    from rwkv_lm_ext_tpu.config import ModelConfig
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import (
        apply_wkv_dispatch,
        suggest_wkv_dispatch,
        verify_wkv_dispatch,
    )

    cfg = ModelConfig(
        n_layer=2, n_embd=128, vocab_size=256, head_size=32,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(_jax.random.PRNGKey(0), cfg)
    cfg = apply_wkv_dispatch(cfg, params, margin=0.0)
    assert cfg.wkv_exact is False  # base checkpoint proves the fast path

    w2 = params["blocks"][0]["att"]["time_decay_w2"]
    lc = LoraConfig(r=1, alpha=1.0)
    big = {"blocks.0.att.time_decay_w2": {
        "A": _jnp.full((w2.shape[0], 1), 3.0, _jnp.float32),
        "B": _jnp.full((1, w2.shape[1]), 3.0, _jnp.float32),
    }}

    # dense merge: the shifted bound must force the exact fallback
    merged = merge_lora(params, big, lc)
    exact, _ = suggest_wkv_dispatch(merged, margin=0.0)
    assert exact is True
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        eng = GenerationEngine(merged, cfg, wkv_backend="reference")
    assert eng.cfg.wkv_exact is True
    assert any("decay bound" in str(w.message) for w in rec)

    # unfused leaf (training path): the bound sees through the factors
    unfused = apply_lora_unfused(params, big, lc)
    exact, _ = suggest_wkv_dispatch(unfused, margin=0.0)
    assert exact is True

    # a benign adapter must NOT trigger the fallback
    small = {"blocks.0.att.time_decay_w2": {
        "A": _jnp.zeros((w2.shape[0], 1), _jnp.float32),
        "B": _jnp.zeros((1, w2.shape[1]), _jnp.float32),
    }}
    merged_ok = merge_lora(params, small, lc)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        cfg_ok = verify_wkv_dispatch(cfg, merged_ok)
    assert cfg_ok.wkv_exact is False and not rec
