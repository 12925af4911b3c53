"""WKV op family: chunked/pallas vs the sequential golden model.

The golden model (`wkv_reference`) is an exact port of the recurrence in
the reference's CPU fallback (tests/test_cpu.py:42-73) — a brute-force
numpy re-derivation here double-checks *it*, then everything else is
checked against it, including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu.ops import wkv, wkv5, wkv6, wkv6_bi, wkv_chunked, wkv_reference


def _rand(key, B=2, T=37, H=2, N=8, w_lo=-6.0, w_hi=0.5):
    ks = jax.random.split(key, 5)
    r = jax.random.normal(ks[0], (B, T, H, N), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, H, N), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, H, N), jnp.float32)
    w = jax.random.uniform(ks[3], (B, T, H, N), jnp.float32, w_lo, w_hi)
    u = jax.random.normal(ks[4], (H, N), jnp.float32) * 0.5
    return r, k, v, w, u


def _numpy_wkv(r, k, v, w, u, s0=None):
    """Independent O(T*N^2) brute force in numpy (state (K,V) layout)."""
    r, k, v, w = (np.asarray(x, np.float64) for x in (r, k, v, w))
    B, T, H, N = r.shape
    ew = np.exp(-np.exp(w))
    u = None if u is None else np.asarray(u, np.float64)
    S = np.zeros((B, H, N, N)) if s0 is None else np.asarray(s0, np.float64).copy()
    y = np.zeros((B, T, H, N))
    for b in range(B):
        for h in range(H):
            for t in range(T):
                kv = np.outer(k[b, t, h], v[b, t, h])
                att = S[b, h] + (u[h][:, None] * kv if u is not None else 0)
                y[b, t, h] = r[b, t, h] @ att
                S[b, h] = S[b, h] * ew[b, t, h][:, None] + kv
    return y, S


def test_reference_matches_numpy():
    r, k, v, w, u = _rand(jax.random.PRNGKey(0))
    y, S = wkv_reference(r, k, v, w, u)
    y_np, S_np = _numpy_wkv(r, k, v, w, u)
    np.testing.assert_allclose(y, y_np, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(S, S_np, rtol=2e-5, atol=2e-5)


def test_reference_initial_state_and_no_bonus():
    key = jax.random.PRNGKey(1)
    r, k, v, w, u = _rand(key)
    s0 = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 8, 8), jnp.float32)
    y, S = wkv_reference(r, k, v, w, None, s0)
    y_np, S_np = _numpy_wkv(r, k, v, w, None, s0)
    np.testing.assert_allclose(y, y_np, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(S, S_np, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T,chunk", [(37, 16), (64, 32), (16, 32), (128, 32)])
def test_chunked_matches_reference(T, chunk):
    r, k, v, w, u = _rand(jax.random.PRNGKey(2), T=T)
    y_ref, S_ref = wkv_reference(r, k, v, w, u)
    y, S = wkv_chunked(r, k, v, w, u, chunk_size=chunk)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(S, S_ref, rtol=1e-4, atol=1e-4)


def test_chunked_initial_state_chaining():
    """Two chained chunked calls == one long call (the infctx contract)."""
    r, k, v, w, u = _rand(jax.random.PRNGKey(3), T=48)
    y_full, S_full = wkv_chunked(r, k, v, w, u, chunk_size=16)
    y1, S1 = wkv_chunked(
        r[:, :24], k[:, :24], v[:, :24], w[:, :24], u, chunk_size=16
    )
    y2, S2 = wkv_chunked(
        r[:, 24:], k[:, 24:], v[:, 24:], w[:, 24:], u, S1, chunk_size=16
    )
    np.testing.assert_allclose(
        jnp.concatenate([y1, y2], 1), y_full, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(S2, S_full, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_chunked_grads_match_reference():
    r, k, v, w, u = _rand(jax.random.PRNGKey(4), B=1, T=21, H=1, N=8)
    s0 = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (1, 1, 8, 8))

    def loss(fn, args):
        y, S = fn(*args)
        return jnp.sum(y**2) + jnp.sum(S**2)

    g_ref = jax.grad(lambda *a: loss(wkv_reference, a), argnums=(0, 1, 2, 3, 4, 5))(
        r, k, v, w, u, s0
    )
    g_chk = jax.grad(
        lambda *a: loss(lambda *b: wkv_chunked(*b, chunk_size=8), a),
        argnums=(0, 1, 2, 3, 4, 5),
    )(r, k, v, w, u, s0)
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_state_param_grad():
    """State-tuning: grad w.r.t. a broadcast (H,N,N) init-state parameter
    (the reference sums gs over batch, src/model.py:178-181)."""
    r, k, v, w, u = _rand(jax.random.PRNGKey(6), B=3, T=10, H=2, N=4)
    s_param = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4))

    def loss(sp, fn):
        s0 = jnp.broadcast_to(sp[None], (3,) + sp.shape)
        y, _ = fn(r, k, v, w, u, s0)
        return jnp.sum(y**2)

    g = jax.grad(loss)(s_param, lambda *a: wkv_chunked(*a, chunk_size=8))
    g_ref = jax.grad(loss)(s_param, wkv_reference)
    # broadcasting the parameter makes autodiff sum the cotangent over
    # batch — the reference kernel's gs-summed-over-batch semantics
    np.testing.assert_allclose(g, g_ref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_wkv5_constant_decay():
    r, k, v, w, u = _rand(jax.random.PRNGKey(8), T=20)
    w5 = w[0, 0]  # (H,N)
    y5, S5 = wkv5(r, k, v, w5, u, backend="chunked")
    w_full = jnp.broadcast_to(w5[None, None], w.shape)
    y_ref, S_ref = wkv_reference(r, k, v, w_full, u)
    np.testing.assert_allclose(y5, y_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(S5, S_ref, rtol=1e-4, atol=1e-4)


def _numpy_bi(r, k, v, w, u, lengths):
    """Brute-force bidirectional per cuda/wkv6_bi_cuda.cu: causal pass with
    bonus + reverse pass without bonus, valid prefix only."""
    r, k, v, w = (np.asarray(x, np.float64) for x in (r, k, v, w))
    u = np.asarray(u, np.float64)
    B, T, H, N = r.shape
    ew = np.exp(-np.exp(w))
    y = np.zeros((B, T, H, N))
    for b in range(B):
        Lb = int(lengths[b]) if lengths is not None else T
        for h in range(H):
            S = np.zeros((N, N))
            for t in range(T):
                kv = np.outer(k[b, t, h], v[b, t, h])
                y[b, t, h] = r[b, t, h] @ (S + u[h][:, None] * kv)
                S = S * ew[b, t, h][:, None] + kv
            S = np.zeros((N, N))
            for t in range(Lb - 1, -1, -1):
                y[b, t, h] += r[b, t, h] @ S
                kv = np.outer(k[b, t, h], v[b, t, h])
                S = S * ew[b, t, h][:, None] + kv
    return y


@pytest.mark.parametrize("with_lengths", [False, True])
def test_bidirectional(with_lengths):
    r, k, v, w, u = _rand(jax.random.PRNGKey(10), B=2, T=19, H=2, N=8)
    lengths = jnp.array([19, 11]) if with_lengths else None
    y = wkv6_bi(r, k, v, w, u, lengths, backend="chunked", chunk_size=8)
    y_np = _numpy_bi(r, k, v, w, u, lengths)
    if with_lengths:
        # compare only valid positions; the masked CUDA kernel's forward
        # pass also runs through padding but padded positions carry no loss
        for b, Lb in enumerate([19, 11]):
            np.testing.assert_allclose(
                y[b, :Lb], y_np[b, :Lb], rtol=1e-4, atol=1e-4
            )
    else:
        np.testing.assert_allclose(y, y_np, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dispatcher_backends_agree():
    r, k, v, w, u = _rand(jax.random.PRNGKey(11), T=33)
    y_a, S_a = wkv(r, k, v, w, u, backend="reference")
    y_b, S_b = wkv(r, k, v, w, u, backend="chunked")
    np.testing.assert_allclose(y_a, y_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(S_a, S_b, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_chunked_exact_extreme_decay():
    """The chunked formulation must match the sequential reference for ANY
    decay — including w up to +3, where round 1's midpoint rescale (and the
    per-checkpoint chunk guard it required) silently degraded. Exactness is
    now the algorithm, not an option: every chunk size agrees."""
    r, k, v, w, u = _rand(jax.random.PRNGKey(21), T=96, w_lo=2.0, w_hi=3.0)
    y_ref, S_ref = wkv_reference(r, k, v, w, u)
    for L in (32, 128):
        y_ex, S_ex = wkv_chunked(r, k, v, w, u, chunk_size=L)
        np.testing.assert_allclose(y_ex, y_ref, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(S_ex, S_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pallas_extreme_decay_chunk_128():
    """VERDICT r1 item 4 acceptance: the Pallas kernel (interpret) matches
    wkv_reference at w_max=+3 with chunk 128 — the exact tiled A makes the
    kernel decay-safe with no per-checkpoint guard."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv_pallas

    r, k, v, w, u = _rand(jax.random.PRNGKey(23), T=160, w_lo=1.5, w_hi=3.0)
    y_ref, S_ref = wkv_reference(r, k, v, w, u)
    y_pl, S_pl = wkv_pallas(r, k, v, w, u, chunk_size=128, interpret=True)
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(S_pl, S_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_chunked_exact_grads_and_dispatch():
    r, k, v, w, u = _rand(jax.random.PRNGKey(22), T=48, w_lo=-4.0, w_hi=2.5)

    def loss(fn, r, k, v, w):
        y, S = fn(r, k, v, w, u, None)
        return jnp.sum(jnp.tanh(y)) + jnp.sum(S * 0.01)

    g_ref = jax.grad(
        lambda *a: loss(wkv_reference, *a), argnums=(0, 1, 2, 3)
    )(r, k, v, w)
    g_ex = jax.grad(
        lambda *a: loss(
            lambda *b: wkv_chunked(*b, chunk_size=16, exact=True), *a
        ),
        argnums=(0, 1, 2, 3),
    )(r, k, v, w)
    for a, b in zip(g_ref, g_ex):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    y_a, S_a = wkv(r, k, v, w, u, backend="chunked_exact", chunk_size=16)
    y_b, S_b = wkv_reference(r, k, v, w, u)
    np.testing.assert_allclose(y_a, y_b, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(S_a, S_b, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("N,H", [(96, 2), (48, 3), (24, 2)])
def test_pallas_padded_geometry_fwd_and_grads(N, H):
    """head sizes that don't divide 128 ride the packed kernels via
    zero-padding (ops.wkv_pallas.pad_target) — fwd and grads must match
    the sequential reference exactly (the padding is lossless)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import pad_target, wkv_pallas

    assert pad_target(N, H) is not None
    B, T = 2, 24
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    s0 = jax.random.normal(ks[5], (B, H, N, N)) * 0.1

    y_p, s_p = wkv_pallas(r, k, v, w, u, s0, interpret=True)
    y_r, s_r = wkv_reference(r, k, v, w, u, s0)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r),
                               rtol=2e-4, atol=2e-4)

    def loss_p(r, k, v, w, u, s0):
        y, sT = wkv_pallas(r, k, v, w, u, s0, interpret=True)
        return jnp.sum(y**2) + jnp.sum(sT**2)

    def loss_r(r, k, v, w, u, s0):
        y, sT = wkv_reference(r, k, v, w, u, s0)
        return jnp.sum(y**2) + jnp.sum(sT**2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(r, k, v, w, u, s0)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(r, k, v, w, u, s0)
    for a, b, name in zip(g_p, g_r, "rkvwus"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad {name}",
        )


def test_fused_output_padded_geometry():
    """wkv6_fused_output at head_size 96: the unfused+XLA-GN route must
    match the jnp composition (_fused_ref)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import _fused_ref, wkv6_fused_output

    B, T, H, N = 1, 16, 2, 96
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    g = jax.random.normal(ks[5], (B, T, H, N))
    sc = jax.random.normal(ks[6], (H * N,)) * 0.1 + 1.0
    bi = jnp.zeros((H * N,))
    out, sT = wkv6_fused_output(
        r, k, v, w, u, g, sc, bi, eps=1e-5, interpret=True
    )
    out_ref, sT_ref = _fused_ref(
        r, k, v, w, u, jnp.zeros((B, H, N, N)), g, sc, bi, 1e-5, 64
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(sT_ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_chunk_256():
    """L=256 chunks (now selectable by suggest_wkv_dispatch when the
    decay bound allows): fwd + grads vs reference, incl. T > L and the
    unfused impl's TB >= L block handling."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv_pallas

    B, T, H, N = 1, 384, 1, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=-1.0)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    s0 = jax.random.normal(ks[5], (B, H, N, N)) * 0.1

    for exact in (True, False):
        y_p, s_p = wkv_pallas(
            r, k, v, w, u, s0, chunk_size=256, interpret=True, exact=exact
        )
        y_r, s_r = wkv_reference(r, k, v, w, u, s0)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r),
                                   rtol=5e-4, atol=5e-4)

    def loss_p(v):
        y, sT = wkv_pallas(r, k, v, w, u, s0, chunk_size=256, interpret=True)
        return jnp.sum(y**2) + jnp.sum(sT**2)

    def loss_r(v):
        y, sT = wkv_reference(r, k, v, w, u, s0)
        return jnp.sum(y**2) + jnp.sum(sT**2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_p)(v)), np.asarray(jax.grad(loss_r)(v)),
        rtol=5e-3, atol=5e-3,
    )
