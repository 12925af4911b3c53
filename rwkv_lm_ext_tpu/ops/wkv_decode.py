"""Fused T=1 decode step: WKV state update + GroupNorm(ln_x) + gate.

At decode time the WKV "scan" degenerates to one recurrence step
(cuda/rwkv6.cu:23-60 semantics): per head,

    y_j     = sum_i r_i (u_i k_i v_j + S[i,j])
    S'[i,j] = exp(-exp(w_i)) S[i,j] + k_i v_j

The FLOPs are trivial; the cost is the fp32 state (B,H,N,N) — ~34 MB per
layer at 1B6 B=64 — which the unfused XLA path walks several times
(ablation: stubbing the state math drops the 1B6 B=64 decode step from
16.3 ms to 4.6 ms, vs a ~2 ms one-pass roofline). This kernel makes one
pass: state block in VMEM once, y/GN/gate computed in place, state
written back once.

Layout is everything here. Two earlier drafts were beaten by XLA:
(HT,N,N) 3D broadcasts lowered to per-element relayouts, and per-head
(1,N)x(N,N) matmuls serialized on MXU latency. This version uses rows =
(batch, head, channel i) and lanes = j, so every per-row scalar (r, k,
decay) arrives as an (R,1) column produced by FREE reshapes in XLA (the
(B,C) activation layout is already row-major in (b,h,i)), and the only
cross-row ops are two large MXU matmuls against a one-hot head-expansion
matrix E[(b,h,i), (b,h)]: Y = E^T (rcol*S) does the per-head reduction,
vmat = E v does the per-head broadcast. No transposes, no tiny matmuls.

Grid: (B/BT,). Backward (never hot: decode is inference) recomputes
through the jnp composition.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref,
    eb_ref, ef_ref, it_ref, s_ref,
    out_ref, snew_ref,
    *, BT: int, H: int, N: int, eps: float,
):
    f = jnp.float32
    bf = jnp.bfloat16
    r2 = r_ref[:, :]                               # (QT, N) bf16-ish
    k2 = k_ref[:, :]
    v2 = v_ref[:, :]
    g2 = g_ref[:, :].astype(f)
    w2 = w_ref[:, :]                               # (QT, N) fp32
    decay = jnp.exp(-jnp.exp(w2))                  # fp32, tiny array
    d_hi = decay.astype(bf)
    d_lo = (decay - d_hi.astype(f)).astype(bf)
    S = s_ref[:, :]                                # (R, N) fp32

    u2 = u_ref[:, :].astype(f)                     # (H, N)
    sc = sc_ref[:, :].astype(f)
    bi = bi_ref[:, :].astype(f)
    if BT > 1:
        u2 = jnp.concatenate([u2] * BT, axis=0)
        sc = jnp.concatenate([sc] * BT, axis=0)
        bi = jnp.concatenate([bi] * BT, axis=0)
    r2f = r2.astype(f)
    k2f = k2.astype(f)
    v2f = v2.astype(f)
    bonus = jnp.sum(r2f * u2 * k2f, axis=1, keepdims=True)   # (QT, 1)

    # E[(q,i), q'] = (q==q') (bf16 + fp32 copies), I[(q,i), j] = (i==j):
    # constant inputs resident in VMEM across the whole grid. A = E @ X
    # broadcasts each head row to its N state rows; sum(A_x * I, lanes)
    # extracts the per-row scalar as an (R,1) column. bf16 matmuls are
    # exact for one-hot E against bf16 activations; the fp32 decay rides
    # a hi/lo split. (Earlier versions: (R,1) columns from XLA -> 64MB
    # 128x-padded layout copies; in-kernel fp32 E rebuild + fp32 matmuls
    # -> ~5x roofline.)
    Eb = eb_ref[:, :]                              # (R, QT) bf16
    Ef = ef_ref[:, :]                              # (R, QT) fp32
    I_t = it_ref[:, :]                             # (R, N) fp32

    def split(x):
        hi = x.astype(bf)
        return hi, (x - hi.astype(f)).astype(bf)

    r_hi, r_lo = split(r2f)
    k_hi, k_lo = split(k2f)
    v_hi, v_lo = split(v2f)
    X = jnp.concatenate(
        [r_hi, k_hi, v_hi, d_hi, r_lo, k_lo, v_lo, d_lo], axis=1
    )                                              # (QT, 8N) bf16
    A = jax.lax.dot_general(                       # (R, 8N) fp32
        Eb, X, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    HALF = 4 * N

    def col(i):
        part = A[:, i * N : (i + 1) * N] + A[:, HALF + i * N : HALF + (i + 1) * N]
        return jnp.sum(part * I_t, axis=1, keepdims=True)

    rcol, kcol, dcol = col(0), col(1), col(3)
    vmat = A[:, 2 * N : 3 * N] + A[:, HALF + 2 * N : HALF + 3 * N]

    G = rcol * S
    y = jax.lax.dot_general(                       # E^T @ G: per-head sums
        Ef, G, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f,
    )                                              # (QT, N)
    y += bonus * v2f
    snew_ref[:, :] = dcol * S + kcol * vmat

    # per-head GroupNorm + affine + gate
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out_ref[:, :] = ((yn * sc + bi) * g2).astype(out_ref.dtype)


def _decode_ref(r, k, v, w, g, u, scale, bias, state, eps):
    """jnp composition (backward + CPU fallback). r/k/v/w/g: (B,H,N);
    u (H,N); scale/bias (C,); state (B,H,N,N) fp32."""
    B, H, N = r.shape
    f = jnp.float32
    rf, kf, vf, wf, gf = (x.astype(f) for x in (r, k, v, w, g))
    uf = u.astype(f)
    decay = jnp.exp(-jnp.exp(wf))
    bonus = jnp.sum(rf * uf[None] * kf, axis=-1, keepdims=True)     # (B,H,1)
    y = jnp.einsum("bhi,bhij->bhj", rf, state) + bonus * vf
    snew = decay[..., None] * state + kf[..., None] * vf[:, :, None, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out = (
        yn * scale.astype(f).reshape(H, N)[None]
        + bias.astype(f).reshape(H, N)[None]
    ) * gf
    return out.reshape(B, H * N).astype(g.dtype), snew


def _pick_bt(B: int, H: int, N: int) -> Optional[int]:
    """Largest divisor of B with 8-aligned block rows and state block
    <= ~1 MB (falling back to the whole batch when alignment needs it)."""
    cap = max(1, (1 << 20) // (H * N * N * 4))
    for bt in range(min(B, cap), 0, -1):
        if B % bt == 0 and (bt * H) % 8 == 0 and (bt * H * N) % 8 == 0:
            return bt
    return B  # full-array blocks always satisfy the tiling rule


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _decode(r, k, v, w, g, u, scale, bias, state, eps, interpret):
    return _decode_impl(r, k, v, w, g, u, scale, bias, state, eps, interpret)


def _decode_impl(r, k, v, w, g, u, scale, bias, state, eps, interpret):
    B, H, N = r.shape
    if N % 8 != 0 or N > 512:
        return _decode_ref(r, k, v, w, g, u, scale, bias, state, eps)
    BT = _pick_bt(B, H, N)
    R, QT = BT * H * N, BT * H

    # free reshapes: (B,H,N) is row-major in (b,h)
    r2 = r.reshape(B * H, N)
    k2 = k.reshape(B * H, N)
    v2 = v.reshape(B * H, N)
    w2 = w.reshape(B * H, N)
    g2 = g.reshape(B * H, N)
    s2 = state.reshape(B * H * N, N)

    # constant one-hot expansion/selection matrices (built once in XLA,
    # resident in VMEM across the whole grid via constant index maps)
    rows = jnp.arange(R)
    E = (rows[:, None] // N == jnp.arange(QT)[None, :])
    I_t = (rows[:, None] % N == jnp.arange(N)[None, :])
    Eb = E.astype(jnp.bfloat16)
    Ef = E.astype(jnp.float32)
    If = I_t.astype(jnp.float32)

    qrow = lambda: pl.BlockSpec((QT, N), lambda b: (b, 0))
    smat = pl.BlockSpec((R, N), lambda b: (b, 0))
    hconst = lambda: pl.BlockSpec((H, N), lambda b: (0, 0))
    econst = lambda sh: pl.BlockSpec(sh, lambda b: (0, 0))
    out, snew = pl.pallas_call(
        functools.partial(_decode_kernel, BT=BT, H=H, N=N, eps=eps),
        grid=(B // BT,),
        in_specs=[
            qrow(), qrow(), qrow(), qrow(), qrow(),
            hconst(), hconst(), hconst(),
            econst((R, QT)), econst((R, QT)), econst((R, N)),
            smat,
        ],
        out_specs=[qrow(), smat],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N), g.dtype),
            jax.ShapeDtypeStruct((B * H * N, N), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * H,  # E matmuls contract over QT/R
            bytes_accessed=2 * B * H * N * N * 4,
            transcendentals=2 * B * H * N,
        ),
    )(
        r2, k2, v2, w2, g2,
        u.reshape(H, N), scale.reshape(H, N), bias.reshape(H, N),
        Eb, Ef, If,
        s2,
    )
    return out.reshape(B, H * N), snew.reshape(B, H, N, N)


def _decode_fwd(r, k, v, w, g, u, scale, bias, state, eps, interpret):
    out = _decode_impl(r, k, v, w, g, u, scale, bias, state, eps, interpret)
    return out, (r, k, v, w, g, u, scale, bias, state)


def _decode_bwd(eps, interpret, res, cts):
    r, k, v, w, g, u, scale, bias, state = res

    def f(r, k, v, w, g, u, scale, bias, state):
        return _decode_ref(r, k, v, w, g, u, scale, bias, state, eps)

    _, vjp = jax.vjp(f, r, k, v, w, g, u, scale, bias, state)
    return vjp(cts)


_decode.defvjp(_decode_fwd, _decode_bwd)


def decode_packable(N: int) -> bool:
    """wkv6_decode_step_packed's geometry guard: the spread/fold index
    arithmetic needs whole logical rows per packed lane group."""
    return (N * N) % 128 == 0 and 128 % N == 0


def wkv6_decode_step_packed(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    g: jax.Array,
    u: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    state_packed: jax.Array,
    *,
    eps: float,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step on the TILE-PACKED state (models/state.py): every
    state-sized array stays (B, H, N*N/128, 128) so XLA never pads the
    minor dim (N=64 arrays lose ~6x copy bandwidth to 128-lane padding —
    the measured root cause of the 16 ms vs ~5 ms B=64 decode gap).

    Pure XLA: the per-row scalars (r_i, k_i, decay_i) and the per-head
    v_j tile are produced by constant one-hot MXU matmuls (x @ M with
    M (N, N*N)); no logical (..., N, N) array is ever materialized.
    Measured on v5e (B=64, H=32, N=64, inside a scan): 145 us/step vs
    172 us for the logical einsum composition and 1034/530 us for
    broadcast/repeat spreads (lane-index-arithmetic broadcasts lower to
    VREG shuffles; the matmul keeps the VPU out of the lane-mix path).

    r,k,v,g: (B, C); w: (B, C) raw log-decay; u (H,N); ln_scale/ln_bias
    (C,); state_packed (B, H, P, 128) fp32, P = N*N/128, with the packed
    lane c holding logical (i, j) = (p*K + c//N, c%N), K = 128/N.
    Returns (gated out (B, C) in g.dtype, new packed state)."""
    H, N = u.shape
    B = r.shape[0]
    K, P = 128 // N, (N * N) // 128
    assert 128 % N == 0 and (N * N) % 128 == 0, (H, N)
    f = jnp.float32
    r3 = r.reshape(B, H, N).astype(f)
    k3 = k.reshape(B, H, N).astype(f)
    v3 = v.reshape(B, H, N).astype(f)
    g3 = g.reshape(B, H, N).astype(f)
    w3 = w.astype(f).reshape(B, H, N)
    decay = jnp.exp(-jnp.exp(w3))
    uf = u.astype(f)
    bonus = jnp.sum(r3 * uf[None] * k3, axis=-1, keepdims=True)  # (B,H,1)
    S = state_packed.astype(f)

    # constant one-hot spread/tile matrices over the flat packed lane
    # index q = i*N + j (trace-time constants, shared across scan steps)
    i_idx = jnp.arange(N)[:, None]
    q_idx = jnp.arange(N * N)[None, :]
    M_spread = (i_idx == q_idx // N).astype(f)           # (N, N*N)
    M_tile = (i_idx == q_idx % N).astype(f)              # (N, N*N)

    def mm(x, M):  # (B,H,N) @ (N, N*N) -> packed (B,H,P,128)
        # HIGHEST: the TPU default truncates fp32 operands to bf16; the
        # hi/lo 3-pass is exact for a 0/1 one-hot M (selection, not math)
        out = jax.lax.dot_general(
            x.reshape(B * H, N), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(B, H, P, 128)

    spread = lambda x: mm(x, M_spread)
    snew = spread(decay) * S + spread(k3) * mm(v3, M_tile)
    y128 = jnp.sum(spread(r3) * S, axis=2)               # (B, H, 128)
    y = jnp.sum(y128.reshape(B, H, K, N), axis=2) + bonus * v3

    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out = (
        yn * ln_scale.astype(f).reshape(H, N)[None]
        + ln_bias.astype(f).reshape(H, N)[None]
    ) * g3
    return out.reshape(B, H * N).astype(g.dtype), snew


def wkv6_decode_step(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    g: jax.Array,
    u: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    state: jax.Array,
    *,
    eps: float,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One fused decode step.

    r,k,v,g: (B, C) compute dtype; w: (B, C) fp32 (raw log-decay; the
    kernel applies exp(-exp(w))); u (H,N); ln_scale/ln_bias (C,);
    state (B, H, N, N) fp32.
    Returns (gated output (B, C) in g.dtype — feed the output projection —
    and the updated state)."""
    from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

    H, N = u.shape
    B = r.shape[0]
    if interpret is None:
        interpret = not pallas_available()
    r3, k3, v3, g3 = (x.reshape(B, H, N) for x in (r, k, v, g))
    w3 = w.astype(jnp.float32).reshape(B, H, N)
    return _decode(
        r3, k3, v3, w3, g3, u, ln_scale, ln_bias,
        state.astype(jnp.float32), eps, interpret,
    )
