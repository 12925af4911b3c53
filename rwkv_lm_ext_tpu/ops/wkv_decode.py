"""T=1 decode step: WKV state update + GroupNorm(ln_x) + gate.

At decode time the WKV "scan" degenerates to one recurrence step
(cuda/rwkv6.cu:23-60 semantics): per head,

    y_j     = sum_i r_i (u_i k_i v_j + S[i,j])
    S'[i,j] = exp(-exp(w_i)) S[i,j] + k_i v_j

The FLOPs are trivial; the cost is the fp32 state — ~34 MB per layer at
1B6 B=64 — so the op is HBM-bandwidth bound and LAYOUT is everything: a
logical (..., N, N) array with N=64 is physically padded to 128 lanes by
XLA (2x footprint, ~6.5x measured copy-bandwidth loss), so both
implementations here consume the TILE-PACKED (B, H, N*N/128, 128) state
(models/state.py) and never materialize a logical view.

Two implementations, measured at 1B6 B=64 inside a decode scan on v5e:
  * wkv6_decode_step_packed — pure XLA, ~130 us/layer. The per-row
    scalar spreads / per-head v tile are constant one-hot MXU matmuls
    (x @ M, M (N, N*N)); XLA fuses them into the two state passes.
    DEFAULT path (models/rwkv.py routes T=1 here).
  * wkv6_decode_step_packed_pallas — single-pass Pallas kernel,
    ~140 us/layer: state block to VMEM once, spread/tile/plane-sum via
    one one-hot MXU matmul + static 128-lane block slices. Kept as the
    opt-in wkv_backend="pallas" route and as the template for multi-op
    fusion; it does not yet beat the XLA composition (the op is
    elementwise-bound and XLA pipelines it well).
Formulations that LOST (for the record): logical-layout einsum 172 us;
broadcast/repeat lane spreads 530-1030 us (lane-index arithmetic lowers
to VREG shuffles); in-kernel masked-reduce spreads 235-310 us; Mosaic
rejects lanes->sublanes shape casts outright.

Backward (never hot: decode is inference) recomputes through the jnp
composition _decode_ref.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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




def _decode_packed_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref,
    msp_ref, s_ref,
    out_ref, snew_ref,
    *, BT: int, H: int, N: int, eps: float,
):
    """Packed-state decode step, one program per BT batch rows.

    Everything stays 2D with 128-aligned lanes: the state block is
    (QT, P*128) (a free reshape of the packed (B, H, P, 128) carry; lane
    q = p*128 + a*N + j holds logical (i, j) = (p*K + a, j)). One
    one-hot MXU matmul produces all three per-row scalar spreads
    (row-stacked [decay; k; r] @ Msp — bf16 one-hot matmuls are exact
    and the hi/lo split rides the same contraction); tile(v) and the
    y plane-sum are static 128-lane block concats/adds on the VPU. No
    lane shuffles, no shape casts, no masked reduces — earlier drafts
    using those were 1.5-8x slower than the XLA composition."""
    f = jnp.float32
    bf = jnp.bfloat16
    K = 128 // N
    P = (N * N) // 128
    QT = BT * H

    r2 = r_ref[:, :].astype(f)
    k2 = k_ref[:, :].astype(f)
    v2 = v_ref[:, :].astype(f)
    g2 = g_ref[:, :].astype(f)
    w2 = w_ref[:, :]                                   # fp32
    decay = jnp.exp(-jnp.exp(w2))
    S = s_ref[:, :]                                    # (QT, P*128) fp32

    u2 = u_ref[:, :].astype(f)                         # (H, N)
    sc = sc_ref[:, :].astype(f)
    bi = bi_ref[:, :].astype(f)
    if BT > 1:
        u2 = jnp.concatenate([u2] * BT, axis=0)
        sc = jnp.concatenate([sc] * BT, axis=0)
        bi = jnp.concatenate([bi] * BT, axis=0)
    bonus = jnp.sum(r2 * u2 * k2, axis=1, keepdims=True)   # (QT, 1)

    Msp = msp_ref[:, :]                                # (2N, P*128) bf16

    def hilo(x):                                       # (QT, N) -> (QT, 2N)
        hi = x.astype(bf)
        lo = (x - hi.astype(f)).astype(bf)
        return jnp.concatenate([hi, lo], axis=1)

    # one MXU matmul produces all three spreads (row-stacked)
    X3 = jnp.concatenate(
        [hilo(decay), hilo(k2), hilo(r2)], axis=0
    )                                                  # (3QT, 2N) bf16
    A3 = jax.lax.dot_general(                          # (3QT, P*128) f32
        X3, Msp, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    sd, sk, sr = A3[:QT], A3[QT : 2 * QT], A3[2 * QT :]

    # tile(v) and the plane-sum are static 128-lane block concats/adds
    rep = jnp.concatenate([v2] * K, axis=1)            # (QT, 128)
    tile_v = jnp.concatenate([rep] * P, axis=1)        # (QT, P*128)

    snew_ref[:, :] = sd * S + sk * tile_v

    t = sr * S                                         # (QT, P*128)
    yh = t[:, :128]
    for p in range(1, P):
        yh = yh + t[:, p * 128 : (p + 1) * 128]        # (QT, 128) fp32
    y = sum(yh[:, a * N : (a + 1) * N] for a in range(K))
    y = y + bonus * v2                                 # (QT, N)

    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out_ref[:, :] = ((yn * sc + bi) * g2).astype(out_ref.dtype)


def _pick_bt_packed(B: int, H: int, N: int):
    """Largest divisor of B with 8-aligned row blocks and a state block
    <= ~2 MB in VMEM (the kernel keeps ~8 state-sized live values:
    S, A3 spreads, tile, products, snew, double-buffered I/O; BT=4 at
    1B6 B=64 measured fastest — bigger blocks OOM the 16 MB scoped
    VMEM, smaller ones pay more per-program fixed cost).

    Returns None when no divisor of B yields 8-aligned row blocks (e.g.
    B=2, H=3): the Mosaic kernel requires the alignment, so the caller
    must route such shapes to the XLA packed composition instead."""
    P = (N * N) // 128
    cap = max(1, (2 << 20) // (H * P * 128 * 4))
    for bt in range(min(B, cap), 0, -1):
        if B % bt == 0 and (bt * H) % 8 == 0 and (bt * H * P) % 8 == 0:
            return bt
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def wkv6_decode_step_packed_pallas(
    r, k, v, w, g, u, ln_scale, ln_bias, state_packed, eps, interpret=False
):
    """Pallas single-pass variant of wkv6_decode_step_packed: the state
    block is read into VMEM once and written once per step (the XLA
    version materializes the one-hot spread products in HBM). Same packed
    (B, H, P, 128) state contract. eps/interpret are positional
    (custom_vjp nondiff); backward recomputes through the XLA packed
    composition."""
    H, N = u.shape
    B = r.shape[0]
    K, P = 128 // N, (N * N) // 128
    BT = _pick_bt_packed(B, H, N)
    if BT is None:
        # no 8-aligned row blocking exists for this (B, H): the XLA
        # packed composition handles any shape at near-identical speed
        return wkv6_decode_step_packed(
            r, k, v, w, g, u, ln_scale, ln_bias, state_packed, eps=eps
        )
    R, QT = BT * H * P, BT * H

    r2 = r.reshape(B * H, N)
    k2 = k.reshape(B * H, N)
    v2 = v.reshape(B * H, N)
    w2 = w.astype(jnp.float32).reshape(B * H, N)
    g2 = g.reshape(B * H, N)
    s2 = state_packed.reshape(B * H, P * 128)

    # one-hot data-movement matrices (trace-time constants); the hi/lo
    # halves stack so spread(hi)+spread(lo) rides one contraction
    i_idx = jnp.arange(N)[:, None]
    q_idx = jnp.arange(P * 128)[None, :]
    msp1 = (i_idx == q_idx // N).astype(jnp.bfloat16)
    Msp = jnp.concatenate([msp1, msp1], axis=0)        # (2N, P*128)

    qrow = lambda: pl.BlockSpec((QT, N), lambda b: (b, 0))
    smat = pl.BlockSpec((QT, P * 128), lambda b: (b, 0))
    hconst = lambda: pl.BlockSpec((H, N), lambda b: (0, 0))
    cconst = lambda sh: pl.BlockSpec(sh, lambda b: (0, 0))
    out, snew = pl.pallas_call(
        functools.partial(
            _decode_packed_kernel, BT=BT, H=H, N=N, eps=eps
        ),
        grid=(B // BT,),
        in_specs=[
            qrow(), qrow(), qrow(), qrow(), qrow(),
            hconst(), hconst(), hconst(),
            cconst((2 * N, P * 128)),
            smat,
        ],
        out_specs=[qrow(), smat],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N), g.dtype),
            jax.ShapeDtypeStruct((B * H, P * 128), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * N * N * N,
            bytes_accessed=2 * B * H * N * N * 4,
            transcendentals=2 * B * H * N,
        ),
    )(
        r2, k2, v2, w2, g2,
        u.reshape(H, N), ln_scale.reshape(H, N), ln_bias.reshape(H, N),
        Msp,
        s2,
    )
    return (
        out.reshape(B, H * N),
        snew.reshape(B, H, P, 128),
    )


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
    bf = jnp.bfloat16
    # r/k/v spreads stay in the INPUT dtype when it is bf16: a one-hot
    # matmul is pure selection, so a bf16 output of a bf16 input is exact
    # and the materialized state-sized intermediates halve their HBM
    # traffic (op 136 -> 109 us/layer at 1B6 B=64). fp32 inputs (tests,
    # fp32 serving) keep fp32 HIGHEST spreads.
    lossless_bf16 = r.dtype == bf and k.dtype == bf and v.dtype == bf
    act_dt = bf if lossless_bf16 else f
    r3 = r.reshape(B, H, N).astype(act_dt)
    k3 = k.reshape(B, H, N).astype(act_dt)
    v3 = v.reshape(B, H, N).astype(act_dt)
    g3 = g.reshape(B, H, N).astype(f)
    w3 = w.astype(f).reshape(B, H, N)
    decay = jnp.exp(-jnp.exp(w3))
    uf = u.astype(f)
    bonus = jnp.sum(
        r3.astype(f) * uf[None] * k3.astype(f), axis=-1, keepdims=True
    )                                                    # (B,H,1)
    S = state_packed.astype(f)

    # constant one-hot spread/tile matrices over the flat packed lane
    # index q = i*N + j (trace-time constants, shared across scan steps)
    i_idx = jnp.arange(N)[:, None]
    q_idx = jnp.arange(N * N)[None, :]
    M_spread = (i_idx == q_idx // N)                     # (N, N*N)
    M_tile = (i_idx == q_idx % N)

    def mm(x, M):  # (B,H,N) @ (N, N*N) -> packed (B,H,P,128)
        # fp32 path at HIGHEST: the TPU default truncates fp32 operands
        # to bf16; the hi/lo 3-pass is exact for a 0/1 one-hot M
        # (selection, not math). bf16 path: single pass, exact.
        out = jax.lax.dot_general(
            x.reshape(B * H, N), M.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
            precision=(
                None if x.dtype == bf else jax.lax.Precision.HIGHEST
            ),
        )
        return out.reshape(B, H, P, 128)

    # products in fp32 (CUDA contract: bf16 I/O, fp32 state math); the
    # upcasts fuse into the consumer so the HBM intermediates stay bf16
    snew = mm(decay, M_spread) * S + (
        mm(k3, M_spread).astype(f) * mm(v3, M_tile).astype(f)
    )
    y128 = jnp.sum(mm(r3, M_spread).astype(f) * S, axis=2)   # (B, H, 128)
    y = (
        jnp.sum(y128.reshape(B, H, K, N), axis=2)
        + bonus * v3.astype(f)
    )

    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out = (
        yn * ln_scale.astype(f).reshape(H, N)[None]
        + ln_bias.astype(f).reshape(H, N)[None]
    ) * g3
    return out.reshape(B, H * N).astype(g.dtype), snew

def _packed_pallas_fwd(r, k, v, w, g, u, ln_scale, ln_bias, state_packed,
                       eps, interpret):
    out = wkv6_decode_step_packed_pallas(
        r, k, v, w, g, u, ln_scale, ln_bias, state_packed, eps, interpret
    )
    return out, (r, k, v, w, g, u, ln_scale, ln_bias, state_packed)


def _packed_pallas_bwd(eps, interpret, res, cts):
    def f(*args):
        return wkv6_decode_step_packed(*args, eps=eps)

    _, vjp = jax.vjp(f, *res)
    return vjp(cts)


wkv6_decode_step_packed_pallas.defvjp(_packed_pallas_fwd, _packed_pallas_bwd)
