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
    rcol_ref, kcol_ref, dcol_ref, v_ref, g_ref, bonus_ref,
    sc_ref, bi_ref, s_ref,
    out_ref, snew_ref,
    *, BT: int, H: int, N: int, eps: float,
):
    R = BT * H * N                                 # state rows this program
    QT = BT * H                                    # (batch, head) rows
    rcol = rcol_ref[:, :].astype(jnp.float32)      # (R, 1)
    kcol = kcol_ref[:, :].astype(jnp.float32)
    dcol = dcol_ref[:, :]                          # (R, 1) fp32 decay
    v = v_ref[:, :].astype(jnp.float32)            # (QT, N)
    g = g_ref[:, :].astype(jnp.float32)
    bonus = bonus_ref[:, :]                        # (QT, 1) fp32
    S = s_ref[:, :]                                # (R, N) fp32

    # one-hot head expansion: E[row, q] = (row // N == q)
    row_q = jax.lax.broadcasted_iota(jnp.int32, (R, QT), 0) // N
    col_q = jax.lax.broadcasted_iota(jnp.int32, (R, QT), 1)
    E = (row_q == col_q).astype(jnp.float32)

    G = rcol * S
    y = jax.lax.dot_general(                       # E^T @ G: per-head sums
        E, G, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (QT, N)
    y += bonus * v

    vmat = jax.lax.dot_general(                    # E @ v: per-head bcast
        E, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (R, N)
    snew_ref[:, :] = dcol * S + kcol * vmat

    # per-head GroupNorm + affine + gate
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    sc = sc_ref[:, :].astype(jnp.float32)          # (H, N)
    bi = bi_ref[:, :].astype(jnp.float32)
    if BT > 1:
        sc = jnp.concatenate([sc] * BT, axis=0)
        bi = jnp.concatenate([bi] * BT, axis=0)
    out_ref[:, :] = ((yn * sc + bi) * g).astype(out_ref.dtype)


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

    f = jnp.float32
    decay = jnp.exp(-jnp.exp(w.astype(f)))
    bonus = jnp.sum(
        r.astype(f) * u.astype(f)[None] * k.astype(f), axis=-1, keepdims=True
    ).reshape(B * H, 1)
    # free reshapes: (B,H,N) is row-major in (b,h,i)
    rcol = r.reshape(B * H * N, 1)
    kcol = k.reshape(B * H * N, 1)
    dcol = decay.reshape(B * H * N, 1)
    v2 = v.reshape(B * H, N)
    g2 = g.reshape(B * H, N)
    s2 = state.reshape(B * H * N, N)

    col = lambda: pl.BlockSpec((R, 1), lambda b: (b, 0))
    qrow = lambda: pl.BlockSpec((QT, N), lambda b: (b, 0))
    smat = pl.BlockSpec((R, N), lambda b: (b, 0))
    hconst = lambda: pl.BlockSpec((H, N), lambda b: (0, 0))
    out, snew = pl.pallas_call(
        functools.partial(_decode_kernel, BT=BT, H=H, N=N, eps=eps),
        grid=(B // BT,),
        in_specs=[
            col(), col(), col(), qrow(), qrow(),
            pl.BlockSpec((QT, 1), lambda b: (b, 0)),
            hconst(), hconst(), smat,
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
            transcendentals=0,
        ),
    )(
        rcol, kcol, dcol, v2, g2, bonus,
        scale.reshape(H, N), bias.reshape(H, N),
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
