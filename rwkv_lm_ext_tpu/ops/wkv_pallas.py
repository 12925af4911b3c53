"""Pallas TPU kernel for the chunked WKV scan.

The TPU replacement for all of the reference's cuda/*.cu WKV kernels: one
fused kernel computes the chunk-parallel formulation of wkv_chunked.py with
the running (K, V) state held in VMEM scratch for the whole sequence — the
state never touches HBM between chunks (the CUDA kernels keep it in
registers per thread; VMEM is the TPU analogue).

Grid: (B*H, T/L). TPU grids execute sequentially with the last axis
innermost, so scratch carries the state across the chunk axis and resets
when a new (batch, head) program begins. Intra-chunk work is (L,N)x(N,L)
and (L,L)x(L,N) matmuls on the MXU in fp32.

Backward: custom_vjp recomputes through the XLA chunked path (fla
checkpoint_level-style recompute) — a fused Pallas backward is a later
optimization.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_lm_ext_tpu.ops.wkv_chunked import MAX_EXP, wkv_chunked


def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _wkv_kernel(
    r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref,  # inputs
    y_ref, sout_ref,                            # outputs
    state,                                      # VMEM scratch (N,N) f32
    *, L: int, N: int, TB: int,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[:, :] = s0_ref[0].astype(jnp.float32)

    u = u_ref[0].astype(jnp.float32)            # (1,N)

    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tril_inc = (row0 >= col0).astype(jnp.float32)
    causal = row0 > col0

    # static loop over the L-sized chunks of this TB-sized block: the
    # state never leaves VMEM between chunks
    for i in range(TB // L):
        sl = slice(i * L, (i + 1) * L)
        r = r_ref[0, sl, :].astype(jnp.float32)  # (L,N)
        k = k_ref[0, sl, :].astype(jnp.float32)
        v = v_ref[0, sl, :].astype(jnp.float32)
        w = w_ref[0, sl, :].astype(jnp.float32)

        lw = -jnp.exp(w)                         # <= 0
        # inclusive prefix sum as a lower-triangular matmul (Pallas TPU
        # has no cumsum; (L,L)x(L,N) rides the MXU anyway)
        winc = jax.lax.dot_general(
            tril_inc, lw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wexc = winc - lw                         # exclusive
        wlast = winc[L - 1, :][None, :]
        wmid = winc[L // 2, :][None, :]

        q_inter = r * jnp.exp(wexc)
        q_intra = r * jnp.exp(jnp.minimum(wexc - wmid, MAX_EXP))
        k_intra = k * jnp.exp(jnp.minimum(wmid - winc, MAX_EXP))
        k_state = k * jnp.exp(wlast - winc)

        # intra-chunk attention (strictly causal) + u-bonus diagonal
        A = jax.lax.dot_general(
            q_intra, k_intra,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # (L,L): A[t,s]
        A = jnp.where(causal, A, 0.0)
        diag = jnp.sum(r * u * k, axis=1, keepdims=True)  # (L,1)

        y = jax.lax.dot_general(
            A, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y += diag * v
        y += jax.lax.dot_general(
            q_inter, state[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[0, sl, :] = y.astype(y_ref.dtype)

        # state update: S = decay_total ⊙_K S + k_state^T @ v
        new_s = state[:, :] * jnp.exp(wlast)[0][:, None]
        new_s += jax.lax.dot_general(
            k_state, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        state[:, :] = new_s

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        sout_ref[0] = state[:, :]


def _wkv_pallas_fwd_impl(
    r, k, v, w, u, s0, *, chunk_size: int, interpret: bool = False,
    t_block: int = 512,
):
    """r,k,v,w: (B,T,H,N); u (H,N); s0 (B,H,N,N) fp32.

    Layout-free: inputs are viewed as (B, T, H*N) (a free reshape of the
    model's contiguous activations) and each (b, h, t-block) program slices
    its head's N columns — no host-side transposes, which at 1B6 scale cost
    more HBM traffic than the kernel's own math.
    """
    B, T, H, N = r.shape
    L = chunk_size
    TB = min(t_block, max(L, ((T + L - 1) // L) * L))
    pad = (-T) % TB
    if pad:
        cfg = [(0, 0)] * 4
        cfg[1] = (0, pad)
        r = jnp.pad(r, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
        w = jnp.pad(w, cfg, constant_values=-1e30)  # decay 1 on dead steps
    Tp = T + pad
    NTB = Tp // TB

    # (B,Tp,H,N) -> (B*H, Tp, N): XLA fuses this transpose into the
    # producing projections; the last block dim then equals the array dim,
    # satisfying the Mosaic lane constraint for N=64 heads.
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tp, N)

    rb, kb, vb, wb = (to_bh(x) for x in (r, k, v, w))
    ub = jnp.broadcast_to(u[None], (B, H, N)).reshape(B * H, 1, N)
    s0b = s0.reshape(B * H, N, N)

    bspec = pl.BlockSpec((1, TB, N), lambda i, c: (i, c, 0))
    in_specs = [
        bspec, bspec, bspec, bspec,
        pl.BlockSpec((1, 1, N), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((1, N, N), lambda i, c: (i, 0, 0)),
    ]
    out_specs = [
        bspec,
        pl.BlockSpec((1, N, N), lambda i, c: (i, 0, 0)),
    ]
    y, sout = pl.pallas_call(
        functools.partial(_wkv_kernel, L=L, N=N, TB=TB),
        grid=(B * H, NTB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tp, N), r.dtype),
            jax.ShapeDtypeStruct((B * H, N, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * N * (2 * N + L),
            bytes_accessed=4 * B * H * Tp * N * 4,
            transcendentals=B * H * Tp * N * 4,
        ),
    )(rb, kb, vb, wb, ub, s0b)

    y = y.reshape(B, H, Tp, N).transpose(0, 2, 1, 3)[:, :T]
    return y, sout.reshape(B, H, N, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _wkv_pallas(r, k, v, w, u, s0, chunk_size, interpret):
    return _wkv_pallas_fwd_impl(
        r, k, v, w, u, s0, chunk_size=chunk_size, interpret=interpret
    )


def _fwd(r, k, v, w, u, s0, chunk_size, interpret):
    out = _wkv_pallas_fwd_impl(
        r, k, v, w, u, s0, chunk_size=chunk_size, interpret=interpret
    )
    return out, (r, k, v, w, u, s0)


def _bwd(chunk_size, interpret, residuals, cts):
    r, k, v, w, u, s0 = residuals
    gy, gs = cts

    def f(r, k, v, w, u, s0):
        y, sT = wkv_chunked(
            r, k, v, w, u, s0, chunk_size=chunk_size, remat=True
        )
        return y.astype(r.dtype), sT

    _, vjp = jax.vjp(f, r, k, v, w, u, s0)
    return vjp((gy, gs))


_wkv_pallas.defvjp(_fwd, _bwd)


def wkv_pallas(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: Optional[jax.Array],
    initial_state: Optional[jax.Array] = None,
    *,
    chunk_size: int = 64,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as wkv_reference/wkv_chunked (y is returned in fp32
    for head-side GroupNorm precision; internals accumulate fp32)."""
    B, T, H, N = r.shape
    if u is None:
        u = jnp.zeros((H, N), jnp.float32)
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = not pallas_available()
    chunk_size = min(chunk_size, max(8, T))
    y, sout = _wkv_pallas(
        r, k, v, w.astype(jnp.float32), u.astype(jnp.float32),
        initial_state.astype(jnp.float32), chunk_size, interpret,
    )
    return y.astype(jnp.float32), sout


# ---------------------------------------------------------------------------
# Fused time-mix output kernel: WKV + GroupNorm(ln_x) + gating, head-PACKED.
#
# Profiling the 1B6 embed path showed the unfused pipeline spends more on
# layout copies and fp32 GroupNorm converts/reductions than on the WKV math
# itself. This kernel packs 128//N heads per program (full 128-lane blocks)
# so inputs stream directly from the model's contiguous (B, T, H*N)
# activations — no transposes — and applies the per-head GroupNorm + silu-
# gate multiply in VMEM, writing the gated bf16 output ready for the output
# projection. Replaces (per layer): 4 input transposes, the fp32 y
# materialization, the GN reductions, the gate multiply, and 1 output
# transpose.
# ---------------------------------------------------------------------------


def _wkv_gn_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref, s0_ref,
    out_ref, sout_ref,
    state,
    *, L: int, N: int, P: int, TB: int, eps: float,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[:, :] = s0_ref[0, 0].astype(jnp.float32)

    u_row = u_ref[0].astype(jnp.float32)        # (1, P*N)
    scale = sc_ref[0].astype(jnp.float32)       # (1, P*N)
    bias = bi_ref[0].astype(jnp.float32)

    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tril_inc = (row0 >= col0).astype(jnp.float32)
    causal = row0 > col0

    for i in range(TB // L):
        sl = slice(i * L, (i + 1) * L)
        r_all = r_ref[0, sl, :].astype(jnp.float32)   # (L, P*N)
        k_all = k_ref[0, sl, :].astype(jnp.float32)
        v_all = v_ref[0, sl, :].astype(jnp.float32)
        w_all = w_ref[0, sl, :].astype(jnp.float32)
        g_all = g_ref[0, sl, :].astype(jnp.float32)

        lw = -jnp.exp(w_all)
        winc = jax.lax.dot_general(
            tril_inc, lw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wexc = winc - lw
        wlast = winc[L - 1, :][None, :]
        wmid = winc[L // 2, :][None, :]
        q_inter_all = r_all * jnp.exp(wexc)
        q_intra_all = r_all * jnp.exp(jnp.minimum(wexc - wmid, MAX_EXP))
        k_intra_all = k_all * jnp.exp(jnp.minimum(wmid - winc, MAX_EXP))
        k_state_all = k_all * jnp.exp(wlast - winc)
        diag_all = r_all * u_row * k_all

        outs = []
        for p in range(P):
            lane = slice(p * N, (p + 1) * N)
            srows = slice(p * N, (p + 1) * N)
            v_h = v_all[:, lane]
            A = jax.lax.dot_general(
                q_intra_all[:, lane], k_intra_all[:, lane],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            A = jnp.where(causal, A, 0.0)
            y = jax.lax.dot_general(
                A, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y += jnp.sum(diag_all[:, lane], axis=1, keepdims=True) * v_h
            y += jax.lax.dot_general(
                q_inter_all[:, lane], state[srows, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_s = state[srows, :] * jnp.exp(wlast[0, lane])[:, None]
            new_s += jax.lax.dot_general(
                k_state_all[:, lane], v_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            state[srows, :] = new_s
            # per-head GroupNorm (torch GroupNorm semantics, groups = heads)
            mu = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
            yn = (y - mu) * jax.lax.rsqrt(var + eps)
            outs.append(yn)

        yn_all = jnp.concatenate(outs, axis=1)        # (L, P*N)
        out = (yn_all * scale + bias) * g_all
        out_ref[0, sl, :] = out.astype(out_ref.dtype)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        sout_ref[0, 0] = state[:, :]


def _fused_ref(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size):
    """jnp composition used for the custom-vjp backward (recompute) and as
    the CPU/interpret fallback. Matches the kernel: y stays fp32 into GN."""
    B, T, H, N = r.shape
    y, sT = wkv_chunked(r, k, v, w, u, s0, chunk_size=chunk_size, remat=True)
    yf = y.reshape(B, T, H, N)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
    yn = (yf - mu) * jax.lax.rsqrt(var + eps)
    yn = yn.reshape(B, T, H * N)
    out = (
        yn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    ) * g.reshape(B, T, H * N).astype(jnp.float32)
    return out.astype(g.dtype), sT


def _fused_impl(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret):
    B, T, H, N = r.shape
    P = 128 // N if N <= 128 and 128 % N == 0 else 1
    if H % P != 0:
        P = 1
    if interpret or P * N != 128:
        return _fused_ref(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size)
    H2 = H // P
    W = P * N
    L = chunk_size
    TB = min(512, max(L, ((T + L - 1) // L) * L))
    pad = (-T) % TB
    if pad:
        cfg4 = [(0, 0), (0, pad), (0, 0), (0, 0)]
        r = jnp.pad(r, cfg4)
        k = jnp.pad(k, cfg4)
        v = jnp.pad(v, cfg4)
        w = jnp.pad(w, cfg4, constant_values=-1e30)
        g = jnp.pad(g.reshape(B, T, H, N), cfg4).reshape(B, T + pad, H * N)
    else:
        g = g.reshape(B, T, H * N)
    Tp = T + pad
    NTB = Tp // TB

    rb, kb, vb, wb = (x.reshape(B, Tp, H * N) for x in (r, k, v, w))
    ub = u.reshape(H2, 1, W)
    scb = scale.reshape(H2, 1, W)
    bib = bias.reshape(H2, 1, W)
    s0b = s0.reshape(B, H2, W, N)

    def lane_spec():
        return pl.BlockSpec(
            (1, TB, W), lambda i, c: (i // H2, c, i % H2)
        )

    in_specs = [
        lane_spec(), lane_spec(), lane_spec(), lane_spec(), lane_spec(),
        pl.BlockSpec((1, 1, W), lambda i, c: (i % H2, 0, 0)),
        pl.BlockSpec((1, 1, W), lambda i, c: (i % H2, 0, 0)),
        pl.BlockSpec((1, 1, W), lambda i, c: (i % H2, 0, 0)),
        pl.BlockSpec((1, 1, W, N), lambda i, c: (i // H2, i % H2, 0, 0)),
    ]
    out_specs = [
        lane_spec(),
        pl.BlockSpec((1, 1, W, N), lambda i, c: (i // H2, i % H2, 0, 0)),
    ]
    out, sout = pl.pallas_call(
        functools.partial(
            _wkv_gn_kernel, L=L, N=N, P=P, TB=TB, eps=eps
        ),
        grid=(B * H2, NTB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * N), g.dtype),
            jax.ShapeDtypeStruct((B, H2, W, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W, N), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * N * (2 * N + L),
            bytes_accessed=6 * B * H * Tp * N * 2,
            transcendentals=B * H * Tp * N * 5,
        ),
    )(rb, kb, vb, wb, g, ub, scb, bib, s0b)
    return out[:, :T], sout.reshape(B, H, N, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _wkv_fused(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret):
    return _fused_impl(
        r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret
    )


def _fused_fwd(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret):
    out = _fused_impl(
        r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret
    )
    return out, (r, k, v, w, u, s0, g, scale, bias)


def _fused_bwd(eps, chunk_size, interpret, residuals, cts):
    r, k, v, w, u, s0, g, scale, bias = residuals

    def f(r, k, v, w, u, s0, g, scale, bias):
        return _fused_ref(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size)

    _, vjp = jax.vjp(f, r, k, v, w, u, s0, g, scale, bias)
    return vjp(cts)


_wkv_fused.defvjp(_fused_fwd, _fused_bwd)


def wkv6_fused_output(
    r, k, v, w, u, g, ln_scale, ln_bias, initial_state=None,
    *, eps: float, chunk_size: int = 64, interpret: Optional[bool] = None,
):
    """Fused WKV + GroupNorm(ln_x) + gate multiply.

    r,k,v,g: (B,T,H,N) compute dtype; w (B,T,H,N) fp32; u (H,N);
    ln_scale/ln_bias (H*N,); initial_state (B,H,N,N) fp32 or None.
    Returns (gated output (B,T,H*N) in g.dtype — feed straight into the
    output projection — and the final WKV state)."""
    B, T, H, N = r.shape
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = not pallas_available()
    return _wkv_fused(
        r, k, v, w.astype(jnp.float32), u.astype(jnp.float32),
        initial_state.astype(jnp.float32), g,
        ln_scale, ln_bias, eps, min(chunk_size, max(8, T)), interpret,
    )
