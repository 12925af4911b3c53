"""Chunked (blockwise-parallel) WKV — the XLA fast path.

Replaces the per-token sequential recurrence with a chunk-parallel
formulation so the FLOPs land on the MXU as (L, N) x (N, N) / (L, L)
matmuls, with only a T/L-step `lax.scan` carrying the (K, V) state between
chunks. Semantically equivalent to `wkv_reference` (same recurrence as the
reference's cuda/wkv6_cuda.cu and the chunked Triton template
fla/ops/rwkv6/chunk.py:785-827).

Derivation (per batch/head; N channels; lw[t] = -exp(w[t]) <= 0 the
log-decay; Winc[t] = sum_{u<=t} lw[u], Wexc[t] = Winc[t] - lw[t]):

  y[t] = r[t]·(u ⊙ k[t]) v[t]                              (bonus, diagonal)
       + sum_{s<t} (r[t] ⊙ e^{Wexc[t]-Winc[s]})·k[s] v[s]  (intra-chunk)
       + (r[t] ⊙ e^{Wexc[t]}) @ S_chunk_start              (inter-chunk)

  S_next = e^{Winc[L-1]} ⊙_K S + sum_s (k[s] ⊙ e^{Winc[L-1]-Winc[s]})^T v[s]

All per-chunk exponents are <= 0 except the intra-chunk key-side factor
e^{-Winc[s]}, which is bounded by rescaling around the chunk midpoint and
clipping at MAX_EXP (affects only contributions that are ~0 anyway; the
sequential reference is the exactness backstop). The rescale is exact only
while (L/2)·max(exp(w)) < MAX_EXP; `exact=True` instead forms the intra-
chunk matrix from the pairwise logit differences Wexc[t]-Winc[s] (<= 0 for
s < t, so it never overflows for ANY decay) — L²N elementwise work on the
VPU instead of an MXU matmul, the right trade for a correctness fallback.
`safe_chunk_size(w)` picks the largest safe L from concrete decay values.

Differentiable by autodiff; each chunk body can be rematerialized
(`remat=True`) — the analogue of fla's checkpoint_level.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MAX_EXP = 80.0  # exp(80) ~ 5.5e34, safely below fp32 max


def safe_chunk_size(w_max: float, candidates=(128, 64, 32, 16, 8)):
    """Largest chunk L for which the midpoint rescale is exact given the
    largest raw decay parameter value w_max (per-step |log-decay| is
    exp(w)): needs (L/2)·exp(w_max) < MAX_EXP. Returns None when even the
    smallest candidate is unsafe — use exact=True (or the sequential
    reference) then. Call with CONCRETE values (e.g. from checkpoint
    params), not traced ones."""
    import math

    m = math.exp(float(w_max))
    for L in candidates:
        if (L / 2) * m < MAX_EXP:
            return L
    return None


def _pad_time(x: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (0, pad)
    return jnp.pad(x, cfg)


def wkv_chunked(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: Optional[jax.Array],
    initial_state: Optional[jax.Array] = None,
    *,
    chunk_size: int = 32,
    remat: bool = True,
    exact: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel WKV scan. Same contract as `wkv_reference`.

    r, k, v, w: (B, T, H, N); u: (H, N) or None; initial_state: (B, H, N, N).
    Returns (y (B,T,H,N) fp32, final_state (B,H,N,N) fp32).
    """
    B, T, H, N = r.shape
    L = min(chunk_size, T)
    pad = (-T) % L
    Tp = T + pad
    NC = Tp // L

    rf = _pad_time(r.astype(jnp.float32), pad)
    kf = _pad_time(k.astype(jnp.float32), pad)
    vf = _pad_time(v.astype(jnp.float32), pad)
    # padding w with 0 gives decay exp(-1) on dead steps — harmless for y
    # (k=0 there) but wrong for the *final state*; use w = +inf -> lw = -inf?
    # No: lw = -exp(w); to make the padded steps identity (decay 1) we need
    # lw = 0, i.e. w = -inf. Pad w with a very negative value instead.
    wf = w.astype(jnp.float32)
    if pad:
        cfg = [(0, 0)] * 4
        cfg[1] = (0, pad)
        wf = jnp.pad(wf, cfg, constant_values=-1e30)
    lw = -jnp.exp(wf)  # (B,Tp,H,N), <= 0

    if initial_state is None:
        state0 = jnp.zeros((B, H, N, N), dtype=jnp.float32)
    else:
        state0 = initial_state.astype(jnp.float32)

    # reshape to chunks: (NC, B, H, L, N)
    def to_chunks(x):
        return x.reshape(B, NC, L, H, N).transpose(1, 0, 3, 2, 4)

    rc, kc, vc, lwc = (to_chunks(x) for x in (rf, kf, vf, lw))

    winc = jnp.cumsum(lwc, axis=-2)            # inclusive, (NC,B,H,L,N)
    wexc = winc - lwc                          # exclusive
    wlast = winc[..., -1:, :]                  # (NC,B,H,1,N) total chunk decay
    wmid = winc[..., L // 2, :][..., None, :]  # midpoint rescale for intra

    q_inter = rc * jnp.exp(wexc)                             # <= |r|
    if exact:
        # intra matrix formed pairwise inside chunk_body; ship the raw
        # cumulants instead of pre-scaled tensors
        q_intra, k_intra = wexc, winc
    else:
        q_intra = rc * jnp.exp(jnp.clip(wexc - wmid, None, MAX_EXP))
        k_intra = kc * jnp.exp(jnp.clip(wmid - winc, None, MAX_EXP))
    k_state = kc * jnp.exp(wlast - winc)                     # <= |k|
    decay_total = jnp.exp(wlast[..., 0, :])                  # (NC,B,H,N)

    if u is None:
        diag = jnp.zeros(rc.shape[:-1], dtype=jnp.float32)   # (NC,B,H,L)
    else:
        uf = u.astype(jnp.float32)
        diag = jnp.einsum("cbhln,hn,cbhln->cbhl", rc, uf, kc)

    tri = jnp.tril(jnp.ones((L, L), dtype=jnp.bool_), k=-1)

    def chunk_body(S, inp):
        qi, qa, ka, ks, dt, vv, dg, rr, kk = inp
        if exact:
            # pairwise logits wexc[t]-winc[s] <= 0 for s < t: exact for any
            # decay (qa carries wexc, ka carries winc here)
            logits = qa[..., :, None, :] - ka[..., None, :, :]  # (b,h,L,L,N)
            pair = rr[..., :, None, :] * kk[..., None, :, :]
            A = jnp.sum(
                pair * jnp.exp(jnp.minimum(logits, 0.0)), axis=-1
            )
        else:
            A = jnp.einsum("bhln,bhmn->bhlm", qa, ka)
        # intra-chunk attention matrix (L, L), strictly causal + bonus diag
        A = jnp.where(tri[None, None], A, 0.0)
        y = jnp.einsum("bhlm,bhmn->bhln", A, vv)
        y = y + dg[..., None] * vv
        # inter-chunk: state contribution
        y = y + jnp.einsum("bhlk,bhkv->bhlv", qi, S)
        # state update
        S = S * dt[..., :, None] + jnp.einsum("bhlk,bhlv->bhkv", ks, vv)
        return S, y

    if remat:
        chunk_body = jax.checkpoint(chunk_body)

    # rc/kc ride along only for the exact pairwise product (zero-size
    # placeholders otherwise so the scan carries no dead memory)
    if exact:
        rk = (rc, kc)
    else:
        z = jnp.zeros((NC, B, H, 0, N), jnp.float32)
        rk = (z, z)
    final_state, ys = jax.lax.scan(
        chunk_body,
        state0,
        (q_inter, q_intra, k_intra, k_state, decay_total, vc, diag) + rk,
    )
    # ys: (NC,B,H,L,N) -> (B,T,H,N)
    y = ys.transpose(1, 0, 3, 2, 4).reshape(B, Tp, H, N)[:, :T]
    return y, final_state
