"""Chunked (blockwise-parallel) WKV — the XLA fast path, exact for ANY decay.

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

The inter-chunk and state factors have exponents <= 0 by construction.  The
intra-chunk matrix A[t,s] = sum_n r k e^{Wexc[t]-Winc[s]} has pairwise
exponents <= 0 for s < t, but a naive rank-factoring e^{Wexc[t]-m}·e^{m-Winc[s]}
with one base m per chunk overflows/underflows when the accumulated decay
within the chunk exceeds fp32 range (round 1 guarded this with a per-
checkpoint max-chunk bound).  `_intra_A_exact` removes the guard: the chunk
is split into EXACT_SUBTILE-sized s-tiles; each tile's contribution to
strictly-later rows uses the base m_j = Winc[tile end] (both factors then
have exponents <= 0 — no overflow, and no underflow beyond the true logit),
while the diagonal tile is formed from the raw pairwise logits (clipped at
0; clipping only touches s >= t entries the causal mask kills).  Exact for
ANY decay, including w > 0 (per-step decay e^{-e^w} ~ 0).

Differentiable by autodiff; each chunk body can be rematerialized
(`remat=True`) — the analogue of fla's checkpoint_level.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# s-tile size of the exact intra-chunk decomposition: the pairwise diagonal
# work is L*EXACT_SUBTILE*N per chunk (vs the L^2*N intra matmul), and every
# off-diagonal factor exponent is <= 0 regardless of decay magnitude.
EXACT_SUBTILE = 16


def _intra_A_exact(rr, kk, wexc, winc, Ls: int = EXACT_SUBTILE):
    """A[..., t, s] = sum_n rr[...,t,n]·kk[...,s,n]·e^{wexc[...,t,n]-winc[...,s,n]},
    exact for any decay. Entries with s >= t are meaningless (caller masks).

    rr, kk, wexc, winc: (..., L, N) fp32.
    """
    L, N = rr.shape[-2:]
    Ls = min(Ls, L)
    if L % Ls != 0:  # odd chunk size: single pairwise tile (rare, small L)
        Ls = L
    NT = L // Ls
    row = jnp.arange(L)[:, None]
    A = jnp.zeros((*rr.shape[:-2], L, L), jnp.float32)
    for j in range(NT):
        sl = slice(j * Ls, (j + 1) * Ls)
        # rows strictly after the tile: factor around the tile-end cumulant
        # m_j = winc[tile end]; q-side wexc[t]-m_j <= 0 for t > tile end,
        # k-side m_j-winc[s] <= 0 for s <= tile end (winc is decreasing)
        if j < NT - 1:
            m = winc[..., (j + 1) * Ls - 1 : (j + 1) * Ls, :]
            kj = kk[..., sl, :] * jnp.exp(m - winc[..., sl, :])
            qj = rr * jnp.exp(jnp.minimum(wexc - m, 0.0))
            C = jnp.einsum("...ln,...sn->...ls", qj, kj)
            C = jnp.where(row >= (j + 1) * Ls, C, 0.0)
            A = A.at[..., :, sl].add(C)
        # diagonal tile: raw pairwise logits (<= 0 for s < t; clip kills
        # the s >= t junk that the causal mask removes anyway)
        logits = (
            wexc[..., sl, :][..., :, None, :]
            - winc[..., sl, :][..., None, :, :]
        )
        pair = (
            rr[..., sl, :][..., :, None, :]
            * kk[..., sl, :][..., None, :, :]
        )
        At = jnp.sum(pair * jnp.exp(jnp.minimum(logits, 0.0)), axis=-1)
        A = A.at[..., sl, sl].add(At)
    return A


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
    exact: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel WKV scan. Same contract as `wkv_reference`.

    r, k, v, w: (B, T, H, N); u: (H, N) or None; initial_state: (B, H, N, N).
    Returns (y (B,T,H,N) fp32, final_state (B,H,N,N) fp32).

    ``exact`` is kept for API compatibility; both values run the exact
    tiled decomposition (round 1's midpoint-rescale approximation and its
    per-checkpoint chunk guard are gone).
    """
    del exact
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

    q_inter = rc * jnp.exp(wexc)                             # <= |r|
    k_state = kc * jnp.exp(wlast - winc)                     # <= |k|
    decay_total = jnp.exp(wlast[..., 0, :])                  # (NC,B,H,N)

    if u is None:
        diag = jnp.zeros(rc.shape[:-1], dtype=jnp.float32)   # (NC,B,H,L)
    else:
        uf = u.astype(jnp.float32)
        diag = jnp.einsum("cbhln,hn,cbhln->cbhl", rc, uf, kc)

    tri = jnp.tril(jnp.ones((L, L), dtype=jnp.bool_), k=-1)

    def chunk_body(S, inp):
        qi, ks, dt, vv, dg, rr, kk, we, wi = inp
        A = _intra_A_exact(rr, kk, we, wi)
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

    final_state, ys = jax.lax.scan(
        chunk_body,
        state0,
        (q_inter, k_state, decay_total, vc, diag, rc, kc, wexc, winc),
    )
    # ys: (NC,B,H,L,N) -> (B,T,H,N)
    y = ys.transpose(1, 0, 3, 2, 4).reshape(B, Tp, H, N)[:, :T]
    return y, final_state
