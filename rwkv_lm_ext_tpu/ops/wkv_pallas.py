"""Pallas TPU kernel for the chunked WKV scan — exact for ANY decay.

The TPU replacement for all of the reference's cuda/*.cu WKV kernels: one
fused kernel computes the chunk-parallel formulation of wkv_chunked.py with
the running (K, V) state held in VMEM scratch for the whole sequence — the
state never touches HBM between chunks (the CUDA kernels keep it in
registers per thread; VMEM is the TPU analogue).

Grid: (B*H, T/L). TPU grids execute sequentially with the last axis
innermost, so scratch carries the state across the chunk axis and resets
when a new (batch, head) program begins. Intra-chunk work is (L,N)x(N,L)
and (L,L)x(L,N) matmuls on the MXU in fp32.

Exactness: the intra-chunk matrix A[t,s] = sum_n r k e^{Wexc[t]-Winc[s]}
has TWO constructions, selected by the static ``exact`` flag:
- exact=True (default): `_exact_A_head` — dyadic-LCA factoring where both
  factor exponents are <= 0, so no overflow at ANY decay.
- exact=False: round 1's single midpoint rescale (`_rescale_A_wide`), ~4x
  cheaper, exact only while the in-chunk accumulated decay keeps every
  factor exponent under MAX_EXP. NOT chosen blindly: the dispatcher
  (models.rwkv.suggest_wkv_dispatch, applied by
  checkpoint.load_rwkv_checkpoint) bounds the checkpoint's decay and
  flips to rescale only when that bound guarantees exactness — the
  fast path is automatic and safe, exact-A is the any-decay fallback.
All index plumbing is 2D lane-concats and one-hot MXU matmuls; Mosaic
rejects sublane<->lane reshapes, so none are used.

Backward: hand-written two-pass Pallas backward (chunk-entry state
checkpoints, then a reverse-adjoint pass) with the exact-A adjoint in
`_exact_A_head_bwd`; XLA-recompute fallback for geometries the packed
kernels can't tile.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_lm_ext_tpu.ops.wkv_chunked import wkv_chunked

# Leaf size of the exact-A backward recursion: halve (L, L) until the
# remaining tile fits the flat-pair adjoint (_pair_A_tile_bwd).
_EXACT_LB = 16

# The exact-A tiles and the HIGHEST-precision (multi-pass fp32) matmuls
# push the backward kernel past Mosaic's default 16 MiB scoped-VMEM stack
# (measured 20.7 MiB at 1B6 geometry); v5e has 128 MiB of VMEM, so give
# every kernel generous headroom.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

# T-block per grid step. The sequential grid carries the WKV state in VMEM
# scratch ACROSS grid steps, so a small T-block costs no extra state
# traffic — it only shrinks the unrolled kernel body (TB/L chunk bodies),
# which sets Mosaic compile time. The exact-A body is ~4x the rescale
# body, so keep ONE chunk per grid step by default.
_T_BLOCK = 128

# Clip for the midpoint-rescale factor exponents: fp32 exp overflows at
# ~88.7. The dispatcher only selects the rescale path when the
# checkpoint's decay bound keeps every exponent under MAX_EXP (see
# models.rwkv.suggest_wkv_dispatch), where the clip is inactive and the
# factoring is EXACT; past the bound the clip keeps the math finite but
# inexact — which is why exact-A is the default for unknown decays.
MAX_EXP = 80.0


def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _dot(a, b, dims, precision=None):
    """In-kernel VALUE matmul: the MXU's 1-pass default (bf16 multiplies,
    fp32 accumulation) — the same numerics as the reference CUDA kernels,
    whose r/k/v inputs are bf16 with fp32 accumulators. Measured ~4e-3
    relative error in fp32 value outputs on-chip; errors here stay
    relative to the VALUES, so bf16-IO models see nothing new."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _split3(x):
    """3-limb bf16 decomposition of fp32: x == hi + mid + lo exactly.

    One-hot/0-1 constant matmuls against bf16 limbs are EXACT products,
    so cumulant-precision sums ride the MXU with only fp32-accumulation
    error (~2^-24 x magnitude): log-decays reach -20/step, accumulate to
    O(-10^3) over a chunk, and cumulant error amplifies EXPONENTIALLY
    through e^{Winc} — 2 limbs (2^-16) measure ~1% exponent error at
    w_max=+3, 3 limbs ~1e-4. pltpu.roll-based doubling (the round-1
    formulation) is exact too but a sublane roll costs ~8x the whole
    rescale A-pipeline on a real chip — every cumulant movement here is
    a matmul instead."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mm3(M, x):
    """M (A, L) 0/1 bf16 constant @ fp32 x (L, N) at cumulant precision
    (3-limb exact products, fp32 accumulation)."""
    hi, mid, lo = _split3(x)

    def f(a):
        return jax.lax.dot_general(
            M, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return f(hi) + f(mid) + f(lo)


def _cumsum_rows(x, L: int, *, reverse: bool = False):
    """Cumulant-exact inclusive prefix (or suffix) sum over the sublane
    axis as a 3-limb tril/triu matmul (see _split3 — roll-free)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    M = (row <= col if reverse else row >= col).astype(jnp.bfloat16)
    return _mm3(M, x)


def _flatten_rows(X, Ls):
    """(Ls, N) -> (1, Ls*N) with [0, s*N+n] = X[s, n].

    One-hot select + sublane reduction: Mosaic rejects lane-concats of row
    slices taken at different sublane offsets ("offset mismatch on
    non-concat dimension"), so build the flat row by masking the
    lane-repeated X with (q//N == s) and summing over sublanes."""
    N = X.shape[1]
    q_s = jax.lax.broadcasted_iota(jnp.int32, (Ls, Ls * N), 1) // N
    s_i = jax.lax.broadcasted_iota(jnp.int32, (Ls, Ls * N), 0)
    rep = jnp.concatenate([X] * Ls, axis=1)
    return jnp.sum(jnp.where(q_s == s_i, rep, 0.0), axis=0, keepdims=True)


def _repeat_cols(X, Ls):
    """(R, N) -> (R, Ls*N) with [t, s*N+n] = X[t, n]."""
    return jnp.concatenate([X] * Ls, axis=1)


def _fold_mats(Ls, N):
    """One-hot fold matrices over the flat pair index q = s*N + n:
    MfoldT (Ls, Ls*N): [s, q] = (q//N == s)   (expand / fold over s)
    Mchan  (Ls*N, N):  [q, n] = (q%N == n)    (fold over s, keep channel)
    """
    q_s = jax.lax.broadcasted_iota(jnp.int32, (Ls, Ls * N), 1) // N
    s_i = jax.lax.broadcasted_iota(jnp.int32, (Ls, Ls * N), 0)
    MfoldT = (q_s == s_i).astype(jnp.float32)
    q_n = jax.lax.broadcasted_iota(jnp.int32, (Ls * N, N), 0) % N
    n_i = jax.lax.broadcasted_iota(jnp.int32, (Ls * N, N), 1)
    Mchan = (q_n == n_i).astype(jnp.float32)
    return MfoldT, Mchan


def _pair_A_tile(r_t, k_t, winc_t, wexc_t, Ls: int, N: int, precision=None):
    """Exact (Ls, Ls) diagonal tile from raw pairwise logits
    wexc[t]-winc[s] (<= 0 for s < t; the clip only touches s >= t junk
    the caller's causal mask removes). Flat-pair layout (Ls, Ls*N) +
    one-hot fold — keep Ls small (8): the fold matmul has Ls output
    lanes, so its MXU utilization is Ls/128."""
    MfoldT, _ = _fold_mats(Ls, N)
    logits = _repeat_cols(wexc_t, Ls) - _flatten_rows(winc_t, Ls)
    Pm = (
        _repeat_cols(r_t, Ls)
        * _flatten_rows(k_t, Ls)
        * jnp.exp(jnp.minimum(logits, 0.0))
    )                                                         # (Ls, Ls*N)
    return _dot(Pm, MfoldT, ((1,), (1,)), precision)          # (Ls, Ls)



def _exact_A_factors(r_w, k_w, winc_w, wexc_w, L: int, precision=None):
    """Per-level (q, kk) factor pairs for the exact-A decomposition, at
    ANY lane width W (all math is per-channel, so the fused kernels call
    this ONCE per chunk for all P heads side-by-side and slice per-head
    lanes only for the (L,N)x(N,L) contractions — the selector/broadcast
    machinery and exps are the expensive part and this halves their
    instruction count at P=2).

    Returns [(q_lvl4, kk_lvl4), (q_8, kk_8), ..., (q_L, kk_L)], each
    (L, W) fp32. See _exact_A_head for the math.
    """
    f32 = jnp.float32
    bf = jnp.bfloat16
    W = r_w.shape[1]
    L4 = L // 4
    lw = winc_w - wexc_w                         # per-step log-decay
    nlev = 0
    bs = 8
    while bs <= L:
        nlev += 1
        bs *= 2

    blkc = jax.lax.broadcasted_iota(jnp.int32, (L4, L), 0)
    posc = jax.lax.broadcasted_iota(jnp.int32, (L4, L), 1)

    def cumsel(aidx):
        return jnp.where(posc <= aidx, 1.0, 0.0)

    def diffsel(aidx, bidx):
        lo = jnp.minimum(aidx, bidx)
        hi = jnp.maximum(aidx, bidx)
        sgn = jnp.where(aidx >= bidx, 1.0, -1.0)
        return jnp.where((posc > lo) & (posc <= hi), sgn, 0.0)

    a4 = 4 * blkc - 1                            # block start-1 index
    z4 = 4 * blkc + 3                            # block end index
    pieces = [cumsel(4 * blkc + 1), cumsel(a4), cumsel(z4)]
    bs = 8
    while bs <= L:
        midbs = bs * (4 * blkc // bs) + bs // 2 - 1
        pieces.append(diffsel(a4, midbs))        # gq = b4 - m_bs
        pieces.append(diffsel(midbs, z4))        # gk = m_bs - e4
        bs *= 2
    Sel = jnp.concatenate(pieces, axis=0).astype(bf)
    G = _mm3(Sel, lw)                            # ((3+2nlev) L/4, W) fp32
    m4c = G[0:L4]
    b4c = G[L4 : 2 * L4]
    e4c = G[2 * L4 : 3 * L4]
    Egap = jnp.exp(jnp.minimum(G[3 * L4 :], 0.0))  # (2nlev L/4, W)

    row4 = jax.lax.broadcasted_iota(jnp.int32, (L, L4), 0) // 4
    col4 = jax.lax.broadcasted_iota(jnp.int32, (L, L4), 1)
    Bm = (row4 == col4).astype(bf)               # (L, L/4) block one-hot

    def limbs2(x):
        xh = x.astype(bf)
        return [xh, (x - xh.astype(f32)).astype(bf)]

    cols = list(_split3(m4c)) + list(_split3(b4c)) + list(_split3(e4c))
    for lv in range(2 * nlev):
        cols.extend(limbs2(Egap[lv * L4 : (lv + 1) * L4]))
    Wm = jnp.concatenate(cols, axis=1)           # (L/4, (9 + 4nlev) W)
    Bc = _dot(Bm, Wm, ((1,), (0,)), precision)   # (L, (9 + 4nlev) W)

    def pick3(i):
        return Bc[:, i * W : (i + 1) * W] + Bc[:, (i + 1) * W : (i + 2) * W] \
            + Bc[:, (i + 2) * W : (i + 3) * W]

    def pick2(i):
        return Bc[:, i * W : (i + 1) * W] + Bc[:, (i + 1) * W : (i + 2) * W]

    m4 = pick3(0)
    b4 = pick3(3)
    e4 = pick3(6)

    out = []
    q4 = r_w * jnp.exp(jnp.minimum(wexc_w - m4, 0.0))
    kk4 = k_w * jnp.exp(jnp.minimum(m4 - winc_w, 0.0))
    out.append((q4, kk4))
    qL = r_w * jnp.exp(wexc_w - b4)
    kkL = k_w * jnp.exp(e4 - winc_w)
    for lv in range(nlev):
        out.append((
            qL * pick2(9 + 4 * lv),
            kkL * pick2(9 + 4 * lv + 2),
        ))
    return out


def _exact_A_combine(r_h, k_h, factors, lane, L: int, precision=None):
    """Per-head finish: one (L,N)x(N,L) contraction per level of the
    wide factor list (lane-sliced), masked to each pair's LCA level."""
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    d = row - col
    # d == 1 sub-diagonal: the pairwise logit is identically zero
    A = jnp.where(d == 1, _dot(r_h, k_h, ((1,), (1,)), precision), 0.0)
    # level bs = 4
    q4, kk4 = factors[0]
    C4 = _dot(q4[:, lane], kk4[:, lane], ((1,), (1,)), precision)
    mask4 = (row // 4 == col // 4) & (row % 4 >= 2) & (col % 4 < 2) & (d >= 2)
    A = A + jnp.where(mask4, C4, 0.0)
    # levels bs = 8..L
    bs = 8
    for q_bs, kk_bs in factors[1:]:
        h = bs // 2
        C = _dot(q_bs[:, lane], kk_bs[:, lane], ((1,), (1,)), precision)
        mask = (
            (row // bs == col // bs)
            & (row % bs >= h)
            & (col % bs < h)
            & (d >= 2)
        )
        A = A + jnp.where(mask, C, 0.0)
        bs *= 2
    return A


def _exact_A_head(r_h, k_h, winc_h, wexc_h, L: int, N: int, precision=None):
    """Exact intra-chunk A (L, L) for one head; entries s >= t are junk
    (caller applies the strict causal mask). Exact for ANY decay — the
    replacement for round 1's midpoint rescale and its per-checkpoint
    chunk guard (suggest_fused_chunk, deleted).

    Every pair (t, s) is factored around the cumulant at the midpoint of
    its dyadic LCA block, so both exponents are <= 0 — no clipping, no
    overflow, at any decay. Engineered for the TPU's cost model (two
    earlier formulations lost: per-s-tile narrow matmuls at ~13 seq/s
    off the embed headline on MXU utilization; banded pltpu.roll sweeps
    at 2.2x total — a cross-sublane roll costs more than this whole
    function):
    - d == 1 sub-diagonal: the pairwise logit is identically zero
      (wexc[t] == winc[t-1]), so it's one shifted elementwise product —
      the shift is a constant one-hot matmul.
    - leaf level (bs = 4): direct factors around each 4-block's midpoint
      cumulant (selected by a one-hot matmul at 3-limb cumulant
      precision, _mm3); the only two full-(L, N) exps beyond the
      rescale pipeline's own.
    - levels bs = 8..L: factors are the leaf factors times a per-4-block
      GAP e^{m4 - m_bs} (<= 1, exact) — the gap cumulant differences are
      0/±1 matmuls against the raw log-decays, the exp runs at (L/4, N),
      and the broadcast back to rows is a 2-limb one-hot matmul. Each
      level contributes one full-width (L,N)x(N,L) MXU matmul masked to
      its LCA blocks.
    """
    if L < 8 or (L & (L - 1)) != 0:
        return _pair_A_tile(r_h, k_h, winc_h, wexc_h, L, N, precision)
    factors = _exact_A_factors(r_h, k_h, winc_h, wexc_h, L, precision)
    return _exact_A_combine(r_h, k_h, factors, slice(0, N), L, precision)


def _rescale_A_wide(r_w, k_w, winc_w, wexc_w, L: int):
    """Round-1 midpoint-rescale factor pair, reinstated as the
    dispatcher-guarded FAST path (one (L,N)x(N,L) MXU matmul per head
    instead of the exact-A level cascade; measured ~4x cheaper per op at
    1B6 geometry). A[t,s] = q[t]·kk[s] with q = r e^{wexc - wmid},
    kk = k e^{wmid - winc} — exact while every exponent stays under
    MAX_EXP, which models.rwkv.suggest_wkv_dispatch guarantees from the
    checkpoint's decay bound before selecting this path. Wide
    (per-channel) like _exact_A_factors, so fused kernels compute it once
    for all P heads. Returns (q, kk, Eq, Ek, okq, okk): factors, their
    exponentials, and clip-inactive masks for the adjoint."""
    wmid = winc_w[L // 2, :][None, :]
    lq = wexc_w - wmid
    lk = wmid - winc_w
    Eq = jnp.exp(jnp.minimum(lq, MAX_EXP))
    Ek = jnp.exp(jnp.minimum(lk, MAX_EXP))
    return r_w * Eq, k_w * Ek, Eq, Ek, lq < MAX_EXP, lk < MAX_EXP


def _rescale_A_bwd(dA, q_h, kk_h, Eq_h, Ek_h, okq_h, okk_h, L: int, N: int):
    """Adjoint of the rescale A = q @ kk^T for one head. dA must already
    be causal-masked. okq/okk zero the w-grads where the forward clip was
    active (r/k grads flow through the clipped constant either way).
    m = winc[L//2] appears as -m in q's exponent and +m in kk's, so its
    adjoint lands on dwinc row L//2."""
    P = jax.lax.Precision.HIGHEST
    dq = _dot(dA, kk_h, ((1,), (0,)), P)
    dkk = _dot(dA, q_h, ((0,), (0,)), P)
    dr = dq * Eq_h
    dk = dkk * Ek_h
    dwexc = jnp.where(okq_h, dq * q_h, 0.0)
    dwk = jnp.where(okk_h, dkk * kk_h, 0.0)
    dm = jnp.sum(dwk, axis=0, keepdims=True) - jnp.sum(
        dwexc, axis=0, keepdims=True
    )
    rowN = jax.lax.broadcasted_iota(jnp.int32, (L, N), 0)
    dwinc = -dwk + jnp.where(rowN == L // 2, dm, 0.0)
    return dr, dk, dwexc, dwinc


def _pair_A_tile_bwd(dAt, r_t_in, k_t_in, winc_t, wexc_t, Ls: int, N: int):
    """Adjoint of _pair_A_tile. dAt must already be causal-masked (entries
    s >= t zero — exactly where the pairwise clip is active, so the clip
    needs no extra adjoint masking). Returns (dr, dk, dwexc, dwinc)."""
    P = jax.lax.Precision.HIGHEST
    MfoldT, Mchan = _fold_mats(Ls, N)
    r_t = _repeat_cols(r_t_in, Ls)
    k_s = _flatten_rows(k_t_in, Ls)
    logits = _repeat_cols(wexc_t, Ls) - _flatten_rows(winc_t, Ls)
    E = jnp.exp(jnp.minimum(logits, 0.0))
    dPm = _dot(dAt, MfoldT, ((1,), (0,)), P)                  # (Ls, Ls*N)
    G = dPm * E
    dr = _dot(G * k_s, Mchan, ((1,), (0,)), P)                # (Ls, N)
    colsum = jnp.sum(G * r_t, axis=0, keepdims=True)          # (1, Ls*N)
    dk = _dot(MfoldT * colsum, Mchan, ((1,), (0,)), P)
    dlog = G * (r_t * k_s)
    dwexc = _dot(dlog, Mchan, ((1,), (0,)), P)
    dwinc = -_dot(
        MfoldT * jnp.sum(dlog, axis=0, keepdims=True), Mchan, ((1,), (0,)), P
    )
    return dr, dk, dwexc, dwinc


def _exact_A_head_bwd(dA, r_h, k_h, winc_h, wexc_h, L: int, N: int):
    """Adjoint of _exact_A_head (same recursive halving). dA must already
    be causal-masked. Returns (dr, dk, dwexc, dwinc), each (L, N) fp32.

    All matmuls run HIGHEST: the dw path sums near-cancelling terms
    (the dlw suffix-sum cancels full-chunk partial sums by construction),
    so summand rounding from 1-pass matmuls surfaces as O(1e-1) relative
    dw error (measured); full-fp32 passes restore ~1e-5. Backward-only
    cost — the forward keeps the reference-numerics 1-pass default.
    """
    P = jax.lax.Precision.HIGHEST
    if L <= _EXACT_LB or L % 2:
        return _pair_A_tile_bwd(dA, r_h, k_h, winc_h, wexc_h, L, N)
    h = L // 2
    m = winc_h[h - 1 : h, :]                                  # (1, N)
    dr1, dk1, dwe1, dwi1 = _exact_A_head_bwd(
        dA[:h, :h], r_h[:h], k_h[:h], winc_h[:h], wexc_h[:h], h, N
    )
    dr2, dk2, dwe2, dwi2 = _exact_A_head_bwd(
        dA[h:, h:], r_h[h:], k_h[h:], winc_h[h:], wexc_h[h:], h, N
    )
    # C = q2 @ k1^T with q2 = r2*e^{wexc2-m}, k1 = k1*e^{m-winc1}
    Ek = jnp.exp(m - winc_h[:h])
    k1 = k_h[:h] * Ek
    Eq = jnp.exp(wexc_h[h:] - m)
    q2 = r_h[h:] * Eq
    dC = dA[h:, :h]                                           # (h, h)
    dq2 = _dot(dC, k1, ((1,), (0,)), P)                       # (h, N)
    dk1c = _dot(dC, q2, ((0,), (0,)), P)                      # (h, N)
    dr2 = dr2 + dq2 * Eq
    dwe2 = dwe2 + dq2 * q2
    dk1 = dk1 + dk1c * Ek
    dwi1 = dwi1 - dk1c * k1
    # base adjoint: m = winc[h-1] appears as +m in Ek, -m in Eq
    dm = jnp.sum(dk1c * k1, axis=0, keepdims=True) - jnp.sum(
        dq2 * q2, axis=0, keepdims=True
    )                                                         # (1, N)
    rowN = jax.lax.broadcasted_iota(jnp.int32, (h, N), 0)
    dwi1 = dwi1 + jnp.where(rowN == h - 1, dm, 0.0)
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    return cat(dr1, dr2), cat(dk1, dk2), cat(dwe1, dwe2), cat(dwi1, dwi2)


def _wkv_kernel(
    r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref,  # inputs
    y_ref, sout_ref,                            # outputs
    state,                                      # VMEM scratch (N,N) f32
    *, L: int, N: int, TB: int, exact: bool = True,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[:, :] = s0_ref[0].astype(jnp.float32)

    u = u_ref[0].astype(jnp.float32)            # (1,N)

    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
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
        winc = _cumsum_rows(lw, L)
        wexc = winc - lw                         # exclusive
        wlast = winc[L - 1, :][None, :]

        q_inter = r * jnp.exp(wexc)
        k_state = k * jnp.exp(wlast - winc)

        # intra-chunk attention (strictly causal) + u-bonus diagonal
        if exact:
            A = _exact_A_head(r, k, winc, wexc, L, N)
        else:
            q, kk, _, _, _, _ = _rescale_A_wide(r, k, winc, wexc, L)
            A = _dot(q, kk, ((1,), (1,)))
        A = jnp.where(causal, A, 0.0)
        diag = jnp.sum(r * u * k, axis=1, keepdims=True)  # (L,1)

        y = _dot(A, v, ((1,), (0,)))
        y += diag * v
        y += _dot(q_inter, state[:, :], ((1,), (0,)))
        y_ref[0, sl, :] = y.astype(y_ref.dtype)

        # state update: S = decay_total ⊙_K S + k_state^T @ v
        new_s = state[:, :] * jnp.exp(wlast)[0][:, None]
        new_s += _dot(k_state, v, ((0,), (0,)))
        state[:, :] = new_s

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        sout_ref[0] = state[:, :]


def _wkv_pallas_fwd_impl(
    r, k, v, w, u, s0, *, chunk_size: int, interpret: bool = False,
    t_block: int = _T_BLOCK, exact: bool = True,
):
    """r,k,v,w: (B,T,H,N); u (H,N); s0 (B,H,N,N) fp32.

    Layout-free: inputs are viewed as (B, T, H*N) (a free reshape of the
    model's contiguous activations) and each (b, h, t-block) program slices
    its head's N columns — no host-side transposes, which at 1B6 scale cost
    more HBM traffic than the kernel's own math.
    """
    B, T, H, N = r.shape
    L = chunk_size
    # TB must be >= L (TB // L static chunk loop): chunks larger than
    # t_block get a block to themselves, matching the fused impl
    TB = min(max(t_block, L), max(L, ((T + L - 1) // L) * L))
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
        functools.partial(_wkv_kernel, L=L, N=N, TB=TB, exact=exact),
        grid=(B * H, NTB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tp, N), r.dtype),
            jax.ShapeDtypeStruct((B * H, N, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * N * (2 * N + L),
            bytes_accessed=4 * B * H * Tp * N * 4,
            transcendentals=B * H * Tp * N * 4,
        ),
    )(rb, kb, vb, wb, ub, s0b)

    y = y.reshape(B, H, Tp, N).transpose(0, 2, 1, 3)[:, :T]
    return y, sout.reshape(B, H, N, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _wkv_pallas(r, k, v, w, u, s0, chunk_size, interpret, exact):
    return _wkv_pallas_fwd_impl(
        r, k, v, w, u, s0, chunk_size=chunk_size, interpret=interpret,
        exact=exact,
    )


def _fwd(r, k, v, w, u, s0, chunk_size, interpret, exact):
    out = _wkv_pallas_fwd_impl(
        r, k, v, w, u, s0, chunk_size=chunk_size, interpret=interpret,
        exact=exact,
    )
    return out, (r, k, v, w, u, s0)


def _bwd(chunk_size, interpret, exact, residuals, cts):
    r, k, v, w, u, s0 = residuals
    gy, gs = cts
    B, T, H, N = r.shape
    P = 128 // N if N <= 128 and 128 % N == 0 else 1
    if P > 1 and H % P == 0 and P * N == 128:
        # two-pass Pallas backward, sharing the fused kernels with the
        # GroupNorm/gate stages compiled out (gn=False)
        ones = jnp.ones((B, T, H, N), r.dtype)
        vec1 = jnp.ones((H * N,), jnp.float32)
        dr, dk, dv, dw, du, ds0, _dg, _dsc, _dbi = _fused_bwd_pallas(
            r, k, v, w, u, s0, ones, vec1, jnp.zeros_like(vec1),
            (gy.astype(jnp.float32).reshape(B, T, H * N), gs),
            eps=1e-5, chunk_size=chunk_size, interpret=interpret, gn=False,
            exact=exact,
        )
        return dr, dk, dv, dw, du, ds0

    def f(r, k, v, w, u, s0):
        y, sT = wkv_chunked(
            r, k, v, w, u, s0, chunk_size=chunk_size, remat=True
        )
        return y.astype(r.dtype), sT

    _, vjp = jax.vjp(f, r, k, v, w, u, s0)
    return vjp((gy, gs))


_wkv_pallas.defvjp(_fwd, _bwd)


def _pow2_chunk(L: int) -> int:
    """Round a chunk length down to a power of two (>= 8).

    The exact-A dyadic-LCA decomposition is only valid for power-of-two
    L: _exact_A_head guards this (pairwise-tile fallback), but the
    two-pass backward builds A from _exact_A_factors DIRECTLY — at
    L=24 the missing dyadic level silently corrupted the causal region
    of A (dv came out wrong by ~1e3 while the guarded forward stayed
    correct). Normalizing L at the public wrappers keeps every kernel
    on the valid decomposition — and the padded-T machinery already
    handles T not being a multiple of the (now rounded) chunk."""
    return max(8, 1 << (int(L).bit_length() - 1))


def geometry_native(N: int, H: int) -> bool:
    """True when the packed Pallas kernels (fwd AND two-pass bwd) tile
    (H, N) directly: 128//N heads per 128-lane program."""
    P = 128 // N if N <= 128 and 128 % N == 0 else 1
    if H % P != 0:
        P = 1
    return P * N == 128


def pad_target(N: int, H: int) -> Optional[int]:
    """Smallest padded head size Np >= N that the packed kernels tile
    ((128//Np) | H). None when N is already native or cannot be padded
    (N > 128). Padding is EXACT: zero-padded k/v rows keep the extra
    state channels at zero, zero-padded r reads nothing from them (the
    decay value on padded channels is then irrelevant)."""
    if N > 128 or geometry_native(N, H):
        return None
    for np_ in (8, 16, 32, 64, 128):
        if np_ >= N and H % (128 // np_) == 0:
            return np_
    return 128


def _warn_fallback(N: int, H: int, where: str) -> None:
    import warnings

    warnings.warn(
        f"wkv_pallas {where}: head geometry (H={H}, N={N}) cannot ride "
        "the packed Pallas kernels (N > 128) — falling back to the "
        "XLA-recompute backward (~4x slower op-level). Use a head_size "
        "that divides 128 to avoid this.",
        stacklevel=3,
    )


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
    exact: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as wkv_reference/wkv_chunked (y is returned in fp32
    for head-side GroupNorm precision; internals accumulate fp32).

    Head sizes the packed kernels can't tile directly (e.g. 96) are
    zero-padded up to the next tileable size (exact — see pad_target),
    so fwd and the two-pass Pallas backward still apply; only N > 128
    falls back to the XLA-recompute backward (with a warning).

    exact=False selects the midpoint-rescale intra-chunk factoring (~4x
    cheaper, exact only under the decay bound
    models.rwkv.suggest_wkv_dispatch checks) — callers must hold that
    bound; exact=True (default) is exact at ANY decay."""
    B, T, H, N = r.shape
    if u is None:
        u = jnp.zeros((H, N), jnp.float32)
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = not pallas_available()
    chunk_size = _pow2_chunk(min(chunk_size, max(8, T)))

    Np = pad_target(N, H)
    if Np is not None:
        pn = Np - N
        pad4 = [(0, 0), (0, 0), (0, 0), (0, pn)]
        r = jnp.pad(r, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        w = jnp.pad(w, pad4)   # padded state channels stay 0: any decay
        u = jnp.pad(u.astype(jnp.float32), [(0, 0), (0, pn)])
        initial_state = jnp.pad(
            initial_state.astype(jnp.float32),
            [(0, 0), (0, 0), (0, pn), (0, pn)],
        )
        y, sout = _wkv_pallas(
            r, k, v, w.astype(jnp.float32), u,
            initial_state, chunk_size, interpret, exact,
        )
        return y[..., :N].astype(jnp.float32), sout[..., :N, :N]

    if not geometry_native(N, H) and not interpret:
        _warn_fallback(N, H, "backward")
    y, sout = _wkv_pallas(
        r, k, v, w.astype(jnp.float32), u.astype(jnp.float32),
        initial_state.astype(jnp.float32), chunk_size, interpret, exact,
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
    *, L: int, N: int, P: int, TB: int, eps: float, exact: bool = True,
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
    causal = row0 > col0

    for i in range(TB // L):
        sl = slice(i * L, (i + 1) * L)
        r_all = r_ref[0, sl, :].astype(jnp.float32)   # (L, P*N)
        k_all = k_ref[0, sl, :].astype(jnp.float32)
        v_all = v_ref[0, sl, :].astype(jnp.float32)
        w_all = w_ref[0, sl, :].astype(jnp.float32)
        g_all = g_ref[0, sl, :].astype(jnp.float32)

        lw = -jnp.exp(w_all)
        winc = _cumsum_rows(lw, L)
        wexc = winc - lw
        wlast = winc[L - 1, :][None, :]
        q_inter_all = r_all * jnp.exp(wexc)
        k_state_all = k_all * jnp.exp(wlast - winc)
        diag_all = r_all * u_row * k_all
        # wide A factors shared by all P heads (exact combine output is
        # zero outside the LCA masks; rescale needs the causal mask)
        if exact:
            factors = _exact_A_factors(r_all, k_all, winc, wexc, L)
        else:
            q_all, kk_all, _, _, _, _ = _rescale_A_wide(
                r_all, k_all, winc, wexc, L
            )

        outs = []
        for p in range(P):
            lane = slice(p * N, (p + 1) * N)
            srows = slice(p * N, (p + 1) * N)
            v_h = v_all[:, lane]
            if exact:
                A = _exact_A_combine(
                    r_all[:, lane], k_all[:, lane], factors, lane, L
                )
            else:
                A = jnp.where(
                    causal,
                    _dot(q_all[:, lane], kk_all[:, lane], ((1,), (1,))),
                    0.0,
                )
            y = _dot(A, v_h, ((1,), (0,)))
            y += jnp.sum(diag_all[:, lane], axis=1, keepdims=True) * v_h
            y += _dot(q_inter_all[:, lane], state[srows, :], ((1,), (0,)))
            new_s = state[srows, :] * jnp.exp(wlast[0, lane])[:, None]
            new_s += _dot(k_state_all[:, lane], v_h, ((0,), (0,)))
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


def _fused_impl(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret,
                exact=True):
    B, T, H, N = r.shape
    P = 128 // N if N <= 128 and 128 % N == 0 else 1
    if H % P != 0:
        P = 1
    if P * N != 128:
        # geometry the packed kernel can't tile -> jnp composition
        return _fused_ref(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size)
    H2 = H // P
    W = P * N
    L = chunk_size
    TB = min(max(_T_BLOCK, L), max(L, ((T + L - 1) // L) * L))
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
            _wkv_gn_kernel, L=L, N=N, P=P, TB=TB, eps=eps, exact=exact
        ),
        grid=(B * H2, NTB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * N), g.dtype),
            jax.ShapeDtypeStruct((B, H2, W, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * N * (2 * N + L),
            bytes_accessed=6 * B * H * Tp * N * 2,
            transcendentals=B * H * Tp * N * 5,
        ),
    )(rb, kb, vb, wb, g, ub, scb, bib, s0b)
    return out[:, :T], sout.reshape(B, H, N, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _wkv_fused(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret,
               exact):
    return _fused_impl(
        r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret, exact
    )


def _fused_fwd(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret,
               exact):
    out = _fused_impl(
        r, k, v, w, u, s0, g, scale, bias, eps, chunk_size, interpret, exact
    )
    return out, (r, k, v, w, u, s0, g, scale, bias)


def _fused_bwd(eps, chunk_size, interpret, exact, residuals, cts):
    r, k, v, w, u, s0, g, scale, bias = residuals
    B, T, H, N = r.shape
    P = 128 // N if N <= 128 and 128 % N == 0 else 1
    if H % P != 0:
        P = 1
    if P * N == 128:
        return _fused_bwd_pallas(
            r, k, v, w, u, s0, g, scale, bias, cts,
            eps=eps, chunk_size=chunk_size, interpret=interpret, exact=exact,
        )

    def f(r, k, v, w, u, s0, g, scale, bias):
        return _fused_ref(r, k, v, w, u, s0, g, scale, bias, eps, chunk_size)

    _, vjp = jax.vjp(f, r, k, v, w, u, s0, g, scale, bias)
    return vjp(cts)


def _fused_bwd_pallas(
    r, k, v, w, u, s0, g, scale, bias, cts, *, eps, chunk_size, interpret,
    gn=True, exact=True,
):
    """Two-pass Pallas backward (see header above): re-run forward saving
    chunk-entry states, then reverse-adjoint kernel. gn=False runs the
    same two passes for the UNFUSED op (raw y out; GroupNorm/gate adjoint
    skipped, dout flows straight into dy)."""
    dout, dsT = cts
    B, T, H, N = r.shape
    P = 128 // N
    H2 = H // P
    W = P * N
    L = chunk_size
    TB = min(max(_T_BLOCK, L), max(L, ((T + L - 1) // L) * L))
    pad = (-T) % TB
    if pad:
        cfg4 = [(0, 0), (0, pad), (0, 0), (0, 0)]
        cfg3 = [(0, 0), (0, pad), (0, 0)]
        r = jnp.pad(r, cfg4)
        k = jnp.pad(k, cfg4)
        v = jnp.pad(v, cfg4)
        w = jnp.pad(w, cfg4, constant_values=-1e30)
        g = jnp.pad(g.reshape(B, T, H, N), cfg4).reshape(B, T + pad, H * N)
        dout = jnp.pad(dout, cfg3)
    else:
        g = g.reshape(B, T, H * N)
    Tp = T + pad
    NTB = Tp // TB
    NCL = TB // L

    rb, kb, vb, wb = (x.reshape(B, Tp, H * N) for x in (r, k, v, w))
    ub = u.astype(jnp.float32).reshape(H2, 1, W)
    scb = scale.astype(jnp.float32).reshape(H2, 1, W)
    bib = bias.astype(jnp.float32).reshape(H2, 1, W)
    s0b = s0.astype(jnp.float32).reshape(B, H2, W, N)
    dsTb = dsT.astype(jnp.float32).reshape(B, H2, W, N)

    lane = pl.BlockSpec((1, TB, W), lambda i, c: (i // H2, c, i % H2))
    lane_rev = pl.BlockSpec(
        (1, TB, W), lambda i, c: (i // H2, NTB - 1 - c, i % H2)
    )
    vec = pl.BlockSpec((1, 1, W), lambda i, c: (i % H2, 0, 0))
    smat = pl.BlockSpec((1, 1, W, N), lambda i, c: (i // H2, i % H2, 0, 0))
    states_spec = pl.BlockSpec(
        (1, NCL, W, N), lambda i, c: (i, c, 0, 0)
    )
    states_spec_rev = pl.BlockSpec(
        (1, NCL, W, N), lambda i, c: (i, NTB - 1 - c, 0, 0)
    )

    # pass 1: forward with state checkpoints
    out, sout, states = pl.pallas_call(
        functools.partial(
            _wkv_gn_fwd_save_kernel, L=L, N=N, P=P, TB=TB, eps=eps, gn=gn,
            exact=exact,
        ),
        grid=(B * H2, NTB),
        in_specs=[lane, lane, lane, lane, lane, vec, vec, vec, smat],
        out_specs=[lane, smat, states_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * N), g.dtype),
            jax.ShapeDtypeStruct((B, H2, W, N), jnp.float32),
            jax.ShapeDtypeStruct((B * H2, NTB * NCL, W, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(rb, kb, vb, wb, g, ub, scb, bib, s0b)

    # pass 2: reverse adjoint
    partial_vec = pl.BlockSpec((1, 1, W), lambda i, c: (i, 0, 0))
    dr, dk, dv, dw, dg, du_p, dsc_p, dbi_p, ds0 = pl.pallas_call(
        functools.partial(
            _wkv_gn_bwd_kernel, L=L, N=N, P=P, TB=TB, eps=eps, NTB=NTB,
            gn=gn, exact=exact,
        ),
        grid=(B * H2, NTB),
        in_specs=[
            lane_rev, lane_rev, lane_rev, lane_rev, lane_rev,
            vec, vec, vec, lane_rev, smat, states_spec_rev,
        ],
        out_specs=[
            lane_rev, lane_rev, lane_rev, lane_rev, lane_rev,
            partial_vec, partial_vec, partial_vec, smat,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * N), r.dtype),
            jax.ShapeDtypeStruct((B, Tp, H * N), k.dtype),
            jax.ShapeDtypeStruct((B, Tp, H * N), v.dtype),
            jax.ShapeDtypeStruct((B, Tp, H * N), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, H * N), g.dtype),
            jax.ShapeDtypeStruct((B * H2, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B * H2, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B * H2, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H2, W, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(rb, kb, vb, wb, g, ub, scb, bib, dout, dsTb, states)

    def unlane(x, dtype):
        return x[:, :T].reshape(B, T, H, N).astype(dtype)

    dr = unlane(dr, r.dtype)
    dk = unlane(dk, k.dtype)
    dv = unlane(dv, v.dtype)
    dw = unlane(dw, jnp.float32)
    dg4 = unlane(dg, g.dtype)
    du = du_p.reshape(B, H2, W).sum(axis=0).reshape(H, N).astype(jnp.float32)
    dscale = dsc_p.reshape(B, H2, W).sum(axis=0).reshape(H * N)
    dbias = dbi_p.reshape(B, H2, W).sum(axis=0).reshape(H * N)
    ds0 = ds0.reshape(B, H, N, N)
    return (
        dr, dk, dv, dw, du, ds0, dg4,
        dscale.astype(scale.dtype), dbias.astype(bias.dtype),
    )


_wkv_fused.defvjp(_fused_fwd, _fused_bwd)


def wkv6_fused_output(
    r, k, v, w, u, g, ln_scale, ln_bias, initial_state=None,
    *, eps: float, chunk_size: int = 64, interpret: Optional[bool] = None,
    exact: bool = True,
):
    """Fused WKV + GroupNorm(ln_x) + gate multiply.

    r,k,v,g: (B,T,H,N) compute dtype; w (B,T,H,N) fp32; u (H,N);
    ln_scale/ln_bias (H*N,); initial_state (B,H,N,N) fp32 or None.
    Returns (gated output (B,T,H*N) in g.dtype — feed straight into the
    output projection — and the final WKV state).

    exact=False: midpoint-rescale intra-chunk factoring — exact only
    under the checkpoint decay bound models.rwkv.suggest_wkv_dispatch
    verifies; the model layer passes cfg.wkv_exact here."""
    B, T, H, N = r.shape
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = not pallas_available()
    if not geometry_native(N, H):
        # head sizes the packed kernel can't tile (e.g. 96): run the
        # UNFUSED op (which zero-pads N up to a tileable size — exact,
        # and keeps the two-pass Pallas backward) and apply the
        # GroupNorm/gate tail in XLA over the true N channels (padded
        # zeros must not enter the GN statistics).
        y, sT = wkv_pallas(
            r, k, v, w, u, initial_state,
            chunk_size=chunk_size, interpret=interpret, exact=exact,
        )
        yf = y.reshape(B, T, H, N)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
        yn = ((yf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, H * N)
        out = (
            yn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
        ) * g.reshape(B, T, H * N).astype(jnp.float32)
        return out.astype(g.dtype), sT
    return _wkv_fused(
        r, k, v, w.astype(jnp.float32), u.astype(jnp.float32),
        initial_state.astype(jnp.float32), g,
        ln_scale, ln_bias, eps,
        _pow2_chunk(min(chunk_size, max(8, T))), interpret,
        exact,
    )


# ---------------------------------------------------------------------------
# Pallas backward for the fused kernel.
#
# Two passes, mirroring the CUDA backward's structure (wkv6_cuda.cu:64-227)
# in chunked form: (1) a forward re-run that checkpoints the state at every
# L-chunk boundary; (2) a reverse-order grid pass that carries the state
# ADJOINT dS in VMEM, recomputes within-chunk forward quantities from the
# checkpointed states, applies the GroupNorm/gate backward in-kernel, and
# emits dr/dk/dv/dw/dg blocks plus per-program du/dscale/dbias partial sums
# (reduced in XLA). The within-chunk dlw suffix-sum is an upper-triangular
# matmul — the chunked analogue of the CUDA gw suffix-scan trick. The
# intra-chunk A and its adjoint run the exact tiled decomposition
# (_exact_A_head/_exact_A_head_bwd) so forward and backward agree for ANY
# decay.
# ---------------------------------------------------------------------------


def _wkv_gn_fwd_save_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref, s0_ref,
    out_ref, sout_ref, states_ref,
    state,
    *, L: int, N: int, P: int, TB: int, eps: float, gn: bool = True,
    exact: bool = True,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[:, :] = s0_ref[0, 0].astype(jnp.float32)

    u_row = u_ref[0].astype(jnp.float32)
    scale = sc_ref[0].astype(jnp.float32)
    bias = bi_ref[0].astype(jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = row0 > col0

    for i in range(TB // L):
        states_ref[0, i] = state[:, :]          # checkpoint chunk entry
        sl = slice(i * L, (i + 1) * L)
        r_all = r_ref[0, sl, :].astype(jnp.float32)
        k_all = k_ref[0, sl, :].astype(jnp.float32)
        v_all = v_ref[0, sl, :].astype(jnp.float32)
        w_all = w_ref[0, sl, :].astype(jnp.float32)
        g_all = g_ref[0, sl, :].astype(jnp.float32)
        lw = -jnp.exp(w_all)
        winc = _cumsum_rows(lw, L)
        wexc = winc - lw
        wlast = winc[L - 1, :][None, :]
        q_inter_all = r_all * jnp.exp(wexc)
        k_state_all = k_all * jnp.exp(wlast - winc)
        diag_all = r_all * u_row * k_all
        if exact:
            factors = _exact_A_factors(r_all, k_all, winc, wexc, L)
        else:
            q_all, kk_all, _, _, _, _ = _rescale_A_wide(
                r_all, k_all, winc, wexc, L
            )
        outs = []
        for p in range(P):
            lane = slice(p * N, (p + 1) * N)
            v_h = v_all[:, lane]
            if exact:
                A = _exact_A_combine(
                    r_all[:, lane], k_all[:, lane], factors, lane, L
                )
            else:
                A = jnp.where(
                    causal,
                    _dot(q_all[:, lane], kk_all[:, lane], ((1,), (1,))),
                    0.0,
                )
            y = _dot(A, v_h, ((1,), (0,)))
            y += jnp.sum(diag_all[:, lane], axis=1, keepdims=True) * v_h
            y += _dot(q_inter_all[:, lane], state[lane, :], ((1,), (0,)))
            new_s = state[lane, :] * jnp.exp(wlast[0, lane])[:, None]
            new_s += _dot(k_state_all[:, lane], v_h, ((0,), (0,)))
            state[lane, :] = new_s
            if gn:
                mu = jnp.mean(y, axis=1, keepdims=True)
                var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
                outs.append((y - mu) * jax.lax.rsqrt(var + eps))
            else:
                outs.append(y)
        yn_all = jnp.concatenate(outs, axis=1)
        if gn:
            yn_all = (yn_all * scale + bias) * g_all
        out_ref[0, sl, :] = yn_all.astype(out_ref.dtype)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        sout_ref[0, 0] = state[:, :]


def _wkv_gn_bwd_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref,
    dout_ref, dsT_ref, states_ref,
    dr_ref, dk_ref, dv_ref, dw_ref, dg_ref, du_ref, dsc_ref, dbi_ref,
    ds0_ref,
    dstate,
    *, L: int, N: int, P: int, TB: int, eps: float, NTB: int,
    gn: bool = True, exact: bool = True,
):
    # grid axis 1 indexes T-blocks in REVERSE (index maps flip it)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        dstate[:, :] = dsT_ref[0, 0].astype(jnp.float32)

    @pl.when(c == 0)
    def _():
        du_ref[0, 0] = jnp.zeros_like(du_ref[0, 0])
        dsc_ref[0, 0] = jnp.zeros_like(dsc_ref[0, 0])
        dbi_ref[0, 0] = jnp.zeros_like(dbi_ref[0, 0])

    u_row = u_ref[0].astype(jnp.float32)
    scale = sc_ref[0].astype(jnp.float32)
    bias = bi_ref[0].astype(jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = row0 > col0

    for i in reversed(range(TB // L)):
        sl = slice(i * L, (i + 1) * L)
        r_all = r_ref[0, sl, :].astype(jnp.float32)
        k_all = k_ref[0, sl, :].astype(jnp.float32)
        v_all = v_ref[0, sl, :].astype(jnp.float32)
        w_all = w_ref[0, sl, :].astype(jnp.float32)
        g_all = g_ref[0, sl, :].astype(jnp.float32)
        dout_all = dout_ref[0, sl, :].astype(jnp.float32)
        S0 = states_ref[0, i]                    # (W, N) chunk-entry state

        lw = -jnp.exp(w_all)
        winc = _cumsum_rows(lw, L)
        wexc = winc - lw
        wlast = winc[L - 1, :][None, :]
        e_exc = jnp.exp(wexc)
        e_state_k = jnp.exp(wlast - winc)
        q_inter_all = r_all * e_exc
        k_state_all = k_all * e_state_k
        diag_all = r_all * u_row * k_all

        dr_parts, dk_parts, dv_parts = [], [], []
        dwinc_parts, dwexc_parts, dwlast_parts = [], [], []
        dg_parts, du_parts, dsc_parts, dbi_parts = [], [], [], []

        if exact:
            factors = _exact_A_factors(r_all, k_all, winc, wexc, L)
        else:
            q_all, kk_all, Eq_all, Ek_all, okq_all, okk_all = (
                _rescale_A_wide(r_all, k_all, winc, wexc, L)
            )
        for p in range(P):
            lane = slice(p * N, (p + 1) * N)
            r_h = r_all[:, lane]
            k_h = k_all[:, lane]
            v_h = v_all[:, lane]
            winc_h = winc[:, lane]
            wexc_h = wexc[:, lane]
            qi = q_inter_all[:, lane]
            ks = k_state_all[:, lane]
            S0h = S0[lane, :]
            dSh = dstate[lane, :]

            # ---- recompute forward y (pre-GN) for this chunk/head ----
            if exact:
                A = _exact_A_combine(r_h, k_h, factors, lane, L)
            else:
                A = jnp.where(
                    causal,
                    _dot(q_all[:, lane], kk_all[:, lane], ((1,), (1,))),
                    0.0,
                )
            cdiag = jnp.sum(diag_all[:, lane], axis=1, keepdims=True)
            y = _dot(A, v_h, ((1,), (0,)))
            y += cdiag * v_h
            y += _dot(qi, S0h, ((1,), (0,)))
            if gn:
                mu = jnp.mean(y, axis=1, keepdims=True)
                var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
                rstd = jax.lax.rsqrt(var + eps)
                z = (y - mu) * rstd

                # ---- GroupNorm + gate backward ----
                do = dout_all[:, lane]
                g_h = g_all[:, lane]
                sc_h = scale[:, lane]
                dg_parts.append(do * (z * sc_h + bias[:, lane]))
                dpre = do * g_h
                dsc_parts.append(jnp.sum(dpre * z, axis=0, keepdims=True))
                dbi_parts.append(jnp.sum(dpre, axis=0, keepdims=True))
                dz = dpre * sc_h
                dy = rstd * (
                    dz
                    - jnp.mean(dz, axis=1, keepdims=True)
                    - z * jnp.mean(dz * z, axis=1, keepdims=True)
                )
            else:
                dy = dout_all[:, lane]
                zero = jnp.zeros((1, N), jnp.float32)
                dg_parts.append(jnp.zeros_like(dy))
                dsc_parts.append(zero)
                dbi_parts.append(zero)

            # ---- WKV backward ----
            # y_inter = qi @ S0h
            dqi = _dot(dy, S0h, ((1,), (1,)))
            dS0h = _dot(qi, dy, ((0,), (0,)))
            # y_intra = A @ v ; A from the exact tiled decomposition
            dA = _dot(dy, v_h, ((1,), (1,)))
            dA = jnp.where(causal, dA, 0.0)
            dv_h = _dot(A, dy, ((0,), (0,)))
            if exact:
                dr_A, dk_A, dwexc_A, dwinc_A = _exact_A_head_bwd(
                    dA, r_h, k_h, winc_h, wexc_h, L, N
                )
            else:
                dr_A, dk_A, dwexc_A, dwinc_A = _rescale_A_bwd(
                    dA, q_all[:, lane], kk_all[:, lane],
                    Eq_all[:, lane], Ek_all[:, lane],
                    okq_all[:, lane], okk_all[:, lane], L, N,
                )
            # diag bonus: y += cdiag * v
            dcdiag = jnp.sum(dy * v_h, axis=1, keepdims=True)
            dv_h += cdiag * dy
            # state update: S1 = E ⊙ S0 + ks^T @ v
            E = jnp.exp(wlast[:, lane])          # (1,N)
            dS0h += E[0][:, None] * dSh
            dks = _dot(v_h, dSh, ((1,), (1,)))
            dv_h += _dot(ks, dSh, ((1,), (0,)))
            dE = jnp.sum(dSh * S0h, axis=1)[None, :]  # (1,N)

            # ---- unfactor exponentials ----
            u_h = u_row[:, lane]
            dr_h = (
                dqi * e_exc[:, lane]
                + dr_A
                + dcdiag * (u_h * k_h)
            )
            dk_h = (
                dk_A
                + dks * e_state_k[:, lane]
                + dcdiag * (u_h * r_h)
            )
            du_parts.append(
                jnp.sum(dcdiag * r_h * k_h, axis=0, keepdims=True)
            )
            dwexc_h = dqi * qi + dwexc_A
            dwinc_h = dwinc_A - dks * ks
            dwlast_h = (
                jnp.sum(dks * ks, axis=0, keepdims=True) + dE * E
            )

            dr_parts.append(dr_h)
            dk_parts.append(dk_h)
            dv_parts.append(dv_h)
            dwexc_parts.append(dwexc_h)
            dwinc_parts.append(dwinc_h)
            dwlast_parts.append(dwlast_h)
            dstate[lane, :] = dS0h

        dr = jnp.concatenate(dr_parts, axis=1)
        dk = jnp.concatenate(dk_parts, axis=1)
        dv = jnp.concatenate(dv_parts, axis=1)
        dwexc = jnp.concatenate(dwexc_parts, axis=1)
        dwinc = jnp.concatenate(dwinc_parts, axis=1)
        dwlast = jnp.concatenate(dwlast_parts, axis=1)
        dg_out = jnp.concatenate(dg_parts, axis=1)
        du_acc = jnp.concatenate(du_parts, axis=1)
        dsc_acc = jnp.concatenate(dsc_parts, axis=1)
        dbi_acc = jnp.concatenate(dbi_parts, axis=1)

        # winc/wexc/wlast -> lw -> w (suffix-sum = triangular matmul);
        # dwlast lands on the last row via a mask (no scatter on TPU)
        dwinc_tot = dwinc + dwexc
        is_last_row = (
            jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == L - 1
        )
        dwinc_tot = dwinc_tot + jnp.where(is_last_row, dwlast, 0.0)
        # suffix sum: dlw[s] = sum_{t>=s} dwinc_tot[t]
        dlw = _cumsum_rows(dwinc_tot, L, reverse=True)
        dlw = dlw - dwexc                        # wexc_t = winc_t - lw_t
        dw_all = dlw * lw                        # dlw * d(lw)/dw, lw=-e^w

        dr_ref[0, sl, :] = dr.astype(dr_ref.dtype)
        dk_ref[0, sl, :] = dk.astype(dk_ref.dtype)
        dv_ref[0, sl, :] = dv.astype(dv_ref.dtype)
        dw_ref[0, sl, :] = dw_all
        dg_ref[0, sl, :] = dg_out.astype(dg_ref.dtype)
        du_ref[0, 0] = du_ref[0, 0] + du_acc[0]
        dsc_ref[0, 0] = dsc_ref[0, 0] + dsc_acc[0]
        dbi_ref[0, 0] = dbi_ref[0, 0] + dbi_acc[0]

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        ds0_ref[0, 0] = dstate[:, :]
