"""RWKV-4 WKV op (log-space stable recurrence).

The recurrence of the `rwkv` pip package's serving kernel
(cuda/operators.cu:12-30, used by the reference's
infer/rwkv_states_runner.py): per channel, a softmax-like accumulator pair
(aa, bb) tracked with a running max exponent pp for stability:

    ww = u + k[t];  p = max(pp, ww)
    y[t] = (e^{pp-p}·aa + e^{ww-p}·v[t]) / (e^{pp-p}·bb + e^{ww-p})
    ww = pp + w;    p = max(ww, k[t])
    aa = e^{ww-p}·aa + e^{k[t]-p}·v[t];  bb = e^{ww-p}·bb + e^{k[t]-p};  pp = p

w is the (negative) per-channel decay, u the bonus. State = (aa, bb, pp).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def wkv4(
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    initial_state: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """k, v: (B, T, C); w, u: (C,) (w <= 0 decay). Returns (y (B,T,C) fp32,
    (aa, bb, pp) final state each (B, C))."""
    B, T, C = k.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    if initial_state is None:
        aa = jnp.zeros((B, C), jnp.float32)
        bb = jnp.zeros((B, C), jnp.float32)
        pp = jnp.full((B, C), -1e38, jnp.float32)
    else:
        aa, bb, pp = (s.astype(jnp.float32) for s in initial_state)

    def step(carry, inp):
        aa, bb, pp = carry
        kt, vt = inp
        ww = uf + kt
        p = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - p)
        e2 = jnp.exp(ww - p)
        y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        ww = pp + wf
        p = jnp.maximum(ww, kt)
        e1 = jnp.exp(ww - p)
        e2 = jnp.exp(kt - p)
        return (e1 * aa + e2 * vt, e1 * bb + e2, p), y

    (aa, bb, pp), ys = jax.lax.scan(
        step, (aa, bb, pp), (jnp.moveaxis(kf, 1, 0), jnp.moveaxis(vf, 1, 0))
    )
    return jnp.moveaxis(ys, 0, 1), (aa, bb, pp)


def wkv4_parallel(
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    initial_state: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """wkv4 as a log-space associative scan: O(log T) depth instead of a
    T-step sequential lax.scan.

    MEASURED NEGATIVE on-chip (don't flip the default): 444 vs 112 ms at
    B=8 T=512 C=2048 — XLA compiles the sequential scan into an
    on-device loop with no per-step dispatch cost, so the parallel
    depth buys nothing while the tree pays ~log2(T) x the memory
    traffic. Kept as the verified-associative formulation (it is the
    basis for sequence-parallel v4 over a mesh, where the combine IS the
    cross-device state merge).

    The per-position element is (p=k_t, a=v_t, b=1, n=1): the running
    (aa, bb) accumulators with max-exponent p and segment length n. The
    combine decays the earlier segment by n_right * w and merges in
    logsumexp form — associative, so lax.associative_scan applies. The
    initial state is prepended as an (pp0, aa0, bb0, n=0) element; the
    prefix at position t is exactly the sequential state BEFORE step t,
    and the last prefix is the final state. Same math as wkv4, tree
    instead of left-to-right summation order (fp32 last-ulp diffs only).
    """
    B, T, C = k.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    if initial_state is None:
        aa0 = jnp.zeros((B, C), jnp.float32)
        bb0 = jnp.zeros((B, C), jnp.float32)
        pp0 = jnp.full((B, C), -1e38, jnp.float32)
    else:
        aa0, bb0, pp0 = (s.astype(jnp.float32) for s in initial_state)

    # concatenated elements: [init] + one per token
    p = jnp.concatenate([pp0[:, None], kf], axis=1)       # (B, T+1, C)
    a = jnp.concatenate([aa0[:, None], vf], axis=1)
    b = jnp.concatenate(
        [bb0[:, None], jnp.ones((B, T, C), jnp.float32)], axis=1
    )
    n = jnp.concatenate(
        [jnp.zeros((B, 1, 1), jnp.float32),
         jnp.ones((B, T, 1), jnp.float32)], axis=1
    )

    def comb(x, y):
        xp, xa, xb, xn = x
        yp, ya, yb, yn = y
        xp = xp + yn * wf                 # earlier segment decays
        m = jnp.maximum(xp, yp)
        e1 = jnp.exp(xp - m)
        e2 = jnp.exp(yp - m)
        return m, e1 * xa + e2 * ya, e1 * xb + e2 * yb, xn + yn

    P, A, Bb, _ = jax.lax.associative_scan(comb, (p, a, b, n), axis=1)
    # prefix at concat index t == state BEFORE token t
    sp, sa, sb = P[:, :T], A[:, :T], Bb[:, :T]
    ww = uf + kf
    m = jnp.maximum(sp, ww)
    e1 = jnp.exp(sp - m)
    e2 = jnp.exp(ww - m)
    y = (e1 * sa + e2 * vf) / (e1 * sb + e2)
    return y, (A[:, T], Bb[:, T], P[:, T])
