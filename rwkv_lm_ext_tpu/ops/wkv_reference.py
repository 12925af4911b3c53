"""Sequential WKV golden model (`jax.lax.scan`, fp32 state).

This is the numerics anchor for every faster implementation: an exact,
token-by-token port of the recurrence defined by the reference's CUDA
kernels (cuda/wkv6_cuda.cu:23-60) and its CPU fallback
(tests/test_cpu.py:42-73, src/model_encoder_run.py:31-62). Slow but exact;
usable anywhere (CPU/TPU), differentiable by plain autodiff.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def wkv_reference(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: Optional[jax.Array],
    initial_state: Optional[jax.Array] = None,
    *,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sequential WKV scan.

    Args:
      r, k, v: (B, T, H, N) any float dtype (computed in fp32).
      w:       (B, T, H, N) log-decay input; effective per-step decay is
               exp(-exp(w)) (matches the reference's host-side `-exp(w)`
               plus in-kernel `exp`, src/model.py:210 + wkv6_cuda.cu:26).
      u:       (H, N) per-head bonus, or None to disable the bonus term
               (the reverse pass of the bidirectional kernel has no bonus,
               cuda/wkv6_bi_cuda.cu:73-111).
      initial_state: (B, H, N, N) fp32 in (K, V) layout, or None for zeros.
      reverse: scan from t=T-1 down to 0 (used by the bidirectional op).

    Returns:
      y:           (B, T, H, N) in r.dtype's promotion with fp32 (cast back
                   to r.dtype by callers as needed) — here fp32.
      final_state: (B, T-independent) (B, H, N, N) fp32.
    """
    B, T, H, N = r.shape
    rf = r.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    ew = jnp.exp(-jnp.exp(w.astype(jnp.float32)))  # (B,T,H,N), in (0,1)

    if initial_state is None:
        state0 = jnp.zeros((B, H, N, N), dtype=jnp.float32)
    else:
        state0 = initial_state.astype(jnp.float32)

    uf = None if u is None else u.astype(jnp.float32)

    def step(S, inp):
        r_t, k_t, v_t, ew_t = inp  # each (B,H,N)
        kv = k_t[..., :, None] * v_t[..., None, :]  # (B,H,K,V)
        if uf is None:
            attend = S
        else:
            attend = uf[None, :, :, None] * kv + S
        y_t = jnp.einsum("bhk,bhkv->bhv", r_t, attend)
        S = S * ew_t[..., :, None] + kv
        return S, y_t

    xs = (
        jnp.moveaxis(rf, 1, 0),
        jnp.moveaxis(kf, 1, 0),
        jnp.moveaxis(vf, 1, 0),
        jnp.moveaxis(ew, 1, 0),
    )
    final_state, ys = jax.lax.scan(step, state0, xs, reverse=reverse)
    y = jnp.moveaxis(ys, 0, 1)  # (B,T,H,N)
    return y, final_state


def wkv_collect(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: Optional[jax.Array],
    initial_state: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """wkv_reference that also emits the state AFTER EVERY position.

    Returns (y (B,T,H,N) fp32, states (T,B,H,N,N) fp32) where
    states[t] is the recurrent state after consuming tokens[..t]. Used
    by the speculative-decoding verify pass (models/collect.py): a
    partial acceptance selects states[j] instead of re-prefilling the
    accepted prefix (VERDICT r3 #5). Intended for short T (gamma+1) at
    small B — the per-step state emit is O(T*B*H*N^2) HBM."""
    B, T, H, N = r.shape
    rf = r.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    ew = jnp.exp(-jnp.exp(w.astype(jnp.float32)))
    state0 = (
        jnp.zeros((B, H, N, N), jnp.float32)
        if initial_state is None else initial_state.astype(jnp.float32)
    )
    uf = None if u is None else u.astype(jnp.float32)

    def step(S, inp):
        r_t, k_t, v_t, ew_t = inp
        kv = k_t[..., :, None] * v_t[..., None, :]
        attend = S if uf is None else uf[None, :, :, None] * kv + S
        y_t = jnp.einsum("bhk,bhkv->bhv", r_t, attend)
        S = S * ew_t[..., :, None] + kv
        return S, (y_t, S)

    xs = tuple(jnp.moveaxis(a, 1, 0) for a in (rf, kf, vf, ew))
    _, (ys, Ss) = jax.lax.scan(step, state0, xs)
    return jnp.moveaxis(ys, 0, 1), Ss
