"""Public WKV dispatcher: one op family for all six reference kernels.

`wkv` selects a backend ("reference" sequential scan, "chunked" XLA
formulation, "pallas" TPU kernel) and covers the variants the reference
implements as separate CUDA extensions:

- plain training kernel          (cuda/wkv6_cuda.cu)        -> wkv6
- state-tuning kernel            (cuda/wkv6state_cuda.cu)   -> wkv6 with a
  broadcast (H,N,N) initial_state parameter; grads via autodiff
- infinite-context kernel        (cuda/wkv6infctx_cuda.cu)  -> wkv6 with
  per-batch initial_state + output_final_state=True
- decode/prefill kernel          (cuda/rwkv6.cu)            -> wkv6 with
  state in/out (T small)
- bidirectional kernel           (cuda/wkv6_bi_cuda.cu)     -> wkv6_bi
- RWKV-5 kernel                  (cuda/wkv5_cuda.cu)        -> wkv5
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_reference
from rwkv_lm_ext_tpu.ops.wkv_chunked import wkv_chunked

_BACKENDS = ("auto", "reference", "chunked", "chunked_exact", "pallas")


def _resolve_backend(backend: str, T: int) -> str:
    if backend not in _BACKENDS:
        raise ValueError(f"unknown wkv backend {backend!r}; one of {_BACKENDS}")
    if backend != "auto":
        return backend
    # Tiny T (decode steps): the sequential scan has no chunk overhead.
    if T <= 4:
        return "reference"
    try:
        from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available
        if pallas_available():
            return "pallas"
    except Exception:
        pass
    return "chunked"


def wkv(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: Optional[jax.Array],
    initial_state: Optional[jax.Array] = None,
    *,
    backend: str = "auto",
    chunk_size: int = 32,
    remat: bool = True,
    reverse: bool = False,
    exact: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Run the WKV scan. Shapes: r/k/v/w (B,T,H,N), u (H,N) or None,
    initial_state (B,H,N,N) fp32 (K,V layout) or None.

    Returns (y fp32 (B,T,H,N), final_state fp32 (B,H,N,N)).

    exact applies to the pallas backend only (midpoint-rescale fast path
    when False — see models.rwkv.suggest_wkv_dispatch for the safety
    bound); reference/chunked are exact at any decay regardless.
    """
    T = r.shape[1]
    be = _resolve_backend(backend, T)
    if be == "reference" or (reverse and be != "reference"):
        if reverse:
            # reverse supported natively only by the sequential scan; the
            # bidirectional op uses flip-composition instead (see wkv6_bi).
            return wkv_reference(r, k, v, w, u, initial_state, reverse=True)
        return wkv_reference(r, k, v, w, u, initial_state)
    if be in ("chunked", "chunked_exact"):
        # both names run the exact tiled decomposition ("chunked_exact" is
        # a compatibility alias from round 1's approximate/exact split)
        return wkv_chunked(
            r, k, v, w, u, initial_state, chunk_size=chunk_size, remat=remat,
        )
    if be == "pallas":
        from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv_pallas

        return wkv_pallas(
            r, k, v, w, u, initial_state, chunk_size=chunk_size, exact=exact
        )
    raise AssertionError(be)


def wkv6(
    r, k, v, w, u, initial_state=None, *, backend="auto", chunk_size=32,
    remat=True,
):
    """RWKV-6 WKV: per-token decay w (B,T,H,N)."""
    return wkv(
        r, k, v, w, u, initial_state,
        backend=backend, chunk_size=chunk_size, remat=remat,
    )


def wkv5(
    r, k, v, w, u, initial_state=None, *, backend="auto", chunk_size=32,
    remat=True,
):
    """RWKV-5 (Eagle) WKV: per-channel constant decay w (H, N).

    The reference passes host-precomputed ew = -exp(w) to the kernel
    (src/model.py:260-261, cuda/wkv5_cuda.cu); here w is the raw log-decay
    parameter, broadcast over (B, T).
    """
    B, T = r.shape[0], r.shape[1]
    w_full = jnp.broadcast_to(w[None, None], (B, T) + w.shape)
    return wkv(
        r, k, v, w_full, u, initial_state,
        backend=backend, chunk_size=chunk_size, remat=remat,
    )


def _flip_valid_prefix(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each row's first `lengths[b]` timesteps, keep the tail.

    JAX equivalent of the reference's reverse_x_idx/reverse_x gather
    (src/model_ext.py:398-417).
    x: (B, T, ...), lengths: (B,) int32.
    """
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]                      # (1,T)
    L = lengths[:, None]                            # (B,1)
    idx = jnp.where(t < L, L - 1 - t, t)            # (B,T)
    return jnp.take_along_axis(
        x, idx.reshape((B, T) + (1,) * (x.ndim - 2)), axis=1
    )


def wkv6_bi(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    backend: str = "auto",
    chunk_size: int = 32,
    remat: bool = True,
    exact: bool = True,
) -> jax.Array:
    """Bidirectional WKV (cuda/wkv6_bi_cuda.cu:23-111 semantics).

    y = causal_wkv(r,k,v,w,u) + reverse_wkv_without_bonus(r,k,v,w),
    with both passes restricted to each row's valid prefix. `lengths` is
    the per-row valid token count (None = all T valid). Positions beyond
    the valid prefix get the causal pass only (they are padding; callers
    mask them out of any loss).
    """
    B, T, H, N = r.shape
    y_fwd, _ = wkv(
        r, k, v, w, u, None,
        backend=backend, chunk_size=chunk_size, remat=remat, exact=exact,
    )
    if lengths is None:
        rr = jnp.flip(r, axis=1)
        kk = jnp.flip(k, axis=1)
        vv = jnp.flip(v, axis=1)
        ww = jnp.flip(w, axis=1)
        y_rev, _ = wkv(
            rr, kk, vv, ww, None, None,
            backend=backend, chunk_size=chunk_size, remat=remat,
            exact=exact,
        )
        y_rev = jnp.flip(y_rev, axis=1)
        return y_fwd + y_rev

    valid = (jnp.arange(T)[None, :] < lengths[:, None])  # (B,T)
    vmask = valid[..., None, None].astype(r.dtype)
    # zero k/v outside the prefix so padded tokens contribute nothing;
    # forward pass then matches the masked CUDA kernel on valid positions.
    rr = _flip_valid_prefix(r, lengths)
    kk = _flip_valid_prefix(k * vmask, lengths)
    vv = _flip_valid_prefix(v * vmask, lengths)
    ww = _flip_valid_prefix(w, lengths)
    y_rev, _ = wkv(
        rr, kk, vv, ww, None, None,
        backend=backend, chunk_size=chunk_size, remat=remat, exact=exact,
    )
    y_rev = _flip_valid_prefix(y_rev, lengths)
    return y_fwd + y_rev * valid[..., None, None]
