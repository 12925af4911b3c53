"""Sequence parallelism for the WKV scan (beyond the reference).

The reference's only long-context mechanisms are within-device chunking
(SURVEY §2.4: infctx TBPTT + chunked inference). On TPU we can shard the
TIME axis across devices: the WKV state update is an associative
segment-composition —

    segment s maps an incoming state S_in to  D_s ⊙_K S_in + S_s_local
    (D_s = the segment's total per-key-channel decay, S_s_local = the
    segment's scan from a zero state)

— so the cross-device dependency is a tiny exclusive prefix-combine over
(B,H,N,N) states (one all-gather of states + decays over ICI; the heavy
(T-local) chunk scan runs fully parallel on every device). Each device then
adds the incoming prefix state's contribution to its local outputs:

    y_t += (r_t ⊙ e^{Wexc_t within shard}) @ S_prefix

This is the linear-attention analogue of ring attention: instead of
passing O(T·d) KV blocks around the ring, only O(N²) states move.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_lm_ext_tpu.ops.wkv_chunked import wkv_chunked


def _local_wkv_with_decay(r, k, v, w, u, chunk_size):
    """Local shard scan from zero state + the quantities needed for the
    cross-shard correction: per-token exclusive cumulative decay within the
    shard and the shard's total decay."""
    B, T, H, N = r.shape
    # derive the zero init from the (axis-varying) inputs so the inner
    # scan carry has a consistent varying type under shard_map
    s0 = jnp.zeros((B, H, N, N), jnp.float32) + 0.0 * jnp.sum(
        r.astype(jnp.float32)
    )
    y_local, s_local = wkv_chunked(
        r, k, v, w, u, s0, chunk_size=chunk_size, remat=True
    )
    lw = -jnp.exp(w.astype(jnp.float32))         # (B,T,H,N)
    winc = jnp.cumsum(lw, axis=1)
    wexc = winc - lw
    d_total = jnp.exp(winc[:, -1])               # (B,H,N)
    q_scaled = r.astype(jnp.float32) * jnp.exp(wexc)
    return y_local, s_local, q_scaled, d_total


def wkv6_sequence_parallel(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    chunk_size: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Time-sharded WKV: r/k/v/w (B, T, H, N) with T sharded over `axis`.

    Returns (y (B,T,H,N) fp32, final_state (B,H,N,N) fp32) with y sharded
    like the inputs and the final state replicated.
    """

    def shard_fn(r, k, v, w, u):
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)
        y_local, s_local, q_scaled, d_total = _local_wkv_with_decay(
            r, k, v, w, u, chunk_size
        )
        # gather every shard's (state, decay) — O(n · B·H·N·N) over ICI
        states = jax.lax.all_gather(s_local, axis)      # (n,B,H,N,N)
        decays = jax.lax.all_gather(d_total, axis)      # (n,B,H,N)

        # exclusive prefix-combine up to this shard:
        #   S_prefix = sum_{s<idx} (prod_{s<u<idx} D_u) ⊙ S_s
        def combine(carry, inp):
            s_prev = carry
            s_i, d_i = inp
            return d_i[..., None] * s_prev + s_i, s_prev

        s_zero = s_local * 0.0  # varying-typed zero (see note above)
        s_after_all, s_before_each = jax.lax.scan(
            combine, s_zero, (states, decays)
        )
        s_prefix = s_before_each[idx]                   # state entering shard
        y = y_local + jnp.einsum(
            "bthn,bhnm->bthm", q_scaled, s_prefix
        )
        # identical on every device already; pmean makes that provable
        return y, jax.lax.pmean(s_after_all, axis)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(None, axis), P(None, axis), P(None, axis), P(None, axis), P()
        ),
        out_specs=(P(None, axis), P()),
    )
    return fn(r, k, v, w, u)
