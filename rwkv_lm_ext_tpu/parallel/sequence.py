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


def _sp_wkv_local(r, k, v, w, u, axis):
    """In-shard_map WKV over a T-shard: local scan + cross-shard state
    prefix-combine (see module docstring). Returns y for this shard."""
    idx = jax.lax.axis_index(axis)
    y_local, s_local, q_scaled, d_total = _local_wkv_with_decay(
        r, k, v, w, u, 32
    )
    states = jax.lax.all_gather(s_local, axis)
    decays = jax.lax.all_gather(d_total, axis)

    def combine(carry, inp):
        s_i, d_i = inp
        return d_i[..., None] * carry + s_i, carry

    _, s_before = jax.lax.scan(combine, s_local * 0.0, (states, decays))
    s_prefix = s_before[idx]
    return y_local + jnp.einsum("bthn,bhnm->bthm", q_scaled, s_prefix)


def rwkv_forward_sequence_parallel(
    params,
    cfg,
    tokens: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    return_hidden: bool = False,
):
    """Full-model forward with the TIME axis sharded over `axis` — encode
    contexts longer than one chip's memory. Per layer: local compute on the
    T-shard; the WKV state crosses shards via the associative
    prefix-combine; the token-shift boundary (one (B, C) vector per layer
    stream) crosses via ppermute. Causal-only (no generation state out).

    tokens: (B, T) with T divisible by the axis size. Returns logits
    (or hidden) sharded like the inputs.
    """
    from rwkv_lm_ext_tpu.models.rwkv import (
        as_weight,
        channel_mix,
        layer_norm,
        tmix_v6_projections,
        tmix_v6_output,
    )

    dt = cfg.compute_dtype
    H, N = cfg.n_head, cfg.head_size

    def shard_fn(params, tokens):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        B, Tl = tokens.shape
        x = jnp.take(params["emb"], tokens, axis=0).astype(dt)

        def boundary_shift(x):
            # previous shard's last token state for the token shift
            last = x[:, -1]
            prev = jax.lax.ppermute(
                last, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            return jnp.where(idx == 0, 0.0, 1.0) * prev

        for i, bp in enumerate(params["blocks"]):
            if i == 0 and "ln0" in bp:
                x = layer_norm(x, bp["ln0"])
            xa = layer_norm(x, bp["ln1"])
            r, k, v, g, w = tmix_v6_projections(
                bp["att"], cfg, xa, boundary_shift(xa)
            )
            y = _sp_wkv_local(
                r.reshape(B, Tl, H, N),
                k.reshape(B, Tl, H, N),
                v.reshape(B, Tl, H, N),
                w.reshape(B, Tl, H, N),
                bp["att"]["time_faaaa"],
                axis,
            ).reshape(B, Tl, cfg.dim_att)
            x = x + tmix_v6_output(bp["att"], cfg, y.astype(dt), g)
            xf = layer_norm(x, bp["ln2"])
            ffn_out, _ = channel_mix(
                bp["ffn"], cfg, xf, boundary_shift(xf), v6=True
            )
            x = x + ffn_out
        x = layer_norm(x, params["ln_out"])
        if return_hidden:
            return x
        return x @ as_weight(params["head"], dt)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
    )
    return fn(params, tokens)
