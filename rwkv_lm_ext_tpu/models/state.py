"""Recurrent state pytrees.

TPU-native replacement for the reference's state containers
(src/infctx_module.py:1-52 BlockState/BlockStateList and the per-layer
python lists of src/model_run.py:578-583): the whole model state is a flat
dict of stacked arrays with a leading n_layer axis, which makes it a plain
JAX pytree — shardable with jax.sharding, donat-able in jitted decode
steps, vmappable for beam-search state forking, and trivially savable.

Layout (L = n_layer, B = batch, C = n_embd, H = heads, N = head_size):
    att_shift: (L, B, C)      last token fed to each time-mix   (fp32)
    wkv:       (L, B, H, N*N/128, 128) WKV state, PACKED         (fp32)
    ffn_shift: (L, B, C)      last token fed to each channel-mix (fp32)

**Packed WKV layout** (TPU tile alignment): the logical per-head state is
(N, N) in (K, V) order, but a minor dim of N=64 makes XLA physically pad
every tile to 128 lanes — 2x the HBM footprint AND a measured ~6x loss of
copy bandwidth (291 GB/s vs 1878 GB/s on v5e for the same 67 MB). Since
the state is the dominant HBM traffic of batched decode, the canonical
in-memory layout packs the row-major (N, N) bytes into (N*N/128, 128) —
a pure reshape, no data movement — whenever N*N is a multiple of 128.
`unpack_wkv` / `pack_wkv` convert at the boundaries of consumers that do
logical (N, N) math (the XLA wkv backends, sequence-parallel composition);
the fused decode kernel consumes the packed layout natively.

Bidirectional streaming additionally carries reverse-direction slots
(att_shift_rev / wkv_rev) — see models/bidirectional.py — mirroring the
reference's 5-slot layout (src/model_run.py:727-758).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

LAYER_STATE_KEYS = ("att_shift", "wkv", "ffn_shift")

ModelState = Dict[str, jax.Array]


def wkv_is_packable(N: int) -> bool:
    return (N * N) % 128 == 0 and N * N >= 128


def wkv_state_shape(H: int, N: int) -> Tuple[int, ...]:
    """Trailing (per batch row) dims of the canonical WKV state."""
    if wkv_is_packable(N):
        return (H, (N * N) // 128, 128)
    return (H, N, N)


def pack_wkv(x: jax.Array) -> jax.Array:
    """(..., N, N) logical state -> canonical packed (..., N*N/128, 128).
    Idempotent: non-square trailing dims (already packed) and unpackable
    head sizes pass through."""
    n = x.shape[-1]
    if x.shape[-2] != n or not wkv_is_packable(n):
        return x
    return x.reshape(x.shape[:-2] + ((n * n) // 128, 128))


def unpack_wkv(x: jax.Array, N: int) -> jax.Array:
    """Canonical packed (..., N*N/128, 128) -> logical (..., N, N)."""
    if x.shape[-1] == N and x.shape[-2] == N:
        return x
    return x.reshape(x.shape[:-2] + (N, N))


def init_model_state(
    cfg, batch_size: int, *, wkv_init: Optional[jax.Array] = None
) -> ModelState:
    """Zero state; `wkv_init` ((L,H,N,N) or (L,B,H,N,N), logical or packed)
    overrides the WKV slots — the hook for state-tuned "states" serving
    (reference infer/states_generator.py:34-49)."""
    L, B, C = cfg.n_layer, batch_size, cfg.n_embd
    if cfg.version < 5:
        assert wkv_init is None, "v4 has no (H,N,N) tuned states"
        from rwkv_lm_ext_tpu.models.rwkv4 import init_v4_state

        return init_v4_state(cfg, B)
    H, N = cfg.n_head, cfg.head_size
    trail = wkv_state_shape(H, N)
    if wkv_init is None:
        wkv = jnp.zeros((L, B) + trail, dtype=jnp.float32)
    elif wkv_init.ndim == 4:
        wkv = jnp.broadcast_to(
            pack_wkv(wkv_init.astype(jnp.float32))[:, None], (L, B) + trail
        )
    else:
        wkv = pack_wkv(wkv_init.astype(jnp.float32))
    return {
        "att_shift": jnp.zeros((L, B, C), dtype=jnp.float32),
        "wkv": wkv,
        "ffn_shift": jnp.zeros((L, B, C), dtype=jnp.float32),
    }


def unstack_state(state: ModelState):
    """Stacked (L, ...) state -> tuple of per-layer (att, wkv, ffn)
    triples; rwkv_forward accepts either form and returns the same kind.
    Measured at 1B6 B=64 decode the stacked carry is actually FASTER
    (10.7 vs 11.5 ms/step — XLA elides the slice/re-stack copies and a
    72-leaf carry adds scan overhead), so engines keep the stacked dict;
    this form exists for callers that manage per-layer state directly
    (e.g. layer-streamed serving)."""
    L = state["att_shift"].shape[0]
    return tuple(
        (state["att_shift"][i], state["wkv"][i], state["ffn_shift"][i])
        for i in range(L)
    )


def restack_state(layers) -> ModelState:
    """Inverse of unstack_state."""
    return {
        "att_shift": jnp.stack([l[0] for l in layers]),
        "wkv": jnp.stack([l[1] for l in layers]),
        "ffn_shift": jnp.stack([l[2] for l in layers]),
    }


def is_unstacked(state) -> bool:
    return isinstance(state, (list, tuple))


def clone_state(state: ModelState) -> ModelState:
    """Functional arrays never alias mutably; kept for API parity with the
    reference's clone_state (src/model_run.py:1407-1410)."""
    return dict(state)


def gather_beams(state: ModelState, beam_idx: jax.Array) -> ModelState:
    """Fork/reorder per-beam states along the batch axis (beam search)."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, beam_idx, axis=1), state)
