"""Recurrent state pytrees.

TPU-native replacement for the reference's state containers
(src/infctx_module.py:1-52 BlockState/BlockStateList and the per-layer
python lists of src/model_run.py:578-583): the whole model state is a flat
dict of stacked arrays with a leading n_layer axis, which makes it a plain
JAX pytree — shardable with jax.sharding, donat-able in jitted decode
steps, vmappable for beam-search state forking, and trivially savable.

Layout (L = n_layer, B = batch, C = n_embd, H = heads, N = head_size):
    att_shift: (L, B, C)      last token fed to each time-mix   (fp32)
    wkv:       (L, B, H, N, N) WKV state, (K, V) layout          (fp32)
    ffn_shift: (L, B, C)      last token fed to each channel-mix (fp32)

Bidirectional streaming additionally carries reverse-direction slots
(att_shift_rev / wkv_rev) — see models/bidirectional.py — mirroring the
reference's 5-slot layout (src/model_run.py:727-758).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

LAYER_STATE_KEYS = ("att_shift", "wkv", "ffn_shift")

ModelState = Dict[str, jax.Array]


def init_model_state(
    cfg, batch_size: int, *, wkv_init: Optional[jax.Array] = None
) -> ModelState:
    """Zero state; `wkv_init` ((L,H,N,N) or (L,B,H,N,N)) overrides the WKV
    slots — the hook for state-tuned "states" serving
    (reference infer/states_generator.py:34-49)."""
    L, B, C = cfg.n_layer, batch_size, cfg.n_embd
    H, N = cfg.n_head, cfg.head_size
    if wkv_init is None:
        wkv = jnp.zeros((L, B, H, N, N), dtype=jnp.float32)
    elif wkv_init.ndim == 4:
        wkv = jnp.broadcast_to(
            wkv_init[:, None].astype(jnp.float32), (L, B, H, N, N)
        )
    else:
        wkv = wkv_init.astype(jnp.float32)
    return {
        "att_shift": jnp.zeros((L, B, C), dtype=jnp.float32),
        "wkv": wkv,
        "ffn_shift": jnp.zeros((L, B, C), dtype=jnp.float32),
    }


def clone_state(state: ModelState) -> ModelState:
    """Functional arrays never alias mutably; kept for API parity with the
    reference's clone_state (src/model_run.py:1407-1410)."""
    return dict(state)


def gather_beams(state: ModelState, beam_idx: jax.Array) -> ModelState:
    """Fork/reorder per-beam states along the batch axis (beam search)."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, beam_idx, axis=1), state)
