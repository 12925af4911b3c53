"""RWKV-4 model family (Raven / Pile checkpoints).

The reference serves RWKV-4 through the `rwkv` pip package
(infer/rwkv_states_runner.py + cuda/operators.cu — the aa/bb/pp
log-space WKV and its serving pipeline); ops/wkv4.py is our kernel for
that recurrence, and this module is the model around it so v4
checkpoints load and generate through the SAME engine/serving stack as
v5/v6 (rwkv_forward dispatches on cfg.version).

v4 semantics (public BlinkDL RWKV-LM v4 / rwkv pip package):
- time mix: static lerp token shift (time_mix_k/v/r), sigmoid
  receptance, per-channel decay w = -exp(time_decay) and bonus
  time_first, y = r * WKV; no GroupNorm, no gate.
- channel mix: static lerp (time_mix_k/r), relu^2 key, sigmoid
  receptance gate — models.rwkv.channel_mix(v6=False) verbatim.
State per layer: att token-shift row, (aa, bb, pp) log-space WKV
accumulators (each (B, C) fp32), ffn token-shift row.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.models.rwkv import (
    _token_shift,
    channel_mix,
    layer_norm,
    proj,
)
from rwkv_lm_ext_tpu.ops.wkv4 import wkv4


def init_v4_state(cfg, batch_size: int) -> Dict:
    L, B, C = cfg.n_layer, batch_size, cfg.n_embd
    z = lambda: jnp.zeros((L, B, C), jnp.float32)
    return {
        "att_shift": z(),
        "aa": z(),
        "bb": z(),
        "pp": jnp.full((L, B, C), -1e38, jnp.float32),
        "ffn_shift": z(),
    }


def v4_time_mix(
    p: Dict, cfg, x: jax.Array, att_shift, aa, bb, pp
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    dt = x.dtype
    prev = _token_shift(x, att_shift)
    mk = p["time_mix_k"].astype(dt)
    mv = p["time_mix_v"].astype(dt)
    mr = p["time_mix_r"].astype(dt)
    xk = x * mk + prev * (1 - mk)
    xv = x * mv + prev * (1 - mv)
    xr = x * mr + prev * (1 - mr)
    r = jax.nn.sigmoid(proj(xr, p["receptance"], dt))
    k = proj(xk, p["key"], dt)
    v = proj(xv, p["value"], dt)
    w = -jnp.exp(p["time_decay"].astype(jnp.float32))
    # the sequential lax.scan stays the default: the associative-scan
    # formulation (ops.wkv4.wkv4_parallel) measured 4x SLOWER on-chip at
    # B=8 T=512 C=2048 (444 vs 112 ms) — XLA compiles the scan into an
    # on-device loop with no per-step dispatch, so the O(log T) depth
    # buys nothing while the tree does ~log2(T) x the memory traffic
    y, (aa, bb, pp) = wkv4(
        k, v, w, p["time_first"].astype(jnp.float32), (aa, bb, pp)
    )
    out = proj(r * y.astype(dt), p["output"], dt)
    return out, x[:, -1].astype(jnp.float32), aa, bb, pp


def rwkv4_forward(
    params: Dict, cfg, tokens: jax.Array, state: Optional[Dict] = None
) -> Tuple[jax.Array, Dict]:
    """(B, T) tokens -> (logits (B, T, V) fp32, new state). Same
    state-threaded contract as rwkv_forward: None state = zero state,
    chunked prefill chains exactly."""
    B, T = tokens.shape
    dt = jnp.dtype(cfg.dtype)
    if state is None:
        state = init_v4_state(cfg, B)
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)
    new = {k: [] for k in ("att_shift", "aa", "bb", "pp", "ffn_shift")}
    for i, bp in enumerate(params["blocks"]):
        if i == 0 and "ln0" in bp:
            x = layer_norm(x, bp["ln0"])
        att_out, ash, aa, bb, pp = v4_time_mix(
            bp["att"], cfg, layer_norm(x, bp["ln1"]),
            state["att_shift"][i], state["aa"][i], state["bb"][i],
            state["pp"][i],
        )
        x = x + att_out
        ffn_out, fsh = channel_mix(
            bp["ffn"], cfg, layer_norm(x, bp["ln2"]),
            state["ffn_shift"][i], v6=False,
        )
        x = x + ffn_out
        new["att_shift"].append(ash)
        new["aa"].append(aa)
        new["bb"].append(bb)
        new["pp"].append(pp)
        new["ffn_shift"].append(fsh)
    x = layer_norm(x, params["ln_out"])
    logits = proj(x, params["head"], dt).astype(jnp.float32)
    return logits, {k: jnp.stack(v) for k, v in new.items()}
