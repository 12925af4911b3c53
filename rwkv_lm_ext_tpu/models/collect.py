"""Forward pass that returns the model state after EVERY position.

The speculative-decoding verify pass needs, on a partial acceptance of
j of gamma drafted tokens, the target state after the accepted prefix.
RWKV has no KV cache to truncate; round 3 recovered that state by
re-prefilling the prefix from a snapshot — a measured 12 ms extra
target pass per rejected round (PERF.json "speculative",
t_reprefill_ms). Here the verify pass itself emits the state after
every fed token (the WKV scan already computes them — ops.wkv_reference
wkv_collect just stops discarding the intermediates), so rollback is
one dynamic-index select into a (T, ...) stack. Shift states cost
nothing to collect: att_shift after position t is ln1(x)[:, t] and
ffn_shift is ln2(x_after_att)[:, t], which the forward materializes
anyway.

Scope: RWKV-5/6 standard blocks (no tiny-att / pre_ffn / dropout —
serving forward), B small, T = gamma+1. The per-position WKV stack is
(T, L, B, H, N, N) fp32 — ~113 MB at 1B6 T=9, transient.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.models.rwkv import (
    channel_mix,
    layer_norm,
    mish_glu,
    proj,
    time_mix_v5,
    tmix_v6_output,
    tmix_v6_projections,
)
from rwkv_lm_ext_tpu.models.state import (
    init_model_state,
    pack_wkv,
    unpack_wkv,
)
from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_collect


def collect_supported(cfg) -> bool:
    return (
        cfg.version >= 5
        and cfg.tiny_att_dim <= 0
        and cfg.pre_ffn <= 0
        and cfg.dropout == 0.0
    )


def rwkv_forward_collect(
    params: Dict, cfg, tokens: jax.Array, state: Optional[Dict] = None
) -> Tuple[jax.Array, Dict]:
    """tokens (B, T) -> (logits (B, T, V), per-position states).

    The returned dict has the canonical ModelState keys with a leading
    T axis: {att_shift: (T, L, B, C), wkv: (T, L, B, <packed>),
    ffn_shift: (T, L, B, C)}; index t is the state after consuming
    tokens[:, :t+1]. select_state(states, j) extracts one position in
    the exact layout rwkv_forward carries.
    """
    assert collect_supported(cfg), "collect forward: unsupported config"
    B, T = tokens.shape
    H, N = cfg.n_head, cfg.head_size
    if state is None:
        state = init_model_state(cfg, B)
    dt = cfg.compute_dtype
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)

    shifts_att, wkvs, shifts_ffn = [], [], []
    for i, bp in enumerate(params["blocks"]):
        att_shift = state["att_shift"][i]
        wkv_state = unpack_wkv(state["wkv"][i], N)
        ffn_shift = state["ffn_shift"][i]
        if i == 0 and "ln0" in bp:
            x = layer_norm(x, bp["ln0"])
        p = bp["att"]
        xln1 = layer_norm(x, bp["ln1"])
        if cfg.version >= 6:
            r, k, v, g, w = tmix_v6_projections(p, cfg, xln1, att_shift)
            y, S_all = wkv_collect(
                r.reshape(B, T, H, N), k.reshape(B, T, H, N),
                v.reshape(B, T, H, N), w.reshape(B, T, H, N),
                p["time_faaaa"], wkv_state,
            )
            att_out = tmix_v6_output(p, cfg, y.reshape(B, T, -1), g)
        else:
            # v5: per-channel constant decay; reuse the standard time-mix
            # for y, then rerun the scan for the state stack
            att_out, _, _ = time_mix_v5(
                p, cfg, xln1, att_shift, wkv_state,
                wkv_backend="reference",
            )
            r5, k5, v5, w5 = _v5_projections(p, cfg, xln1, att_shift)
            _, S_all = wkv_collect(
                r5, k5, v5, w5, p["time_faaaa"], wkv_state
            )
        x = x + att_out
        xln2 = layer_norm(x, bp["ln2"])
        if cfg.ffn_type == "mishglu" and "aa" in bp["ffn"]:
            ffn_out, _ = mish_glu(bp["ffn"], cfg, xln2, ffn_shift)
        else:
            ffn_out, _ = channel_mix(
                bp["ffn"], cfg, xln2, ffn_shift, v6=cfg.version >= 6
            )
        x = x + ffn_out
        shifts_att.append(jnp.moveaxis(xln1, 1, 0).astype(jnp.float32))
        wkvs.append(pack_wkv(S_all))           # (T, B, <packed>)
        shifts_ffn.append(jnp.moveaxis(xln2, 1, 0).astype(jnp.float32))

    x = layer_norm(x, params["ln_out"])
    logits = proj(x, params["head"], dt)
    states = {
        "att_shift": jnp.stack(shifts_att, axis=1),   # (T, L, B, C)
        "wkv": jnp.stack(wkvs, axis=1),
        "ffn_shift": jnp.stack(shifts_ffn, axis=1),
    }
    return logits, states


def _v5_projections(p, cfg, x, att_shift):
    """(r,k,v,w) for v5 in wkv_collect's (B,T,H,N) convention, with the
    per-channel decay broadcast over T (gate not needed for the state)."""
    from rwkv_lm_ext_tpu.models.rwkv import _token_shift

    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = x.dtype
    prev = _token_shift(x, att_shift)

    def lerp(mix):
        m = p[mix].astype(dt)
        return x * m + prev * (1 - m)

    r = proj(lerp("time_mix_r"), p["receptance"], dt).reshape(B, T, H, N)
    k = proj(lerp("time_mix_k"), p["key"], dt).reshape(B, T, H, N)
    v = proj(lerp("time_mix_v"), p["value"], dt).reshape(B, T, H, N)
    w = jnp.broadcast_to(
        p["time_decay"].astype(jnp.float32).reshape(1, 1, H, N), (B, T, H, N)
    )
    return r, k, v, w


def select_state(states: Dict, j) -> Dict:
    """states (from rwkv_forward_collect) + position index j (int or
    scalar array; traced — one compile covers all j) -> the canonical
    ModelState after consuming j+1 tokens."""
    j = jnp.asarray(j, jnp.int32)
    return {
        k: jax.lax.dynamic_index_in_dim(v, j, 0, keepdims=False)
        for k, v in states.items()
    }
