"""T=1-specialized decode step: the whole layer stack on (B, C) arrays.

The generic rwkv_forward at T=1 runs every op on (B, 1, C) tensors.
This path drops the T axis entirely: token shift is just the carried
(B, C) row, the ddlerp/projection chain runs on (B, C), and the WKV
update is the tile-packed decode op (ops/wkv_decode.py) it already
matches shape-for-shape.

Measured at 1B6 B=64 on v5e this is PERF-NEUTRAL vs the generic path
(11.25 vs ~11 ms/step) — XLA handles the singleton T dim fine, so the
residual non-state decode cost is fusion/scheduling granularity, not
shape bookkeeping. Kept as the explicit decode surface: it is the
natural seed for whole-block decode fusion and for layer-streamed
serving, and its parity test pins the T=1 semantics independently.

Semantics are identical to rwkv_forward(tokens[:, None]) — the parity
test drives both and compares logits AND carried state. Falls back
implicitly: engines call decode_supported(cfg, params) and use
rwkv_forward for exotic configs (tiny attention, pre-ffn, MishGLU,
head_qk, pos_emb, v5) — the same option set the scan-over-layers
forward excludes.

Reference: the decode semantics are cuda/rwkv6.cu:23-60 +
src/model_run.py:130-621 (streaming blocks); this file is their
TPU-shaped fusion surface.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.models.rwkv import as_weight, proj
from rwkv_lm_ext_tpu.models.state import ModelState, init_model_state


def decode_supported(cfg, params: Dict) -> bool:
    """True when the specialized step covers this config (plain v6 block
    stack, flat param tree, packable head geometry)."""
    from rwkv_lm_ext_tpu.ops.wkv_decode import decode_packable

    return (
        cfg.version >= 6
        and "blocks" in params
        and cfg.tiny_att_dim <= 0
        and cfg.pre_ffn == 0
        and cfg.head_qk == 0
        and cfg.my_pos_emb == 0
        and cfg.ffn_type != "mishglu"
        and cfg.dropout == 0
        and decode_packable(cfg.head_size)
    )


def _ln(x: jax.Array, p: Dict, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _att_step_fused(
    p: Dict, lnp: Dict, cfg, x: jax.Array, shift: jax.Array,
    wkv_packed: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused-prologue variant of _att_step: ln1 + shift + ddlerp + decay
    run as ONE Pallas program (ops/decode_fused.py), leaving only the four
    projections, the packed WKV step and the output projection to XLA.
    Takes the RAW residual stream x (the kernel owns the ln1)."""
    from rwkv_lm_ext_tpu.ops.decode_fused import att_prep_fused
    from rwkv_lm_ext_tpu.ops.wkv_decode import wkv6_decode_step_packed

    dt = x.dtype
    f = jnp.float32
    maas = jnp.stack([
        as_weight(p[k], f) for k in (
            "time_maa_x", "time_maa_w", "time_maa_k",
            "time_maa_v", "time_maa_r", "time_maa_g",
        )
    ])
    xr, xk, xv, xg, w, xn = att_prep_fused(
        x,
        shift,
        lnp["scale"], lnp["bias"],
        maas,
        as_weight(p["time_maa_w1"], dt),
        as_weight(p["time_maa_w2"], dt),
        as_weight(p["time_decay_w1"], f),
        as_weight(p["time_decay_w2"], f),
        as_weight(p["time_decay"], f),
        1e-5,
    )
    r = proj(xr, p["receptance"], dt)
    k = proj(xk, p["key"], dt)
    v = proj(xv, p["value"], dt)
    g = jax.nn.silu(proj(xg, p["gate"], dt))
    gated, new_wkv = wkv6_decode_step_packed(
        r, k, v, w, g,
        p["time_faaaa"],
        p["ln_x"]["scale"], p["ln_x"]["bias"],
        wkv_packed,
        eps=cfg.ln_x_eps,
    )
    return proj(gated, p["output"], dt), xn, new_wkv


def _ffn_step_fused(
    p: Dict, lnp: Dict, cfg, x: jax.Array, shift: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Whole-block fused channel mix: ln2 + shift + mix + all three
    GEMMs + gated residual in ONE Pallas program (ffn_block_fused),
    weights streamed through VMEM. Quantized weight leaves fall back to
    the fused-prologue + XLA-proj path (proj owns dequantization).
    Returns (x + ffn_out, new shift) — the residual is folded in."""
    from rwkv_lm_ext_tpu.ops.decode_fused import (
        ffn_block_fused,
        ffn_prep_fused,
    )

    dt = x.dtype
    plain = all(
        isinstance(p[nm], jax.Array) for nm in ("key", "value", "receptance")
    )
    if plain:
        return ffn_block_fused(
            x, shift, lnp["scale"], lnp["bias"],
            as_weight(p["time_maa_k"], jnp.float32),
            as_weight(p["time_maa_r"], jnp.float32),
            p["key"].astype(dt), p["value"].astype(dt),
            p["receptance"].astype(dt),
            1e-5,
        )
    xk, xr, xn = ffn_prep_fused(
        x, shift, lnp["scale"], lnp["bias"],
        as_weight(p["time_maa_k"], jnp.float32),
        as_weight(p["time_maa_r"], jnp.float32),
        1e-5,
    )
    k = jnp.square(jax.nn.relu(proj(xk, p["key"], dt)))
    kv = proj(k, p["value"], dt)
    out = jax.nn.sigmoid(proj(xr, p["receptance"], dt)) * kv
    return x + out.astype(dt), xn


def _att_step(
    p: Dict, cfg, xa: jax.Array, shift: jax.Array, wkv_packed: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One time-mix on (B, C): ddlerp + projections + packed WKV step +
    output projection. xa is the ln1 output; shift the previous ln1 row."""
    from rwkv_lm_ext_tpu.ops.wkv_decode import wkv6_decode_step_packed

    B, C = xa.shape
    dt = xa.dtype
    prev = shift.astype(dt)
    xx = prev - xa

    xxx = xa + xx * p["time_maa_x"].astype(dt)
    m = jnp.tanh(xxx @ p["time_maa_w1"].astype(dt))        # (B, 5D)
    D = m.shape[-1] // 5
    m = m.reshape(B, 5, D)
    m = jnp.einsum("bfd,fdc->fbc", m, p["time_maa_w2"].astype(dt))
    mw, mk, mv, mr, mg = m[0], m[1], m[2], m[3], m[4]

    xw = xa + xx * (p["time_maa_w"].astype(dt) + mw)
    xk = xa + xx * (p["time_maa_k"].astype(dt) + mk)
    xv = xa + xx * (p["time_maa_v"].astype(dt) + mv)
    xr = xa + xx * (p["time_maa_r"].astype(dt) + mr)
    xg = xa + xx * (p["time_maa_g"].astype(dt) + mg)

    r = proj(xr, p["receptance"], dt)
    k = proj(xk, p["key"], dt)
    v = proj(xv, p["value"], dt)
    g = jax.nn.silu(proj(xg, p["gate"], dt))

    ww = jnp.tanh(
        xw.astype(jnp.float32) @ p["time_decay_w1"].astype(jnp.float32)
    ) @ p["time_decay_w2"].astype(jnp.float32)
    w = p["time_decay"].astype(jnp.float32) + ww           # (B, C) fp32

    gated, new_wkv = wkv6_decode_step_packed(
        r, k, v, w, g,
        p["time_faaaa"],
        p["ln_x"]["scale"], p["ln_x"]["bias"],
        wkv_packed,
        eps=cfg.ln_x_eps,
    )
    return proj(gated, p["output"], dt), xa.astype(jnp.float32), new_wkv


def _ffn_step(
    p: Dict, cfg, xf: jax.Array, shift: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """v6 channel mix on (B, C). xf is the ln2 output."""
    dt = xf.dtype
    prev = shift.astype(dt)
    xx = prev - xf
    xk = xf + xx * p["time_maa_k"].astype(dt)
    xr = xf + xx * p["time_maa_r"].astype(dt)
    k = jnp.square(jax.nn.relu(proj(xk, p["key"], dt)))
    kv = proj(k, p["value"], dt)
    out = jax.nn.sigmoid(proj(xr, p["receptance"], dt)) * kv
    return out, xf.astype(jnp.float32)


def _fused_prep_ok(B: int) -> bool:
    from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

    return B % 8 == 0 and pallas_available()


def rwkv_decode_step(
    params: Dict,
    cfg,
    tokens: jax.Array,
    state: Optional[ModelState] = None,
    *,
    fused_prep: Optional[bool] = None,
) -> Tuple[jax.Array, ModelState]:
    """One decode step for a batch of streams.

    tokens: (B,) int32 — the current token per stream.
    state: ModelState (canonical packed WKV) or None for zeros.
    fused_prep: run the per-layer glue (ln + shift + ddlerp + decay /
    ln2 + mix) as single Pallas programs (ops/decode_fused.py); None =
    off for now (pending the on-chip measurement — flip the default
    here once scripts/ablate_decode.py shows it winning; pass True to
    opt in, auto-guarded by _fused_prep_ok).
    Returns (logits (B, V), new_state). Equivalent to
    ``rwkv_forward(params, cfg, tokens[:, None], state)`` with the T axis
    removed from every intermediate (use decode_supported to gate)."""
    B = tokens.shape[0]
    if state is None:
        state = init_model_state(cfg, B)
    if fused_prep is None:
        fused_prep = False  # pending on-chip measurement (_fused_prep_ok
        #                     is the auto-gate once the default flips)
    dt = cfg.compute_dtype
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)  # (B, C)

    new_att, new_wkv, new_ffn = [], [], []
    for i, bp in enumerate(params["blocks"]):
        if i == 0 and "ln0" in bp:
            x = _ln(x, bp["ln0"])
        if fused_prep:
            att_out, a_shift, wkv_p = _att_step_fused(
                bp["att"], bp["ln1"], cfg, x,
                state["att_shift"][i], state["wkv"][i],
            )
        else:
            att_out, a_shift, wkv_p = _att_step(
                bp["att"], cfg, _ln(x, bp["ln1"]),
                state["att_shift"][i], state["wkv"][i],
            )
        x = x + att_out
        if fused_prep:
            # _ffn_step_fused folds the residual in (whole-block kernel)
            x, f_shift = _ffn_step_fused(
                bp["ffn"], bp["ln2"], cfg, x, state["ffn_shift"][i]
            )
        else:
            ffn_out, f_shift = _ffn_step(
                bp["ffn"], cfg, _ln(x, bp["ln2"]), state["ffn_shift"][i]
            )
            x = x + ffn_out
        new_att.append(a_shift)
        new_wkv.append(wkv_p)
        new_ffn.append(f_shift)

    new_state = {
        "att_shift": jnp.stack(new_att),
        "wkv": jnp.stack(new_wkv),
        "ffn_shift": jnp.stack(new_ffn),
    }
    x = _ln(x, params["ln_out"])
    logits = proj(x, params["head"], dt)
    return logits, new_state
