"""Conversion between the BlinkDL flat key schema and our parameter tree.

Torch stores Linear weights (out, in); we store (in, out) for `x @ W`.
LayerNorm/GroupNorm weight/bias become scale/bias. (1,1,C) time-mix
vectors flatten to (C,). Key schema per SURVEY.md §5 (checkpoint/resume):
``blocks.{i}.att.{time_maa_*, time_decay[_w1/w2], time_faaaa,
receptance/key/value/gate/output.weight, ln_x.*}``, ``blocks.{i}.ffn.*``,
``emb.weight``, ``ln_out.*``, ``head.weight``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.checkpoint.pth import (
    load_torch_pth,
    sniff_model_config,
    strip_prefix,
)

_ATT_VECS_V6 = ("time_maa_x", "time_maa_w", "time_maa_k", "time_maa_v",
                "time_maa_r", "time_maa_g")
_ATT_VECS_V5 = ("time_mix_k", "time_mix_v", "time_mix_r", "time_mix_g")
_LINEARS_ATT = ("receptance", "key", "value", "gate", "output")
_LINEARS_FFN = ("key", "value", "receptance")


def _f(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def state_dict_to_params(
    sd: Dict[str, np.ndarray], cfg, *, dtype: Optional[str] = None
) -> Dict:
    """Build the parameter tree rwkv_forward expects from a flat torch
    state dict (already prefix-stripped)."""
    dt = jnp.dtype(dtype or cfg.param_dtype)
    H, N, A = cfg.n_head, cfg.head_size, cfg.dim_att

    def g(key):
        return sd[key]

    def lin(key):
        return jnp.asarray(_f(g(key)).T, dt)

    def vec(key):
        return jnp.asarray(_f(g(key)).reshape(-1), dt)

    def ln(prefix):
        return {
            "scale": jnp.asarray(_f(g(prefix + ".weight")), dt),
            "bias": jnp.asarray(_f(g(prefix + ".bias")), dt),
        }

    blocks = []
    for i in range(cfg.n_layer):
        b = f"blocks.{i}."
        att: Dict = {}
        if cfg.version >= 6:
            for name in _ATT_VECS_V6:
                att[name] = vec(b + f"att.{name}")
            att["time_maa_w1"] = jnp.asarray(_f(g(b + "att.time_maa_w1")), dt)
            att["time_maa_w2"] = jnp.asarray(_f(g(b + "att.time_maa_w2")), dt)
            att["time_decay"] = vec(b + "att.time_decay")
            att["time_decay_w1"] = jnp.asarray(_f(g(b + "att.time_decay_w1")), dt)
            att["time_decay_w2"] = jnp.asarray(_f(g(b + "att.time_decay_w2")), dt)
        elif cfg.version >= 5:
            for name in _ATT_VECS_V5:
                if b + f"att.{name}" in sd:
                    att[name] = vec(b + f"att.{name}")
            td = _f(g(b + "att.time_decay"))
            if td.size == A:
                td = td.reshape(H, N)
            else:  # per-head scalar decay (v5.0/5.1)
                td = np.broadcast_to(td.reshape(H, 1), (H, N)).copy()
            att["time_decay"] = jnp.asarray(td, dt)
        else:
            # v4: per-channel (C,) decay/bonus, static lerp vectors
            for name in ("time_mix_k", "time_mix_v", "time_mix_r"):
                att[name] = vec(b + f"att.{name}")
            att["time_decay"] = vec(b + "att.time_decay")
            att["time_first"] = vec(b + "att.time_first")
        if cfg.version >= 5:
            faaaa_key = (
                b + "att.time_faaaa"
                if b + "att.time_faaaa" in sd
                else b + "att.time_first"
            )
            att["time_faaaa"] = jnp.asarray(_f(g(faaaa_key)).reshape(H, N), dt)
        for name in _LINEARS_ATT:
            if b + f"att.{name}.weight" in sd:
                att[name] = lin(b + f"att.{name}.weight")
        if b + "att.ln_x.weight" in sd:
            att["ln_x"] = ln(b + "att.ln_x")
        if b + "att.time_state" in sd:
            att["time_state"] = jnp.asarray(
                _f(g(b + "att.time_state")).reshape(H, N, N), dt
            )

        ffn: Dict = {}
        for name in ("time_maa_k", "time_maa_r", "time_mix_k", "time_mix_r"):
            if b + f"ffn.{name}" in sd:
                ffn[name] = vec(b + f"ffn.{name}")
        for name in _LINEARS_FFN:
            ffn[name] = lin(b + f"ffn.{name}.weight")

        block = {"ln1": ln(b + "ln1"), "ln2": ln(b + "ln2"), "att": att, "ffn": ffn}
        if b + "ln0.weight" in sd:
            block["ln0"] = ln(b + "ln0")
        blocks.append(block)

    params = {
        "emb": jnp.asarray(_f(g("emb.weight")), dt),
        "blocks": blocks,
        "ln_out": ln("ln_out"),
    }
    if "head.weight" in sd:
        params["head"] = lin("head.weight")
    return params


def params_to_state_dict(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of state_dict_to_params (fp32 numpy, torch key schema)."""
    sd: Dict[str, np.ndarray] = {}

    def putln(prefix, p):
        sd[prefix + ".weight"] = _f(p["scale"])
        sd[prefix + ".bias"] = _f(p["bias"])

    sd["emb.weight"] = _f(params["emb"])
    for i, block in enumerate(params["blocks"]):
        b = f"blocks.{i}."
        if "ln0" in block:
            putln(b + "ln0", block["ln0"])
        putln(b + "ln1", block["ln1"])
        putln(b + "ln2", block["ln2"])
        att = block["att"]
        for name, v in att.items():
            if name == "ln_x":
                putln(b + "att.ln_x", v)
            elif name in _LINEARS_ATT:
                sd[b + f"att.{name}.weight"] = _f(v).T
            elif (
                (name.startswith("time_maa_") or name.startswith("time_mix_"))
                and _f(v).ndim == 1
            ):
                sd[b + f"att.{name}"] = _f(v).reshape(1, 1, -1)
            elif name == "time_decay" and cfg.version >= 6:
                sd[b + f"att.{name}"] = _f(v).reshape(1, 1, -1)
            else:
                sd[b + f"att.{name}"] = _f(v)
        ffn = block["ffn"]
        for name, v in ffn.items():
            if name in _LINEARS_FFN:
                sd[b + f"ffn.{name}.weight"] = _f(v).T
            else:
                sd[b + f"ffn.{name}"] = _f(v).reshape(1, 1, -1)
    putln("ln_out", params["ln_out"])
    if "head" in params:
        sd["head.weight"] = _f(params["head"]).T
    return sd


def extract_encoder_from_mae(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Drop the one-layer-decoder keys from a MAE checkpoint, leaving a
    plain encoder (train_scripts/extract_encoder_from_mae.py)."""
    return {
        k: v
        for k, v in state_dict.items()
        if not k.startswith("onelayer_decoder.")
    }


def load_rwkv_checkpoint(path: str, wkv_dispatch: str = "auto",
                         **cfg_overrides):
    """One-call loader: .pth -> (params, ModelConfig). Replaces the
    reference's load_ckpt_and_parse_args + load_state_dict pattern.
    cfg_overrides are ModelConfig fields (e.g. dtype="float32"); params are
    cast to the resulting cfg.param_dtype.

    wkv_dispatch="auto" bounds the checkpoint's decay and picks the
    fastest exact WKV kernel path (models.rwkv.suggest_wkv_dispatch);
    "exact" keeps the any-decay default, e.g. for training runs expected
    to move the decay bound substantially."""
    sd = strip_prefix(load_torch_pth(path))
    cfg = sniff_model_config(sd, **cfg_overrides)
    params = state_dict_to_params(sd, cfg)
    if (wkv_dispatch == "auto" and "wkv_exact" not in cfg_overrides
            and cfg.version >= 5):
        # v4 runs the aa/bb/pp log-space kernel — nothing to dispatch on
        from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

        cfg = apply_wkv_dispatch(cfg, params)
    return params, cfg
