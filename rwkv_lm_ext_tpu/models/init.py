"""Parameter initialization.

Reproduces the reference's init scheme: the per-module "fancy" time-mix /
decay initializations (src/model.py:376-477, :616-644) and the global
orthogonal/zero/uniform rules of RWKV.generate_init_weight
(src/model.py:1291-1358). Kernels are stored (in, out) — x @ W — i.e. the
transpose of torch Linear's (out, in).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _ln(C, dtype):
    return {
        "scale": jnp.ones((C,), dtype),
        "bias": jnp.zeros((C,), dtype),
    }


_FAST_INIT = False  # scaled-normal instead of orthogonal (benchmarks only)


def _orthogonal(key, in_dim, out_dim, gain, dtype):
    if _FAST_INIT:
        std = gain / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
        return (jax.random.normal(key, (in_dim, out_dim), jnp.float32) * std).astype(dtype)
    init = jax.nn.initializers.orthogonal(scale=gain)
    return init(key, (in_dim, out_dim), jnp.float32).astype(dtype)


def _att_params_v6(key, cfg, layer_id: int, dtype) -> Dict:
    C, A = cfg.n_embd, cfg.dim_att
    H, N = cfg.n_head, cfg.head_size
    nl = cfg.n_layer
    r01 = layer_id / max(nl - 1, 1)
    r10 = 1.0 - layer_id / nl
    ddd = np.arange(C, dtype=np.float64) / C

    maa = lambda e: jnp.asarray(1.0 - np.power(ddd, e), dtype)
    Dm = cfg.time_mix_extra_dim
    Dd = cfg.time_decay_extra_dim

    decay_speed = np.array(
        [
            -6 + 5 * (n / max(A - 1, 1)) ** (0.7 + 1.3 * r01)
            for n in range(A)
        ]
    )
    zigzag = np.array([((n + 1) % 3 - 1) * 0.1 for n in range(A)])
    faaaa = r01 * (1 - np.arange(A) / max(A - 1, 1)) + zigzag

    ks = jax.random.split(key, 9)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -1e-4, 1e-4).astype(dtype)
    # orthogonal gains per generate_init_weight: sqrt(out/in) if out > in
    gain_rkvg = float(np.sqrt(A / C)) if A > C else 1.0
    return {
        "time_maa_x": maa(r10),
        "time_maa_w": maa(r10),
        "time_maa_k": maa(r10),
        "time_maa_v": jnp.asarray(
            1.0 - (np.power(ddd, r10) + 0.3 * r01), dtype
        ),
        "time_maa_r": maa(0.5 * r10),
        "time_maa_g": maa(0.5 * r10),
        "time_maa_w1": u(ks[0], (C, Dm * 5)),
        "time_maa_w2": u(ks[1], (5, Dm, C)),
        "time_decay": jnp.asarray(decay_speed, dtype),
        "time_decay_w1": u(ks[2], (C, Dd)),
        "time_decay_w2": u(ks[3], (Dd, A)),
        "time_faaaa": jnp.asarray(faaaa.reshape(H, N), dtype),
        "receptance": _orthogonal(ks[4], C, A, gain_rkvg, dtype),
        "key": _orthogonal(ks[5], C, A, gain_rkvg, dtype),
        "value": _orthogonal(ks[6], C, A, gain_rkvg, dtype),
        "gate": _orthogonal(ks[7], C, A, gain_rkvg, dtype),
        "output": jnp.zeros((A, C), dtype),  # ".att.output." -> zero
        "ln_x": {
            # ln_x.weight = ((1+layer_id)/n_layer) ** 0.7
            "scale": jnp.full((A,), ((1 + layer_id) / nl) ** 0.7, dtype),
            "bias": jnp.zeros((A,), dtype),
        },
    }


def _att_params_v5(key, cfg, layer_id: int, dtype) -> Dict:
    C, A = cfg.n_embd, cfg.dim_att
    H, N = cfg.n_head, cfg.head_size
    nl = cfg.n_layer
    r01 = layer_id / max(nl - 1, 1)
    r10 = 1.0 - layer_id / nl
    ddd = np.arange(C, dtype=np.float64) / C
    mix = lambda e: jnp.asarray(np.power(ddd, e), dtype)

    decay_speed = np.array(
        [-6 + 5 * (n / max(A - 1, 1)) ** (0.7 + 1.3 * r01) for n in range(A)]
    )
    zigzag = np.array([((n + 1) % 3 - 1) * 0.1 for n in range(A)])
    faaaa = r01 * (1 - np.arange(A) / max(A - 1, 1)) + zigzag

    ks = jax.random.split(key, 5)
    gain = float(np.sqrt(A / C)) if A > C else 1.0
    return {
        "time_mix_k": mix(r10),
        "time_mix_v": jnp.asarray(np.power(ddd, r10) + 0.3 * r01, dtype),
        "time_mix_r": mix(0.5 * r10),
        "time_mix_g": mix(0.5 * r10),
        "time_decay": jnp.asarray(decay_speed.reshape(H, N), dtype),
        "time_faaaa": jnp.asarray(faaaa.reshape(H, N), dtype),
        "receptance": _orthogonal(ks[0], C, A, gain, dtype),
        "key": _orthogonal(ks[1], C, A, gain, dtype),
        "value": _orthogonal(ks[2], C, A, gain, dtype),
        "gate": _orthogonal(ks[3], C, A, gain, dtype),
        "output": jnp.zeros((A, C), dtype),
        "ln_x": _ln(A, dtype),
    }


def _ffn_params(key, cfg, layer_id: int, dtype) -> Dict:
    C, F = cfg.n_embd, cfg.dim_ffn
    r10 = 1.0 - layer_id / cfg.n_layer
    ddd = np.arange(C, dtype=np.float64) / C
    gain_key = float(np.sqrt(F / C)) if F > C else 1.0
    k1, = jax.random.split(key, 1)
    p = {
        "key": _orthogonal(k1, C, F, gain_key, dtype),
        "value": jnp.zeros((F, C), dtype),        # ".ffn.value." -> zero
        "receptance": jnp.zeros((C, C), dtype),   # ".ffn.receptance." -> zero
    }
    if cfg.version >= 6:
        p["time_maa_k"] = jnp.asarray(1.0 - np.power(ddd, r10), dtype)
        p["time_maa_r"] = jnp.asarray(1.0 - np.power(ddd, r10), dtype)
    else:
        p["time_mix_k"] = jnp.asarray(np.power(ddd, r10), dtype)
        p["time_mix_r"] = jnp.asarray(np.power(ddd, r10), dtype)
    return p


def init_rwkv_params(
    key: jax.Array,
    cfg,
    *,
    emb_init_scale: float = 1e-4,
    with_state_params: bool = False,
    fast_init: bool = False,
) -> Dict:
    """Build a full parameter tree (fresh model).

    with_state_params: add a zero (H,N,N) att.time_state per block — the
    state-tuning parameter (src/model.py:481-584 RWKV_Tmix_x060_state).
    fast_init: scaled-normal instead of orthogonal projections (for
    benchmarks / smoke tests where init statistics don't matter).
    """
    global _FAST_INIT
    if fast_init:
        _FAST_INIT = True
    try:
        return _init_rwkv_params(
            key, cfg,
            emb_init_scale=emb_init_scale,
            with_state_params=with_state_params,
        )
    finally:
        _FAST_INIT = False


def _init_rwkv_params(
    key: jax.Array,
    cfg,
    *,
    emb_init_scale: float = 1e-4,
    with_state_params: bool = False,
) -> Dict:
    dtype = cfg.params_dtype
    keys = jax.random.split(key, cfg.n_layer + 2)
    blocks = []
    for i in range(cfg.n_layer):
        bk = jax.random.split(keys[i], 5)
        att = (
            _att_params_v6(bk[0], cfg, i, dtype)
            if cfg.version >= 6
            else _att_params_v5(bk[0], cfg, i, dtype)
        )
        if with_state_params:
            att["time_state"] = jnp.zeros(
                (cfg.n_head, cfg.head_size, cfg.head_size), dtype
            )
        if cfg.ffn_type == "mishglu":
            C, F = cfg.n_embd, cfg.dim_ffn
            r10 = 1.0 - i / cfg.n_layer
            ddd = np.arange(C, dtype=np.float64) / C
            gain = float(np.sqrt(F / C)) if F > C else 1.0
            mk = jax.random.split(bk[1], 2)
            ffn = {
                "time_mix_k": jnp.asarray(np.power(ddd, r10), dtype),
                "time_mix_r": jnp.asarray(np.power(ddd, r10), dtype),
                "aa": _orthogonal(mk[0], C, F, gain, dtype),
                "bb": _orthogonal(mk[1], C, F, gain, dtype),
                "value": jnp.zeros((F, C), dtype),
            }
        else:
            ffn = _ffn_params(bk[1], cfg, i, dtype)
        block = {
            "ln1": _ln(cfg.n_embd, dtype),
            "ln2": _ln(cfg.n_embd, dtype),
            "att": att,
            "ffn": ffn,
        }
        if i == 0:
            block["ln0"] = _ln(cfg.n_embd, dtype)
            if cfg.my_pos_emb > 0:
                block["pos_emb_x"] = jnp.zeros(
                    (cfg.my_pos_emb, cfg.n_embd), dtype
                )
                block["pos_emb_y"] = jnp.zeros(
                    (cfg.my_pos_emb, cfg.n_embd), dtype
                )
            if cfg.pre_ffn > 0:
                block["ffn_pre"] = _ffn_params(bk[2], cfg, 0, dtype)
                block["ffn_pre"]["time_mix_k"] = block["ffn_pre"].pop(
                    "time_maa_k", jnp.zeros((cfg.n_embd,), dtype)
                )
                block["ffn_pre"]["time_mix_r"] = block["ffn_pre"].pop(
                    "time_maa_r", jnp.zeros((cfg.n_embd,), dtype)
                )
        if cfg.tiny_att_dim > 0 and i == cfg.tiny_att_layer:
            tk = jax.random.split(bk[3], 3)
            block["tiny_ln"] = _ln(cfg.n_embd, dtype)
            block["tiny_q"] = jnp.zeros((cfg.n_embd, cfg.tiny_att_dim), dtype)
            block["tiny_k"] = _orthogonal(
                tk[0], cfg.n_embd, cfg.tiny_att_dim, 0.1, dtype
            )
            block["tiny_v"] = _orthogonal(
                tk[1], cfg.n_embd, cfg.n_embd, 1.0, dtype
            )
        blocks.append(block)

    emb = jax.random.uniform(
        keys[-2],
        (cfg.vocab_size, cfg.n_embd),
        jnp.float32,
        -emb_init_scale,
        emb_init_scale,
    ).astype(dtype)
    head = _orthogonal(keys[-1], cfg.n_embd, cfg.vocab_size, 0.5, dtype)
    params = {
        "emb": emb,
        "blocks": blocks,
        "ln_out": _ln(cfg.n_embd, dtype),
        "head": head,
    }
    if cfg.head_qk > 0:
        hk = jax.random.split(keys[-1], 3)
        params["head_q"] = jnp.zeros((cfg.n_embd, cfg.head_qk), dtype)
        params["head_k"] = _orthogonal(
            hk[1], cfg.n_embd, cfg.head_qk, 0.1, dtype
        )
    return params
