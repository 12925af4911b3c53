"""Optimizer: AdamW with the reference's layerwise-lr groups + schedules.

Replaces configure_optimizers (src/model.py:1007-1076) and the
warmup/decay schedule logic of src/trainer.py:60-104 /
peft_train/Callbacks.py:36-93 with an optax chain. Name-pattern rules
(non-pile branch, the one every trainer in the reference uses):
  _w1/_w2            -> 1x
  time_mix/time_maa  -> 1x
  time_decay         -> 2x
  time_faaaa         -> 1x
  time_first         -> 3x
  ndim>=2 & wd>0     -> weight-decay group (1x)
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from rwkv_lm_ext_tpu.config import TrainConfig


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def lr_scale_labels(params) -> Any:
    """'1x' | '2x' | '3x' per leaf (reference lr groups)."""

    def label(path, leaf):
        name = _path_str(path)
        if "_w1" in name or "_w2" in name:
            return "1x"
        if "time_mix" in name or "time_maa" in name:
            return "1x"
        if "time_decay" in name:
            return "2x"
        if "time_faaaa" in name:
            return "1x"
        if "time_first" in name:
            return "3x"
        return "1x"

    return jax.tree_util.tree_map_with_path(label, params)


def decay_mask(params) -> Any:
    """True where weight decay applies (ndim >= 2, reference rule)."""
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


def make_schedule(tc: TrainConfig) -> Callable[[jax.Array], jax.Array]:
    """warmup (0.2 + 0.8*t/w, src/trainer.py:63-66) then decay to lr_final."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = max(tc.warmup_steps, 1)
        warm = (0.2 + 0.8 * step / w) * tc.lr_init
        progress = jnp.clip(
            (step - tc.warmup_steps)
            / max(tc.total_steps - tc.warmup_steps, 1),
            0.0,
            1.0,
        )
        if tc.lr_schedule == "cosine":
            decayed = tc.lr_final + 0.5 * (tc.lr_init - tc.lr_final) * (
                1 + jnp.cos(jnp.pi * progress)
            )
        elif tc.lr_schedule == "exp":
            ratio = tc.lr_final / tc.lr_init
            decayed = tc.lr_init * ratio**progress
        elif tc.lr_schedule == "linear":
            decayed = tc.lr_init + (tc.lr_final - tc.lr_init) * progress
        else:
            decayed = jnp.asarray(tc.lr_init)
        return jnp.where(step < tc.warmup_steps, warm, decayed)

    return schedule


def _scale_by_leaf_multiplier(mults) -> optax.GradientTransformation:
    """One elementwise multiply per leaf whose multiplier != 1 (the lr
    groups); leaves at 1x pass through untouched."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        out = jax.tree_util.tree_map(
            lambda u, m: u if m == 1.0 else u * m, updates, mults
        )
        return out, state

    return optax.GradientTransformation(init, update)


def make_optimizer(tc: TrainConfig, params) -> optax.GradientTransformation:
    """AdamW chain. The clip+adam core runs FLATTENED (optax.flatten):
    per-leaf optimizer math on a ~400-leaf adapter tree emits thousands
    of tiny fusions that cost real wall-clock on TPU (measured +73 ms
    per 1B6 LoRA step vs the grads-only program, scripts/ablate_train);
    on one raveled vector it is a handful of large ops. The masked
    lr-group scales of r3 are gone too: groups are a per-leaf STATIC
    multiplier now, skipped entirely when every leaf is 1x (always true
    for LoRA adapter trees — no time_* leaves)."""
    schedule = make_schedule(tc)
    labels = lr_scale_labels(params) if tc.layerwise_lr else None

    core = [optax.clip_by_global_norm(tc.grad_clip)] if tc.grad_clip > 0 else []
    core.append(
        optax.scale_by_adam(b1=tc.beta1, b2=tc.beta2, eps=tc.adam_eps)
    )
    # flatten only for small (adapter-sized) trees: ravel_pytree promotes
    # mixed dtypes to fp32 and a single flat m/v vector defeats the
    # per-leaf ZeRO dp-sharding — both fine for a ~25 MB LoRA/state
    # adapter, wrong trades for a multi-GB full fine-tune.
    n_bytes = sum(
        leaf.size * getattr(leaf, "dtype", jnp.float32).itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "size")
    )
    if n_bytes <= 200 * 1024 * 1024:
        chain = [optax.flatten(optax.chain(*core))]
    else:
        chain = list(core)
    if tc.weight_decay > 0:
        chain.append(
            optax.add_decayed_weights(tc.weight_decay, mask=decay_mask(params))
        )
    if labels is not None:
        mult_of = {"1x": 1.0, "2x": 2.0, "3x": 3.0}
        mults = jax.tree_util.tree_map(lambda l: mult_of[l], labels)
        if any(m != 1.0 for m in jax.tree_util.tree_leaves(mults)):
            chain.append(_scale_by_leaf_multiplier(mults))
    chain.append(optax.scale_by_schedule(schedule))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


def trainable_mask(params, train_type: str = "full") -> Any:
    """Which leaves train (the reference's requires_grad filters,
    peft_train/peft_train_sft.py:318-398):
      'full'   - everything
      'lora'   - leaves under a 'lora' subtree + time_* vectors
      'states' - only att.time_state leaves
    """

    def label(path, leaf):
        name = _path_str(path)
        if train_type == "full":
            return True
        if train_type in ("states", "state"):
            return "time_state" in name
        if train_type in ("lora", "pissa"):
            return (
                "lora" in name
                or "time_state" in name
                or name.startswith("head_")
            )
        raise ValueError(train_type)

    return jax.tree_util.tree_map_with_path(label, params)


def apply_trainable_mask(
    tx: optax.GradientTransformation, mask
) -> optax.GradientTransformation:
    """Zero updates for frozen leaves."""
    frozen = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
