"""Mesh + sharding rules for RWKV on TPU.

Parallelism model:
- ``dp`` axis: data parallel — batch dim of tokens/state sharded; gradient
  all-reduce inserted by XLA (the DeepSpeed-ZeRO-2 replacement; optimizer
  state is additionally sharded over dp by train.loop.place_train_state).
- ``tp`` axis: head-parallel tensor parallel — RWKV's WKV recurrence and
  its ln_x GroupNorm are independent per head, so sharding dim_att across
  ``tp`` splits every attention matmul column/row-wise with a single
  all-reduce at the output projection (inserted by GSPMD). The FFN shards
  over dim_ffn the same way.

The reference has no TP/PP at all (SURVEY §2.4) — this is a TPU-native
extension, exercised by tests/test_parallel.py on a virtual CPU mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    devices = devices[: dp * tp]
    return Mesh(np.array(devices).reshape(dp, tp), ("dp", "tp"))


def _att_spec(name: str, leaf) -> P:
    """PartitionSpecs for time-mix parameters (head-parallel over tp)."""
    if name in ("receptance", "key", "value", "gate"):
        return P(None, "tp")          # (C, A): column parallel
    if name == "output":
        return P("tp", None)          # (A, C): row parallel
    if name == "time_decay" and leaf.ndim == 1:
        return P("tp")                # (A,)
    if name == "time_decay_w2":
        return P(None, "tp")          # (Dd, A)
    if name in ("time_faaaa", "time_state"):
        return P("tp")                # (H, ...) heads sharded
    if name == "time_decay" and leaf.ndim == 2:
        return P("tp")                # v5 (H, N)
    return P()                        # replicate small vectors


def _ffn_spec(name: str, leaf) -> P:
    if name == "key":
        return P(None, "tp")          # (C, F)
    if name == "value":
        return P("tp", None)          # (F, C)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for the whole parameter tree."""

    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        spec = P()
        if "att" in keys:
            name = keys[keys.index("att") + 1]
            if name == "ln_x":
                spec = P("tp")
            elif isinstance(name, str):
                spec = _att_spec(name, leaf)
        elif "ffn" in keys:
            name = keys[keys.index("ffn") + 1]
            if isinstance(name, str):
                spec = _ffn_spec(name, leaf)
        elif keys[-1] == "head":
            spec = P(None, "tp")      # (C, V)
        # emb / layer norms / time vectors replicate
        if mesh.shape["tp"] == 1 and spec != P():
            spec = P()
        # divisibility guard: quantized leaves flatten into (q, scale)
        # children that inherit the weight's spec — a (1, C) int8 scale
        # can't divide a tp-sharded leading axis, and 4-bit leaves are
        # block-packed. Sharding is layout, not semantics: dropping a
        # non-divisible axis to replicated is always correct.
        if spec != P():
            shape = getattr(leaf, "shape", ())
            fixed = []
            for ax, name_ in enumerate(spec):
                if ax >= len(shape):
                    break  # spec longer than the (packed) leaf's rank
                ok = name_ is None or shape[ax] % mesh.shape[name_] == 0
                fixed.append(name_ if ok else None)
            spec = P(*fixed) if any(fixed) else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_shardings(mesh: Mesh, tree):
    """Shard the leading (batch) axis of every leaf over dp."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("dp")), tree
    )


def state_shardings(mesh: Mesh, state):
    """Model state: batch axis (axis 1 after the layer axis) over dp, WKV
    head axis over tp. Axes that don't divide (e.g. the B=1 admission
    prefill of a continuous batcher on a dp>1 mesh) replicate — sharding
    is layout, not semantics."""

    def assign(path, leaf):
        key = path[0].key
        spec = (
            P(None, "dp", "tp") if key == "wkv"   # (L, B, H, ...)
            else P(None, "dp")                    # (L, B, C)
        )
        fixed = [
            name if name is None or leaf.shape[ax] % mesh.shape[name] == 0
            else None
            for ax, name in enumerate(spec)
        ]
        return NamedSharding(mesh, P(*fixed) if any(fixed) else P())

    return jax.tree_util.tree_map_with_path(assign, state)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
