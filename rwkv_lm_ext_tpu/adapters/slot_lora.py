"""Per-row (multi-adapter) LoRA: different adapters in ONE batched step.

The reference serves multiple adapters on one base by flipping a global
``active_adapter`` between requests (src/layers.py:171-175) — requests
with different adapters cannot share a batch. Here adapters are STACKED
into batched tensors and every batch row selects its own adapter inside
the same compiled program, so continuous batching can decode a mixed
pool (chat LoRA next to an embedding LoRA next to the pristine base).

TPU-native formulation: for an adapted projection ``y = x @ W``, the
per-row delta is computed for ALL n adapters at once as two small
einsums plus a one-hot selection —

    t = einsum('b...c,acr->ab...r', x, A_stack)
    u = einsum('ab...r,aro->ab...o', t, B_stack)
    y += einsum('ab...o,ba->b...o', u, one_hot(idx))

which is ~n·B·(in+out)·r MACs per projection (trivial next to the base
GEMM's B·in·out at r=8, n small) and — unlike gathering per-row A/B
matrices — moves no weight-sized tensors per step. Adapter id 0 is the
reserved "base only" row (zero stacks). Per-adapter alpha/r differences
are folded at build time (scale into B, rank zero-padded to the max), so
the runtime math is uniform.

PiSSA adapters are rejected: each PiSSA adapter subtracts ITS OWN top-r
SVD from the base weight (adapters.lora.pissa_init), so two of them
cannot share one base tree. Serve those merged (adapters.lora.merge_pissa).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.adapters.lora import LoraConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SlotLoraLeaf:
    """A projection weight plus stacked per-adapter low-rank deltas and
    the per-row adapter index. models.rwkv.proj dispatches on this type
    (slot_apply); the base may itself be quantized (int8c etc. — proj
    recursion handles it)."""

    base: Any             # (in, out) jax.Array or QuantizedTensor
    A: jax.Array          # (n_adapters, in, r_max) — entry 0 is zeros
    B: jax.Array          # (n_adapters, r_max, out), per-adapter scale folded in
    idx: jax.Array        # (rows,) int32 — adapter id per batch row

    def tree_flatten(self):
        return (self.base, self.A, self.B, self.idx), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def slot_apply(self, x: jax.Array, y: jax.Array, dt) -> jax.Array:
        """y (the base projection of x) plus each row's adapter delta.
        x: (rows, ..., in); idx length must equal rows."""
        A = self.A.astype(dt)
        B = self.B.astype(dt)
        t = jnp.einsum("b...c,acr->ab...r", x, A)
        u = jnp.einsum("ab...r,aro->ab...o", t, B)
        onehot = jax.nn.one_hot(self.idx, A.shape[0], dtype=u.dtype)
        return y + jnp.einsum("ab...o,ba->b...o", u, onehot)


def build_slot_lora(
    params: Dict,
    adapters: Dict[str, Dict],
    configs: Union[LoraConfig, Dict[str, LoraConfig]],
    *,
    rows: int = 1,
) -> Tuple[Dict, Dict[str, int]]:
    """Wrap every leaf any adapter targets in a SlotLoraLeaf.

    adapters: {name: adapter tree} (adapters.lora layout,
    {path: {"A", "B"}}). configs: one LoraConfig for all, or per name.
    Returns (slot_params, name_to_id) with name_to_id["base"] == 0.
    The initial idx is zeros((rows,)) — use set_slot_idx per batch."""
    names = list(adapters)
    if isinstance(configs, LoraConfig):
        configs = {n: configs for n in names}
    for n in names:
        if configs[n].pissa:
            raise ValueError(
                f"adapter {n!r} is PiSSA — its base-weight residual cannot "
                "share a base tree; merge it instead (merge_pissa)"
            )
    name_to_id = {"base": 0, **{n: i + 1 for i, n in enumerate(names)}}
    r_max = max((configs[n].r for n in names), default=1)
    keys = sorted({k for n in names for k in adapters[n]})

    out = _shallow_copy(params)
    idx0 = jnp.zeros((rows,), jnp.int32)
    n_total = len(names) + 1
    for keyname in keys:
        base = _get_leaf(out, keyname)
        if keyname in ("emb",):
            raise ValueError(
                "slot-lora cannot adapt the embedding table (it is read "
                "by gather, not proj); drop 'emb' from lc.parts"
            )
        shape = base.shape
        if hasattr(base, "qformat") and not shape:
            shape = base.q.shape  # int8 absmax q is shape-preserving
        fan_in, fan_out = shape[-2], shape[-1]
        A = np.zeros((n_total, fan_in, r_max), np.float32)
        B = np.zeros((n_total, r_max, fan_out), np.float32)
        for n in names:
            ab = adapters[n].get(keyname)
            if ab is None:
                continue
            r = ab["A"].shape[-1]
            aid = name_to_id[n]
            A[aid, :, :r] = np.asarray(ab["A"], np.float32)
            # fold this adapter's alpha/r scale into B
            B[aid, :r, :] = configs[n].scaling * np.asarray(
                ab["B"], np.float32
            )
        _set_leaf(
            out, keyname,
            SlotLoraLeaf(base, jnp.asarray(A), jnp.asarray(B), idx0),
        )
    return out, name_to_id


def _shallow_copy(params: Dict) -> Dict:
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    out["blocks"] = [dict(b) for b in params["blocks"]]
    for b in out["blocks"]:
        b["att"] = dict(b["att"])
        b["ffn"] = dict(b["ffn"])
    return out


def _get_leaf(tree: Dict, key: str):
    if key.startswith("blocks."):
        _, i, sub, nm = key.split(".")
        return tree["blocks"][int(i)][sub][nm]
    return tree[key]


def _set_leaf(tree: Dict, key: str, leaf) -> None:
    if key.startswith("blocks."):
        _, i, sub, nm = key.split(".")
        tree["blocks"][int(i)][sub][nm] = leaf
    else:
        tree[key] = leaf


# ---- training: N adapters learned jointly in one batched step ---------
#
# The same stacked formulation trains: grads flow through the one-hot
# selection to exactly the rows the batch's examples route to (absent
# adapters and the reserved base row get zero gradient). Stacks are kept
# RAW (scaling applied at trace time), so each row's gradient equals
# plain single-adapter LoRA training of that row.


def init_slot_stacks(
    key: jax.Array, params: Dict, lc, names
) -> Tuple[Dict, Dict[str, int]]:
    """Trainable stacks for joint multi-adapter SFT: per adapted leaf
    {"A": (n+1, in, r), "B": (n+1, r, out)} — row 0 reserved (base, zero,
    never routed during training), rows 1..n LoRA-init (A kaiming, B
    zero) exactly like init_lora_params per adapter."""
    from rwkv_lm_ext_tpu.adapters.lora import init_lora_params

    names = list(names)
    name_to_id = {"base": 0, **{n: i + 1 for i, n in enumerate(names)}}
    per = []
    for n in names:
        key, sub = jax.random.split(key)
        per.append(init_lora_params(sub, params, lc))
    stacks: Dict[str, Dict[str, jax.Array]] = {}
    for k in per[0] if per else ():
        A0 = jnp.zeros_like(per[0][k]["A"])
        B0 = jnp.zeros_like(per[0][k]["B"])
        stacks[k] = {
            "A": jnp.stack([A0] + [ad[k]["A"] for ad in per]),
            "B": jnp.stack([B0] + [ad[k]["B"] for ad in per]),
        }
    return stacks, name_to_id


def apply_slot_stacks(
    params: Dict, stacks: Dict, idx: jax.Array, lc
) -> Dict:
    """Wrap the frozen base with trainable stacks + this batch's per-row
    adapter ids (jit-traceable — stacks/idx may be tracers). Scaling is
    folded here, so the stored stacks stay raw like plain LoRA's A/B."""
    out = _shallow_copy(params)
    idx = jnp.asarray(idx, jnp.int32)
    for k, ab in stacks.items():
        _set_leaf(
            out, k,
            SlotLoraLeaf(_get_leaf(params, k), ab["A"],
                         lc.scaling * ab["B"], idx),
        )
    return out


def split_slot_stacks(
    stacks: Dict, name_to_id: Dict[str, int]
) -> Dict[str, Dict]:
    """Trained stacks -> per-name adapter trees in the adapters.lora
    layout ({key: {"A", "B"}}), servable via merge_lora or build_slot_lora
    and savable with save_lora_checkpoint."""
    out = {}
    for name, aid in name_to_id.items():
        if aid == 0:
            continue
        out[name] = {
            k: {"A": ab["A"][aid], "B": ab["B"][aid]}
            for k, ab in stacks.items()
        }
    return out


def _is_slot_leaf(x) -> bool:
    return isinstance(x, SlotLoraLeaf)


def set_slot_idx(params: Dict, idx: jax.Array) -> Dict:
    """New tree with every SlotLoraLeaf's per-row index replaced (the
    stacks/bases are shared, not copied — host-side rewrap only)."""
    idx = jnp.asarray(idx, jnp.int32)

    def rewrap(leaf):
        if _is_slot_leaf(leaf):
            return SlotLoraLeaf(leaf.base, leaf.A, leaf.B, idx)
        return leaf

    return jax.tree_util.tree_map(rewrap, params, is_leaf=_is_slot_leaf)


def has_slot_lora(params: Dict) -> bool:
    return any(
        _is_slot_leaf(x)
        for x in jax.tree_util.tree_leaves(params, is_leaf=_is_slot_leaf)
    )
