"""LoRA / PiSSA as parameter-tree transforms.

Semantics from the reference:
- train-time LoraLinear (src/rwkvLinear.py:42-120): W @ x + scaling * B(A(dropout(x))),
  scaling = alpha/r, A kaiming-init, B zero; PiSSA: A,B from top-r SVD and
  the base weight *reduced* by B@A (pissa_init, :66-75); pissa forward has
  no scaling (:92-95).
- run-time multi-adapter LoraLinear/LoraEmbedding (src/layers.py:6-81):
  named adapter dicts, "default" = base only.
- LORA_CONFIG parts {'att','ffn'} choose which Linears adapt
  (make_linear_att/ffn, rwkvLinear.py:122-139).

Here: an adapter is a pytree {path: {"A": (in,r), "B": (r,out)}} aligned
with the base tree; `merge_lora` produces serving weights W + scale*A@B
(weight-merge — one matmul ahead of time, zero per-step overhead on TPU);
training materializes the merge inside the loss with the base frozen.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ATT_TARGETS = ("receptance", "key", "value", "gate", "output")
_FFN_TARGETS = ("key", "value", "receptance")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: float = 32.0
    dropout: float = 0.0
    parts: Tuple[str, ...] = ("att", "ffn")  # + "emb" to adapt embeddings
    pissa: bool = False

    @property
    def scaling(self) -> float:
        # PiSSA merges at scale 1 (rwkvLinear.py:92-95)
        return 1.0 if self.pissa else self.alpha / self.r


def _iter_targets(params: Dict, lc: LoraConfig):
    """Yield (block_idx | None, sub, name, kernel) for every adapted leaf."""
    for i, block in enumerate(params["blocks"]):
        if "att" in lc.parts:
            for name in _ATT_TARGETS:
                if name in block["att"]:
                    yield i, "att", name, block["att"][name]
        if "ffn" in lc.parts:
            for name in _FFN_TARGETS:
                if name in block["ffn"]:
                    yield i, "ffn", name, block["ffn"][name]
    if "emb" in lc.parts:
        yield None, "emb", "emb", params["emb"]
    if "head" in lc.parts and "head" in params:
        yield None, "head", "head", params["head"]


def _adapter_key(i, sub, name) -> str:
    return f"blocks.{i}.{sub}.{name}" if i is not None else name


def init_lora_params(key: jax.Array, params: Dict, lc: LoraConfig) -> Dict:
    """Fresh adapter tree: A ~ kaiming-uniform, B = 0 (rwkvLinear.py:52-56)."""
    adapter: Dict[str, Dict[str, jax.Array]] = {}
    for i, sub, name, kernel in _iter_targets(params, lc):
        key, k1 = jax.random.split(key)
        fan_in = kernel.shape[0]
        bound = float(np.sqrt(3.0) * np.sqrt(2.0 / fan_in))  # kaiming a=√5 ~ gain sqrt(2/(1+5))... matches torch default scale
        A = jax.random.uniform(
            k1, (kernel.shape[0], lc.r), jnp.float32, -bound, bound
        )
        B = jnp.zeros((lc.r, kernel.shape[1]), jnp.float32)
        adapter[_adapter_key(i, sub, name)] = {"A": A, "B": B}
    return adapter


def _svd_lowrank(M: jax.Array, r: int, niter: int = 4, key=None):
    """Randomized top-r SVD (torch.svd_lowrank equivalent) — subspace
    iteration with QR re-orthogonalization."""
    m, n = M.shape
    key = key if key is not None else jax.random.PRNGKey(0)
    Q = jax.random.normal(key, (n, min(2 * r, n)), jnp.float32)
    Y = M @ Q
    Q, _ = jnp.linalg.qr(Y)
    for _ in range(niter):
        Z = M.T @ Q
        Z, _ = jnp.linalg.qr(Z)
        Y = M @ Z
        Q, _ = jnp.linalg.qr(Y)
    B_small = Q.T @ M                      # (k, n)
    U_s, S, Vt = jnp.linalg.svd(B_small, full_matrices=False)
    U = Q @ U_s
    return U[:, :r], S[:r], Vt[:r]


def pissa_init(
    params: Dict, lc: LoraConfig, *, svd_niter: int = 4, key=None
) -> Tuple[Dict, Dict]:
    """PiSSA: adapter = top-r SVD of each target weight, base weight
    reduced by the extracted component (rwkvLinear.py:66-75).

    Returns (new_params, adapter). new_params shares un-adapted leaves.

    NOTE: on a FRESHLY INITIALIZED model the reference init zeroes
    att.output / ffn.value, so their SVD gives A=B=0 — a true saddle
    (dL/dA = G@Bᵀ = 0, dL/dB = Aᵀ@G = 0) and those leaves never train.
    This matches the reference's math; PiSSA is meant for pretrained
    checkpoints, where every target is nonzero."""
    key = key if key is not None else jax.random.PRNGKey(0)
    adapter: Dict[str, Dict[str, jax.Array]] = {}
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    new_params["blocks"] = [dict(b) for b in params["blocks"]]
    for i, b in enumerate(new_params["blocks"]):
        b["att"] = dict(b["att"])
        b["ffn"] = dict(b["ffn"])

    for i, sub, name, kernel in _iter_targets(params, lc):
        key, k1 = jax.random.split(key)
        W = kernel.astype(jnp.float32)
        U, S, Vt = _svd_lowrank(W, lc.r, niter=svd_niter, key=k1)
        sq = jnp.sqrt(S)
        A = U * sq[None, :]                 # (in, r)
        B = sq[:, None] * Vt                # (r, out)
        adapter[_adapter_key(i, sub, name)] = {"A": A, "B": B}
        residual = (W - A @ B).astype(kernel.dtype)
        if i is not None:
            new_params["blocks"][i][sub][name] = residual
        elif name == "emb":
            new_params["emb"] = residual
        else:
            new_params["head"] = residual
    return new_params, adapter


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraDeltaLeaf:
    """A quantized frozen base with a lazy LoRA delta (QLoRA training:
    reference LORA_CONFIG['quant'] + QuantLinear, rwkvLinear.py:97-120).

    The base stays quantized in HBM; models.rwkv.as_weight materializes
    dequant(base) + scale * A @ B per use — the A@B outer product is
    ~2·r·in·out flops (trivial at r=8) and fuses into the dequant
    elementwise, so the memory saving of the quantized base survives
    training. Gradients flow to A/B through the delta term only (the
    quantized base rides in the frozen arg)."""

    base: Any
    A: jax.Array
    B: jax.Array
    scale: float

    def tree_flatten(self):
        return (self.base, self.A, self.B), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, A, B = children
        return cls(base, A, B, aux[0])

    def materialize(self, dt):
        from rwkv_lm_ext_tpu.adapters.quant import dequantize, is_quantized

        w = (
            dequantize(self.base, jnp.float32)
            if is_quantized(self.base)
            else self.base.astype(jnp.float32)
        )
        A = self.A.astype(jnp.float32)
        B = self.B.astype(jnp.float32)
        if A.ndim == 3:  # stacked (L, in, r) x (L, r, out)
            delta = self.scale * jnp.einsum("lir,lro->lio", A, B)
        else:
            delta = self.scale * (A @ B)
        return (w + delta).astype(dt)


def merge_lora(params: Dict, adapter: Dict, lc: LoraConfig) -> Dict:
    """Serving weights: W + scaling * A @ B per adapted leaf (the weight-
    merge strategy; the per-token fused low-rank path of the reference's
    LoraLinear costs extra HBM reads every step on TPU — merging is free
    after the first use). Quantized base leaves (QLoRA) are not densified:
    they become LoraDeltaLeaf nodes that as_weight materializes per use."""
    scale = lc.scaling
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["blocks"] = [dict(b) for b in params["blocks"]]
    for i, b in enumerate(out["blocks"]):
        b["att"] = dict(b["att"])
        b["ffn"] = dict(b["ffn"])
    from rwkv_lm_ext_tpu.adapters.quant import is_quantized

    def merged(base, ab):
        if is_quantized(base):
            return LoraDeltaLeaf(base, ab["A"], ab["B"], scale)
        delta = (scale * (ab["A"] @ ab["B"])).astype(jnp.float32)
        return (base.astype(jnp.float32) + delta).astype(base.dtype)

    for keyname, ab in adapter.items():
        if keyname.startswith("blocks."):
            _, idx, sub, name = keyname.split(".")
            i = int(idx)
            base = out["blocks"][i][sub][name]
            out["blocks"][i][sub][name] = merged(base, ab)
        else:
            out[keyname] = merged(out[keyname], ab)
    return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraUnfusedLeaf(LoraDeltaLeaf):
    """Train-time LoRA leaf: base W and the low-rank factors kept
    SEPARATE so models.rwkv.proj computes x@W + (x@A)@(scale*B) without
    ever forming W + scale*A@B.

    Why: differentiating through a merged weight makes JAX emit a full
    (in, out) cotangent for every adapted projection — the same dW
    matmuls as full fine-tuning (the backward costs 2x the forward's
    matmul FLOPs) plus weight-shaped fp32 gradient buffers in HBM. With
    the factors separate, the base branch is a constant: the backward
    needs only dx through W (1x) and the O(r) dA/dB contractions.
    The base may itself be quantized (QLoRA): proj recurses, so an
    int8c base rides the MXU int8 path during training too.

    Inherits materialize() from LoraDeltaLeaf so non-proj consumers
    (as_weight) still see the dense merged weight."""

    unfused_lora = True  # marker for models.rwkv.proj


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TransposedPair:
    """A frozen projection weight paired with a pre-transposed copy.

    The LoRA backward's dominant HBM cost is dx = dy @ W^T over the
    frozen base: the train-step profile shows XLA materializing
    transposed copies of the big FFN kernels every step (PERF.json
    train_accounting). Storing W^T ONCE beside W (frozen, so it never
    changes) lets a custom-vjp matmul read it directly — the backward
    becomes a plain NN-contraction with zero per-step transpose
    traffic, for +1x weight HBM capacity (frozen LoRA training has
    plenty: the 1B6 base is 3.2 GB on a 16 GB chip).
    Consumed by models.rwkv.proj via the ``transposed_pair`` marker.
    """

    w: Any
    wt: Any
    transposed_pair = True

    # non-proj consumers (LoraDeltaLeaf.materialize, dispatch bound
    # checks) see the plain dense weight
    def astype(self, dt):
        return self.w.astype(dt)

    @property
    def shape(self):
        return self.w.shape

    def tree_flatten(self):
        return (self.w, self.wt), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def add_transposed_bases(params: Dict, adapter: Dict) -> Dict:
    """Pair every adapter-targeted plain-array 2D projection weight with
    a contiguous transposed copy (TransposedPair). Run ONCE on the
    frozen tree before training; quantized bases and non-2D leaves are
    left untouched (they fall back to the normal path)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["blocks"] = [dict(b) for b in params["blocks"]]
    for b in out["blocks"]:
        b["att"] = dict(b["att"])
        b["ffn"] = dict(b["ffn"])

    def pair(leaf):
        if isinstance(leaf, jax.Array) and leaf.ndim == 2:
            return TransposedPair(leaf, jnp.asarray(leaf.T))
        return leaf

    for keyname in adapter:
        if keyname == "emb":
            continue
        if keyname.startswith("blocks."):
            _, idx, sub, name = keyname.split(".")
            i = int(idx)
            out["blocks"][i][sub][name] = pair(out["blocks"][i][sub][name])
        else:
            out[keyname] = pair(out[keyname])
    return out


def apply_lora_unfused(params: Dict, adapter: Dict, lc: LoraConfig) -> Dict:
    """Training twin of merge_lora: wrap every adapted projection leaf in
    a LoraUnfusedLeaf (see its docstring for why this halves the
    backward's matmul FLOPs vs merging). Embedding adapters are still
    dense-merged — the emb leaf is consumed by jnp.take, not proj."""
    scale = lc.scaling
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["blocks"] = [dict(b) for b in params["blocks"]]
    for b in out["blocks"]:
        b["att"] = dict(b["att"])
        b["ffn"] = dict(b["ffn"])
    from rwkv_lm_ext_tpu.adapters.quant import is_quantized

    def wrap(base, ab):
        return LoraUnfusedLeaf(base, ab["A"], ab["B"], scale)

    def dense(base, ab):
        if is_quantized(base):
            return LoraDeltaLeaf(base, ab["A"], ab["B"], scale)
        delta = (scale * (ab["A"] @ ab["B"])).astype(jnp.float32)
        return (base.astype(jnp.float32) + delta).astype(base.dtype)

    for keyname, ab in adapter.items():
        if keyname.startswith("blocks."):
            _, idx, sub, name = keyname.split(".")
            i = int(idx)
            out["blocks"][i][sub][name] = wrap(out["blocks"][i][sub][name], ab)
        elif keyname == "emb":
            out[keyname] = dense(out[keyname], ab)
        else:
            out[keyname] = wrap(out[keyname], ab)
    return out


def apply_lora_unfused_stacked(
    sparams: Dict, sadapter: Dict, lc: LoraConfig
) -> Dict:
    """apply_lora_unfused twin for stacked (scan-over-layers) trees: the
    stacked A (L,in,r) / B (L,r,out) ride inside the LoraUnfusedLeaf and
    are sliced per layer by the scan like any other stacked leaf."""
    scale = lc.scaling
    out = jax.tree_util.tree_map(lambda x: x, sparams)
    out["block0"] = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in sparams["block0"].items()
    }
    out["blocks_stacked"] = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in sparams["blocks_stacked"].items()
    }

    def wrap(base, ab):
        return LoraUnfusedLeaf(base, ab["A"], ab["B"], scale)

    for path, ab in sadapter["block0"].items():
        sub, name = path.split(".")
        out["block0"][sub][name] = wrap(out["block0"][sub][name], ab)
    for path, ab in sadapter["stacked"].items():
        sub, name = path.split(".")
        out["blocks_stacked"][sub][name] = wrap(
            out["blocks_stacked"][sub][name], ab
        )
    for keyname, ab in sadapter["global"].items():
        if keyname == "emb":
            delta = (scale * (ab["A"] @ ab["B"])).astype(jnp.float32)
            out[keyname] = (
                out[keyname].astype(jnp.float32) + delta
            ).astype(out[keyname].dtype)
        else:
            out[keyname] = wrap(out[keyname], ab)
    return out


def lora_trainable_mask(adapter: Dict) -> Dict:
    return jax.tree_util.tree_map(lambda _: True, adapter)


def lora_tree_to_state_dict(adapter: Dict, lc: LoraConfig) -> Dict[str, np.ndarray]:
    """Reference on-disk LoRA layout: `<path>.lora_A` (r, in) and
    `<path>.lora_B` (out, r) (rwkvLinear.py:42-56, trainer save filters)."""
    sd = {}
    for keyname, ab in adapter.items():
        sd[f"{keyname}.lora_A"] = np.asarray(ab["A"], np.float32).T
        sd[f"{keyname}.lora_B"] = np.asarray(ab["B"], np.float32).T
    return sd


def lora_state_dict_to_tree(
    sd: Dict[str, Any], *, adapter_name: Optional[str] = None
) -> Dict:
    """Read reference/HF-peft LoRA checkpoints into an adapter tree.

    Accepts both `<path>.lora_A` / `.lora_B` (reference trainer format,
    possibly with a `.weight` suffix) and HF-peft
    `<path>.lora_A.<adapter>.weight` (src/layers.py:125-169 key mapping,
    peft_train/hf2rwkv_lora.py)."""
    tree: Dict[str, Dict[str, np.ndarray]] = {}
    pat = re.compile(
        r"^(?:base_model\.model\.)?(?P<path>.+?)\.lora_(?P<ab>[AB])"
        r"(?:\.(?P<name>[^.]+))?(?:\.weight)?$"
    )
    for k, v in sd.items():
        m = pat.match(k)
        if not m:
            continue
        if adapter_name and m.group("name") not in (None, adapter_name):
            continue
        path = m.group("path")
        # HF peft embedding keys: lora_embedding_A/B
        entry = tree.setdefault(path, {})
        arr = np.asarray(v, np.float32)
        entry["A" if m.group("ab") == "A" else "B"] = arr.T
    out = {}
    for path, ab in tree.items():
        if "A" in ab and "B" in ab:
            out[path] = {"A": jnp.asarray(ab["A"]), "B": jnp.asarray(ab["B"])}
    return out


# --- stacked (scan-over-layers) adapter format ------------------------------
# Pairs with models.stacked.stack_params: layer-0 entries stay separate
# (block 0 is unstacked), layers 1..L-1 stack leaf-wise along a leading
# axis so the whole LoRA merge is three einsums instead of 3*(L-1) matmuls
# traced separately — the same 7x compile-time win as the stacked forward.


def stack_adapter(adapter: Dict) -> Dict:
    """Flat {"blocks.i.sub.name": {"A","B"}} -> {"block0": {...},
    "stacked": {"sub.name": {"A" (L-1,in,r), "B" (L-1,r,out)}},
    "global": {...}} (emb/head entries)."""
    block0: Dict[str, Dict] = {}
    per_layer: Dict[str, Dict[int, Dict]] = {}
    glob: Dict[str, Dict] = {}
    n_max = 0
    for keyname, ab in adapter.items():
        if keyname.startswith("blocks."):
            _, idx, sub, name = keyname.split(".")
            i = int(idx)
            if i == 0:
                block0[f"{sub}.{name}"] = ab
            else:
                per_layer.setdefault(f"{sub}.{name}", {})[i] = ab
                n_max = max(n_max, i)
        else:
            glob[keyname] = ab
    stacked = {}
    for path, entries in per_layer.items():
        assert sorted(entries) == list(range(1, n_max + 1)), (
            f"adapter {path} missing layers; stacking needs all of 1..L-1"
        )
        stacked[path] = {
            "A": jnp.stack([entries[i]["A"] for i in range(1, n_max + 1)]),
            "B": jnp.stack([entries[i]["B"] for i in range(1, n_max + 1)]),
        }
    return {"block0": block0, "stacked": stacked, "global": glob}


def unstack_adapter(sadapter: Dict) -> Dict:
    out: Dict[str, Dict] = {}
    for path, ab in sadapter["block0"].items():
        out[f"blocks.0.{path}"] = ab
    for path, ab in sadapter["stacked"].items():
        n = ab["A"].shape[0]
        for i in range(n):
            out[f"blocks.{i + 1}.{path}"] = {
                "A": ab["A"][i], "B": ab["B"][i]
            }
    out.update(sadapter["global"])
    return out


def merge_lora_stacked(sparams: Dict, sadapter: Dict, lc: LoraConfig) -> Dict:
    """merge_lora twin for stacked trees (models.stacked.stack_params
    layout): W + scaling * A @ B with the layer axis batched into one
    einsum per adapted projection."""
    scale = lc.scaling
    out = jax.tree_util.tree_map(lambda x: x, sparams)  # shallow copy
    out["block0"] = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in sparams["block0"].items()
    }
    out["blocks_stacked"] = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in sparams["blocks_stacked"].items()
    }

    from rwkv_lm_ext_tpu.adapters.quant import is_quantized

    def merged(base, ab):
        if is_quantized(base):   # QLoRA: keep the base quantized
            return LoraDeltaLeaf(base, ab["A"], ab["B"], scale)
        if ab["A"].ndim == 3:
            delta = scale * jnp.einsum("lir,lro->lio", ab["A"], ab["B"])
        else:
            delta = scale * (ab["A"] @ ab["B"])
        return (base.astype(jnp.float32) + delta).astype(base.dtype)

    for path, ab in sadapter["block0"].items():
        sub, name = path.split(".")
        out["block0"][sub][name] = merged(out["block0"][sub][name], ab)
    for path, ab in sadapter["stacked"].items():
        sub, name = path.split(".")
        out["blocks_stacked"][sub][name] = merged(
            out["blocks_stacked"][sub][name], ab
        )
    for keyname, ab in sadapter["global"].items():
        out[keyname] = merged(out[keyname], ab)
    return out


def merge_pissa(
    params: Dict, adapter: Dict, adapter_init: Dict, lc: LoraConfig
) -> Dict:
    """Serve a PiSSA adapter against the ORIGINAL (undeflated) base:
    W + A@B - A_init@B_init. The reference does this at inject time by
    concatenating [A; -A_init], [B; B_init] into one doubled-rank adapter
    (src/layers.py:125-169 pissa residual merge); algebraically identical,
    and here it reuses the plain merge twice. `adapter_init` is the SVD
    init saved at training start (the reference's init_pissa checkpoint)."""
    assert lc.pissa, "merge_pissa is for PiSSA configs (scaling 1)"
    neg_init = {
        k: {"A": -ab["A"], "B": ab["B"]} for k, ab in adapter_init.items()
    }
    return merge_lora(merge_lora(params, adapter, lc), neg_init, lc)
