"""Weight-only quantization (int8 / nf4 / fp4) for serving memory.

The reference quantizes LoRA base weights with bitsandbytes
(rwkv_quantize/rwkv_dequantize, src/rwkvLinear.py:8-29, LORA_CONFIG
quant — its bnb modes: int8, nf4, fp4). TPU-native version: pure-jnp
codecs over the parameter tree — int8 per-output-channel absmax, or
4-bit block-64 absmax with either the QLoRA NF4 codebook or the bnb
FP4 (e2m1) codebook. Quantized leaves are dicts
{"qformat", "q", "scale"}; the model's weight accessor (models.rwkv
as_weight) dequantizes on use, so int8/uint8 stays in HBM and the convert
fuses into the consuming matmul.
"""
from __future__ import annotations

from typing import Dict

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """A quantized weight leaf: arrays are pytree children, the format
    metadata is static aux data — so quantized trees pass through jit,
    grad and shardings like any other params."""

    qformat: str
    q: jax.Array
    scale: jax.Array
    shape: tuple = ()
    block: int = 0
    pad: int = 0

    def tree_flatten(self):
        return (self.q, self.scale), (self.qformat, self.shape, self.block, self.pad)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        return cls(aux[0], q, scale, aux[1], aux[2], aux[3])

# QLoRA NF4 codebook: quantiles of N(0,1), normalized to [-1, 1].
# numpy (not jnp): a module-level device array would be created inside
# whatever trace first imports this module lazily -> leaked tracer.
NF4_CODE = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495,
        0.0, 0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)

# bitsandbytes FP4 (e2m1) codebook, sign in bit 3 — the dequant table of
# bnb's dDequantizeFP4 (csrc/kernels.cu), normalized to [-1, 1]
FP4_CODE = np.asarray(
    [
        0.0, 0.0052083335, 0.6666667, 1.0,
        0.33333334, 0.5, 0.16666667, 0.25,
        -0.0, -0.0052083335, -0.6666667, -1.0,
        -0.33333334, -0.5, -0.16666667, -0.25,
    ],
    np.float32,
)

_CODE4 = {"nf4": NF4_CODE, "fp4": FP4_CODE}


def quantize_int8(w: jax.Array, *, compute: bool = False) -> Dict:
    """Per-output-channel (last axis) absmax int8; the absmax runs over
    the input axis (-2), so stacked (L, in, out) leaves quantize with an
    independent scale per (layer, out-channel).

    ``compute=True`` marks the leaf ``int8c``: same codec, but the model's
    projection helper (models.rwkv.proj) runs the matmul natively on the
    MXU's int8 path (~1.7x bf16 throughput measured on v5e) with dynamic
    per-token activation quantization, instead of dequantizing to bf16."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor("int8c" if compute else "int8", q, scale)


def dequantize_int8(d: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    return (d.q.astype(jnp.float32) * d.scale).astype(dtype)


def int8_matmul(x: jax.Array, d: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """x @ W on the MXU's native int8 path (int8 x int8 -> int32).

    The TPU answer to the reference's mm8 CUDA serving ops
    (cuda/operators.cu, wrapper.cpp:125-140): activations are quantized
    dynamically per token (absmax over the contraction axis), the matmul
    accumulates in int32, and the per-token x per-out-channel rescale is
    applied to the int32 result. Measured 300 TOP/s vs 173 TFLOP/s bf16
    at (32k, 2048) x (2048, 2048) on v5e — the int8 MXU is how the
    embedding path beats the bf16 roofline rather than just matching it.

    On TPU the activation quant runs as one fused Pallas pass
    (ops.quant_pallas: absmax + round + int8 store in VMEM, one HBM
    read) — composed in XLA the reduce re-reads the tensor, a measured
    12% end-to-end tax on the int8c embedding headline.  The backward
    replays the XLA composition's VJP, so training through an int8c
    base (--quant int8c QLoRA) is unchanged.

    Reverse-mode only: the custom_vjp wrapper means jax.jvp/jacfwd over
    this op raise; every trainer here uses jax.grad (reverse mode). If
    forward-mode is ever needed, differentiate the XLA composition
    (quantize_rows_xla + dot) directly instead.
    """
    return _int8_mm(x, d.q, d.scale, jnp.dtype(dtype))


def _int8_mm_impl(x, q, scale, dtype, fused: bool):
    if fused:
        from rwkv_lm_ext_tpu.ops.quant_pallas import quantize_rows

        xq, sx = quantize_rows(x)
    else:
        from rwkv_lm_ext_tpu.ops.quant_pallas import quantize_rows_xla

        xq, sx = quantize_rows_xla(x)
    y = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * scale).astype(dtype)


def _use_fused_quant() -> bool:
    try:
        from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

        return pallas_available()
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _int8_mm(x, q, scale, dtype):
    return _int8_mm_impl(x, q, scale, dtype, _use_fused_quant())


def _int8_mm_fwd(x, q, scale, dtype):
    out = _int8_mm_impl(x, q, scale, dtype, _use_fused_quant())
    return out, (x, q, scale)


def _int8_mm_bwd(dtype, res, g):
    # Exact VJP of the original XLA composition (grads reach x and scale
    # through the dynamic-quant arithmetic; the int8 weight gets float0).
    x, q, scale = res
    _, vjp = jax.vjp(
        lambda x_, s_: _int8_mm_impl(x_, q, s_, dtype, False), x, scale
    )
    dx, dscale = vjp(g)
    return dx, np.zeros(q.shape, jax.dtypes.float0), dscale


_int8_mm.defvjp(_int8_mm_fwd, _int8_mm_bwd)


def quantize_nf4(w: jax.Array, block: int = 64, *, stacked: bool = False,
                 fmt: str = "nf4") -> Dict:
    """Blockwise 4-bit (NF4 or bnb FP4 via ``fmt``): each `block`
    consecutive values share an absmax.

    ``stacked=True`` treats the leading axis as a layer axis (scan-over-
    layers trees) and quantizes each layer independently, so q keeps shape
    (L, nb, block//2) and scale (L, nb) — lax.scan can slice the layer
    axis, and the aux ``shape`` records the PER-LAYER logical shape so an
    in-scan slice dequantizes to one layer's weight.
    """
    wf = w.astype(jnp.float32)
    if stacked:
        lead, shape = wf.shape[0], wf.shape[1:]
        flat = wf.reshape(lead, -1)
    else:
        lead, shape = None, wf.shape
        flat = wf.reshape(1, -1)
    pad = (-flat.shape[-1]) % block
    flat = jnp.pad(flat, ((0, 0), (0, pad)))
    blocks = flat.reshape(flat.shape[0], -1, block)
    absmax = jnp.maximum(jnp.max(jnp.abs(blocks), axis=-1, keepdims=True), 1e-12)
    normed = blocks / absmax
    code = _CODE4[fmt]
    idx = jnp.argmin(
        jnp.abs(normed[..., None] - code[None, None, None, :]), axis=-1
    ).astype(jnp.uint8)
    # pack two 4-bit codes per byte
    lo = idx[..., 0::2]
    hi = idx[..., 1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    scale = absmax[..., 0]
    if not stacked:
        packed, scale = packed[0], scale[0]
    return QuantizedTensor(fmt, packed, scale, tuple(shape), block, int(pad))


def dequantize_nf4(d: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_nf4. Handles both the flat layout
    (q: (nb, block//2)) and the stacked layout (q: (L, nb, block//2) →
    returns (L, *shape)); a stacked leaf sliced by lax.scan arrives here
    2-D and reshapes to the per-layer ``shape``."""
    packed = d.q
    lead = packed.shape[:-2]  # () flat / in-scan slice, (L,) stacked
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    idx = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    vals = jnp.asarray(_CODE4[d.qformat])[idx] * d.scale[..., None]
    flat = vals.reshape(*lead, -1)
    if d.pad:
        flat = flat[..., : -d.pad]
    return flat.reshape(*lead, *d.shape).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, QuantizedTensor)


def dequantize(leaf, dtype=jnp.float32) -> jax.Array:
    if leaf.qformat in ("int8", "int8c"):
        return dequantize_int8(leaf, dtype)
    if leaf.qformat in ("nf4", "fp4"):
        return dequantize_nf4(leaf, dtype)
    raise ValueError(leaf.qformat)


_ATT_TARGETS = ("receptance", "key", "value", "gate", "output")
_FFN_TARGETS = ("key", "value", "receptance")


def quantize_tree(
    params: Dict, mode: str = "int8", *, include_head: bool = False
) -> Dict:
    """Quantize every block linear (the LORA_CONFIG['quant'] targets:
    the same Linears make_linear_att/ffn wraps). emb/ln stay full;
    include_head also quantizes the LM head (another ~8%% of 1B6 decode
    weight traffic)."""
    if mode not in ("int8", "int8c", "nf4", "fp4"):
        raise ValueError(
            f"unknown quant mode {mode!r} (expected int8|int8c|nf4|fp4)"
        )
    out = dict(params)

    def make_enc(stacked: bool):
        if mode in ("int8", "int8c"):
            # int8 absmax runs over the input axis (-2): shape-preserving,
            # so a stacked (L, in, out) leaf quantizes with an independent
            # scale per (layer, out-channel) with no special casing.
            return lambda w: quantize_int8(w, compute=(mode == "int8c"))
        if stacked:
            return lambda w: quantize_nf4(w, stacked=True, fmt=mode)
        return lambda w: quantize_nf4(w, fmt=mode)

    if include_head and "head" in out and not is_quantized(out["head"]):
        out["head"] = make_enc(False)(params["head"])

    def quant_block(b, stacked: bool):
        enc = make_enc(stacked)
        nb = dict(b)
        nb["att"] = dict(b["att"])
        nb["ffn"] = dict(b["ffn"])
        for name in _ATT_TARGETS:
            if name in nb["att"] and not is_quantized(nb["att"][name]):
                nb["att"][name] = enc(nb["att"][name])
        for name in _FFN_TARGETS:
            if name in nb["ffn"] and not is_quantized(nb["ffn"][name]):
                nb["ffn"][name] = enc(nb["ffn"][name])
        return nb

    if "blocks_stacked" in params:
        # scan-over-layers trees: the stacked leaves carry a leading layer
        # axis that lax.scan slices, so the codec must keep it (int8 does
        # by construction; nf4 quantizes per layer via stacked=True)
        out["block0"] = quant_block(params["block0"], stacked=False)
        out["blocks_stacked"] = quant_block(params["blocks_stacked"], stacked=True)
    else:
        out["blocks"] = [quant_block(b, stacked=False) for b in params["blocks"]]
    return out


def dequantize_tree(params: Dict, dtype=jnp.float32) -> Dict:
    def walk(leaf):
        return dequantize(leaf, dtype) if is_quantized(leaf) else leaf

    def walk_block(b):
        nb = {}
        for k, v in b.items():
            if k in ("att", "ffn"):
                nb[k] = {kk: walk(vv) for kk, vv in v.items()}
            else:
                nb[k] = v
        return nb

    out = dict(params)
    if "head" in out and is_quantized(out["head"]):
        out["head"] = walk(out["head"])
    if "blocks_stacked" in params:
        out["block0"] = walk_block(params["block0"])
        out["blocks_stacked"] = walk_block(params["blocks_stacked"])
    else:
        out["blocks"] = [walk_block(b) for b in params["blocks"]]
    return out
