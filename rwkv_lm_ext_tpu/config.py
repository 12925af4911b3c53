"""Typed model/run configuration.

Replaces the reference's two-tier env-var + argparse config system
(/root/reference/src/model.py:34-79, peft_train/peft_train_sft.py:77-161):
every variant that the reference selects via import-time environment
variables (RWKV_MY_TESTING, RWKV_TRAIN_TYPE, WKV, RWKV_FLOAT_MODE, ...)
is an explicit field or function argument here.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Union

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters of an RWKV-5/6 model.

    Mirrors the fields the reference sniffs out of a checkpoint in
    /root/reference/src/model_ext.py:93-139 (load_ckpt_and_parse_args).
    """

    n_layer: int
    n_embd: int
    vocab_size: int
    dim_att: int = 0          # defaults to n_embd
    dim_ffn: int = 0          # defaults to 3.5*n_embd rounded to /32
    head_size: int = 64       # reference: head_size_a (RWKV_HEAD_SIZE_A)
    head_size_divisor: int = 8
    version: float = 6.0      # 5.0 / 5.1 / 5.2 / 6.0
    # ln_x is a GroupNorm with eps scaled by head_size_divisor**2
    # (reference src/model.py:432).
    dropout: float = 0.0
    # legacy RWKV-LM options carried by the reference (src/model.py):
    tiny_att_dim: int = 0        # tiny attention at tiny_att_layer
    tiny_att_layer: int = -1
    head_qk: int = 0             # copy-mechanism head (:1225-1238)
    pre_ffn: int = 0             # layer-0 ffnPre instead of att (:833-834)
    my_pos_emb: int = 0          # additive 2D positional emb (:829-831)
    ffn_type: str = "relu_sq"    # "relu_sq" (CMix) | "mishglu" (:648-675)
    ctx_len: int = 4096
    # dtype policy: params/IO bf16, state + normalization fp32.
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # ------------------------------------------------------------------
    # Kernel-path knobs (documented HERE, the one place). The WKV kernels
    # are exact for any decay, so these are pure performance choices.
    # Each can be overridden for perf bisection by an RWKV_* env var —
    # read once at config construction (never in model hot paths):
    #   RWKV_FUSED_CHUNK=<n>     fused-kernel chunk length
    #   RWKV_FUSED_PROLOGUE=0|1  Pallas ln1+token-shift+ddlerp prologue
    #   RWKV_PACKED_DECODE=0|1   tile-packed T=1 decode state layout
    #   RWKV_FUSED_DECODE=0|1    single-pass Pallas T=1 decode kernel
    # ------------------------------------------------------------------
    fused_chunk: int = 128
    fused_prologue: bool = True
    packed_decode: bool = True
    fused_decode: bool = False
    # exact-at-any-decay intra-chunk A (default) vs the ~4x-cheaper
    # midpoint-rescale factoring, which is exact only under a per-
    # checkpoint decay bound. NOT a free knob: set through
    # models.rwkv.suggest_wkv_dispatch / checkpoint.load_rwkv_checkpoint
    # (wkv_dispatch="auto"), which verify the bound before flipping it.
    # RWKV_WKV_EXACT=0|1 overrides for perf bisection.
    wkv_exact: bool = True

    def __post_init__(self):
        if self.dim_att == 0:
            object.__setattr__(self, "dim_att", self.n_embd)
        if self.dim_ffn == 0:
            object.__setattr__(
                self, "dim_ffn", int((self.n_embd * 3.5) // 32 * 32)
            )
        assert self.dim_att % self.head_size == 0
        for field, env, conv in (
            ("fused_chunk", "RWKV_FUSED_CHUNK", int),
            ("fused_prologue", "RWKV_FUSED_PROLOGUE", lambda s: s == "1"),
            ("packed_decode", "RWKV_PACKED_DECODE", lambda s: s == "1"),
            ("fused_decode", "RWKV_FUSED_DECODE", lambda s: s == "1"),
            ("wkv_exact", "RWKV_WKV_EXACT", lambda s: s == "1"),
        ):
            raw = os.environ.get(env)
            if raw is not None:
                object.__setattr__(self, field, conv(raw))

    @property
    def n_head(self) -> int:
        return self.dim_att // self.head_size

    @property
    def ln_x_eps(self) -> float:
        return 1e-5 * (self.head_size_divisor ** 2)

    @property
    def time_mix_extra_dim(self) -> int:
        # reference src/model.py:402-404: doubled for 4096-wide models
        return 64 if self.n_embd == 4096 else 32

    @property
    def time_decay_extra_dim(self) -> int:
        # reference src/model.py:415-417
        return 128 if self.n_embd == 4096 else 64

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def params_dtype(self):
        return jnp.dtype(self.param_dtype)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / parallelism settings (one place instead of the
    reference's ~60 argparse flags, peft_train/peft_train_sft.py:92-161)."""

    lr_init: float = 3e-4
    lr_final: float = 1e-5
    warmup_steps: int = 50
    beta1: float = 0.9
    beta2: float = 0.99
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    lr_schedule: str = "cosine"   # cosine | exp | linear | constant
    total_steps: int = 10000
    micro_bsz: int = 8
    accumulate_grad_batches: int = 1
    # layerwise lr multipliers by parameter-name pattern
    # (reference src/model.py:1007-1068 lr_1x/2x/3x groups)
    layerwise_lr: bool = True
    # remat (activation checkpointing) per block: False | True |
    # "dots"/"dots_nobatch" selective policies (utils.remat)
    grad_checkpoint: Union[bool, str] = True
    # TBPTT chunk length for infinite-context training (0 = off)
    chunk_ctx: int = 0
    # mesh axes sizes; data parallel is the default axis
    dp: int = 1
    tp: int = 1
    # ZeRO-style optimizer state sharding over dp axis
    shard_opt_state: bool = True
    seed: int = 0


def rwkv6_1b6(**overrides) -> ModelConfig:
    """RWKV-6-World-1B6 geometry (the reference's flagship serving model)."""
    kw = dict(n_layer=24, n_embd=2048, vocab_size=65536, head_size=64)
    kw.update(overrides)
    return ModelConfig(**kw)


def rwkv6_3b(**overrides) -> ModelConfig:
    kw = dict(n_layer=32, n_embd=2560, vocab_size=65536, head_size=64)
    kw.update(overrides)
    return ModelConfig(**kw)


def rwkv6_7b(**overrides) -> ModelConfig:
    kw = dict(n_layer=32, n_embd=4096, vocab_size=65536, head_size=64)
    kw.update(overrides)
    return ModelConfig(**kw)


# Special token ids of the RWKV world vocabulary
# (reference: pad=0, eos/emb/cls=1, sep=2, mask=3; see SURVEY §2.3 tokenizers)
PAD_ID = 0
EOS_ID = 1
EMB_ID = 1
CLS_ID = 1
SEP_ID = 2
MASK_ID = 3
