"""Training throughput: 1B6 LoRA SFT step time (the reference logs Kt/s).

Chained-scan methodology; measures a full jitted train step (fwd+bwd+adam)
with remat, LoRA adapter trainable, base frozen. Prints one JSON line.
Env: TRAIN_BATCH (def 8), TRAIN_CTX (512), TRAIN_ITERS (4),
TRAIN_TYPE (lora|qlora|full), REMAT (1|0; 0 skips per-block activation
checkpointing — ~25% fewer flops when the batch fits in HBM). qlora =
LoRA over an int8-quantized frozen base (LoraDeltaLeaf path).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_lm_ext_tpu.config import TrainConfig, rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params, merge_lora
from rwkv_lm_ext_tpu.train.loop import make_train_step, sft_loss_fn

B = int(os.environ.get("TRAIN_BATCH", "8"))
T = int(os.environ.get("TRAIN_CTX", "512"))
ITERS = int(os.environ.get("TRAIN_ITERS", "4"))
TRAIN_TYPE = os.environ.get("TRAIN_TYPE", "lora")
# REMAT: 1/0/full/off or a selective policy name (dots / dots_nobatch)
from rwkv_lm_ext_tpu.utils.remat import normalize_remat

REMAT = normalize_remat(os.environ.get("REMAT", "1"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True))
# the same automatic kernel dispatch every load_rwkv_checkpoint user gets
# (training default margin: decay params move during training)
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

cfg = apply_wkv_dispatch(cfg, params)
tc = TrainConfig(lr_init=1e-4, warmup_steps=1, total_steps=100)

tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4, 60000, jnp.int32)
batch = {"input_ids": tokens, "labels": tokens}

LORA_APPLY = os.environ.get("LORA_APPLY", "unfused")  # unfused | merge

if TRAIN_TYPE in ("lora", "qlora"):
    lc = LoraConfig(r=8, alpha=32.0)
    adapter = init_lora_params(jax.random.PRNGKey(2), params, lc)
    if TRAIN_TYPE == "qlora":
        from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

        params = jax.device_put(quantize_tree(params, "int8"))
    if LORA_APPLY == "unfused":
        from rwkv_lm_ext_tpu.adapters import apply_lora_unfused as _apply
    else:
        _apply = merge_lora
    if os.environ.get("TBWD") == "1" and TRAIN_TYPE == "lora":
        # frozen base stored with pre-transposed copies: the backward's
        # dx reads W^T directly (adapters.lora.TransposedPair)
        from rwkv_lm_ext_tpu.adapters.lora import add_transposed_bases

        params = jax.device_put(add_transposed_bases(params, adapter))

    def loss_fn(adapter_p, frozen, cfg_, b):
        merged = _apply(frozen, adapter_p, lc)
        return sft_loss_fn(merged, cfg_, b, remat=REMAT)

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn, donate=False)
    ts = init_fn(adapter)
    args = (batch, params)
else:
    init_fn, step_fn = make_train_step(cfg, tc, donate=False)
    ts = init_fn(params)
    args = (batch,)

# warm
ts, m = step_fn(ts, *args)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(ITERS):
    ts, m = step_fn(ts, *args)
loss = float(m["loss"])  # forces the chain (ts threads through)
dt = (time.perf_counter() - t0) / ITERS
kts = T * B / dt / 1000.0
print(json.dumps({
    "metric": f"train_step ({TRAIN_TYPE}, RWKV-6 1B6, bsz {B}, ctx {T})",
    "value": round(kts, 2), "unit": "Kt/s",
    "step_ms": round(dt * 1e3, 1),
    "vs_baseline": None,
}))
