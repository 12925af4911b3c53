"""Per-op profile of the LoRA train step (the 'measured accounting of
exactly where the rest goes' half of VERDICT r3 #2).

Captures a jax.profiler trace of a few chained grads steps on the real
chip, then parses the XSpace with tensorboard_plugin_profile and prints
the top self-time HLO op categories + individual ops as JSON.

Run: python scripts/profile_train.py            (TPU)
Env: B/T/REMAT/LORA_MODE as ablate_train.py; TOP (default 25).
"""
import glob
import gzip
import json
import os
import sys

# tensorboard_plugin_profile's generated protos predate this protobuf's
# C++ parser; the pure-python implementation accepts them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _benchlib import perturb_tokens
from rwkv_lm_ext_tpu.config import rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch
from rwkv_lm_ext_tpu.adapters import (
    LoraConfig, apply_lora_unfused, init_lora_params, merge_lora,
)
from rwkv_lm_ext_tpu.train.loop import sft_loss_fn
from rwkv_lm_ext_tpu.utils.remat import normalize_remat

B = int(os.environ.get("B", "8"))
T = int(os.environ.get("T", "512"))
TOP = int(os.environ.get("TOP", "25"))
REMAT = normalize_remat(os.environ.get("REMAT", "0"))
LORA_MODE = os.environ.get("LORA_MODE", "unfused")
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/rwkv_train_trace")

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True))
cfg = apply_wkv_dispatch(cfg, params)
lc = LoraConfig(r=8, alpha=32.0)
adapter = jax.device_put(init_lora_params(jax.random.PRNGKey(2), params, lc))
apply = apply_lora_unfused if LORA_MODE == "unfused" else merge_lora
toks = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4, 60000, jnp.int32)


def loss(ad, p, tk):
    return sft_loss_fn(
        apply(p, ad, lc), cfg, {"input_ids": tk, "labels": tk}, remat=REMAT
    )


@jax.jit
def gstep(ad, p, tk):
    g = jax.grad(loss)(ad, p, tk)
    return g, perturb_tokens(tk, jax.tree_util.tree_leaves(g)[0])


g, toks = gstep(adapter, params, toks)   # compile
jax.block_until_ready(g)

with jax.profiler.trace(TRACE_DIR):
    for _ in range(3):
        g, toks = gstep(adapter, params, toks)
    jax.block_until_ready(g)

paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                         recursive=True))
if not paths:
    raise SystemExit(f"no xplane under {TRACE_DIR}")
xplane = paths[-1]

from tensorflow.tsl.profiler.protobuf import xplane_pb2

space = xplane_pb2.XSpace()
with open(xplane, "rb") as f:
    space.ParseFromString(f.read())

report = {"xplane": xplane, "planes": []}
for plane in space.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    totals = {}
    for line in plane.lines:
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
            totals[name] = totals.get(name, 0) + ev.duration_ps
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:TOP]
    tot = sum(totals.values())
    report["planes"].append({
        "plane": plane.name,
        "total_ms": round(tot / 1e9, 2),
        "top_ops": [
            {"op": k[:120], "ms": round(v / 1e9, 3),
             "pct": round(100.0 * v / max(tot, 1), 2)}
            for k, v in top
        ],
    })
print(json.dumps(report, indent=1))
