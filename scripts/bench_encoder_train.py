"""Bidirectional-encoder train-step benchmark (the unfused-WKV backward
path): pallas (two-pass Pallas backward) vs chunked (XLA recompute).

The scan body is data-chained (tokens perturbed from the previous
iteration's grads) and guarded by the elision canary in _benchlib —
round 3's version let XLA hoist the loop-invariant grad computation and
reported a physically impossible 41.4 Kt/s (see VERDICT.md r3 weak #1).

Run one backend per process (compiles are remote and slow):
    python scripts/bench_encoder_train.py pallas
    python scripts/bench_encoder_train.py chunked
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _benchlib import time_scan, perturb_tokens
from rwkv_lm_ext_tpu.config import rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.bidirectional import encoder_forward

backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
REMAT = os.environ.get("BENCH_REMAT", "1") == "1"
B = int(os.environ.get("BENCH_BATCH", "8"))
T = int(os.environ.get("BENCH_CTX", "512"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(
    init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
)
# the same automatic kernel dispatch every load_rwkv_checkpoint user gets
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

cfg = apply_wkv_dispatch(cfg, params)
toks0 = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4, 60000, jnp.int32)


def loss(p, toks):
    h = encoder_forward(
        p, cfg, toks, wkv_backend=backend, remat=REMAT, chunk_size=64
    )
    return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6


g = jax.grad(loss)


def body(toks, p):
    grads = g(p, toks)
    return perturb_tokens(toks, grads["emb"])


per = time_scan(body, toks0, ITERS, const=(params,))
print(json.dumps({
    "metric": f"encoder_train_step ({backend}, RWKV-6 1B6, B{B}, ctx {T})",
    "value": round(B * T / per / 1e3, 2), "unit": "Kt/s",
    "step_ms": round(per * 1e3, 1), "vs_baseline": None,
}))
