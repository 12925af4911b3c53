"""Fused-prologue decode ablation at 1B6: does collapsing the per-layer
glue (ln + shift + ddlerp + decay, ln2 + mix) into Pallas programs
(ops/decode_fused.py) cut the ~3.3 ms/step fusion-granularity residual?

Variants (all greedy, no sampling, hidden-state decode + head):
  forward      rwkv_forward(tok[:, None]) — the current production path
  step         rwkv_decode_step(fused_prep=False) — T-axis-free, unfused
  step_fused   rwkv_decode_step(fused_prep=True)  — Pallas glue kernels

Differential methodology (long scan minus short scan, one host fetch).
Env: B (64), N_LONG (48), N_SHORT (8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.config import rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.decode import decode_supported, rwkv_decode_step
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state

B = int(os.environ.get("B", "64"))
NL = int(os.environ.get("N_LONG", "48"))
NS = int(os.environ.get("N_SHORT", "8"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(
    init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
)
assert decode_supported(cfg, params)
state0 = init_model_state(cfg, B)
tok0 = jnp.full((B,), 5, jnp.int32)


def mk(n, variant):
    @jax.jit
    def f(params, tok0, state):
        def body(carry, _):
            tok, st = carry
            if variant == "forward":
                lg, st = rwkv_forward(params, cfg, tok[:, None], st)
                lg = lg[:, -1]
            else:
                lg, st = rwkv_decode_step(
                    params, cfg, tok, st,
                    fused_prep=(variant == "step_fused"),
                )
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, st), jnp.sum(tok)

        (tok, st), s = jax.lax.scan(body, (tok0, state), None, length=n)
        return jnp.sum(s)

    return f


def run(variant):
    fl, fs = mk(NL, variant), mk(NS, variant)
    float(fl(params, tok0, state0))
    float(fs(params, tok0, state0))
    t0 = time.perf_counter()
    float(fl(params, tok0, state0))
    dl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fs(params, tok0, state0))
    ds = time.perf_counter() - t0
    ms = (dl - ds) / (NL - NS) * 1e3
    return {
        "variant": variant,
        "ms_per_step": round(ms, 3),
        "tok_s_aggregate": round(B / ms * 1e3, 1),
    }


if __name__ == "__main__":
    for v in ("forward", "step", "step_fused"):
        r = run(v)
        r["B"] = B
        print(json.dumps(r), flush=True)
