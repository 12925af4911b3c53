"""State-dtype drift study (STATUS open question / VERDICT r2 item 9).

The CUDA contract keeps the WKV state fp32 (cuda/rwkv6_cuda.cu: float
state); storing it bf16 between decode steps would halve the dominant
HBM traffic of batched decode (the state is ~34 MB/layer at 1B6 B=64).
The risk is compounding per-step rounding: S' = decay*S + k v^T feeds
back every step, so storage rounding errors can accumulate over long
generations.

Method: run the same token stream through the model three times with the
WKV state carried between steps in (a) fp32 (reference contract),
(b) bf16 storage (upcast to fp32 for the step, round back after),
(c) int8 storage with a per-(layer,B,head) symmetric max-abs scale.
Drift = relative L2 error of the logits vs (a), sampled at checkpoints.
Shift slots stay fp32 everywhere (they are (B,C) — not the traffic).

Env: MODEL=small|1b6 (default small, CPU-friendly), STEPS (2048),
B (4), CHECK_EVERY (256). Prints one JSON line per checkpoint and a
final summary with the go/no-go numbers.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MODEL = os.environ.get("MODEL", "small")
STEPS = int(os.environ.get("STEPS", "2048"))
B = int(os.environ.get("B", "4"))
CHECK_EVERY = int(os.environ.get("CHECK_EVERY", "256"))

if MODEL == "small":
    jax.config.update("jax_platforms", "cpu")

from rwkv_lm_ext_tpu.config import ModelConfig, rwkv6_1b6  # noqa: E402
from rwkv_lm_ext_tpu.models import init_rwkv_params  # noqa: E402
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward  # noqa: E402
from rwkv_lm_ext_tpu.models.state import init_model_state  # noqa: E402

if MODEL == "1b6":
    cfg = rwkv6_1b6(param_dtype="bfloat16")
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
else:
    cfg = ModelConfig(
        n_layer=4, n_embd=256, vocab_size=4096, head_size=64,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
# the reference init zero-inits att.output, which would disconnect the
# WKV state from the logits entirely — randomize it so state rounding
# actually propagates (trained checkpoints have non-zero outputs)
keys = jax.random.split(jax.random.PRNGKey(7), len(params["blocks"]))
for bk, b in zip(keys, params["blocks"]):
    b["att"]["output"] = (
        0.05 * jax.random.normal(bk, b["att"]["output"].shape)
    ).astype(b["att"]["output"].dtype)
params = jax.device_put(params)

tokens = jax.random.randint(
    jax.random.PRNGKey(1), (B, STEPS), 4, cfg.vocab_size - 4, jnp.int32
)


def store_fp32(s):
    return s


def store_bf16(s):
    return s.astype(jnp.bfloat16).astype(jnp.float32)


def store_int8(s):
    # per-(L,B,H) symmetric max-abs scale over the packed planes
    scale = jnp.max(jnp.abs(s), axis=(-2, -1), keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(s / scale), -127, 127)
    return q * scale


MODES = {"fp32": store_fp32, "bf16": store_bf16, "int8": store_int8}


def run(mode_fn):
    state = init_model_state(cfg, B)

    @jax.jit
    def seg(params, state, toks):
        def body(st, tok):
            lg, st = rwkv_forward(params, cfg, tok[:, None], st)
            st = dict(st, wkv=mode_fn(st["wkv"]))
            return st, lg[:, 0]
        st, lgs = jax.lax.scan(body, state, toks.T)
        return st, lgs[-1]

    outs = []
    for s in range(0, STEPS, CHECK_EVERY):
        state, last_logits = seg(params, state, tokens[:, s : s + CHECK_EVERY])
        outs.append((s + CHECK_EVERY, np.asarray(last_logits, np.float32),
                     np.asarray(state["wkv"], np.float32)))
    return outs


ref = run(MODES["fp32"])
summary = {"model": MODEL, "steps": STEPS, "batch": B}
for name in ("bf16", "int8"):
    got = run(MODES[name])
    rows = []
    for (t, lg_r, st_r), (_, lg_g, st_g) in zip(ref, got):
        rel = float(
            np.linalg.norm(lg_g - lg_r) / max(np.linalg.norm(lg_r), 1e-12)
        )
        st_rel = float(
            np.linalg.norm(st_g - st_r) / max(np.linalg.norm(st_r), 1e-12)
        )
        # does rounding flip the greedy token?
        flips = int(np.sum(np.argmax(lg_g, -1) != np.argmax(lg_r, -1)))
        rows.append({"step": t, "logit_rel_l2": round(rel, 6),
                     "state_rel_l2": round(st_rel, 6),
                     "greedy_flips": flips})
        print(json.dumps({"mode": name, **rows[-1]}), flush=True)
    summary[name] = rows[-1]
print(json.dumps({"summary": summary}))
