"""Split the serving block-step cost: decode forward vs per-row sampling
(top_p sort vs bisect) vs host loop, at serving shapes.

Times ContinuousBatcher._block_fn via full step() calls with all slots
active (chained host loop — every fetch depends on the previous block,
so the relay cannot elide), for top_p_impl in {sort, bisect} and the
categorical impl in {gumbel, invcdf}.

Run: python scripts/ablate_block_step.py      (TPU)
Env: SLOTS (8), BLOCK (16), BENCH_SMALL=1 for CPU smoke.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SMALL = os.environ.get("BENCH_SMALL") == "1"
if SMALL:
    jax.config.update("jax_platforms", "cpu")

from rwkv_lm_ext_tpu.config import ModelConfig, rwkv6_1b6
from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

SLOTS = int(os.environ.get("SLOTS", "8"))
BLOCK = int(os.environ.get("BLOCK", "16"))
STEPS = 2 if SMALL else 12


def main():
    if SMALL:
        cfg = ModelConfig(
            n_layer=2, n_embd=64, vocab_size=65536, head_size=16,
            dtype="float32", param_dtype="float32",
        )
    else:
        cfg = rwkv6_1b6(param_dtype="bfloat16")
    params = jax.device_put(
        init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
    )
    cfg = apply_wkv_dispatch(cfg, params)
    engine = GenerationEngine(params, cfg)
    out = {}
    for label, sp in [
        ("sort_gumbel", SamplingParams(temperature=1.0, top_p=0.9,
                                       token_stop=())),
        ("bisect_gumbel", SamplingParams(temperature=1.0, top_p=0.9,
                                         token_stop=(),
                                         top_p_impl="bisect")),
        ("bisect_invcdf", SamplingParams(temperature=1.0, top_p=0.9,
                                         token_stop=(),
                                         top_p_impl="bisect",
                                         categorical_impl="invcdf")),
    ]:
        batcher = ContinuousBatcher(
            engine, n_slots=SLOTS, sampling=sp, block_size=BLOCK
        )
        batcher.warmup()
        for s in range(SLOTS):
            batcher.submit(list(range(5 + s, 25 + s)),
                           max_tokens=10_000_000)
        batcher.step()  # admit all + dispatch first block
        batcher.step()  # pipeline primed
        t0 = time.perf_counter()
        for _ in range(STEPS):
            batcher.step()
        dt = (time.perf_counter() - t0) / STEPS
        # drain: cancel every active request, then run to idle
        for slot in batcher._slots:
            if slot is not None:
                batcher.cancel(slot.rid)
        batcher.run()
        out[label] = {
            "block_ms": round(dt * 1e3, 2),
            "per_tok_ms": round(dt * 1e3 / BLOCK, 3),
            "agg_tok_s": round(SLOTS * BLOCK / dt, 1),
        }
        print(label, out[label], flush=True)
    print(json.dumps({
        "stage": "block_step_ablation", "slots": SLOTS, "block": BLOCK,
        "platform": jax.devices()[0].platform, **out,
    }))


if __name__ == "__main__":
    main()
