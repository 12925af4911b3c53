"""Beam-search throughput (VERDICT r4 weak #6 / #8: no measured number).

generate_beamsearch runs one jitted batched decode step per beam-search
step (all beams on the batch axis) with host-side hypothesis
finalization — so the per-STEP cost is the batched decode + the ~5 ms
relay dispatch + O(num_beams * reserve) Python. This measures the real
end-to-end surface at 1B6 geometry: steps/s, beam-tokens/s (num_beams
rows advance per step), and wall-clock per finished generation.

Run: python scripts/bench_beam.py          (TPU)
Env: BENCH_SMALL=1 for a CPU smoke; BEAMS (10), TOKENS (64), RUNS (3).
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
from rwkv_lm_ext_tpu.infer.beam import BeamParams, generate_beamsearch
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

BEAMS = int(os.environ.get("BEAMS", "10"))
TOKENS = int(os.environ.get("TOKENS", "8" if SMALL else "64"))
RUNS = int(os.environ.get("RUNS", "1" if SMALL else "3"))


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
    bp = BeamParams(
        num_beams=BEAMS, num_groups=BEAMS // 2, max_tokens=TOKENS,
        eos_ids=(), early_stopping=False,
    )
    prompt = list(range(10, 42))

    # warm compile
    generate_beamsearch(engine, prompt, bp, seed=0)

    times = []
    for r in range(RUNS):
        t0 = time.perf_counter()
        out = generate_beamsearch(engine, prompt, bp, seed=r + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "stage": "beam_search",
        "platform": jax.devices()[0].platform,
        "num_beams": BEAMS,
        "max_tokens": TOKENS,
        "wall_s_per_generation": round(best, 3),
        "steps_per_s": round(TOKENS / best, 1),
        "beam_tok_s": round(BEAMS * TOKENS / best, 1),
        "n_results": len(out),
    }))


if __name__ == "__main__":
    main()
