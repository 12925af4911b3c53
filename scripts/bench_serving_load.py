"""Serving under concurrent load (VERDICT r3 #8).

Drives the REAL HTTP serving stack — serve.api.serve_http over a
ServingService with a ContinuousBatcher (slot pool), prefix cache and
per-request sampling — with N closed-loop HTTP clients mixing:
  decode-heavy:  ~32-token prompt, 64 generated tokens
  prefill-heavy: ~1024-token prompt, 8 generated tokens (half of them
                 share one prefix -> exercises the prefix cache)
and reports, per offered load N: completed requests, aggregate
generated tok/s, p50/p99 latency per request class, and mean batcher
occupancy/queue depth sampled from /stats.

The reference's FastAPI demo (demo/states_runner.py) has no load story
— this is where the production-serving claim gets proven. Random
weights (no checkpoint in the image): throughput/latency are
weight-independent.

Run: python scripts/bench_serving_load.py            (TPU)
Env: SLOTS (8), LOADS ("1,4,8,16"), DURATION (20 s per load),
     BENCH_SMALL=1 for a quick CPU smoke.
"""
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

SMALL = os.environ.get("BENCH_SMALL") == "1"
if SMALL:
    jax.config.update("jax_platforms", "cpu")

from rwkv_lm_ext_tpu.config import ModelConfig, rwkv6_1b6
from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch
from rwkv_lm_ext_tpu.serve.api import ServingService, serve_http

SLOTS = int(os.environ.get("SLOTS", "8"))
BLOCK = int(os.environ.get("BLOCK", "16"))
ADAPTIVE = os.environ.get("ADAPTIVE") == "1"
LOADS = [int(x) for x in os.environ.get("LOADS", "1,4,8,16").split(",")]
DURATION = float(os.environ.get("DURATION", "20"))
DEC_TOKENS = 8 if SMALL else 64
PRE_TOKENS = 2 if SMALL else 8


def build_service():
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
    if os.environ.get("QUANT"):
        from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

        params = jax.device_put(
            quantize_tree(params, os.environ["QUANT"])
        )
    tok = WorldTokenizer()
    engine = GenerationEngine(
        params, cfg, tok, state_cache=PrefixStateCache(32),
    )
    sp = SamplingParams(temperature=1.0, top_p=0.9, token_stop=())
    batcher = ContinuousBatcher(
        engine, n_slots=SLOTS, sampling=sp, block_size=BLOCK,
        adaptive_block=ADAPTIVE,
    )
    return ServingService(engine=engine, batcher=batcher, tokenizer=tok)


def _prompts():
    """Fixed-length prompts (stable compile shapes): one shared long
    prefix (cache-hit class), unique same-length variants, short ones."""
    base_short = "The quick brown fox jumps over the lazy dog. " * 2
    base_long = "All happy families are alike; each unhappy family is " \
                "unhappy in its own way. " * 64
    uniq = [
        base_long[:-16] + f"variant {i:04d} end" for i in range(8)
    ]
    return base_short, base_long, uniq


def _post(port, payload, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    svc = build_service()
    server = serve_http(svc, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    short, long_p, uniq = _prompts()
    # pre-compile every shape ON THE MAIN THREAD (axon: a first compile
    # inside an HTTP handler thread crashes the runtime)
    for p, mt in [(short, DEC_TOKENS), (long_p, PRE_TOKENS),
                  (uniq[0], PRE_TOKENS)]:
        svc.generate(p, max_tokens=mt, temperature=1.0, top_p=0.9,
                     token_stop=[])

    results = []
    for n_clients in LOADS:
        lat = {"decode": [], "prefill": []}
        tokens_out = [0]
        occ, queued = [], []
        stop = threading.Event()
        lock = threading.Lock()

        def client(idx):
            rng = np.random.RandomState(idx)
            while not stop.is_set():
                if idx % 2 == 0:
                    cls, prompt, mt = "decode", short, DEC_TOKENS
                else:
                    cls = "prefill"
                    # half the prefill clients reuse the shared prefix
                    prompt = long_p if rng.rand() < 0.5 else uniq[
                        rng.randint(len(uniq))
                    ]
                    mt = PRE_TOKENS
                t0 = time.perf_counter()
                try:
                    out = _post(port, {
                        "prompt": prompt, "max_tokens": mt,
                        "temperature": 1.0, "top_p": 0.9, "token_stop": [],
                    })
                except Exception:
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    lat[cls].append(dt)
                    tokens_out[0] += mt
                    assert out.get("backend") == "batcher", out.get("backend")

        def monitor():
            while not stop.is_set():
                s = svc.stats().get("batcher", {})
                occ.append(s.get("active", 0))
                queued.append(s.get("queued", 0))
                time.sleep(0.25)

        threads = [
            threading.Thread(target=client, args=(i,), daemon=True)
            for i in range(n_clients)
        ] + [threading.Thread(target=monitor, daemon=True)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(DURATION)
        stop.set()
        for t in threads:
            t.join(timeout=120)
        wall = time.perf_counter() - t0

        def pct(xs, q):
            return round(float(np.percentile(xs, q)) * 1e3, 1) if xs else None

        results.append({
            "clients": n_clients,
            "duration_s": round(wall, 1),
            "completed": len(lat["decode"]) + len(lat["prefill"]),
            "gen_tok_s": round(tokens_out[0] / wall, 1),
            "decode_p50_ms": pct(lat["decode"], 50),
            "decode_p99_ms": pct(lat["decode"], 99),
            "prefill_p50_ms": pct(lat["prefill"], 50),
            "prefill_p99_ms": pct(lat["prefill"], 99),
            "occupancy_mean": round(float(np.mean(occ)), 2) if occ else None,
            "queued_mean": round(float(np.mean(queued)), 2) if queued else None,
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({
        "stage": "serving_load", "slots": SLOTS, "block": BLOCK,
        "quant": os.environ.get("QUANT") or "bf16",
        "platform": jax.devices()[0].platform,
        "prefix_cache": svc.stats().get("prefix_cache"),
        "loads": results,
    }))
    server.shutdown()


if __name__ == "__main__":
    main()
