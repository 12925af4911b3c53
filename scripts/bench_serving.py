"""Secondary serving benchmarks (BASELINE.md: rerank pairs/sec + p50
latency have no reference numbers — measure & report).

Measures on one chip, RWKV-6 1B6:
- rerank pairs/sec at ctx 256 (cross-encoder scoring, batched)
- rerank p50 latency for one batch
- decode tokens/sec single-stream (fully on-device scan decode)

Same anti-elision methodology as bench.py. Prints one JSON line per metric.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_lm_ext_tpu.config import rwkv6_1b6, CLS_ID, SEP_ID
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.heads import classify_sequences, init_classification_head
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams, sample_token

B = int(os.environ.get("BENCH_BATCH", "64"))
T = int(os.environ.get("BENCH_CTX", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
DECODE_T = int(os.environ.get("BENCH_DECODE_TOKENS", "128"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True))
# serving-style dispatch (load_rwkv_checkpoint default): picks the
# fastest exact-safe kernel path for these params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch

cfg = apply_wkv_dispatch(cfg, params, margin=0.0)
score = init_classification_head(jax.random.PRNGKey(1), cfg, 1)
tokens0 = jax.random.randint(jax.random.PRNGKey(2), (B, T), 4, 60000, jnp.int32)
tokens0 = tokens0.at[:, T // 2].set(SEP_ID).at[:, -1].set(CLS_ID)


def chained_rerank(n):
    @jax.jit
    def f(params, score, toks):
        def body(tk, _):
            s = classify_sequences(params, cfg, tk, score, wkv_backend="auto")
            d = (jnp.abs(s[:, None] * 100).astype(jnp.int32) % 13)
            tk = 4 + (tk + d - 4) % 59000
            tk = tk.at[:, T // 2].set(SEP_ID).at[:, -1].set(CLS_ID)
            return tk, jnp.sum(s)
        tk, ss = jax.lax.scan(body, toks, None, length=n)
        return jnp.sum(ss)
    return f


def bench_rerank():
    f1, fn = chained_rerank(1), chained_rerank(ITERS)
    float(f1(params, score, tokens0)); float(fn(params, score, tokens0))
    t0 = time.perf_counter(); float(fn(params, score, tokens0)); dtn = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(params, score, tokens0)); dt1 = time.perf_counter() - t0
    per = (dtn - dt1) / (ITERS - 1)
    print(json.dumps({
        "metric": f"rerank_pairs_per_sec_chip (RWKV-6 1B6, ctx {T})",
        "value": round(B / per, 2), "unit": "pairs/s/chip",
        "p50_batch_latency_ms": round(per * 1e3, 2),
        "vs_baseline": None,
    }))


def bench_decode():
    sp = SamplingParams(temperature=1.0, top_p=0.85)

    def scan_decode(n):
        @jax.jit
        def f(params, tok0, state, rng):
            occ = jnp.zeros((cfg.vocab_size,), jnp.float32)

            def body(carry, _):
                tok, st, occ, rng = carry
                lg, st = rwkv_forward(params, cfg, tok[None, None], st)
                rng, sub = jax.random.split(rng)
                nxt, occ = sample_token(sub, lg[0, -1], occ, sp)
                return (nxt, st, occ, rng), tok

            (tok, st, _, _), toks = jax.lax.scan(
                body, (tok0, state, occ, rng), None, length=n
            )
            return jnp.sum(toks)

        return f

    from rwkv_lm_ext_tpu.models.state import init_model_state

    state = init_model_state(cfg, 1)
    tok0 = jnp.asarray(5, jnp.int32)
    rng = jax.random.PRNGKey(0)
    f1, fn = scan_decode(8), scan_decode(DECODE_T)
    float(f1(params, tok0, state, rng)); float(fn(params, tok0, state, rng))
    t0 = time.perf_counter(); float(fn(params, tok0, state, rng)); dtn = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(params, tok0, state, rng)); dt1 = time.perf_counter() - t0
    per_tok = (dtn - dt1) / (DECODE_T - 8)
    print(json.dumps({
        "metric": "decode_tokens_per_sec_single_stream (RWKV-6 1B6)",
        "value": round(1.0 / per_tok, 2), "unit": "tok/s",
        "p50_token_latency_ms": round(per_tok * 1e3, 3),
        "vs_baseline": None,
    }))


def bench_engine_stream():
    """END-TO-END single-stream generation through GenerationEngine.
    generate — host loop included (the r4 gap: ~30 tok/s through the
    engine vs 244 for the bare jitted scan above; the K-per-dispatch
    decode blocks close most of it). Reports tok/s per block size."""
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine

    engine = GenerationEngine(params, cfg)
    sp = SamplingParams(temperature=1.0, top_p=0.85, token_stop=())
    prompt = list(range(10, 42))
    n = DECODE_T
    out = {}
    for bs in (1, 8, 16, 32):
        # warm with the SAME max_tokens so every block shape (bs and
        # the remainder) compiles before the timed run
        engine.generate(prompt, max_tokens=n, sampling=sp,
                        block_size=bs, seed=0)
        t0 = time.perf_counter()
        ids = engine.generate(prompt, max_tokens=n, sampling=sp,
                              block_size=bs, seed=1)
        dt = time.perf_counter() - t0
        assert len(ids) == n
        out[f"block{bs}"] = round(n / dt, 2)
    print(json.dumps({
        "metric": "engine_generate_tok_s_single_stream (RWKV-6 1B6, "
                  "host loop incl.)",
        "value": out["block8"], "unit": "tok/s",
        "by_block_size": out,
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    bench_rerank()
    bench_decode()
    bench_engine_stream()
