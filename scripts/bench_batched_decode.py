"""Batched decode-step benchmark: gumbel vs invcdf sampling at B=64, 1B6.

Measured r1: gumbel 16.3 ms/step (3.9k tok/s aggregate) on the padded
(N, N) state layout. With the tile-packed canonical state + packed T=1
step (models/state.py + ops/wkv_decode.py): 10.67 ms (6.0k tok/s);
int8 weights 9.74 ms (6.6k). Set INT8=1 to quantize.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from rwkv_lm_ext_tpu.config import rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams, sample_token

B = 64
N_TOK = 64
cfg = rwkv6_1b6(param_dtype="bfloat16")
params = init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
_sl = int(os.environ.get("SLOT_LORA", "0"))
_lora_trees = None
if _sl:
    # SLOT_LORA=n -> n stacked adapters (r=8), every row decoding under a
    # random adapter (incl. base) — the multi-adapter serving tax
    from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params

    _lc = LoraConfig(r=8, alpha=32.0)
    _lora_trees = {
        f"a{i}": init_lora_params(jax.random.PRNGKey(100 + i), params, _lc)
        for i in range(_sl)
    }
_q = os.environ.get("INT8")
if _q:
    from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

    # INT8=1 -> dequantize-to-bf16 weights; INT8=int8c -> native int8 MXU
    params = quantize_tree(
        params, "int8" if _q == "1" else _q, include_head=True
    )
if _lora_trees is not None:
    from rwkv_lm_ext_tpu.adapters import build_slot_lora, set_slot_idx

    params, _ids = build_slot_lora(params, _lora_trees, _lc, rows=B)
    params = set_slot_idx(
        params,
        jax.random.randint(jax.random.PRNGKey(7), (B,), 0, _sl + 1),
    )
params = jax.device_put(params)
state = init_model_state(cfg, B)
tok0 = jnp.full((B,), 5, jnp.int32)

def mk(sp, n):
    @jax.jit
    def f(params, tok0, state, rng):
        occ = jnp.zeros((B, cfg.vocab_size), jnp.float32)
        def body(carry, _):
            tok, st, occ, rng = carry
            lg, st = rwkv_forward(params, cfg, tok[:, None], st)
            rng, sub = jax.random.split(rng)
            nxt, occ = sample_token(sub, lg[:, -1], occ, sp)
            return (nxt, st, occ, rng), jnp.sum(tok)
        (tok, st, _, _), s = jax.lax.scan(body, (tok0, state, occ, rng), None, length=n)
        return jnp.sum(s)
    return f

for name, sp in [
    ("gumbel", SamplingParams(top_p_impl="bisect")),
    ("invcdf", SamplingParams(top_p_impl="bisect", categorical_impl="invcdf")),
]:
    f1, fn = mk(sp, 8), mk(sp, N_TOK)
    rng = jax.random.PRNGKey(0)
    float(f1(params, tok0, state, rng)); float(fn(params, tok0, state, rng))
    t0 = time.perf_counter(); float(fn(params, tok0, state, rng)); dtn = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(params, tok0, state, rng)); dt1 = time.perf_counter() - t0
    per = (dtn - dt1) / (N_TOK - 8)
    print(json.dumps({"impl": name, "step_ms": round(per*1e3, 2),
                      "agg_tok_s": round(B/per, 1)}))
