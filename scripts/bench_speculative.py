"""On-chip speculative-decoding cost model (single stream, B=1).

There is no small RWKV draft checkpoint in this image and random weights
give a meaningless acceptance rate, so this measures the MECHANICS and
reports the implied speedup as a function of acceptance alpha:

  t_base         per-token cost of plain greedy decode (target T=1 step,
                 one dispatch per token — the host-loop engine path)
  t_draft_round  the ENTIRE gamma-step draft lookahead as one dispatched
                 lax.scan (exactly SpeculativeEngine._draft_scan)
  t_verify       target verify pass over gamma+1 tokens (one prefill)
  t_reprefill    mean target correction re-prefill (length ~gamma/2)

Round cost (greedy speculative, infer/speculative.py):
  full accept  (prob ~alpha^gamma): t_draft_round + t_verify
                                    -> gamma+1 tokens
  partial at j: + t_reprefill (target) + ~t_reprefill_draft -> j+1 tokens
Expected tokens/round under iid-alpha: sum_{j} P(j)*(j+1); speedup =
(tokens/round * t_base) / round cost. Printed for alpha in 0..1.

Note on this environment: every dispatch crosses the axon relay, so a
host-loop T=1 step pays a large fixed latency. Speculation amortizes
that by emitting up to gamma+1 tokens per 2-3 dispatches — part of the
measured win is dispatch amortization, which a local-TPU deployment
gets from generate_on_device instead. Both effects are real; the
verify-pass-vs-decode-steps compute trade is the hardware-independent
part.

Run: python scripts/bench_speculative.py  (TPU, ~3-6 min of compiles)
Env: GAMMA (default 8), LAYERS/EMBD to resize the target.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.config import ModelConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch, rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state


def timed(fn, *args, iters=20, warmup=2):
    """Data-chained timing: each call consumes the previous call's state
    so the relay cannot elide repeats; one host fetch at the end."""
    for _ in range(warmup):
        out = fn(*args)
        args = _thread(args, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args = _thread(args, out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _thread(args, out):
    # replace the trailing state argument with the returned state
    return args[:-1] + (out[1],)


def main():
    gamma = int(os.environ.get("GAMMA", "8"))
    n_layer = int(os.environ.get("LAYERS", "24"))
    n_embd = int(os.environ.get("EMBD", "2048"))
    t_cfg = ModelConfig(
        n_layer=n_layer, n_embd=n_embd, vocab_size=65536, head_size=64,
        dtype="bfloat16", param_dtype="bfloat16",
    )
    d_cfg = ModelConfig(
        n_layer=6, n_embd=512, vocab_size=65536, head_size=64,
        dtype="bfloat16", param_dtype="bfloat16",
    )
    tp = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), t_cfg,
                                         fast_init=True))
    dp = jax.device_put(init_rwkv_params(jax.random.PRNGKey(1), d_cfg,
                                         fast_init=True))
    t_cfg = apply_wkv_dispatch(t_cfg, tp)
    d_cfg = apply_wkv_dispatch(d_cfg, dp)

    tok1 = jnp.ones((1, 1), jnp.int32)
    tokg = jnp.ones((1, gamma + 1), jnp.int32)
    tokh = jnp.ones((1, gamma // 2 + 1), jnp.int32)

    t_step = jax.jit(lambda p, t, s: rwkv_forward(p, t_cfg, t, s))
    t_ver = jax.jit(lambda p, t, s: rwkv_forward(p, t_cfg, t, s))
    d_ver = jax.jit(lambda p, t, s: rwkv_forward(p, d_cfg, t, s))

    def draft_scan(p, cur, state):
        def body(carry, _):
            tok, st = carry
            logits, st = rwkv_forward(p, d_cfg, tok[None, None], st)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, st), nxt

        (last, st), toks = jax.lax.scan(
            body, (cur, state), None, length=gamma
        )
        return toks, st

    d_scan = jax.jit(draft_scan)

    out = {"gamma": gamma, "platform": jax.devices()[0].platform}
    out["t_base_ms"] = 1e3 * timed(
        t_step, tp, tok1, init_model_state(t_cfg, 1))
    out["t_draft_round_ms"] = 1e3 * timed(
        d_scan, dp, jnp.int32(1), init_model_state(d_cfg, 1))
    out["t_verify_ms"] = 1e3 * timed(
        t_ver, tp, tokg, init_model_state(t_cfg, 1))
    out["t_reprefill_ms"] = 1e3 * timed(
        t_ver, tp, tokh, init_model_state(t_cfg, 1))
    out["t_reprefill_draft_ms"] = 1e3 * timed(
        d_ver, dp, tokh, init_model_state(d_cfg, 1))

    td, tv, tr, trd, tb = (
        out["t_draft_round_ms"], out["t_verify_ms"],
        out["t_reprefill_ms"], out["t_reprefill_draft_ms"],
        out["t_base_ms"],
    )
    curve = {}
    for a10 in range(0, 11):
        a = a10 / 10.0
        # iid acceptance: P(j accepted) = a^j*(1-a) for j<gamma, a^gamma
        exp_tokens = sum(
            (j + 1) * (a ** j) * (1 - a) for j in range(gamma)
        ) + (gamma + 1) * a ** gamma
        p_partial = 1 - a ** gamma
        # the draft re-advance runs every round (infer/speculative.py);
        # the target correction re-prefill only on partial acceptance
        round_ms = td + tv + trd + p_partial * tr
        curve[f"{a:.1f}"] = round(exp_tokens * tb / round_ms, 3)
    out["speedup_vs_acceptance"] = curve
    out["breakeven_acceptance"] = next(
        (float(k) for k, v in curve.items() if v >= 1.0), None
    )
    out["tok_s_base"] = round(1e3 / tb, 1)
    out["tok_s_at_accept_0.8"] = round(curve["0.8"] * 1e3 / tb, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
