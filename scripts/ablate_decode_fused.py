"""Fused-prologue decode ablation at 1B6: does collapsing the per-layer
glue (ln + shift + ddlerp + decay, ln2 + mix) into Pallas programs
(ops/decode_fused.py) cut the ~3.3 ms/step fusion-granularity residual?

Variants (all greedy, no sampling, hidden-state decode + head):
  forward      rwkv_forward(tok[:, None]) — the current production path
  step         rwkv_decode_step(fused_prep=False) — T-axis-free, unfused
  step_fused   rwkv_decode_step(fused_prep=True)  — Pallas glue kernels
  step_ffnblk  ffn whole-block kernel only (att side unfused)
  step_attprep att prep kernel only (ffn side unfused)

Differential methodology (long scan minus short scan, one host fetch).
Env: B (64), N_LONG (48), N_SHORT (8), VARIANTS (comma list).
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
    import rwkv_lm_ext_tpu.models.decode as dec

    @jax.jit
    def f(params, tok0, state):
        def body(carry, _):
            tok, st = carry
            if variant == "forward":
                lg, st = rwkv_forward(params, cfg, tok[:, None], st)
                lg = lg[:, -1]
            elif variant in ("step_ffnblk", "step_attprep"):
                # hand-spliced: one side fused, the other unfused
                B = tok.shape[0]
                dt = cfg.compute_dtype
                x = jnp.take(params["emb"], tok, axis=0).astype(dt)
                na, nw, nf = [], [], []
                for i, bp in enumerate(params["blocks"]):
                    if i == 0 and "ln0" in bp:
                        x = dec._ln(x, bp["ln0"])
                    if variant == "step_attprep":
                        ao, ash, wp = dec._att_step_fused(
                            bp["att"], bp["ln1"], cfg, x,
                            st["att_shift"][i], st["wkv"][i])
                        x = x + ao
                        fo, fsh = dec._ffn_step(
                            bp["ffn"], cfg, dec._ln(x, bp["ln2"]),
                            st["ffn_shift"][i])
                        x = x + fo
                    else:
                        ao, ash, wp = dec._att_step(
                            bp["att"], cfg, dec._ln(x, bp["ln1"]),
                            st["att_shift"][i], st["wkv"][i])
                        x = x + ao
                        x, fsh = dec._ffn_step_fused(
                            bp["ffn"], bp["ln2"], cfg, x,
                            st["ffn_shift"][i])
                    na.append(ash); nw.append(wp); nf.append(fsh)
                st = {"att_shift": jnp.stack(na), "wkv": jnp.stack(nw),
                      "ffn_shift": jnp.stack(nf)}
                x = dec._ln(x, params["ln_out"])
                lg = dec.proj(x, params["head"], dt)
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
    variants = os.environ.get(
        "VARIANTS", "step,step_fused,step_ffnblk,step_attprep"
    ).split(",")
    for v in variants:
        r = run(v.strip())
        r["B"] = B
        print(json.dumps(r), flush=True)
