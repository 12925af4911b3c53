"""Decode-step ablation at B=64, 1B6: where do the milliseconds go?

Differential methodology (long scan minus short scan, one host fetch) so
the remote-dispatch round trip cancels. Variants:
  full/packed    auto backend (tile-packed XLA T=1 step — the default)
  full/xla       reference backend (sequential-scan XLA path, logical state)
  nostate        packed T=1 step stubbed to y=r*k+v, state passthrough
                 (non-state ceiling)
  nohead         hidden state only: no 65536-vocab head matmul, no sampling
Env: B (64), N_LONG (48), N_SHORT (8).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.config import rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
import rwkv_lm_ext_tpu.models.rwkv as rwkv_mod
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams, sample_token

B = int(os.environ.get("B", "64"))
NL = int(os.environ.get("N_LONG", "48"))
NS = int(os.environ.get("N_SHORT", "8"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True))
state0 = init_model_state(cfg, B)
tok0 = jnp.full((B,), 5, jnp.int32)
sp = SamplingParams(top_p_impl="bisect")

import rwkv_lm_ext_tpu.ops.wkv_decode as wkv_decode_mod

real_wkv = rwkv_mod.wkv
real_packed = wkv_decode_mod.wkv6_decode_step_packed


def fake_wkv(r, k, v, w, u, s0=None, **kw):
    Bs, Ts, H, N = r.shape
    S = s0 if s0 is not None else jnp.zeros((Bs, H, N, N), jnp.float32)
    return (r * k + v).astype(jnp.float32), S


def fake_packed(r, k, v, w, g, u, scale, bias, state_packed, *, eps):
    return (r * k + v).astype(g.dtype), state_packed


def mk(n, backend, head=True):
    @jax.jit
    def f(params, tok0, state, rng):
        occ = jnp.zeros((B, cfg.vocab_size), jnp.float32)

        def body(carry, _):
            tok, st, occ, rng = carry
            if head:
                lg, st = rwkv_forward(
                    params, cfg, tok[:, None], st, wkv_backend=backend
                )
                rng, sub = jax.random.split(rng)
                nxt, occ = sample_token(sub, lg[:, -1], occ, sp)
            else:
                h, st = rwkv_forward(
                    params, cfg, tok[:, None], st, wkv_backend=backend,
                    return_hidden=True, return_logits=False,
                )
                nxt = (jnp.abs(h[:, -1, 0] * 100).astype(jnp.int32) % 100) + 4
            return (nxt, st, occ, rng), jnp.sum(tok)

        (tok, st, _, _), s = jax.lax.scan(
            body, (tok0, state, occ, rng), None, length=n
        )
        return jnp.sum(s)

    return f


def run(name, backend, head=True, stub=False):
    rwkv_mod.wkv = fake_wkv if stub else real_wkv
    wkv_decode_mod.wkv6_decode_step_packed = (
        fake_packed if stub else real_packed
    )
    try:
        fs, fl = mk(NS, backend, head), mk(NL, backend, head)
        rng = jax.random.PRNGKey(0)
        float(fs(params, tok0, state0, rng)); float(fl(params, tok0, state0, rng))

        def t(f):
            t0 = time.perf_counter()
            for _ in range(5):
                float(f(params, tok0, state0, rng))
            return (time.perf_counter() - t0) / 5

        per = (t(fl) - t(fs)) / (NL - NS)
        print(json.dumps({"variant": name, "step_ms": round(per * 1e3, 2)}))
    finally:
        rwkv_mod.wkv = real_wkv
        wkv_decode_mod.wkv6_decode_step_packed = real_packed


run("full/packed", "auto")
run("full/xla", "reference")
run("nohead/packed", "auto", head=False)
run("nohead/xla", "reference", head=False)
run("nostate/packed", "auto", stub=True)
