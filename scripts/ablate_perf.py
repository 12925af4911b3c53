"""Perf ablation for the 1B6 embedding benchmark: where does time go?

Variants: full model (pallas / chunked wkv), wkv stubbed to identity
(non-wkv ceiling), and a pure-matmul roofline at the same total FLOPs.
Methodology identical to bench.py (chained lax.scan, one fetch).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_lm_ext_tpu.config import rwkv6_1b6, EMB_ID
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.heads import embed_sequences
import rwkv_lm_ext_tpu.models.rwkv as rwkv_mod

B = int(os.environ.get("B", "64"))
T = int(os.environ.get("T", "512"))
ITERS = int(os.environ.get("ITERS", "3"))

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
params = jax.device_put(params)
tokens0 = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4, 60000, jnp.int32)

real_wkv = rwkv_mod.wkv


def fake_wkv(r, k, v, w, u, s0=None, **kw):
    Bs, Ts, H, N = r.shape
    y = r * k + v  # cheap elementwise stand-in
    S = s0 if s0 is not None else jnp.zeros((Bs, H, N, N), jnp.float32)
    return y.astype(jnp.float32), S


def timed(name, backend, stub=False):
    rwkv_mod.wkv = fake_wkv if stub else real_wkv

    def one(p, toks):
        toks = toks.at[:, -1].set(EMB_ID)
        return embed_sequences(p, cfg, toks, wkv_backend=backend)

    def make(n):
        @jax.jit
        def f(p, toks):
            def body(tk, _):
                e = one(p, tk)
                d = (jnp.abs(e[:, :T] * 100).astype(jnp.int32) % 17)
                tk = 4 + (tk + d - 4) % 60000
                return tk, jnp.sum(e.astype(jnp.float32))
            tk, s = jax.lax.scan(body, toks, None, length=n)
            return jnp.sum(s)
        return f

    f1, fn = make(1), make(ITERS)
    float(f1(params, tokens0)); float(fn(params, tokens0))
    t0 = time.perf_counter(); float(fn(params, tokens0)); dtn = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(params, tokens0)); dt1 = time.perf_counter() - t0
    per = (dtn - dt1) / (ITERS - 1)
    flops = 2 * 1.55e9 * B * T
    print(f"{name:28s} {B/per:8.2f} seq/s  {flops/per/1e12:6.1f} TFLOP/s", flush=True)
    rwkv_mod.wkv = real_wkv


def matmul_roofline():
    # ~same matmul volume as one forward: 24 layers x ~(4+1)*C^2 + ffn
    x = jax.random.normal(jax.random.PRNGKey(0), (B * T, 2048), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (2048, 2048), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(2), (2048, 7168), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(3), (7168, 2048), jnp.bfloat16)

    def make(n):
        @jax.jit
        def f(x):
            def body(xx, _):
                for _ in range(24):
                    for _ in range(5):
                        xx = xx @ w1
                    h = jax.nn.relu(xx @ w2)
                    xx = h @ w3
                return xx / jnp.maximum(jnp.abs(xx).max(), 1.0), jnp.sum(xx)
            xx, s = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(s)
        return f

    f1, fn = make(1), make(ITERS)
    float(f1(x)); float(fn(x))
    t0 = time.perf_counter(); float(fn(x)); dtn = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1(x)); dt1 = time.perf_counter() - t0
    per = (dtn - dt1) / (ITERS - 1)
    flops = 24 * (5 * 2 * 2048**2 + 2 * 2048 * 7168 * 2) * B * T
    print(f"{'matmul roofline':28s} {'':8s}        {flops/per/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    matmul_roofline()
    timed("wkv=identity (ceiling)", "chunked", stub=True)
    timed("full, chunked", "chunked")
    timed("full, pallas", "pallas")
    # the headline serving config (decay-bound dispatch: rescale path,
    # large fused chunk). NOTE the stub "ceiling" runs without the
    # fused prologue (chunked backend), so this can exceed it.
    from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch
    cfg = apply_wkv_dispatch(cfg, params, margin=0.0)
    timed("full, pallas (dispatched)", "auto")
