"""Real-TPU numerics smoke: the cross-path contracts the CPU test suite
can't pin (tests/conftest.py forces the CPU platform; Pallas kernels there
run in interpret mode — this script runs the COMPILED kernels on the
chip).

Checks, on a production-geometry random model (layers trimmed for
compile time; H/N/C ratios of 1B6):
  1. chunked Pallas prefill (T=64) vs token-by-token packed decode:
     per-position logits + carried state agreement (bf16 contract:
     logits exact-ish, state ~4e-3 rel — see .claude/skills/verify).
  2. fused decode prep kernels (att_prep/ffn_block) compiled vs their
     jnp compositions.
  3. exact-A vs rescale-dispatch WKV paths vs the dense golden model.

Prints one JSON line {"ok": bool, ...max errors...}; rc 1 on failure.
Run: python scripts/tpu_smoke.py   (~2-4 min, mostly compiles)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(
        np.abs(a - b).max() / max(1e-6, float(np.abs(b).max()))
    )


def main():
    from rwkv_lm_ext_tpu.config import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch, rwkv_forward
    from rwkv_lm_ext_tpu.models.state import init_model_state

    out = {"platform": jax.devices()[0].platform}
    ok = True

    # production head geometry (H*N=C, N=64), 4 layers for compile time
    cfg = ModelConfig(
        n_layer=4, n_embd=512, vocab_size=4096, head_size=64,
        dtype="bfloat16", param_dtype="bfloat16",
    )
    params = jax.device_put(
        init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True)
    )
    cfg = apply_wkv_dispatch(cfg, params)
    out["dispatch"] = {
        "wkv_exact": cfg.wkv_exact, "fused_chunk": cfg.fused_chunk
    }
    B, T = 8, 64
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (B, T), 4, cfg.vocab_size - 4, jnp.int32
    )

    # 1) chunked prefill vs token-by-token decode
    lg_pref, st_pref = jax.jit(
        lambda p, t: rwkv_forward(p, cfg, t)
    )(params, tokens)
    step = jax.jit(lambda p, t, s: rwkv_forward(p, cfg, t, s))
    s = init_model_state(cfg, B)
    logits = []
    for t in range(T):
        lg, s = step(params, tokens[:, t:t + 1], s)
        logits.append(lg)
    lg_dec = jnp.concatenate(logits, axis=1)
    out["prefill_vs_decode_logits_rel"] = rel(lg_dec, lg_pref)
    out["prefill_vs_decode_wkv_rel"] = rel(s["wkv"], st_pref["wkv"])
    ok &= out["prefill_vs_decode_logits_rel"] < 2e-2
    ok &= out["prefill_vs_decode_wkv_rel"] < 2e-2

    # 2) fused decode prep kernels compiled vs jnp refs
    from rwkv_lm_ext_tpu.ops.decode_fused import (
        _att_prep_ref,
        _ffn_block_ref,
        att_prep_fused,
        ffn_block_fused,
    )

    C = cfg.n_embd
    ks = jax.random.split(jax.random.PRNGKey(2), 12)
    x = jax.random.normal(ks[0], (B, C), jnp.bfloat16)
    shift = jax.random.normal(ks[1], (B, C), jnp.float32)
    sc = 1.0 + 0.1 * jax.random.normal(ks[2], (C,))
    bi = 0.1 * jax.random.normal(ks[3], (C,))
    maas = 0.5 * jax.random.normal(ks[4], (6, C))
    w1 = 0.2 * jax.random.normal(ks[5], (C, 160))
    w2 = 0.2 * jax.random.normal(ks[6], (5, 32, C))
    dw1 = 0.2 * jax.random.normal(ks[7], (C, 64))
    dw2 = 0.2 * jax.random.normal(ks[8], (64, C))
    td = jax.random.normal(ks[9], (C,))
    ref = _att_prep_ref(x, shift, sc, bi, maas, w1, w2, dw1, dw2, td, 1e-5)
    got = jax.jit(
        lambda *a: att_prep_fused(*a, 1e-5)
    )(x, shift, sc, bi, maas, w1, w2, dw1, dw2, td)
    out["att_prep_rel"] = max(rel(g, r) for r, g in zip(ref, got))
    ok &= out["att_prep_rel"] < 2e-2

    F = 2 * C
    wk = (0.05 * jax.random.normal(ks[10], (C, F))).astype(jnp.bfloat16)
    wv = (0.05 * jax.random.normal(ks[11], (F, C))).astype(jnp.bfloat16)
    wr = (0.05 * jax.random.normal(ks[0], (C, C))).astype(jnp.bfloat16)
    mk = jax.random.uniform(ks[1], (C,))
    mr = jax.random.uniform(ks[2], (C,))
    # B=8 < the full-batch requirement check? guard expects _pick_bb==B
    refb = _ffn_block_ref(x, shift, sc, bi, mk, mr, wk, wv, wr, 1e-5)
    gotb = jax.jit(
        lambda *a: ffn_block_fused(*a, 1e-5)
    )(x, shift, sc, bi, mk, mr, wk, wv, wr)
    out["ffn_block_rel"] = max(rel(g, r) for r, g in zip(refb, gotb))
    ok &= out["ffn_block_rel"] < 2e-2

    # 3) WKV kernel paths vs the dense golden model
    from rwkv_lm_ext_tpu.ops.wkv import wkv
    from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_reference

    H, N = cfg.n_head, cfg.head_size
    kw = jax.random.split(jax.random.PRNGKey(3), 5)
    r = jax.random.normal(kw[0], (B, T, H, N), jnp.bfloat16)
    k = jax.random.normal(kw[1], (B, T, H, N), jnp.bfloat16)
    v = jax.random.normal(kw[2], (B, T, H, N), jnp.bfloat16)
    w = -jnp.exp(jax.random.normal(kw[3], (B, T, H, N)))  # raw log decay
    u = jax.random.normal(kw[4], (H, N), jnp.float32)
    y_gold, s_gold = wkv_reference(r, k, v, w, u)
    for name, exact in (("exact", True), ("rescale", False)):
        y, sfin = jax.jit(
            lambda r, k, v, w, u, e=exact: wkv(
                r, k, v, w, u, backend="pallas", chunk_size=64, exact=e
            )
        )(r, k, v, w, u)
        out[f"wkv_pallas_{name}_y_rel"] = rel(y, y_gold)
        out[f"wkv_pallas_{name}_s_rel"] = rel(sfin, s_gold)
        ok &= out[f"wkv_pallas_{name}_y_rel"] < 2e-2
        ok &= out[f"wkv_pallas_{name}_s_rel"] < 2e-2

    out["ok"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
