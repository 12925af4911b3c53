"""Per-stage roofline accounting for the LoRA train step (VERDICT r3 #2).

Itemizes the 1B6 B8 ctx512 LoRA SFT step the way ablate_decode_fused did
for decode: forward alone, fwd+bwd, +optimizer, head/CE ablated, WKV
stubbed, and full-model (no LoRA merge) — all data-chained through
_benchlib.time_scan (elision canary on).

FLOP accounting (C=2048, F=7168, V=65536, L=24, r=8):
  fwd body   = 2L(5C^2 + 2*224C + 2CF) per token   (bench.py roofline)
  fwd head   = 2CV per token
  merged-LoRA bwd = 2x fwd body (dx + dW cotangent of every merged
                    weight) + dx-only head (2CV)
  unfused-LoRA bwd = 1x fwd body (dx only; A/B grads are O(r) extra)
                    + dx-only head
Stages (pass names as argv, default all):
  fwd grads step nohead noce wkv_stub full_ft
Env: B (8), T (512), ITERS (4), REMAT (0), LORA_MODE (merge|unfused).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _benchlib import time_scan, perturb_tokens
from rwkv_lm_ext_tpu.config import TrainConfig, rwkv6_1b6
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.rwkv import apply_wkv_dispatch, rwkv_forward
from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params, merge_lora
from rwkv_lm_ext_tpu.train.loop import make_train_step, sft_loss_fn
from rwkv_lm_ext_tpu.train.losses import causal_lm_loss
import rwkv_lm_ext_tpu.models.rwkv as rwkv_mod

B = int(os.environ.get("B", "8"))
T = int(os.environ.get("T", "512"))
ITERS = int(os.environ.get("ITERS", "4"))
from rwkv_lm_ext_tpu.utils.remat import normalize_remat

REMAT = normalize_remat(os.environ.get("REMAT", "0"))
LORA_MODE = os.environ.get("LORA_MODE", "merge")
stages = sys.argv[1:] or ["fwd", "grads", "step", "nohead", "noce", "wkv_stub", "full_ft"]

cfg = rwkv6_1b6(param_dtype="bfloat16")
params = jax.device_put(init_rwkv_params(jax.random.PRNGKey(0), cfg, fast_init=True))
cfg = apply_wkv_dispatch(cfg, params)
lc = LoraConfig(r=8, alpha=32.0)
adapter = jax.device_put(init_lora_params(jax.random.PRNGKey(2), params, lc))
toks0 = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4, 60000, jnp.int32)

C, F, V, L = cfg.n_embd, cfg.dim_ffn, cfg.vocab_size, cfg.n_layer
FWD_BODY = 2 * L * (5 * C * C + 2 * 224 * C + 2 * C * F)
FWD_HEAD = 2 * C * V
TOK = B * T


def apply_adapter(frozen, ad):
    if LORA_MODE == "unfused":
        from rwkv_lm_ext_tpu.adapters.lora import apply_lora_unfused

        return apply_lora_unfused(frozen, ad, lc)
    return merge_lora(frozen, ad, lc)


def loss_tokens(merged, toks):
    return sft_loss_fn(merged, cfg, {"input_ids": toks, "labels": toks},
                       remat=REMAT)


def report(name, per, train_flops_tok, note=""):
    kts = TOK / per / 1e3
    tf = train_flops_tok * TOK / per / 1e12 if train_flops_tok else None
    print(json.dumps({
        "stage": name, "step_ms": round(per * 1e3, 1),
        "kt_s": round(kts, 2),
        "useful_tflops": round(tf, 1) if tf else None,
        "note": note,
    }), flush=True)


def run(stage):
    if stage == "fwd":
        def body(toks, p, ad):
            l = loss_tokens(apply_adapter(p, ad), toks)
            return perturb_tokens(toks, l)
        per = time_scan(body, toks0, ITERS, const=(params, adapter))
        report(stage, per, FWD_BODY + FWD_HEAD, "loss only (incl merge)")
    elif stage == "grads":
        g = jax.grad(lambda ad, p, toks: loss_tokens(apply_adapter(p, ad), toks))

        def body(toks, p, ad):
            grads = g(ad, p, toks)
            sig = jax.tree_util.tree_leaves(grads)[0]
            return perturb_tokens(toks, sig)
        per = time_scan(body, toks0, ITERS, const=(params, adapter))
        bwd = 2 * FWD_BODY if LORA_MODE == "merge" else FWD_BODY
        report(stage, per, FWD_BODY + FWD_HEAD + bwd + FWD_HEAD,
               f"fwd+bwd, {LORA_MODE} adapter")
    elif stage == "step":
        tc = TrainConfig(lr_init=1e-4, warmup_steps=1, total_steps=100)

        def loss_fn(ad, frozen, cfg_, b):
            return loss_tokens(apply_adapter(frozen, ad), b["input_ids"])
        init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn, donate=False)
        ts0 = init_fn(adapter)

        def body(carry, p):
            ts, toks = carry
            ts, m = step_fn(ts, {"input_ids": toks, "labels": toks}, p)
            return (ts, perturb_tokens(toks, m["loss"]))
        # carry sums the whole TrainState at the end — harmless (few MB)
        per = time_scan(body, (ts0, toks0), ITERS, const=(params,))
        bwd = 2 * FWD_BODY if LORA_MODE == "merge" else FWD_BODY
        report(stage, per, FWD_BODY + FWD_HEAD + bwd + FWD_HEAD,
               "full step incl adam")
    elif stage == "nohead":
        def loss_nohead(merged, toks):
            h, _ = rwkv_forward(merged, cfg, toks, remat=REMAT,
                                return_hidden=True, return_logits=False)
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-9
        g = jax.grad(lambda ad, p, toks: loss_nohead(apply_adapter(p, ad), toks))

        def body(toks, p, ad):
            grads = g(ad, p, toks)
            return perturb_tokens(toks, jax.tree_util.tree_leaves(grads)[0])
        per = time_scan(body, toks0, ITERS, const=(params, adapter))
        bwd = 2 * FWD_BODY if LORA_MODE == "merge" else FWD_BODY
        report(stage, per, FWD_BODY + bwd, "no head matmul / CE")
    elif stage == "noce":
        def loss_noce(merged, toks):
            logits, _ = rwkv_forward(merged, cfg, toks, remat=REMAT)
            return jnp.sum(logits.astype(jnp.float32)) * 1e-9
        g = jax.grad(lambda ad, p, toks: loss_noce(apply_adapter(p, ad), toks))

        def body(toks, p, ad):
            grads = g(ad, p, toks)
            return perturb_tokens(toks, jax.tree_util.tree_leaves(grads)[0])
        per = time_scan(body, toks0, ITERS, const=(params, adapter))
        bwd = 2 * FWD_BODY if LORA_MODE == "merge" else FWD_BODY
        report(stage, per, FWD_BODY + FWD_HEAD + bwd + FWD_HEAD,
               "head kept, CE/logsumexp dropped")
    elif stage == "wkv_stub":
        real = rwkv_mod.wkv

        def fake_wkv(r, k, v, w, u, s0=None, **kw):
            Bs, Ts, H, N = r.shape
            y = r * k + v
            S = s0 if s0 is not None else jnp.zeros((Bs, H, N, N), jnp.float32)
            return y.astype(jnp.float32), S
        rwkv_mod.wkv = fake_wkv
        try:
            g = jax.grad(lambda ad, p, toks: loss_tokens(apply_adapter(p, ad), toks))

            def body(toks, p, ad):
                grads = g(ad, p, toks)
                return perturb_tokens(toks, jax.tree_util.tree_leaves(grads)[0])
            per = time_scan(body, toks0, ITERS, const=(params, adapter))
        finally:
            rwkv_mod.wkv = real
        bwd = 2 * FWD_BODY if LORA_MODE == "merge" else FWD_BODY
        report(stage, per, FWD_BODY + FWD_HEAD + bwd + FWD_HEAD,
               "wkv = elementwise stub (non-WKV ceiling)")
    elif stage == "full_ft":
        g = jax.grad(lambda p, toks: loss_tokens(p, toks))

        def body(toks, p):
            grads = g(p, toks)
            return perturb_tokens(toks, grads["emb"])
        per = time_scan(body, toks0, ITERS, const=(params,))
        report(stage, per, 3 * (FWD_BODY + FWD_HEAD),
               "full-model grads (no adapter), dW everywhere")
    else:
        raise SystemExit(f"unknown stage {stage}")


print(json.dumps({
    "config": {"B": B, "T": T, "iters": ITERS, "remat": str(REMAT),
               "lora_mode": LORA_MODE,
               "fwd_flops_tok": FWD_BODY + FWD_HEAD}}), flush=True)
for s in stages:
    run(s)
