"""Pipeline parallelism (GPipe) over a ``pp`` mesh axis.

The reference has no pipeline parallelism at all (SURVEY §2.4 — DP-only
via DeepSpeed ZeRO-2); this is a TPU-native extension alongside the
head-parallel TP (parallel.mesh) and sequence parallelism
(parallel.sequence): layers are sharded across the ``pp`` axis (each
device holds a contiguous stage of the scan-over-layers stacked tree),
microbatches flow stage-to-stage over ICI via ``ppermute``, and the
whole schedule lives inside one ``shard_map`` so ``jax.grad``
differentiates straight through the collectives (backward microbatch
pipelining falls out of the transposed ppermute).

Schedule: plain GPipe — M microbatches over P stages in M + P - 1 ticks;
stage p processes microbatch t - p at tick t. Bubble fraction
(P-1)/(M+P-1); choose n_micro >= ~4*pp for production runs.

Layout notes:
- params are the UNIFORM stacked form (models.stacked
  stack_params_uniform): emb + ln0 + ln_out + head replicate to every
  stage; ``blocks_stacked`` (n_layer leading axis — ln0 lifted out of
  block 0 so every block stacks leaf-for-leaf) shards over ``pp``.
  Uniform stacking makes the stage split ``n_layer % pp`` (satisfiable
  for 24-layer 1B6) instead of the block0-separate form's
  ``(n_layer-1) % pp`` (23: prime — no usable pp at all).
- the embedding (+ln0) runs only on stage 0 and the LM head + CE only
  on the last stage, under ``lax.cond`` — one SPMD program, but the
  untaken branches cost nothing at runtime (a where-select would pay
  the 65536-vocab head matmul on every stage every tick).
- the token/label batch reshapes to (n_micro, B/n_micro, T) and shards
  its microbatch-row axis over ``dp``; the loss is a token-weighted CE
  psum-reduced over pp (only the last stage contributes) and dp.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rwkv_lm_ext_tpu.models.rwkv import block_forward, layer_norm, proj


def make_pp_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """(dp, pp) mesh, dp outermost. Multi-host: jax.devices() is
    process-major, so with dp outermost each pp group (a contiguous run
    of ``pp`` devices) stays inside one host — the per-tick ppermute
    stays on ICI while only the dp gradient psum crosses DCN. Guarded:
    a pp group spanning two hosts would put the activation ring on DCN
    every microbatch tick."""
    devices = list(devices if devices is not None else jax.devices())
    devices = devices[: dp * pp]
    if len({d.process_index for d in devices}) > 1:
        for g in range(dp):
            grp = devices[g * pp:(g + 1) * pp]
            if len({d.process_index for d in grp}) > 1:
                raise ValueError(
                    f"pp group {g} spans processes "
                    f"{sorted({d.process_index for d in grp})}; pp must "
                    f"divide the per-host device count so each pipeline "
                    f"stays on one host's ICI"
                )
    return Mesh(np.array(devices).reshape(dp, pp), ("dp", "pp"))


def pp_param_specs(sparams: Dict):
    """PartitionSpecs: blocks_stacked layer axis over ``pp``, everything
    else replicated (emb/head on every stage — see module notes)."""

    def assign(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "blocks_stacked" in keys:
            return P("pp", *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(assign, sparams)


def _zero_layer_state(cfg, B: int):
    H, N = cfg.n_head, cfg.head_size
    C = cfg.n_embd
    return (
        jnp.zeros((B, C), jnp.float32),
        jnp.zeros((B, H, N, N), jnp.float32),
        jnp.zeros((B, C), jnp.float32),
    )


def pipeline_loss(
    sparams: Dict,
    cfg,
    tokens: jax.Array,
    labels: jax.Array,
    mesh: Mesh,
    *,
    n_micro: int,
    wkv_backend: str = "reference",
    chunk_size: int = 32,
) -> jax.Array:
    """Token-mean causal-LM CE of a uniform-stacked model
    (models.stacked.stack_params_uniform), computed with the layer stack
    sharded over ``mesh``'s ``pp`` axis and the batch over ``dp``.
    labels: same shape as tokens, -100 = ignored (the data pipeline's
    padding convention). Differentiable wrt sparams."""
    assert "blocks_stacked" in sparams and "block0" not in sparams, (
        "pipeline needs the UNIFORM stacked form "
        "(models.stacked.stack_params_uniform)"
    )
    B, T = tokens.shape
    PP = mesh.shape["pp"]
    n_stacked = jax.tree_util.tree_leaves(sparams["blocks_stacked"])[0].shape[0]
    assert n_stacked % PP == 0, (
        f"{n_stacked} stacked layers not divisible by pp={PP}"
    )
    assert B % n_micro == 0, f"batch {B} not divisible by n_micro={n_micro}"
    mb = B // n_micro
    assert mb % mesh.shape["dp"] == 0, "microbatch not divisible by dp"
    toks = tokens.reshape(n_micro, mb, T)
    labs = labels.reshape(n_micro, mb, T)
    dt = cfg.compute_dtype
    C = cfg.n_embd

    def stage_fn(sp, toks, labs):
        p = jax.lax.axis_index("pp")
        mb_l = toks.shape[1]  # local (dp-sharded) microbatch rows

        def embed(tok_mb):
            x = jnp.take(sp["emb"], tok_mb, axis=0).astype(dt)
            if "ln0" in sp:
                x = layer_norm(x, sp["ln0"])
            return x

        def stage_layers(x):
            def body(x, bp):
                x, _ = block_forward(
                    bp, cfg, x, _zero_layer_state(cfg, mb_l),
                    layer_id=1, wkv_backend=wkv_backend,
                    chunk_size=chunk_size,
                )
                return x, None

            x, _ = jax.lax.scan(body, x, sp["blocks_stacked"])
            return x

        def ce_sum(x, lab_mb):
            h = layer_norm(x, sp["ln_out"])
            logits = proj(h, sp["head"], dt)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            mask = (lab_mb >= 0).astype(jnp.float32)
            gold = jnp.take_along_axis(
                logp, jnp.maximum(lab_mb, 0)[..., None], axis=-1
            )[..., 0]
            return -jnp.sum(gold * mask), jnp.sum(mask)

        perm = [(i, (i + 1) % PP) for i in range(PP)]
        zero_act = jnp.zeros((mb_l, T, C), dt)

        def tick(carry, t):
            buf, loss_sum, cnt_sum = carry
            m = t - p
            valid = (m >= 0) & (m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            # lax.cond (not where): only stage 0 pays the embedding and
            # only the last stage pays the V-sized head matmul + CE
            x_in = jax.lax.cond(
                p == 0, lambda: embed(toks[mc]), lambda: buf
            )
            x_out = stage_layers(x_in)
            l, c = jax.lax.cond(
                valid & (p == PP - 1),
                lambda: ce_sum(x_out, labs[mc]),
                lambda: (jnp.float32(0), jnp.float32(0)),
            )
            nxt = jax.lax.ppermute(x_out, "pp", perm)
            return (nxt, loss_sum + l, cnt_sum + c), None

        ticks = jnp.arange(n_micro + PP - 1)
        (_, loss_sum, cnt_sum), _ = jax.lax.scan(
            tick, (zero_act, jnp.float32(0), jnp.float32(0)), ticks
        )
        loss_sum = jax.lax.psum(jax.lax.psum(loss_sum, "pp"), "dp")
        cnt_sum = jax.lax.psum(jax.lax.psum(cnt_sum, "pp"), "dp")
        return loss_sum / jnp.maximum(cnt_sum, 1.0)

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(pp_param_specs(sparams), P(None, "dp", None),
                  P(None, "dp", None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(sparams, toks, labs)
