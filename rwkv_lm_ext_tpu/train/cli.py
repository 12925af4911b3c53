"""Trainer entry points (one typed CLI instead of the reference's seven
peft_train/ + train_scripts/ argparse scripts).

Subcommands (reference equivalents):
  sft            peft_train/peft_train_sft.py  (full / lora / pissa /
                 states / infctx train types)
  bi-encoder     peft_train/peft_train_bi_encoder(_birwkv).py
  cross-encoder  peft_train/peft_train_cross_encoder.py
  mlm / mae      train_scripts/train_mlm.py / train_mae.py

Usage: python -m rwkv_lm_ext_tpu.train.cli sft --model base.pth \\
           --train-data data.jsonl --output-dir out --train-type lora
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _common_args(p: argparse.ArgumentParser):
    p.add_argument("--model", required=True, help="base .pth checkpoint")
    p.add_argument("--train-data", required=True, help="jsonl input")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--vocab", default=None, help="world-vocab path")
    p.add_argument("--lr-init", type=float, default=3e-4)
    p.add_argument("--lr-final", type=float, default=1e-5)
    p.add_argument("--lr-schedule", default="cosine")
    p.add_argument("--warmup-steps", type=int, default=50)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--micro-bsz", type=int, default=4)
    p.add_argument("--accumulate-grad-batches", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=0, help="0 = all data")
    p.add_argument("--ctx-len", type=int, default=512)
    p.add_argument("--chunk-ctx", type=int, default=0, help="TBPTT (infctx)")
    p.add_argument(
        "--grad-checkpoint", choices=["on", "off", "dots", "dots_nobatch"],
        default="on",
        help="per-block activation remat (reference grad_cp). 'off' "
        "trades ~25%% recompute flops for activation memory — wins when "
        "the batch fits (e.g. LoRA 1B6 B8 ctx512 on a 16 GB chip); "
        "'dots'/'dots_nobatch' are selective policies that keep matmul "
        "outputs resident and recompute only elementwise chains — near "
        "'off' speed at a fraction of its activation memory "
        "(utils.remat)",
    )
    p.add_argument("--dp", type=int, default=0, help="0 = all devices")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (sft full fine-tune only)")
    p.add_argument("--n-micro", type=int, default=4,
                   help="GPipe microbatches per step when --pp > 1")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-every-steps", type=int, default=0)
    p.add_argument("--skip-steps", type=int, default=0, help="resume skip")
    p.add_argument("--wandb-project", default=None)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu/tpu), e.g. for data prep")
    p.add_argument("--upload-cmd", default=None,
                   help="shell command run async after each checkpoint save;"
                        " {dir} expands to --output-dir (the reference's"
                        " my_save S3-push hook, src/trainer.py:10-23)")
    p.add_argument("--save-train-state", action="store_true",
                   help="also save the full TrainState (params+optimizer+"
                        "step) with Orbax for exact resume")
    p.add_argument("--resume-train-state", default=None,
                   help="Orbax dir from --save-train-state to resume from")
    p.add_argument("--stack-layers", action="store_true",
                   help="scan-over-layers params: ~7x faster compiles "
                        "(full/states train types)")
    # multi-host (the reference's --num_nodes + NCCL env block,
    # peft_train_sft.py:63-70,142): run the SAME command on every host
    # with a shared --coordinator and that host's --process-id; dp spans
    # processes (DCN), tp stays within a host/slice. On Cloud TPU pods
    # none of these are needed — jax autodetects (set RWKV_DIST=1).
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _load_base(args):
    from rwkv_lm_ext_tpu.checkpoint import load_rwkv_checkpoint

    params, cfg = load_rwkv_checkpoint(args.model)
    return params, cfg


def _normalize_remat(spec):
    from rwkv_lm_ext_tpu.utils.remat import normalize_remat

    return normalize_remat(spec)


def _train_config(args, total_steps: int):
    from rwkv_lm_ext_tpu.config import TrainConfig

    return TrainConfig(
        lr_init=args.lr_init,
        lr_final=args.lr_final,
        warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay,
        grad_clip=args.grad_clip,
        lr_schedule=args.lr_schedule,
        total_steps=total_steps,
        micro_bsz=args.micro_bsz,
        accumulate_grad_batches=args.accumulate_grad_batches,
        chunk_ctx=args.chunk_ctx,
        grad_checkpoint=_normalize_remat(args.grad_checkpoint),
        seed=args.seed,
    )


def _mesh(args):
    from rwkv_lm_ext_tpu.parallel import make_mesh
    from rwkv_lm_ext_tpu.parallel.distributed import (
        make_hybrid_mesh, process_count,
    )

    if process_count() > 1:
        # multi-host: dp spans processes (DCN-outermost), tp stays local
        n = jax.device_count()
        return make_hybrid_mesh(dp=args.dp or n // args.tp, tp=args.tp)
    n = len(jax.devices())
    if args.tp == 1 and (args.dp == 1 or (args.dp == 0 and n == 1)):
        return None
    dp = args.dp or n // args.tp
    return make_mesh(dp=dp, tp=args.tp)


def _make_sampler(args, ds, sizes, epoch):
    """Per-host data sharding in multi-host runs: each process samples
    only its offset-strided shard of every bucket (the reference's
    MyBatchSampler.set_world_size/rank, data/custom_datasets.py:38-67);
    ``sizes`` stay PER-PROCESS (--micro-bsz is per host, like the
    reference's per-GPU micro_bsz), so the global batch is
    sizes x process_count, assembled by local_batch_to_global."""
    from rwkv_lm_ext_tpu.data.buckets import BucketBatchSampler
    from rwkv_lm_ext_tpu.parallel.distributed import (
        process_count, process_index,
    )

    procs = process_count()
    if procs == 1:
        return BucketBatchSampler(ds, sizes, seed=args.seed + epoch)
    return BucketBatchSampler(
        ds, sizes, seed=args.seed + epoch,
        world_size=procs, rank=process_index(),
    )


def _wrap_save(args, save_fn):
    """Decorate a checkpoint save with the Orbax train-state dump and the
    async upload hook."""
    if save_fn is None and not args.save_train_state:
        return save_fn

    def wrapped(ts, step):
        from rwkv_lm_ext_tpu.parallel.distributed import is_main_process

        if save_fn is not None and is_main_process():
            # .pth writes happen on process 0 only; trained leaves are
            # replicated across dp, so the local replica IS the value
            save_fn(_host_local_tree(ts), step)
        if args.save_train_state:
            # Orbax coordinates its own multihost write — every process
            # must participate (it owns the ZeRO-sharded opt state)
            from rwkv_lm_ext_tpu.checkpoint.orbax_io import save_checkpoint

            save_checkpoint(
                os.path.join(args.output_dir, "train_state"), ts
            )
        if args.upload_cmd:
            import subprocess
            import threading

            cmd = args.upload_cmd.format(dir=args.output_dir)
            threading.Thread(
                target=subprocess.run, args=(cmd,),
                kwargs={"shell": True, "check": False}, daemon=True,
            ).start()

    return wrapped


def _group_accum(batch_iter, accum: int):
    """Group ``accum`` same-shape micro-batches into the (accum, micro,
    T) layout make_train_step scans over. The bucketed sampler
    round-robins fixed lengths, so grouping is per shape; a trailing
    partial group per shape is dropped (the compiled step has a static
    accum axis)."""
    pending = {}
    for b in batch_iter:
        key = tuple(sorted((k, v.shape) for k, v in b.items()))
        pending.setdefault(key, []).append(b)
        if len(pending[key]) == accum:
            grp = pending.pop(key)
            yield {k: np.stack([g[k] for g in grp]) for k in grp[0]}


def _host_local_tree(tree):
    """Main-process view of a (possibly multihost) pytree for .pth
    writes: fully-replicated global leaves are read from the local
    replica (a global jax.Array spanning processes is never
    fully-addressable, even when replicated)."""

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree_util.tree_map(f, tree)


def _run_loop(args, cfg, tc, init_params, step_fn, init_fn, batches, *,
              frozen=None, save_fn=None, mesh="auto", placer=None,
              place_batches=True, eval_fn=None):
    from rwkv_lm_ext_tpu.train.callbacks import MetricsLogger
    from rwkv_lm_ext_tpu.train.loop import place_batch, place_train_state
    from rwkv_lm_ext_tpu.train.optim import make_schedule

    os.makedirs(args.output_dir, exist_ok=True)
    save_fn = _wrap_save(args, save_fn)
    if mesh == "auto":
        mesh = _mesh(args)
    placer = placer or place_train_state
    ts = init_fn(init_params)
    if getattr(args, "resume_train_state", None):
        from rwkv_lm_ext_tpu.checkpoint.orbax_io import load_checkpoint

        ts = load_checkpoint(args.resume_train_state, target=ts)
    if mesh is not None:
        ts = placer(ts, mesh)
    from rwkv_lm_ext_tpu.parallel.distributed import (
        is_main_process, local_batch_to_global, process_count,
    )

    multihost = process_count() > 1
    main = is_main_process()
    schedule = make_schedule(tc)
    logger = MetricsLogger(
        args.output_dir,
        wandb_project=args.wandb_project,
        ctx_len=args.ctx_len,
        real_bsz=(
            args.micro_bsz * args.accumulate_grad_batches * process_count()
        ),
    ) if main else None  # logs/wandb/train_log.txt: process 0 only
    step = 0
    epoch_losses = []
    for epoch in range(args.epochs):
        epoch_batches = batches(epoch)
        if tc.accumulate_grad_batches > 1:
            epoch_batches = _group_accum(
                epoch_batches, tc.accumulate_grad_batches
            )
        for batch in epoch_batches:
            if step < args.skip_steps:
                step += 1
                continue
            if args.max_steps and step >= args.max_steps:
                break
            if multihost:
                # each host contributes its sampler shard; the global
                # dp-sharded batch is micro_bsz * process_count rows.
                # pp (place_batches=False) takes the same construction:
                # (B, T) rows shard over the pp mesh's dp axis (which
                # spans hosts — make_pp_mesh keeps pp on-host) and the
                # step fn's shard_map consumes the global array
                batch = local_batch_to_global(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if mesh is not None and place_batches:
                    batch = place_batch(batch, mesh)
            if frozen is not None:
                ts, metrics = step_fn(ts, batch, frozen)
            else:
                ts, metrics = step_fn(ts, batch)
            loss = float(metrics["loss"])
            epoch_losses.append(loss)
            if step % args.log_every == 0 and main:
                m = logger.on_step(step, metrics, float(schedule(step)))
                print(f"step {step}: {json.dumps(m)}", flush=True)
            step += 1
            if (
                save_fn is not None
                and args.save_every_steps
                and step % args.save_every_steps == 0
            ):
                save_fn(ts, step)
            if (
                eval_fn is not None
                and getattr(args, "eval_every_steps", 0)
                and step % args.eval_every_steps == 0
            ):
                eval_fn(ts, step, epoch)
        if main:
            logger.on_epoch_end(
                epoch, float(np.mean(epoch_losses or [0.0])),
                float(schedule(step)),
            )
        epoch_losses = []
        if save_fn is not None:
            save_fn(ts, step)
        if eval_fn is not None:
            eval_fn(ts, step, epoch)
    return ts


def _sft_batches(args, tokenizer, *, want_tasks=False):
    from rwkv_lm_ext_tpu.data.buckets import BucketBatchSampler
    from rwkv_lm_ext_tpu.data.collators import sft_collate
    from rwkv_lm_ext_tpu.data.sft import load_sft_jsonl

    ds = load_sft_jsonl(args.train_data, tokenizer)
    task_names = None
    if want_tasks:
        # multi-task SFT (slot-lora): rows carry a "task" name; each
        # example routes to its task's adapter row (ids 1..n, 0 = base)
        exs = [e for b in ds.buckets for e in b.examples]
        task_names = sorted({e["task"] for e in exs if "task" in e})
        if not task_names or any("task" not in e for e in exs):
            raise SystemExit(
                "--train-type slot-lora needs a 'task' field on every "
                "training row"
            )
        task_to_id = {n: i + 1 for i, n in enumerate(task_names)}
        for e in exs:
            e["adapter_id"] = task_to_id[e["task"]]
    sizes = {
        b.fixed_len: max(1, args.micro_bsz * 64 // b.fixed_len)
        for b in ds.buckets
    }

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield sft_collate(examples, fixed_len)

    if want_tasks:
        return batches, task_names
    return batches


def cmd_sft(args):
    from rwkv_lm_ext_tpu.adapters import (
        LoraConfig,
        init_lora_params,
        merge_lora,
        pissa_init,
    )
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.init import init_rwkv_params
    from rwkv_lm_ext_tpu.train.callbacks import (
        save_lora_checkpoint,
        save_states_checkpoint,
    )
    from rwkv_lm_ext_tpu.train.loop import make_train_step, sft_loss_fn
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    task_names = None
    if args.train_type == "slot-lora":
        batches, task_names = _sft_batches(args, tokenizer, want_tasks=True)
    else:
        batches = _sft_batches(args, tokenizer)
    n_batches = sum(1 for _ in batches(0))
    total = args.max_steps or n_batches * args.epochs
    tc = _train_config(args, total)

    if args.train_type == "slot-lora":
        # joint multi-task LoRA: N adapters trained in ONE batched step,
        # each example's gradient reaching only its task's stack rows
        # (adapters.slot_lora). Serve the results mixed per request via
        # serve.cli --slot-adapter.
        from rwkv_lm_ext_tpu.adapters import (
            apply_slot_stacks,
            init_slot_stacks,
            split_slot_stacks,
        )

        lc = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
        stacks, name_to_id = init_slot_stacks(
            jax.random.PRNGKey(args.seed), params, lc, task_names
        )
        if getattr(args, "quant", "none") != "none":
            from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

            params = quantize_tree(params, args.quant)

        def loss_fn(stacks_p, frozen, cfg_, batch):
            p = apply_slot_stacks(
                frozen, stacks_p, batch["adapter_ids"], lc
            )
            return sft_loss_fn(p, cfg_, batch, remat=tc.grad_checkpoint)

        init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

        def save_fn(ts, step):
            for name, ad in split_slot_stacks(ts.params, name_to_id).items():
                save_lora_checkpoint(
                    ad, lc,
                    os.path.join(
                        args.output_dir, f"lora-{name}-step{step}.pth"
                    ),
                )

        _run_loop(
            args, cfg, tc, stacks, step_fn, init_fn, batches,
            frozen=params, save_fn=save_fn,
        )
        return

    if args.train_type in ("lora", "pissa"):
        lc = LoraConfig(
            r=args.lora_r, alpha=args.lora_alpha,
            pissa=args.train_type == "pissa",
        )
        if args.train_type == "pissa":
            params, adapter = pissa_init(params, lc)
            # the SVD init, needed to serve the trained adapter against the
            # ORIGINAL base (reference saves init_pissa.pth the same way)
            os.makedirs(args.output_dir, exist_ok=True)
            save_lora_checkpoint(
                adapter, lc, os.path.join(args.output_dir, "init_pissa.pth")
            )
        else:
            adapter = init_lora_params(jax.random.PRNGKey(args.seed), params, lc)
        if getattr(args, "quant", "none") != "none":
            # QLoRA: quantize the frozen base AFTER pissa subtraction
            # (the reference quantizes the residual weight the same way)
            from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

            params = quantize_tree(params, args.quant)
        if args.peft_checkpoint:
            from rwkv_lm_ext_tpu.adapters import lora_state_dict_to_tree
            from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth

            adapter = lora_state_dict_to_tree(load_torch_pth(args.peft_checkpoint))

        # --lora-apply unfused (default) keeps base and low-rank factors
        # separate in the loss (adapters.lora.LoraUnfusedLeaf): the
        # backward then computes dx only instead of a weight-shaped
        # cotangent per merged projection — measured materially faster
        # at 1B6 (scripts/ablate_train.py); "merge" keeps the r3 path.
        unfused = getattr(args, "lora_apply", "unfused") == "unfused"
        if args.stack_layers:
            from rwkv_lm_ext_tpu.adapters.lora import (
                apply_lora_unfused_stacked, merge_lora_stacked,
                stack_adapter, unstack_adapter,
            )
            from rwkv_lm_ext_tpu.models.stacked import stack_params

            params = stack_params(params)
            adapter = stack_adapter(adapter)
            apply_fn = (
                apply_lora_unfused_stacked if unfused else merge_lora_stacked
            )

            def loss_fn(adapter_p, frozen, cfg_, batch):
                merged = apply_fn(frozen, adapter_p, lc)
                return sft_loss_fn(merged, cfg_, batch, remat=tc.grad_checkpoint)
        else:
            from rwkv_lm_ext_tpu.adapters import apply_lora_unfused

            apply_fn = apply_lora_unfused if unfused else merge_lora
            if (getattr(args, "bwd_transpose", False) and unfused
                    and getattr(args, "quant", "none") == "none"):
                # store W^T beside each frozen adapted base so the
                # backward's dx never re-transposes the big weights
                # (adapters.lora.TransposedPair; +1x frozen-base HBM)
                from rwkv_lm_ext_tpu.adapters.lora import (
                    add_transposed_bases,
                )

                params = add_transposed_bases(params, adapter)

            def loss_fn(adapter_p, frozen, cfg_, batch):
                merged = apply_fn(frozen, adapter_p, lc)
                return sft_loss_fn(merged, cfg_, batch, remat=tc.grad_checkpoint)

        init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

        def save_fn(ts, step):
            a = ts.params
            if args.stack_layers:
                a = unstack_adapter(a)
            save_lora_checkpoint(
                a, lc,
                os.path.join(args.output_dir, f"lora-step{step}.pth"),
            )

        _run_loop(
            args, cfg, tc, adapter, step_fn, init_fn, batches,
            frozen=params, save_fn=save_fn,
        )
        return

    if args.train_type in ("state", "states"):
        # add zero state params, train only them
        for b in params["blocks"]:
            if "time_state" not in b["att"]:
                b["att"]["time_state"] = jnp.zeros(
                    (cfg.n_head, cfg.head_size, cfg.head_size), jnp.float32
                )
        if args.stack_layers:
            from rwkv_lm_ext_tpu.models.stacked import stack_params

            params = stack_params(params)

        def loss_fn(p, cfg_, batch):
            from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
            from rwkv_lm_ext_tpu.train.losses import causal_lm_loss

            logits, _ = rwkv_forward(
                p, cfg_, batch["input_ids"], remat=tc.grad_checkpoint, use_state_params=True
            )
            return causal_lm_loss(logits, batch["labels"])

        init_fn, step_fn = make_train_step(
            cfg, tc, loss_fn=loss_fn, train_type="states"
        )

        def save_fn(ts, step):
            p = ts.params
            if args.stack_layers:
                from rwkv_lm_ext_tpu.models.stacked import unstack_params

                p = unstack_params(p)
            save_states_checkpoint(
                p, cfg,
                os.path.join(args.output_dir, f"states-step{step}.pth"),
            )

        _run_loop(args, cfg, tc, params, step_fn, init_fn, batches, save_fn=save_fn)
        return

    # full fine-tune (incl. infctx TBPTT via --chunk-ctx, optional LISA)
    if args.stack_layers and not args.lisa_k:
        from rwkv_lm_ext_tpu.models.stacked import stack_params

        params = stack_params(params)
    init_fn, raw_step_fn = make_train_step(cfg, tc)
    step_fn = raw_step_fn
    if args.lisa_k > 0:
        from rwkv_lm_ext_tpu.train.callbacks import LisaSchedule

        lisa = LisaSchedule(
            n_layer=cfg.n_layer, k=args.lisa_k,
            interval=args.lisa_interval, seed=args.seed,
        )
        counter = {"step": 0}

        def step_fn(ts, batch):  # noqa: F811
            mask = jax.tree_util.tree_map(
                lambda m: jnp.asarray(1.0 if m else 0.0),
                lisa.trainable_mask(ts.params, counter["step"]),
            )
            counter["step"] += 1
            return raw_step_fn(ts, batch, None, mask)

    def save_fn(ts, step):
        p = ts.params
        if "blocks_stacked" in p:
            from rwkv_lm_ext_tpu.models.stacked import unstack_any

            p = unstack_any(p)
        save_torch_pth(
            os.path.join(args.output_dir, f"model-step{step}.pth"),
            params_to_state_dict(p, cfg),
        )

    if getattr(args, "pp", 1) > 1:
        # pipeline-parallel full fine-tune: layers staged over the pp
        # axis, microbatched GPipe schedule (parallel.pipeline). Batch
        # sizes must divide n_micro (and the microbatch must divide dp).
        assert args.accumulate_grad_batches == 1, (
            "--pp pipelines microbatches itself; use --n-micro, not "
            "--accumulate-grad-batches"
        )
        assert not args.lisa_k, "--pp does not compose with LISA"
        from rwkv_lm_ext_tpu.models.stacked import stack_params_uniform
        from rwkv_lm_ext_tpu.parallel import make_pp_mesh
        from rwkv_lm_ext_tpu.train.loop import (
            make_pp_train_step,
            place_pp_train_state,
        )

        # pipeline staging uses the UNIFORM stack (n_layer % pp, not
        # (n_layer-1) % pp — 24-layer models have no usable pp under the
        # block0-separate form); --stack-layers may have produced the
        # block0-separate form above, so restack through the flat tree
        if "block0" in params:
            from rwkv_lm_ext_tpu.models.stacked import unstack_params

            params = unstack_params(params)
        if "blocks_stacked" not in params:
            params = stack_params_uniform(params)
        n_dev = len(jax.devices())
        dp = args.dp or max(1, n_dev // args.pp)
        mesh = make_pp_mesh(dp=dp, pp=args.pp)
        init_fn, step_fn = make_pp_train_step(
            cfg, tc, mesh, n_micro=args.n_micro,
        )
        _run_loop(
            args, cfg, tc, params, step_fn, init_fn, batches,
            save_fn=save_fn, mesh=mesh, placer=place_pp_train_state,
            place_batches=False,
        )
        return

    _run_loop(args, cfg, tc, params, step_fn, init_fn, batches, save_fn=save_fn)


def _contrastive_batches(args, tokenizer, collate):
    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )

    ds = LengthBucketedDataset()
    with open(args.train_data, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            ex = {
                k: (
                    [tokenizer.encode(x) for x in v]
                    if isinstance(v, list)
                    else tokenizer.encode(v)
                )
                for k, v in row.items()
                if k in ("query", "positive", "negative", "document")
            }
            if "label" in row:
                ex["label"] = row["label"]
            length = len(ex.get("query", [])) + 1
            ds.add(ex, min(length, args.ctx_len))
    sizes = {
        b.fixed_len: max(1, args.micro_bsz * 64 // b.fixed_len)
        for b in ds.buckets
    }

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield collate(examples, min(fixed_len * 2, args.ctx_len))

    return batches


def cmd_bi_encoder(args):
    from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params, merge_lora
    from rwkv_lm_ext_tpu.data.collators import triplet_collate
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.heads import embed_sequences
    from rwkv_lm_ext_tpu.train.callbacks import save_lora_checkpoint
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import cosent_loss, in_batch_infonce

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    batches = _contrastive_batches(args, tokenizer, triplet_collate)
    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    lc = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
    adapter = init_lora_params(jax.random.PRNGKey(args.seed), params, lc)
    use_infonce = args.loss == "infonce"

    from rwkv_lm_ext_tpu.adapters import apply_lora_unfused

    def loss_fn(adapter_p, frozen, cfg_, batch):
        # unfused apply: dx-only backward (see cmd_sft / LoraUnfusedLeaf)
        merged = apply_lora_unfused(frozen, adapter_p, lc)
        embs = {
            k: embed_sequences(
                merged, cfg_, batch[k], pooling_type=args.pooling, remat=tc.grad_checkpoint
            )
            for k in ("query", "positive", "negative")
            if k in batch
        }
        fn = in_batch_infonce if use_infonce else cosent_loss
        return fn(
            embs["query"], embs["positive"], embs.get("negative")
        )

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        save_lora_checkpoint(
            ts.params, lc,
            os.path.join(args.output_dir, f"bi-encoder-step{step}.pth"),
        )

    _run_loop(
        args, cfg, tc, adapter, step_fn, init_fn, batches,
        frozen=params, save_fn=save_fn,
    )


def cmd_nli(args):
    """AllNLI contrastive trainer with STS-b validation
    (train_scripts/train_nli.py:1-379): full-parameter fine-tune of the
    causal LM as a sequence embedder on entailment/contradiction
    triplets, CoSENT by default or in-batch InfoNCE
    (--in-batch-negative, the reference's is_in_batch_negative), with a
    per-eval EmbeddingSimilarityEvaluator CSV (eval.sts)."""
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth
    from rwkv_lm_ext_tpu.config import EMB_ID
    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )
    from rwkv_lm_ext_tpu.data.collators import triplet_collate
    from rwkv_lm_ext_tpu.data.nli import load_allnli_triplets, load_stsb_pairs
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.eval.sts import SimilarityEvaluator
    from rwkv_lm_ext_tpu.models.heads import embed_sequences
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import cosent_loss, in_batch_infonce

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    L = args.max_seq_len  # reference pads every field to max_seq_length
    rows = load_allnli_triplets(args.train_data, seed=args.seed)
    if not rows:
        raise SystemExit("no usable AllNLI triplets in --train-data")
    ds = LengthBucketedDataset()
    for r in rows:
        ds.add({k: tokenizer.encode(v)[: L - 1] for k, v in r.items()}, L)
    sizes = {L: args.micro_bsz}

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield triplet_collate(examples, fixed_len)

    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    use_infonce = args.in_batch_negative

    def loss_fn(p, cfg_, batch):
        embs = {
            k: embed_sequences(
                p, cfg_, batch[k], pooling_type=args.pooling,
                remat=tc.grad_checkpoint,
            )
            for k in ("query", "positive", "negative")
            if k in batch
        }
        fn = in_batch_infonce if use_infonce else cosent_loss
        return fn(embs["query"], embs["positive"], embs.get("negative"))

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    evaluator = None
    if args.sts_file:
        s1, s2, gold = load_stsb_pairs(args.sts_file, split=args.sts_split)
        evaluator = SimilarityEvaluator(
            s1, s2, gold, csv_dir=args.output_dir, name="sts-" + args.sts_split
        )

    embed_jit = jax.jit(
        lambda p, toks: embed_sequences(p, cfg, toks, pooling_type=args.pooling)
    )

    def eval_fn(ts, step, epoch):
        if evaluator is None:
            return
        Bv = max(1, args.micro_bsz * 4)

        def encode(sentences):
            toks = np.zeros((len(sentences), L), np.int32)
            for i, s in enumerate(sentences):
                ids = tokenizer.encode(s)[: L - 1] + [EMB_ID]
                toks[i, : len(ids)] = ids
            chunks = []
            for i in range(0, len(sentences), Bv):
                chunk = toks[i : i + Bv]
                pad_rows = Bv - chunk.shape[0]
                if pad_rows:  # keep ONE compiled shape; drop pads after
                    filler = np.zeros((pad_rows, L), np.int32)
                    filler[:, 0] = EMB_ID
                    chunk = np.concatenate([chunk, filler])
                emb = np.asarray(embed_jit(ts.params, jnp.asarray(chunk)))
                chunks.append(emb[: Bv - pad_rows] if pad_rows else emb)
            return np.concatenate(chunks)

        out = evaluator(encode, epoch=epoch, steps=step)
        print(
            f"nli eval step {step}: "
            f"cosine_spearman={out['cosine_spearman']:.4f} "
            f"cosine_pearson={out['cosine_pearson']:.4f}",
            flush=True,
        )

    def save_fn(ts, step):
        save_torch_pth(
            os.path.join(args.output_dir, f"nli-step{step}.pth"),
            params_to_state_dict(ts.params, cfg),
        )

    _run_loop(
        args, cfg, tc, params, step_fn, init_fn, batches,
        save_fn=save_fn, eval_fn=eval_fn,
    )


def cmd_encoder_biencoder(args):
    """From-scratch bidirectional bi-encoder training
    (train_scripts/train_biencoder.py RwkvEncoderBiEncoder): full-parameter
    training of the bi encoder with symmetric InfoNCE."""
    from rwkv_lm_ext_tpu.data.collators import triplet_collate
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.bidirectional import encode_sentence
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import symmetric_infonce
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    batches = _contrastive_batches(args, tokenizer, triplet_collate)
    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)

    def loss_fn(p, cfg_, batch):
        embs = {
            k: encode_sentence(p, cfg_, batch[k], mode=args.bi_mode, remat=tc.grad_checkpoint)
            for k in ("query", "positive", "negative")
            if k in batch
        }
        return symmetric_infonce(
            embs["query"], embs["positive"], embs.get("negative"),
            temperature=args.temperature,
        )

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        save_torch_pth(
            os.path.join(args.output_dir, f"encoder-bi-step{step}.pth"),
            params_to_state_dict(ts.params, cfg),
        )

    _run_loop(args, cfg, tc, params, step_fn, init_fn, batches, save_fn=save_fn)


def cmd_encoder_crossencoder(args):
    """From-scratch encoder reranker (train_scripts/train_crossencoder.py
    RwkvEncoderForClassification): group softmax — each query gets one
    positive + G-1 negatives, CE target is column 0."""
    import numpy as _np

    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )
    from rwkv_lm_ext_tpu.data.collators import _pad_to
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.bidirectional import encode_sentence
    from rwkv_lm_ext_tpu.models.heads import init_classification_head
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import group_softmax_loss
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    G = args.group_size

    ds = LengthBucketedDataset()
    with open(args.train_data, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            q = tokenizer.encode(row["query"])
            docs = [tokenizer.encode(d) for d in row["documents"]][:G]
            if len(docs) < G:
                continue
            pairs = [q + [2] + d + [1] for d in docs]  # q [sep] d [cls]
            ds.add({"pairs": pairs}, min(max(map(len, pairs)), args.ctx_len))
    sizes = {
        b.fixed_len: max(1, args.micro_bsz * 64 // b.fixed_len)
        for b in ds.buckets
    }

    def collate(examples, fixed_len):
        rows = [
            _pad_to(p[:fixed_len], fixed_len, 0)
            for e in examples
            for p in e["pairs"]
        ]
        return {"input_ids": _np.stack(rows)}  # (B*G, T)

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield collate(examples, fixed_len)

    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    score = init_classification_head(jax.random.PRNGKey(args.seed + 1), cfg, 1)
    trainable = {"model": params, "score": score}

    def loss_fn(tp, cfg_, batch):
        emb = encode_sentence(
            tp["model"], cfg_, batch["input_ids"], mode=args.bi_mode,
            remat=tc.grad_checkpoint,
        )
        scores = emb.astype(jnp.float32) @ tp["score"]["kernel"].astype(
            jnp.float32
        )
        return group_softmax_loss(scores.reshape(-1, G))

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        sd = params_to_state_dict(ts.params["model"], cfg)
        sd["score.weight"] = np.asarray(
            ts.params["score"]["kernel"], np.float32
        ).T
        save_torch_pth(
            os.path.join(args.output_dir, f"encoder-cross-step{step}.pth"), sd
        )

    _run_loop(args, cfg, tc, trainable, step_fn, init_fn, batches, save_fn=save_fn)


def cmd_cross_encoder(args):
    from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params, merge_lora
    from rwkv_lm_ext_tpu.data.collators import cross_encoder_collate
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.heads import (
        classify_sequences,
        init_classification_head,
    )
    from rwkv_lm_ext_tpu.train.callbacks import save_lora_checkpoint
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    batches = _contrastive_batches(args, tokenizer, cross_encoder_collate)
    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    lc = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
    adapter = init_lora_params(jax.random.PRNGKey(args.seed), params, lc)
    score = init_classification_head(jax.random.PRNGKey(args.seed + 1), cfg, 1)
    trainable = {"adapter": adapter, "score": score}

    from rwkv_lm_ext_tpu.train.losses import classification_loss

    from rwkv_lm_ext_tpu.adapters import apply_lora_unfused

    def loss_fn(tp, frozen, cfg_, batch):
        # unfused apply: dx-only backward (see cmd_sft / LoraUnfusedLeaf)
        merged = apply_lora_unfused(frozen, tp["adapter"], lc)
        scores = classify_sequences(
            merged, cfg_, batch["input_ids"], tp["score"], remat=tc.grad_checkpoint
        )
        # scalar scores -> MSE on 0/1 labels (RwkvForClassification
        # num_labels==1 semantics, src/model_ext.py:238-249)
        return classification_loss(scores, batch["labels"])

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        save_lora_checkpoint(
            ts.params["adapter"], lc,
            os.path.join(args.output_dir, f"cross-encoder-step{step}.pth"),
        )
        save_torch_pth(
            os.path.join(args.output_dir, f"score-step{step}.pth"),
            {"score.weight": np.asarray(ts.params["score"]["kernel"], np.float32).T},
        )

    _run_loop(
        args, cfg, tc, trainable, step_fn, init_fn, batches,
        frozen=params, save_fn=save_fn,
    )


def cmd_mlm(args, mae: bool = False):
    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )
    from rwkv_lm_ext_tpu.data.collators import mae_collate, mlm_collate
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.bidirectional import (
        dupmae_bow_loss,
        init_one_layer_decoder,
        mae_forward,
    )
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import mlm_loss
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    if mae:
        params["onelayer_decoder"] = init_one_layer_decoder(
            jax.random.PRNGKey(args.seed), cfg
        )

    ds = LengthBucketedDataset()
    with open(args.train_data, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            ids = tokenizer.encode(row["text"] if isinstance(row, dict) else row)
            ds.add({"input_ids": ids}, min(len(ids) + 1, args.ctx_len))
    sizes = {
        b.fixed_len: max(1, args.micro_bsz * 64 // b.fixed_len)
        for b in ds.buckets
    }

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            if mae:
                yield mae_collate(
                    examples, fixed_len, bag_of_words=args.dup_mae,
                    vocab_size=cfg.vocab_size, seed=args.seed + epoch,
                )
            else:
                yield mlm_collate(
                    examples, fixed_len, seed=args.seed + epoch, emb_id=1
                )

    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)

    if mae:
        def loss_fn(p, cfg_, batch):
            out = mae_forward(
                p, cfg_, batch["encoder_input_ids"],
                batch["decoder_input_ids"], bidirectional=not args.uni,
                remat=tc.grad_checkpoint,
            )
            loss = mlm_loss(out["encoder_logits"], batch["encoder_labels"])
            loss += mlm_loss(out["decoder_logits"], batch["decoder_labels"])
            if args.dup_mae and "bag_word_weight" in batch:
                loss += dupmae_bow_loss(
                    out["ot_logits"], batch["bag_word_weight"]
                )
            return loss
    else:
        def loss_fn(p, cfg_, batch):
            from rwkv_lm_ext_tpu.models.bidirectional import encoder_forward
            from rwkv_lm_ext_tpu.models.heads import mlm_logits

            hidden = encoder_forward(
                p, cfg_, batch["input_ids"], remat=tc.grad_checkpoint
            )
            return mlm_loss(mlm_logits(p, cfg_, hidden), batch["labels"])

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        p = dict(ts.params)
        dec = p.pop("onelayer_decoder", None)
        save_torch_pth(
            os.path.join(args.output_dir, f"encoder-step{step}.pth"),
            params_to_state_dict(p, cfg),
        )

    _run_loop(args, cfg, tc, params, step_fn, init_fn, batches, save_fn=save_fn)


def cmd_simcse(args):
    """SimCSE embedding training (train_scripts/train_askubuntu_simcse.py
    sentence-pair variant; train_wiki1m_simcse.py dropout-noise variant when
    rows carry only "text")."""
    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )
    from rwkv_lm_ext_tpu.data.collators import _pad_to
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.heads import (
        first_token_position,
        pool_hidden,
    )
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import simcse_loss
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    if args.dropout_noise and cfg.dropout == 0:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, dropout=0.1)  # wiki1m recipe uses p=0.1
    tokenizer = WorldTokenizer(args.vocab)

    ds = LengthBucketedDataset()
    with open(args.train_data, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            if "sentence_b" in row:
                a = tokenizer.encode(row["sentence_a"])
                b = tokenizer.encode(row["sentence_b"])
            else:
                a = b = tokenizer.encode(row["text"])
            ds.add({"a": a, "b": b}, min(max(len(a), len(b)) + 1, args.ctx_len))
    sizes = {
        bk.fixed_len: max(2, args.micro_bsz * 64 // bk.fixed_len)
        for bk in ds.buckets
    }

    def collate(examples, fixed_len):
        import numpy as _np

        rows_a = [_pad_to(e["a"][: fixed_len - 1] + [1], fixed_len, 0) for e in examples]
        rows_b = [_pad_to(e["b"][: fixed_len - 1] + [1], fixed_len, 0) for e in examples]
        return {"a": _np.stack(rows_a), "b": _np.stack(rows_b)}

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield collate(examples, fixed_len)

    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    use_dropout = bool(args.dropout_noise)

    def embed(p, tokens, rng):
        hidden, _ = rwkv_forward(
            p, cfg, tokens, remat=tc.grad_checkpoint, dropout_rng=rng,
            return_hidden=True, return_logits=False,
        )
        return pool_hidden(hidden, first_token_position(tokens, 1), args.pooling)

    def loss_fn(p, cfg_, batch):
        # rng varies with the batch content (loss_fn has no step arg)
        rng = jax.random.fold_in(
            jax.random.PRNGKey(tc.seed),
            jnp.sum(batch["a"]).astype(jnp.uint32),
        )
        r1, r2 = jax.random.split(rng)
        ea = embed(p, batch["a"], r1 if use_dropout else None)
        eb = embed(p, batch["b"], r2 if use_dropout else None)
        return simcse_loss(ea, eb, temperature=args.temperature)

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        save_torch_pth(
            os.path.join(args.output_dir, f"simcse-step{step}.pth"),
            params_to_state_dict(ts.params, cfg),
        )

    _run_loop(args, cfg, tc, params, step_fn, init_fn, batches, save_fn=save_fn)


def cmd_instructor(args):
    """Instructor embeddings (train_scripts/instructor/train.py): MEDI-style
    instruction-prefixed triplets, dense+LN projection head, symmetric
    InfoNCE."""
    from rwkv_lm_ext_tpu.data.buckets import (
        BucketBatchSampler,
        LengthBucketedDataset,
    )
    from rwkv_lm_ext_tpu.data.collators import _pad_to
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.models.heads import instructor_embed
    from rwkv_lm_ext_tpu.train.loop import make_train_step
    from rwkv_lm_ext_tpu.train.losses import symmetric_infonce
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    params, cfg = _load_base(args)
    tokenizer = WorldTokenizer(args.vocab)
    out_dim = args.output_dim or cfg.n_embd
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    lim = 1.0 / np.sqrt(cfg.n_embd)
    inst_head = {
        "dense": {
            "kernel": jax.random.uniform(
                k1, (cfg.n_embd, out_dim), jnp.float32, -lim, lim
            ),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        },
        "ln": {
            "scale": jnp.ones((out_dim,), jnp.float32),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        },
    }

    ds = LengthBucketedDataset()
    with open(args.train_data, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            inst = row.get("instruction", "")
            ex = {
                k: tokenizer.encode(inst + row[k])
                for k in ("query", "positive", "negative")
                if k in row
            }
            ds.add(ex, min(len(ex["query"]) + 1, args.ctx_len))
    sizes = {
        bk.fixed_len: max(2, args.micro_bsz * 64 // bk.fixed_len)
        for bk in ds.buckets
    }

    def collate(examples, fixed_len):
        import numpy as _np

        out = {}
        for key in ("query", "positive", "negative"):
            if key in examples[0]:
                out[key] = _np.stack([
                    _pad_to(e[key][: fixed_len - 1] + [1], fixed_len, 0)
                    for e in examples
                ])
        return out

    def batches(epoch):
        sampler = _make_sampler(args, ds, sizes, epoch)
        for fixed_len, examples in sampler.batches():
            yield collate(examples, fixed_len)

    n_batches = sum(1 for _ in batches(0))
    tc = _train_config(args, args.max_steps or n_batches * args.epochs)
    trainable = {"model": params, "head": inst_head}

    def loss_fn(tp, cfg_, batch):
        embs = {
            k: instructor_embed(
                tp["model"], cfg_, batch[k], tp["head"],
                pooling_type=args.pooling,
            )
            for k in ("query", "positive", "negative")
            if k in batch
        }
        return symmetric_infonce(
            embs["query"], embs["positive"], embs.get("negative"),
            temperature=args.temperature,
        )

    init_fn, step_fn = make_train_step(cfg, tc, loss_fn=loss_fn)

    def save_fn(ts, step):
        sd = params_to_state_dict(ts.params["model"], cfg)
        sd["dense.weight"] = np.asarray(
            ts.params["head"]["dense"]["kernel"], np.float32
        ).T
        sd["dense.bias"] = np.asarray(
            ts.params["head"]["dense"]["bias"], np.float32
        )
        sd["ln_dense.weight"] = np.asarray(
            ts.params["head"]["ln"]["scale"], np.float32
        )
        sd["ln_dense.bias"] = np.asarray(
            ts.params["head"]["ln"]["bias"], np.float32
        )
        save_torch_pth(
            os.path.join(args.output_dir, f"instructor-step{step}.pth"), sd
        )

    _run_loop(args, cfg, tc, trainable, step_fn, init_fn, batches, save_fn=save_fn)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="rwkv_lm_ext_tpu.train")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("sft")
    _common_args(p)
    p.add_argument("--train-type", default="lora",
                   choices=["full", "lora", "pissa", "state", "states",
                            "slot-lora"])
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--lora-apply", default="unfused",
                   choices=["unfused", "merge"],
                   help="how LoRA enters the loss: 'unfused' keeps "
                        "x@W + (x@A)@B separate (backward needs no "
                        "weight-shaped cotangents — faster); 'merge' "
                        "materializes W + scale*A@B per step")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8c", "nf4", "fp4"],
                   help="QLoRA: quantize the frozen base (reference "
                        "LORA_CONFIG['quant']); the base stays quantized "
                        "in HBM and LoRA rides as a lazy delta")
    p.add_argument("--bwd-transpose", action="store_true",
                   help="store a pre-transposed copy of each frozen "
                        "adapted base weight so the backward's dx reads "
                        "W^T directly instead of re-transposing per "
                        "step (+1x frozen-base HBM; unfused, unquantized "
                        "LoRA only)")
    p.add_argument("--peft-checkpoint", default=None)
    p.add_argument("--lisa-k", type=int, default=0,
                   help="LISA: train k random layers, resampled every "
                        "--lisa-interval steps (full train type only)")
    p.add_argument("--lisa-interval", type=int, default=20)
    p.set_defaults(fn=cmd_sft)

    p = sub.add_parser("bi-encoder")
    _common_args(p)
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8c", "nf4", "fp4"],
                   help="QLoRA: quantize the frozen base (reference "
                        "LORA_CONFIG['quant']); the base stays quantized "
                        "in HBM and LoRA rides as a lazy delta")
    p.add_argument("--pooling", default="weightedmean")
    p.add_argument("--loss", default="infonce", choices=["infonce", "cosent"])
    p.set_defaults(fn=cmd_bi_encoder)

    p = sub.add_parser("cross-encoder")
    _common_args(p)
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8c", "nf4", "fp4"],
                   help="QLoRA: quantize the frozen base (reference "
                        "LORA_CONFIG['quant']); the base stays quantized "
                        "in HBM and LoRA rides as a lazy delta")
    p.set_defaults(fn=cmd_cross_encoder)

    p = sub.add_parser("nli")
    _common_args(p)
    p.add_argument("--sts-file", default=None,
                   help="stsbenchmark.tsv for per-eval STS validation")
    p.add_argument("--sts-split", default="dev")
    p.add_argument("--max-seq-len", type=int, default=33,
                   help="fixed pad length incl. the emb token "
                        "(reference --max_seq_length)")
    p.add_argument("--pooling", default="lasttoken")
    p.add_argument("--in-batch-negative", action="store_true",
                   help="in-batch InfoNCE instead of CoSENT (the "
                        "reference's --is_in_batch_negative)")
    p.add_argument("--eval-every-steps", type=int, default=0)
    p.set_defaults(fn=cmd_nli)

    p = sub.add_parser("encoder-biencoder")
    _common_args(p)
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--bi-mode", default="average", choices=["average", "fused"])
    p.set_defaults(fn=cmd_encoder_biencoder)

    p = sub.add_parser("encoder-crossencoder")
    _common_args(p)
    p.add_argument("--group-size", type=int, default=4)
    p.add_argument("--bi-mode", default="average", choices=["average", "fused"])
    p.set_defaults(fn=cmd_encoder_crossencoder)

    p = sub.add_parser("simcse")
    _common_args(p)
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--pooling", default="weightedmean")
    p.add_argument("--dropout-noise", action="store_true",
                   help="wiki1m variant: two dropout-noised views of text")
    p.set_defaults(fn=cmd_simcse)

    p = sub.add_parser("instructor")
    _common_args(p)
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--pooling", default="weightedmean")
    p.add_argument("--output-dim", type=int, default=0)
    p.set_defaults(fn=cmd_instructor)

    p = sub.add_parser("mlm")
    _common_args(p)
    p.set_defaults(fn=lambda a: cmd_mlm(a, mae=False))

    p = sub.add_parser("mae")
    _common_args(p)
    p.add_argument("--dup-mae", action="store_true")
    p.add_argument("--uni", action="store_true",
                   help="unidirectional encoder (seq-emb bottleneck add)")
    p.set_defaults(fn=lambda a: cmd_mlm(a, mae=True))

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if (
        getattr(args, "coordinator", None)
        or getattr(args, "num_processes", None)
        or os.environ.get("RWKV_DIST") == "1"
    ):
        from rwkv_lm_ext_tpu.parallel.distributed import init_distributed

        init_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
    args.fn(args)


if __name__ == "__main__":
    main()
