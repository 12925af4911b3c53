"""Subprocess body for tests/test_multihost.py. Modes:

  step <pid> <coord> <tmp>   one dp=4 train step over 2 procs, print loss
  single 0 - <tmp>           same global batch on one 4-device process
  cli  <pid> <coord> <tmp>   the real trainer CLI, 2 procs x 2 devices
  serve <pid> <coord> <tmp>  serve CLI with a lockstep continuous
                             batcher (SERVE_PORT env names p0's port)
"""
import json
import os
import sys

import jax

if os.environ.get("RWKV_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

mode, pid, coord, tmp = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]


def _global_batch(B, T, vocab):
    tok = jax.random.randint(jax.random.PRNGKey(7), (B, T), 4, vocab - 4)
    return {"input_ids": np.asarray(tok), "labels": np.asarray(tok)}


def _cfg_tc():
    from rwkv_lm_ext_tpu.config import ModelConfig, TrainConfig

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=256, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    tc = TrainConfig(lr_init=1e-3, warmup_steps=1, total_steps=4)
    return cfg, tc


if mode in ("step", "single"):
    if mode == "step":
        from rwkv_lm_ext_tpu.parallel.distributed import (
            init_distributed, local_batch_to_global, make_hybrid_mesh,
        )

        init_distributed(coord, 2, pid)
        mesh = make_hybrid_mesh(dp=4, tp=1)
    else:
        from rwkv_lm_ext_tpu.parallel import make_mesh
        from rwkv_lm_ext_tpu.parallel.distributed import (
            local_batch_to_global,
        )

        mesh = make_mesh(dp=4, tp=1)

    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.train.loop import (
        make_train_step, place_batch, place_train_state,
    )

    cfg, tc = _cfg_tc()
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    init_fn, step_fn = make_train_step(cfg, tc, donate=False)
    ts = place_train_state(init_fn(params), mesh)
    gb = _global_batch(8, 16, cfg.vocab_size)
    if mode == "step":
        # this process feeds only its half of the global batch
        local = {k: v[pid * 4:(pid + 1) * 4] for k, v in gb.items()}
        batch = local_batch_to_global(local, mesh)
    else:
        batch = place_batch(
            {k: jnp.asarray(v) for k, v in gb.items()}, mesh
        )
    ts, metrics = step_fn(ts, batch)
    print(json.dumps({"pid": pid, "loss": float(metrics["loss"])}))

elif mode == "cli":
    # fixtures (m.pth / sft.jsonl) are built by the parent test — the
    # worker must not touch JAX before jax.distributed.initialize
    ckpt = os.path.join(tmp, "m.pth")
    data = os.path.join(tmp, "sft.jsonl")

    from rwkv_lm_ext_tpu.train import cli

    cli.main([
        "sft", "--model", ckpt, "--train-data", data,
        "--output-dir", os.path.join(tmp, f"out_p{pid}"),
        "--train-type", "lora", "--max-steps", "2", "--micro-bsz", "2",
        "--log-every", "1",
        "--coordinator", coord, "--num-processes", "2",
        "--process-id", str(pid),
    ])
elif mode in ("pp", "pp_single"):
    # dp=2 (across the 2 processes) x pp=2 (within each host): one GPipe
    # train step; losses must agree across processes and vs the
    # single-process run on the same global batch
    if mode == "pp":
        from rwkv_lm_ext_tpu.parallel.distributed import (
            init_distributed, local_batch_to_global,
        )

        init_distributed(coord, 2, pid)
    else:
        from rwkv_lm_ext_tpu.parallel.distributed import (
            local_batch_to_global,
        )

    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.stacked import stack_params_uniform
    from rwkv_lm_ext_tpu.parallel import make_pp_mesh
    from rwkv_lm_ext_tpu.train.loop import (
        make_pp_train_step, place_pp_train_state,
    )

    cfg, tc = _cfg_tc()
    params = stack_params_uniform(init_rwkv_params(jax.random.PRNGKey(0), cfg))
    mesh = make_pp_mesh(dp=2, pp=2)
    init_fn, step_fn = make_pp_train_step(cfg, tc, mesh, n_micro=2)
    ts = place_pp_train_state(init_fn(params), mesh)
    gb = _global_batch(8, 16, cfg.vocab_size)
    if mode == "pp":
        local = {k: v[pid * 4:(pid + 1) * 4] for k, v in gb.items()}
        batch = local_batch_to_global(local, mesh)
    else:
        batch = {k: jnp.asarray(v) for k, v in gb.items()}
    ts, metrics = step_fn(ts, batch)
    print(json.dumps({"pid": pid, "loss": float(metrics["loss"])}))

elif mode == "serve":
    ckpt = os.path.join(tmp, "m.pth")

    from rwkv_lm_ext_tpu.serve import cli as scli

    scli.main([
        "--model", ckpt, "--dtype", "float32",
        "--batcher-slots", "2", "--batcher-block", "4",
        "--host", "127.0.0.1",
        "--port", os.environ.get("SERVE_PORT", "0") if pid == 0 else "0",
        "--coordinator", coord, "--num-processes", "2",
        "--process-id", str(pid),
    ])
else:
    raise SystemExit(f"unknown mode {mode}")
