"""Multi-host / multi-slice execution.

The reference trains multi-node by exporting NCCL env vars and passing
``--num_nodes`` to Lightning (peft_train/peft_train_sft.py:63-70,142).
The TPU-native equivalent is JAX's single-controller-per-process SPMD:
every host runs the same program, ``jax.distributed.initialize`` wires
the processes into one global device set, the Mesh spans all global
devices (dp across DCN/process boundaries, tp/ici axes within a slice),
and GSPMD inserts the cross-host collectives. This module provides:

- ``init_distributed``: the one call trainers/servers make at startup
  (no-op single-process; env- or flag-driven otherwise).
- ``process_count / process_index / is_main_process``: rank helpers —
  logging and checkpoint writes gate on ``is_main_process()``.
- ``local_batch_to_global``: assemble a per-process local batch into a
  global dp-sharded jax.Array (jax.make_array_from_process_local_data).
- ``make_hybrid_mesh``: a (dp, tp) mesh where dp factors across
  processes (DCN) first, so the high-bandwidth ICI axes carry tp and
  the slower DCN links only carry the gradient all-reduce.

Validated without a real multi-host cluster by the two-process CPU
dryrun (tests/test_multihost.py, __graft_entry__.dryrun_multihost):
gloo collectives over localhost stand in for DCN.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if this looks like a multi-process run.

    Returns True when distributed mode is active. Resolution order:
    explicit args > RWKV_COORDINATOR / RWKV_NUM_PROCESSES /
    RWKV_PROCESS_ID env > TPU pod auto-detection (args all None but
    cluster env present — jax.distributed.initialize() autodetects on
    Cloud TPU). Single-process (nothing set): no-op, returns False.
    """
    coordinator = coordinator or os.environ.get("RWKV_COORDINATOR")
    if num_processes is None and os.environ.get("RWKV_NUM_PROCESSES"):
        num_processes = int(os.environ["RWKV_NUM_PROCESSES"])
    if process_id is None and os.environ.get("RWKV_PROCESS_ID"):
        process_id = int(os.environ["RWKV_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Gate for host-side side effects (stdout logs, train_log.txt,
    wandb, .pth/Orbax writes): the reference's rank-0 behavior under
    Lightning, here explicit."""
    return jax.process_index() == 0


def make_hybrid_mesh(
    dp: Optional[int] = None, tp: int = 1
) -> Mesh:
    """(dp, tp) mesh for multi-process runs: dp = (processes x local_dp)
    with the process axis outermost, so device order groups each
    process's local devices contiguously — dp's gradient all-reduce is
    then a local reduce-scatter + one DCN all-reduce (GSPMD handles the
    decomposition), and tp never crosses a host boundary."""
    procs = jax.process_count()
    n = jax.device_count()
    if dp is None:
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"dp*tp={dp * tp} exceeds {n} global devices")
    if dp % procs:
        raise ValueError(
            f"dp={dp} must be a multiple of process_count={procs} so every "
            "host owns an equal dp shard"
        )
    local_per = (dp // procs) * tp
    # jax.devices() sorts by (process_index, local ordinal); verify the
    # assumption instead of silently building a DCN-crossing tp axis
    devs = jax.devices()[: dp * tp]
    for i, d in enumerate(devs):
        if d.process_index != i // local_per:
            raise RuntimeError(
                "global device order is not process-major; build the mesh "
                "explicitly with mesh_utils.create_hybrid_device_mesh"
            )
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


_BCAST_MAX = 1 << 16


def broadcast_obj(obj=None):
    """Broadcast a small JSON-serializable object from process 0 to all
    processes (the serving request-lockstep primitive: every process
    must replay the same jitted calls in the same order, so process 0
    broadcasts each HTTP request before executing it and the workers
    execute the copy). All processes must call this; non-zero processes
    pass None and block until process 0 sends."""
    import json

    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    data = json.dumps(obj).encode() if jax.process_index() == 0 else b""
    if len(data) > _BCAST_MAX:
        raise ValueError(f"broadcast_obj payload > {_BCAST_MAX} bytes")
    buf = np.zeros(_BCAST_MAX, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    n = multihost_utils.broadcast_one_to_all(
        np.array([len(data)], np.int32)
    )
    buf = multihost_utils.broadcast_one_to_all(buf)
    return json.loads(bytes(buf[: int(n[0])]))


def local_batch_to_global(batch, mesh: Mesh):
    """Per-process local batch dict -> global dp-sharded arrays.

    Each process feeds only the rows its rank-sharded sampler produced
    (data/buckets.py BucketBatchSampler(world_size=process_count,
    rank=process_index)); the returned jax.Arrays are global: leading
    batch axis = local_rows * process_count, sharded over ``dp``.
    Leaves with 3 dims are (accum, micro, T) — accum stays unsharded.
    """

    def put(x):
        x = np.asarray(x)
        spec = P(None, "dp") if x.ndim == 3 else P("dp")
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(put, batch)
