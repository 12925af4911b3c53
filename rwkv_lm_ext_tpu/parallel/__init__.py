"""Device-mesh parallelism: mesh construction + sharding rules.

Replaces the reference's NCCL/DeepSpeed/Lightning distributed stack
(SURVEY §2.4) with single-controller JAX SPMD: pick a Mesh, annotate
shardings, let XLA/GSPMD insert the collectives over ICI.
"""
from rwkv_lm_ext_tpu.parallel.sequence import (  # noqa: F401
    wkv6_sequence_parallel,
)
from rwkv_lm_ext_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    batch_shardings,
    state_shardings,
)
from rwkv_lm_ext_tpu.parallel.pipeline import (  # noqa: F401
    make_pp_mesh,
    pipeline_loss,
    pp_param_specs,
)
from rwkv_lm_ext_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    is_main_process,
    local_batch_to_global,
    make_hybrid_mesh,
    process_count,
    process_index,
)
