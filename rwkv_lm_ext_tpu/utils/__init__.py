from rwkv_lm_ext_tpu.utils.profiling import (  # noqa: F401
    Throughput,
    profile_trace,
    record_time,
)
