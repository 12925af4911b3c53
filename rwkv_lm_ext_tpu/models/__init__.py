"""Functional RWKV models over explicit state pytrees.

One forward implementation serves training (full T, zero state), streaming
inference (state in/out, any T including T=1 decode), TBPTT chunking, and
bidirectional encoding — collapsing the reference's five parallel model
files (src/model.py, model_run.py, model_bi.py, model_run_bi.py,
model_encoder_run.py) into a single functional core.
"""
from rwkv_lm_ext_tpu.models.state import (  # noqa: F401
    init_model_state,
    LAYER_STATE_KEYS,
)
from rwkv_lm_ext_tpu.models.rwkv import (  # noqa: F401
    rwkv_forward,
    block_forward,
    time_mix_v6,
    time_mix_v5,
    channel_mix,
)
from rwkv_lm_ext_tpu.models.init import init_rwkv_params  # noqa: F401
