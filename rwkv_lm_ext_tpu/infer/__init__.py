"""Stateful inference runtime: prefill/decode engine, sampling pipeline,
beam search over forked state pytrees, adapter & named-state registries."""
from rwkv_lm_ext_tpu.infer.sampling import (  # noqa: F401
    SamplingParams,
    sample_token,
    apply_top_k,
    apply_top_p,
    apply_repetition_penalty,
)
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine  # noqa: F401
from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher  # noqa: F401
from rwkv_lm_ext_tpu.infer.speculative import SpeculativeEngine  # noqa: F401
from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache  # noqa: F401
