"""Training: losses, optimizer groups/schedules, and the pjit'd loop."""
from rwkv_lm_ext_tpu.train.losses import (  # noqa: F401
    causal_lm_loss,
    in_batch_infonce,
    cosent_loss,
    symmetric_infonce,
    mlm_loss,
    l2_wrap_penalty,
)
