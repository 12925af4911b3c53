"""Checkpoint I/O.

- torch-free reader for BlinkDL/PyTorch ``.pth`` zip checkpoints
  (pth.py) with the reference's arch-sniffing rules
  (src/model_ext.py:29-139 load_ckpt_and_parse_args).
- conversion between the flat torch key schema and this framework's
  parameter tree (convert.py), including LoRA / state sub-checkpoints.
- Orbax save/load for native checkpoints (orbax_io.py).
"""
from rwkv_lm_ext_tpu.checkpoint.pth import (  # noqa: F401
    load_torch_pth,
    sniff_model_config,
)
from rwkv_lm_ext_tpu.checkpoint.convert import (  # noqa: F401
    state_dict_to_params,
    params_to_state_dict,
    load_rwkv_checkpoint,
)
