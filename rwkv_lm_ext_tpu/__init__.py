"""rwkv_lm_ext_tpu — a TPU-native (JAX/XLA/Pallas) RWKV sequence-model framework.

A from-scratch rebuild of the capabilities of yynil/RWKV_LM_EXT, designed
TPU-first:

- ``ops``        — the WKV linear-attention scan family (sequential golden
                   reference, chunked XLA formulation, Pallas TPU kernels).
- ``models``     — functional RWKV-5/6 blocks and task heads over explicit
                   state pytrees (one forward for train / streaming / bi).
- ``adapters``   — LoRA / PiSSA / state-tuning as parameter-tree transforms
                   with named multi-adapter hot-swap.
- ``checkpoint`` — torch-free BlinkDL ``.pth`` reader + Orbax save/load.
- ``data``       — trie tokenizer, binidx mmap datasets, length-bucketed
                   sampling, SFT / contrastive / MLM / MAE collators.
- ``train``      — pjit'd training loop (DP/ZeRO-style sharding), schedules,
                   losses, TBPTT infinite-context training.
- ``infer``      — stateful generation engine (sampling + beam search),
                   multi-adapter & named-state registries.
- ``parallel``   — mesh construction and sharding rules.
"""

__version__ = "0.1.0"

from rwkv_lm_ext_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainConfig,
    rwkv6_1b6,
    rwkv6_3b,
    rwkv6_7b,
)


def __getattr__(name):
    """Lazy top-level API (keeps `import rwkv_lm_ext_tpu` light)."""
    lazy = {
        "load_rwkv_checkpoint": "rwkv_lm_ext_tpu.checkpoint",
        "WorldTokenizer": "rwkv_lm_ext_tpu.data",
        "GenerationEngine": "rwkv_lm_ext_tpu.infer",
        "SamplingParams": "rwkv_lm_ext_tpu.infer",
        "ContinuousBatcher": "rwkv_lm_ext_tpu.infer",
        "SpeculativeEngine": "rwkv_lm_ext_tpu.infer",
        "rwkv_forward": "rwkv_lm_ext_tpu.models",
        "init_rwkv_params": "rwkv_lm_ext_tpu.models",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(name)
