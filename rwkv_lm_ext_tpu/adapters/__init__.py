"""PEFT adapters as parameter-tree transforms.

LoRA / PiSSA / state-tuning do not wrap modules (the reference's
LoraLinear approach, src/rwkvLinear.py + src/layers.py) — they are pure
functions over the parameter pytree: init builds an adapter tree, merge
produces serving weights, and a registry hot-swaps named adapters on one
base model (the BiCrossFusionEncoder pattern, infer/encoders.py:27-115).
"""
from rwkv_lm_ext_tpu.adapters.lora import (  # noqa: F401
    LoraConfig,
    LoraDeltaLeaf,
    LoraUnfusedLeaf,
    apply_lora_unfused,
    apply_lora_unfused_stacked,
    init_lora_params,
    merge_lora,
    merge_lora_stacked,
    merge_pissa,
    pissa_init,
    stack_adapter,
    unstack_adapter,
    lora_trainable_mask,
    lora_state_dict_to_tree,
    lora_tree_to_state_dict,
)
from rwkv_lm_ext_tpu.adapters.registry import AdapterRegistry  # noqa: F401
from rwkv_lm_ext_tpu.adapters.slot_lora import (  # noqa: F401
    SlotLoraLeaf,
    apply_slot_stacks,
    build_slot_lora,
    has_slot_lora,
    init_slot_stacks,
    set_slot_idx,
    split_slot_stacks,
)
