"""Named multi-adapter registry with hot-swap.

The reference serves chat + embedding + reranking off ONE base model by
walking modules and flipping `active_adapter` on every wrapped layer
(src/layers.py:171-175 set_adapter; infer/encoders.py BiCrossFusionEncoder,
explicitly "not thread-safe", model_run.py:1108). Here an adapter switch
is a pure function: `registry.materialize(name)` returns merged serving
weights (cached per adapter — memory for zero swap latency), so different
requests can use different adapters concurrently.

Named initial-state registry ("states" serving, infer/states_generator.py)
lives in infer/states_registry.py.
"""
from __future__ import annotations

from typing import Dict

from rwkv_lm_ext_tpu.adapters.lora import LoraConfig, merge_lora, merge_pissa


class AdapterRegistry:
    def __init__(self, base_params, cache_merged: bool = True):
        self.base = base_params
        self._adapters: Dict[str, tuple] = {}
        self._cache: Dict[str, object] = {}
        self.cache_merged = cache_merged

    def register(
        self, name: str, adapter, lc: LoraConfig, pissa_init=None
    ) -> None:
        """pissa_init: the SVD-init adapter saved at training start; when
        given (PiSSA served against the ORIGINAL base) materialize computes
        W + A@B - A_init@B_init (src/layers.py:125-169 semantics)."""
        self._adapters[name] = (adapter, lc, pissa_init)
        self._cache.pop(name, None)

    def names(self):
        return ["default", *self._adapters]

    def materialize(self, name: str = "default"):
        """Serving weights for an adapter ("default" = bare base,
        matching src/layers.py:30-33)."""
        if name == "default":
            return self.base
        if name in self._cache:
            return self._cache[name]
        adapter, lc, pissa_init = self._adapters[name]
        if pissa_init is not None:
            merged = merge_pissa(self.base, adapter, pissa_init, lc)
        else:
            merged = merge_lora(self.base, adapter, lc)
        if self.cache_merged:
            self._cache[name] = merged
        return merged
