"""Named state-tuning checkpoint registry for "states" serving.

The reference keeps a dict of state-tuned checkpoints and builds a fresh
initial BlockState list per request (infer/states_generator.py:34-49,
demo/states_runner.py): each checkpoint contributes per-layer
`blocks.{i}.att.time_state` tensors used as the WKV initial state (shift
states zero). Here a named state is a stacked (L,H,N,N) array plugged into
init_model_state(wkv_init=...), so the engine's prefill starts from it.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth, strip_prefix


def extract_time_states(state_dict: Dict[str, np.ndarray], n_layer: int):
    """Stack blocks.{i}.att.time_state -> (L,H,N,N) fp32 (the filter the
    reference applies in peft_train/extract_states.py)."""
    mats = []
    for i in range(n_layer):
        key = f"blocks.{i}.att.time_state"
        if key not in state_dict:
            raise KeyError(f"missing {key} — not a state-tuning checkpoint")
        mats.append(np.asarray(state_dict[key], np.float32))
    return jnp.asarray(np.stack(mats))


class StatesRegistry:
    """name -> (L,H,N,N) initial WKV states + instruction templates."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._states: Dict[str, jnp.ndarray] = {}
        self._templates: Dict[str, str] = {}

    def register(self, name: str, wkv_init, template: str = "{input}") -> None:
        wkv_init = jnp.asarray(wkv_init, jnp.float32)
        L, H, N = self.cfg.n_layer, self.cfg.n_head, self.cfg.head_size
        assert wkv_init.shape == (L, H, N, N), wkv_init.shape
        self._states[name] = wkv_init
        self._templates[name] = template

    def register_pth(self, name: str, path: str, template: str = "{input}"):
        sd = strip_prefix(load_torch_pth(path))
        self.register(
            name, extract_time_states(sd, self.cfg.n_layer), template
        )

    def names(self):
        return list(self._states)

    def initial_state(self, name: str, batch_size: int = 1):
        from rwkv_lm_ext_tpu.models.state import init_model_state

        return init_model_state(
            self.cfg, batch_size, wkv_init=self._states[name]
        )

    def build_prompt(self, name: str, user_input: str) -> str:
        return self._templates[name].format(input=user_input)

    def generate(self, engine, name: str, user_input: str, **kw):
        """Run generation from the named tuned state (the /process_text
        endpoint behavior, demo/states_runner.py)."""
        state = self.initial_state(name, 1)
        prompt = self.build_prompt(name, user_input)
        return engine.generate(prompt, state=state, **kw)
