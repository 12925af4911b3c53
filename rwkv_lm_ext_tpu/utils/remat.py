"""Activation-rematerialization policies for the per-block checkpoint.

``jax.checkpoint`` with no policy recomputes the whole block forward during
the backward pass (~a full extra forward of FLOPs). A *selective* policy
keeps the MXU matmul outputs resident and recomputes only the cheap
elementwise chains (ddlerp / LayerNorm / sigmoid / relu^2), trading a
fraction of no-remat's activation memory for near no-remat step time.

The reference has only the all-or-nothing per-block DeepSpeed/torch
checkpointing (``src/model.py:1204-1221``); policy selection is a
TPU-native lever XLA exposes through ``jax.checkpoint_policies``.

Everywhere the package accepts ``remat=``, the value may be:

- ``False`` (or ``"off"``/``"none"``): no rematerialization;
- ``True`` (or ``"on"``/``"full"``): full per-block recompute (max memory
  savings — the historical behavior);
- a policy name: ``"dots"`` (save every dot/matmul output) or
  ``"dots_nobatch"`` (save only non-batched dots, i.e. the weight
  projections but not any batched einsums).
"""
from __future__ import annotations

from typing import Union

import jax

RematSpec = Union[bool, str]

_POLICIES = {
    "dots": "dots_saveable",
    "dots_nobatch": "dots_with_no_batch_dims_saveable",
}

_FALSY = (False, None, "off", "none", "0", "false")
_TRUTHY = (True, "on", "full", "1", "true")


def normalize_remat(remat: RematSpec) -> RematSpec:
    """Map CLI/env spellings to canonical ``False | True | policy-key``."""
    if isinstance(remat, str):
        remat = remat.lower()
    if remat in _FALSY:
        return False
    if remat in _TRUTHY:
        return True
    if remat in _POLICIES:
        return remat
    raise ValueError(
        f"unknown remat spec {remat!r}; expected on/off/full/none or one of "
        f"{sorted(_POLICIES)}"
    )


def remat_wrap(fn, remat: RematSpec, **checkpoint_kwargs):
    """``jax.checkpoint`` honoring the remat spec (no-op when falsy)."""
    remat = normalize_remat(remat)
    if remat is False:
        return fn
    if remat is True:
        return jax.checkpoint(fn, **checkpoint_kwargs)
    policy = getattr(jax.checkpoint_policies, _POLICIES[remat])
    return jax.checkpoint(fn, policy=policy, **checkpoint_kwargs)
