"""Native (Orbax) checkpointing.

The reference's only on-disk format is torch.save (.pth, see pth.py);
natively we checkpoint full training state — params, optimizer state,
step — with Orbax, which handles sharded arrays (writes each shard from
its owning device) and atomic renames. Use .pth for interop, Orbax for
training state.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """target: a pytree of like-shaped arrays (or ShapeDtypeStructs with
    shardings) to restore into; None restores as saved."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=getattr(x, "sharding", None),
                )
                if hasattr(x, "shape")
                else x,
                target,
            )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)
