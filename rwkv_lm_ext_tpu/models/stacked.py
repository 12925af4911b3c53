"""Scan-over-layers forward (compile-time at scale).

The python-loop forward traces 24 copies of the block at 1B6 scale — on a
remote-compile TPU stack that is 150-250s per program. Stacking blocks
1..L-1 into leading-axis arrays and running one `lax.scan` compiles the
block once. Block 0 stays unstacked (it owns ln0 / pos_emb / ffn_pre).

Usage:
    sparams = stack_params(params)         # one-time conversion
    logits, state = rwkv_forward_stacked(sparams, cfg, tokens, state)

Same semantics as models.rwkv.rwkv_forward (state threading, fused Pallas
path via the same time-mix); unsupported options (tiny attention,
dropout, pre_ffn) raise — convert back with unstack_params for those.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.models.rwkv import as_weight, block_forward, layer_norm, proj
from rwkv_lm_ext_tpu.models.state import init_model_state


def stack_params(params: Dict) -> Dict:
    """{"emb", "block0", "blocks_stacked", "ln_out", "head", ...}: blocks
    1..L-1 stacked leaf-wise along a new leading axis."""
    blocks = params["blocks"]
    assert len(blocks) >= 2, "stacking needs >= 2 layers"
    rest = blocks[1:]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *rest
    )
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["block0"] = blocks[0]
    out["blocks_stacked"] = stacked
    return out


def unstack_params(sparams: Dict) -> Dict:
    stacked = sparams["blocks_stacked"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    blocks = [sparams["block0"]]
    for i in range(n):
        blocks.append(jax.tree_util.tree_map(lambda x: x[i], stacked))
    out = {k: v for k, v in sparams.items()
           if k not in ("block0", "blocks_stacked")}
    out["blocks"] = blocks
    return out


def stack_params_uniform(params: Dict) -> Dict:
    """All n_layer blocks stacked with ONE uniform leaf structure:
    block 0's ``ln0`` (the embedding LayerNorm) is lifted to the top
    level so every block stacks leaf-for-leaf.

    This is the pipeline-parallel form: staging needs the stacked axis
    divisible by ``pp``, and ``n_layer % pp`` (24-layer 1B6: pp in
    {2,3,4,6,8,12,24}) is satisfiable where the block0-separate form's
    ``(n_layer-1) % pp`` (23: prime) is not."""
    blocks = params["blocks"]
    b0 = {k: v for k, v in blocks[0].items() if k != "ln0"}
    uniform = [b0] + list(blocks[1:])
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *uniform
    )
    out = {k: v for k, v in params.items() if k != "blocks"}
    if "ln0" in blocks[0]:
        out["ln0"] = blocks[0]["ln0"]
    out["blocks_stacked"] = stacked
    return out


def unstack_params_uniform(sparams: Dict) -> Dict:
    """Inverse of stack_params_uniform (``ln0`` folds back into block 0)."""
    stacked = sparams["blocks_stacked"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    blocks = [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]
    if "ln0" in sparams:
        blocks[0] = dict(blocks[0])
        blocks[0]["ln0"] = sparams["ln0"]
    out = {k: v for k, v in sparams.items()
           if k not in ("ln0", "blocks_stacked")}
    out["blocks"] = blocks
    return out


def unstack_any(sparams: Dict) -> Dict:
    """Unstack either stacked form (block0-separate or uniform)."""
    if "block0" in sparams:
        return unstack_params(sparams)
    return unstack_params_uniform(sparams)


def is_stacked(params: Dict) -> bool:
    return "blocks_stacked" in params


def rwkv_forward_stacked(
    sparams: Dict,
    cfg,
    tokens: jax.Array,
    state: Optional[Dict] = None,
    *,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    remat: bool = False,
    use_state_params: bool = False,
    return_hidden: bool = False,
    return_logits: bool = True,
    fused_prologue: bool = True,
) -> Tuple[jax.Array, Dict]:
    """Scan-over-layers twin of rwkv_forward."""
    assert cfg.tiny_att_dim <= 0 and cfg.pre_ffn == 0 and cfg.dropout == 0, (
        "scan-over-layers supports the plain block; use rwkv_forward for "
        "tiny attention / pre_ffn / dropout"
    )
    B, T = tokens.shape
    if state is None:
        state = init_model_state(cfg, B)
    dt = cfg.compute_dtype
    x = jnp.take(sparams["emb"], tokens, axis=0).astype(dt)

    # block 0 (owns ln0)
    ls0 = (state["att_shift"][0], state["wkv"][0], state["ffn_shift"][0])
    spo0 = (
        sparams["block0"]["att"].get("time_state")
        if use_state_params
        else None
    )
    x, ls0 = block_forward(
        sparams["block0"], cfg, x, ls0,
        layer_id=0, wkv_backend=wkv_backend, chunk_size=chunk_size,
        state_param_override=spo0, fused_prologue=fused_prologue,
    )

    def body(x, inp):
        bp, att_shift, wkv_state, ffn_shift = inp
        spo = bp["att"].get("time_state") if use_state_params else None
        x, ls = block_forward(
            bp, cfg, x, (att_shift, wkv_state, ffn_shift),
            layer_id=1, wkv_backend=wkv_backend, chunk_size=chunk_size,
            state_param_override=spo, fused_prologue=fused_prologue,
        )
        return x, ls

    if remat:
        from rwkv_lm_ext_tpu.utils.remat import remat_wrap

        body = remat_wrap(body, remat)

    x, (a_s, w_s, f_s) = jax.lax.scan(
        body,
        x,
        (
            sparams["blocks_stacked"],
            state["att_shift"][1:],
            state["wkv"][1:],
            state["ffn_shift"][1:],
        ),
    )
    new_state = {
        "att_shift": jnp.concatenate([ls0[0][None], a_s]),
        "wkv": jnp.concatenate([ls0[1][None], w_s]),
        "ffn_shift": jnp.concatenate([ls0[2][None], f_s]),
    }
    x = layer_norm(x, sparams["ln_out"])
    if return_hidden and not return_logits:
        return x, new_state
    logits = proj(x, sparams["head"], dt)
    if return_hidden:
        return (logits, x), new_state
    return logits, new_state
