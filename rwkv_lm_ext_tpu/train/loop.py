"""The pjit'd training loop.

Replaces PyTorch Lightning + DeepSpeed (reference peft_train_sft.py:404-419,
src/trainer.py): one jitted SPMD train step over a Mesh — batch sharded on
``dp``, params optionally head-sharded on ``tp``, optimizer state
ZeRO-sharded over ``dp`` — with gradient accumulation via lax.scan, per-
block rematerialization, and TBPTT (infctx) chunked loss with carried
recurrent state (src/model.py:1134-1192) as a lax.scan over sequence
chunks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rwkv_lm_ext_tpu.config import TrainConfig
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state
from rwkv_lm_ext_tpu.train.losses import causal_lm_loss
from rwkv_lm_ext_tpu.train.optim import (
    apply_trainable_mask,
    make_optimizer,
    trainable_mask,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, tx):
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def sft_loss_fn(
    params, cfg, batch: Dict[str, jax.Array], *, remat: bool = True,
    wkv_backend: str = "auto",
) -> jax.Array:
    """Causal-LM SFT loss: batch = {"input_ids" (B,T), "labels" (B,T)}
    with labels -100 on prompt/pad (the reference's collator contract,
    data/custom_datasets.py pad_only_according_data)."""
    logits, _ = rwkv_forward(
        params, cfg, batch["input_ids"], remat=remat,
        wkv_backend=wkv_backend,
    )
    return causal_lm_loss(logits, batch["labels"])


def tbptt_loss_fn(
    params, cfg, batch: Dict[str, jax.Array], *, chunk_ctx: int,
    remat: bool = True, wkv_backend: str = "auto",
) -> jax.Array:
    """Infinite-context (TBPTT) loss: lax.scan over chunk_ctx-sized chunks
    carrying the recurrent state; running token-weighted loss average
    (src/model.py:1134-1192). Gradients flow through carried state (the
    wkv6infctx kernel's gs path) — memory bounded by remat per chunk."""
    tokens, labels = batch["input_ids"], batch["labels"]
    B, T = tokens.shape
    assert T % chunk_ctx == 0, "pad sequences to a multiple of chunk_ctx"
    NC = T // chunk_ctx
    state0 = init_model_state(cfg, B)

    tok_c = tokens.reshape(B, NC, chunk_ctx).swapaxes(0, 1)
    lab_c = labels.reshape(B, NC, chunk_ctx).swapaxes(0, 1)

    def chunk_step(carry, inp):
        state, loss_sum, n_sum = carry
        tk, lb = inp
        logits, state = rwkv_forward(
            params, cfg, tk, state, remat=remat,
            wkv_backend=wkv_backend,
        )
        valid = jnp.sum(lb != -100)
        loss = causal_lm_loss(logits, lb, l2_wrap=False)
        return (state, loss_sum + loss * valid, n_sum + valid), None

    from rwkv_lm_ext_tpu.utils.remat import remat_wrap

    body = remat_wrap(chunk_step, remat) if remat else chunk_step
    (state, loss_sum, n_sum), _ = jax.lax.scan(
        body, (state0, jnp.zeros(()), jnp.zeros((), jnp.int32)), (tok_c, lab_c)
    )
    return loss_sum / jnp.maximum(n_sum, 1)


def make_train_step(
    cfg,
    tc: TrainConfig,
    loss_fn: Optional[Callable] = None,
    *,
    mesh=None,
    train_type: str = "full",
    donate: bool = True,
):
    """Build (init_fn, step_fn).

    step_fn(ts, batch) -> (ts, metrics); batch leaves shaped
    (accum, micro_bsz, T) when tc.accumulate_grad_batches > 1 else
    (micro_bsz, T). All collectives (grad all-reduce over dp, activation
    reductions over tp) are inserted by XLA from the shardings.
    """
    if loss_fn is None:
        loss_fn = functools.partial(
            sft_loss_fn, remat=tc.grad_checkpoint
        ) if not tc.chunk_ctx else functools.partial(
            tbptt_loss_fn, chunk_ctx=tc.chunk_ctx, remat=tc.grad_checkpoint
        )

    def build_tx(params):
        tx = make_optimizer(tc, params)
        if train_type != "full":
            tx = apply_trainable_mask(tx, trainable_mask(params, train_type))
        return tx

    def init_fn(params):
        tx = build_tx(params)
        return TrainState.create(params, tx)

    def step_fn(
        ts: TrainState, batch, frozen=None, update_mask=None
    ) -> Tuple[TrainState, Dict]:
        """frozen: optional pytree of non-trained parameters (e.g. the LoRA
        base weights) passed through to loss_fn as a real argument so jit
        doesn't bake it in as constants.
        update_mask: optional pytree of 0/1 floats multiplied into the
        updates — the LISA layerwise-sampling hook (masks change per step,
        so they are data, not optimizer structure)."""
        tx = build_tx(ts.params)

        def single(params, b):
            if frozen is not None:
                return loss_fn(params, frozen, cfg, b)
            return loss_fn(params, cfg, b)

        accum = tc.accumulate_grad_batches
        if accum > 1:
            def micro(carry, b):
                loss, grads = jax.value_and_grad(single)(ts.params, b)
                acc_loss, acc_grads = carry
                acc_grads = jax.tree_util.tree_map(
                    lambda a, g: a + g / accum, acc_grads, grads
                )
                return (acc_loss + loss / accum, acc_grads), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zero_grads), batch
            )
        else:
            loss, grads = jax.value_and_grad(single)(ts.params, batch)

        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        if update_mask is not None:
            updates = jax.tree_util.tree_map(
                lambda upd, m: upd * m, updates, update_mask
            )
        params = optax.apply_updates(ts.params, updates)
        gnorm = optax.global_norm(grads)
        new_ts = TrainState(
            params=params, opt_state=opt_state, step=ts.step + 1
        )
        return new_ts, {"loss": loss, "grad_norm": gnorm}

    # Shardings propagate from the placed inputs (place_train_state /
    # place_batch); XLA/GSPMD inserts the dp grad all-reduce and tp
    # activation collectives automatically.
    step_jit = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return init_fn, step_jit


def place_train_state(ts: TrainState, mesh) -> TrainState:
    """Device-place a TrainState per the sharding rules: params per
    param_shardings, optimizer state ZeRO-sharded over dp."""
    from rwkv_lm_ext_tpu.parallel.mesh import param_shardings

    p_sh = param_shardings(ts.params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, ts.params, p_sh)

    dp = mesh.shape["dp"]

    def place_opt(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            for a in sorted(range(leaf.ndim), key=lambda a: -leaf.shape[a]):
                if leaf.shape[a] % dp == 0 and leaf.shape[a] >= dp:
                    parts = [None] * leaf.ndim
                    parts[a] = "dp"
                    return jax.device_put(
                        leaf, NamedSharding(mesh, P(*parts))
                    )
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map(place_opt, ts.opt_state)
    step = jax.device_put(ts.step, NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)


def place_batch(batch, mesh):
    from rwkv_lm_ext_tpu.parallel.mesh import batch_shardings

    def put(x):
        ndim = x.ndim
        # accum axis (if any) is leading; shard the batch axis
        spec = P(None, "dp") if ndim == 3 else P("dp")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def make_pp_train_step(
    cfg,
    tc: TrainConfig,
    mesh,
    *,
    n_micro: int,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    train_type: str = "full",
    donate: bool = True,
):
    """(init_fn, step_fn) training through the GPipe pipeline schedule
    (parallel.pipeline.pipeline_loss): layers staged over the mesh's
    ``pp`` axis, batch over ``dp``, grads differentiated through the
    ppermute schedule. Params must be the UNIFORM stacked form
    (models.stacked.stack_params_uniform — n_layer % pp == 0);
    batch = {"input_ids", "labels"} with -100-masked labels.

    Beyond the reference (DP-only): stage-sharded training fits models
    whose full parameter+optimizer state exceeds one chip.
    """
    from rwkv_lm_ext_tpu.parallel.pipeline import pipeline_loss

    def build_tx(params):
        tx = make_optimizer(tc, params)
        if train_type != "full":
            tx = apply_trainable_mask(tx, trainable_mask(params, train_type))
        return tx

    def init_fn(sparams):
        return TrainState.create(sparams, build_tx(sparams))

    def step_fn(ts: TrainState, batch) -> Tuple[TrainState, Dict]:
        tx = build_tx(ts.params)

        def loss(p):
            return pipeline_loss(
                p, cfg, batch["input_ids"], batch["labels"], mesh,
                n_micro=n_micro, wkv_backend=wkv_backend,
                chunk_size=chunk_size,
            )

        loss_val, grads = jax.value_and_grad(loss)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        gnorm = optax.global_norm(grads)
        new_ts = TrainState(
            params=params, opt_state=opt_state, step=ts.step + 1
        )
        return new_ts, {"loss": loss_val, "grad_norm": gnorm}

    step_jit = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return init_fn, step_jit


def place_pp_train_state(ts: TrainState, mesh) -> TrainState:
    """Device-place a stacked-params TrainState for pipeline training:
    params per pp_param_specs; optimizer moments follow their parameter
    (any array whose leading axis equals the stacked layer count shards
    over ``pp`` — adamw's mu/nu mirror the param tree), scalars
    replicate."""
    from rwkv_lm_ext_tpu.parallel.pipeline import pp_param_specs

    specs = pp_param_specs(ts.params)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        ts.params, specs,
    )
    n_stacked = jax.tree_util.tree_leaves(
        ts.params["blocks_stacked"]
    )[0].shape[0]

    def place_opt(leaf):
        if (
            hasattr(leaf, "ndim") and leaf.ndim >= 1
            and leaf.shape[0] == n_stacked
        ):
            return jax.device_put(
                leaf,
                NamedSharding(mesh, P("pp", *([None] * (leaf.ndim - 1)))),
            )
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map(place_opt, ts.opt_state)
    step = jax.device_put(ts.step, NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)
