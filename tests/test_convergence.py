"""End-to-end learning: the full training stack must actually converge.

A tiny model memorizes a small corpus — exercises forward, fused/chunked
kernels' gradients, optimizer groups, schedules, and the data path as one
system (the property no unit test shows)."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.config import TrainConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.train.loop import make_train_step

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=64, head_size=16,
    dtype="float32", param_dtype="float32",
)


def test_lm_memorizes():
    tc = TrainConfig(
        lr_init=3e-3, lr_final=1e-3, warmup_steps=2, total_steps=60,
        grad_clip=1.0, lr_schedule="cosine",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    init_fn, step_fn = make_train_step(CFG, tc, donate=False)
    ts = init_fn(params)
    # fixed corpus of 4 sequences with strong structure
    rng = np.random.default_rng(0)
    base = rng.integers(2, 64, size=(4, 33))
    batch = {
        "input_ids": jnp.asarray(base[:, :-1], jnp.int32),
        "labels": jnp.asarray(base[:, 1:], jnp.int32),
    }
    losses = []
    for _ in range(60):
        ts, m = step_fn(ts, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # memorization: final loss far below initial (ln(64) ~ 4.16 at chance)
    assert losses[0] > 3.0
    assert losses[-1] < losses[0] * 0.25, (losses[0], losses[-1])
    # and mostly monotone improvement over the run
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.3
