"""Joint multi-task LoRA training (adapters.slot_lora): N adapters learn
in ONE batched step, each example's gradient reaching only its task's
stack rows. Parity target: a single-task slot step must equal a plain
single-adapter LoRA step exactly (raw stacks, scaling applied at trace
time — same optimization geometry as adapters.lora)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters import (
    LoraConfig,
    apply_slot_stacks,
    init_lora_params,
    init_slot_stacks,
    merge_lora,
    split_slot_stacks,
)
from rwkv_lm_ext_tpu.config import TrainConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.train.loop import make_train_step, sft_loss_fn

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)
LC = LoraConfig(r=4, alpha=16.0)
TC = TrainConfig(
    lr_init=1e-3, lr_final=1e-4, warmup_steps=1, total_steps=4,
    micro_bsz=4, weight_decay=0.01, grad_clip=1.0,
)


def _batch(key, B=4, T=8):
    ids = jax.random.randint(key, (B, T), 4, 90)
    labels = jnp.where(
        jnp.arange(T)[None, :] >= T // 2, ids, -100
    ).astype(jnp.int32)
    return {"input_ids": ids, "labels": labels}


def _stacks_from_adapter(adapter, n_total, aid):
    """Stacks holding one known adapter at row aid, zeros elsewhere."""
    stacks = {}
    for k, ab in adapter.items():
        A = jnp.zeros((n_total,) + ab["A"].shape).at[aid].set(ab["A"])
        B = jnp.zeros((n_total,) + ab["B"].shape).at[aid].set(ab["B"])
        stacks[k] = {"A": A, "B": B}
    return stacks


def test_single_task_step_matches_plain_lora():
    """One slot-lora train step (all rows task 1) == one plain LoRA step
    on the same batch: inactive rows are zero, so losses, grads, the
    global grad norm and therefore the AdamW updates coincide."""
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    batch = _batch(jax.random.PRNGKey(2))
    # the train step donates its TrainState — build the stacks (and keep
    # host copies for assertions) before the adapter buffers are donated
    stacks = _stacks_from_adapter(adapter, 2, 1)
    adapter = jax.tree_util.tree_map(np.asarray, adapter)

    def plain_loss(ad, frozen, cfg_, b):
        return sft_loss_fn(merge_lora(frozen, ad, LC), cfg_, b, remat=False)

    init_p, step_p = make_train_step(CFG, TC, loss_fn=plain_loss)
    ts_p, m_p = step_p(init_p(adapter), batch, params)

    def slot_loss(st, frozen, cfg_, b):
        p = apply_slot_stacks(frozen, st, b["adapter_ids"], LC)
        return sft_loss_fn(p, cfg_, b, remat=False)

    init_s, step_s = make_train_step(CFG, TC, loss_fn=slot_loss)
    sbatch = dict(batch, adapter_ids=jnp.ones((4,), jnp.int32))
    ts_s, m_s = step_s(init_s(stacks), sbatch, params)

    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_p["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_s["grad_norm"]), float(m_p["grad_norm"]), rtol=1e-5
    )
    got = split_slot_stacks(ts_s.params, {"base": 0, "t": 1})["t"]
    for k in adapter:
        np.testing.assert_allclose(
            got[k]["A"], ts_p.params[k]["A"], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            got[k]["B"], ts_p.params[k]["B"], rtol=1e-5, atol=1e-7
        )


def test_gradients_isolate_per_task():
    """A batch routed entirely to task 1 must leave task 2's rows (and
    the reserved base row) exactly at their init. weight_decay=0 here
    (the CLI default): AdamW's decay term is gradient-independent, so a
    nonzero wd shrinks idle adapters too — documented in HOWTO §17b."""
    import dataclasses

    tc = dataclasses.replace(TC, weight_decay=0.0)
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    # the reference-faithful init zero-inits several projections (e.g.
    # att.value), which makes some adapters' first-step grads exactly 0
    # through the wkv product — randomize the base so every adapted leaf
    # sees gradient signal
    k = jax.random.PRNGKey(99)
    for b in params["blocks"]:
        for sub in ("att", "ffn"):
            for nm, w in b[sub].items():
                if isinstance(w, jax.Array) and w.ndim == 2:
                    k, sk = jax.random.split(k)
                    b[sub][nm] = 0.1 * jax.random.normal(sk, w.shape)
    stacks0, ids = init_slot_stacks(
        jax.random.PRNGKey(1), params, LC, ["t1", "t2"]
    )
    assert ids == {"base": 0, "t1": 1, "t2": 2}
    # host copies: the train step donates the TrainState buffers
    stacks0_host = jax.tree_util.tree_map(np.asarray, stacks0)

    def slot_loss(st, frozen, cfg_, b):
        p = apply_slot_stacks(frozen, st, b["adapter_ids"], LC)
        return sft_loss_fn(p, cfg_, b, remat=False)

    init_fn, step_fn = make_train_step(CFG, tc, loss_fn=slot_loss)
    batch = dict(
        _batch(jax.random.PRNGKey(2)),
        adapter_ids=jnp.ones((4,), jnp.int32),
    )
    ts, _ = step_fn(init_fn(stacks0), batch, params)
    for k, ab in ts.params.items():
        np.testing.assert_array_equal(ab["A"][0], stacks0_host[k]["A"][0])
        np.testing.assert_array_equal(ab["A"][2], stacks0_host[k]["A"][2])
        np.testing.assert_array_equal(ab["B"][2], stacks0_host[k]["B"][2])
        # task 1 actually moved (B leaves zero on the first step)
        assert not np.allclose(ab["B"][1], stacks0_host[k]["B"][1])


def test_cli_slot_lora_end_to_end(tmp_path):
    """Trainer CLI: rows carry a 'task' field; per-task lora-NAME-step
    checkpoints come out servable (HF-peft-compatible state dicts that
    round-trip into slot serving via build_slot_lora)."""
    from rwkv_lm_ext_tpu.adapters import build_slot_lora
    from rwkv_lm_ext_tpu.adapters.lora import lora_state_dict_to_tree
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth, save_torch_pth
    from rwkv_lm_ext_tpu.train.cli import main

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    ckpt = str(tmp_path / "base.pth")
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    save_torch_pth(ckpt, params_to_state_dict(params, cfg))

    data = str(tmp_path / "sft.jsonl")
    with open(data, "w") as f:
        for i in range(8):
            task = "chat" if i % 2 == 0 else "kg"
            f.write(json.dumps({
                "instruction": "do", "input": f"x {i}",
                "output": f"y {i}", "task": task,
            }) + "\n")

    out = str(tmp_path / "out")
    main([
        "sft", "--model", ckpt, "--train-data", data,
        "--output-dir", out, "--train-type", "slot-lora",
        "--lora-r", "4", "--max-steps", "2", "--micro-bsz", "2",
        "--log-every", "1", "--save-every-steps", "2",
        "--warmup-steps", "1", "--dp", "1",
    ])
    files = os.listdir(out)
    named = {}
    for name in ("chat", "kg"):
        saved = sorted(f for f in files if f.startswith(f"lora-{name}-step"))
        assert saved, (name, files)
        sd = load_torch_pth(os.path.join(out, saved[-1]))
        assert any(k.endswith(".lora_A") for k in sd)
        named[name] = lora_state_dict_to_tree(sd)
    # the two tasks learned different adapters, and they serve mixed
    a = np.concatenate([np.ravel(v["B"]) for v in named["chat"].values()])
    b = np.concatenate([np.ravel(v["B"]) for v in named["kg"].values()])
    assert a.any() and b.any() and not np.allclose(a, b)
    slot, ids = build_slot_lora(params, named, LoraConfig(r=4, alpha=32.0))
    assert set(ids) == {"base", "chat", "kg"}
