"""SPMD training on a virtual 8-device CPU mesh (dp, tp, dp x tp, ZeRO)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.config import TrainConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward
from rwkv_lm_ext_tpu.parallel import make_mesh, param_shardings
from rwkv_lm_ext_tpu.train.loop import (

    make_train_step,
    place_batch,
    place_train_state,
)

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=128, head_size=16,
    dtype="float32", param_dtype="float32",
)
TC = TrainConfig(
    lr_init=1e-3, warmup_steps=2, total_steps=10, grad_checkpoint=True,
)


def _batch(key, B=8, T=16):
    tokens = jax.random.randint(key, (B, T), 0, 128)
    labels = jnp.where(
        jax.random.uniform(key, (B, T)) < 0.2, -100, tokens
    )
    return {"input_ids": tokens, "labels": labels}


def _run_steps(mesh, n=2, accum=1, train_type="full", chunk_ctx=0):
    tc = TrainConfig(
        lr_init=1e-3, warmup_steps=2, total_steps=10,
        accumulate_grad_batches=accum, chunk_ctx=chunk_ctx,
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    init_fn, step_fn = make_train_step(CFG, tc, train_type=train_type)
    ts = init_fn(params)
    if mesh is not None:
        ts = place_train_state(ts, mesh)
    metrics = None
    for i in range(n):
        b = _batch(jax.random.PRNGKey(i + 1))
        if accum > 1:
            b = jax.tree_util.tree_map(
                lambda x: x.reshape(accum, -1, *x.shape[1:]), b
            )
        if mesh is not None:
            b = place_batch(b, mesh)
        ts, metrics = step_fn(ts, b)
    return ts, metrics


def test_single_device_training_decreases_loss():
    ts, m = _run_steps(None, n=1)
    assert jnp.isfinite(m["loss"]) and m["loss"] > 0
    assert int(ts.step) == 1


def test_dp8_matches_single_device():
    mesh = make_mesh(dp=8, tp=1)
    ts_a, m_a = _run_steps(None, n=2)
    ts_b, m_b = _run_steps(mesh, n=2)
    np.testing.assert_allclose(m_a["loss"], m_b["loss"], rtol=1e-4, atol=1e-5)
    # parameters identical after 2 steps
    la = jax.tree_util.tree_leaves(ts_a.params)
    lb = jax.tree_util.tree_leaves(ts_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-4, atol=1e-5)


def test_tp_sharded_forward_matches():
    mesh = make_mesh(dp=2, tp=4)
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    l_ref, _ = rwkv_forward(params, CFG, tokens)
    sh = param_shardings(params, mesh)
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)
    with jax.sharding.set_mesh(mesh):
        l_tp, _ = jax.jit(lambda p, t: rwkv_forward(p, CFG, t))(
            params_sh, tokens
        )
    np.testing.assert_allclose(l_ref, np.asarray(l_tp), rtol=2e-4, atol=2e-4)


def test_dp_tp_train_step():
    mesh = make_mesh(dp=2, tp=4)
    ts, m = _run_steps(mesh, n=2)
    assert jnp.isfinite(m["loss"])


def test_grad_accumulation_equivalence():
    """Accumulated loss == mean of the independently-computed micro losses
    (mean-of-means, same semantics as Lightning's accumulate_grad_batches)."""
    from rwkv_lm_ext_tpu.train.loop import sft_loss_fn

    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    b = _batch(jax.random.PRNGKey(1))
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape(2, -1, *x.shape[1:]), b
    )
    tc = TrainConfig(
        lr_init=1e-3, warmup_steps=2, total_steps=10,
        accumulate_grad_batches=2,
    )
    # compute expectation first: step_fn donates (deletes) its TrainState
    expect = float(
        0.5
        * (
            sft_loss_fn(params, CFG, {"input_ids": micro["input_ids"][0],
                                      "labels": micro["labels"][0]})
            + sft_loss_fn(params, CFG, {"input_ids": micro["input_ids"][1],
                                        "labels": micro["labels"][1]})
        )
    )
    init_fn, step_fn = make_train_step(CFG, tc)
    ts = init_fn(params)
    _, m = step_fn(ts, micro)
    np.testing.assert_allclose(m["loss"], expect, rtol=1e-4, atol=1e-5)


def test_tbptt_training_runs():
    ts, m = _run_steps(None, n=1, chunk_ctx=8)
    assert jnp.isfinite(m["loss"]) and m["loss"] > 0


def test_states_train_type_only_updates_states():
    params = init_rwkv_params(
        jax.random.PRNGKey(0), CFG, with_state_params=True
    )
    # zero att.output (reference init) blocks gradients to time_state
    for b in params["blocks"]:
        b["att"]["output"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(9), b["att"]["output"].shape
        )
    tc = TrainConfig(lr_init=1e-2, warmup_steps=0, total_steps=10)

    def loss_fn(p, cfg, batch):
        logits, _ = rwkv_forward(p, cfg, batch["input_ids"], use_state_params=True)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    before = {
        "emb": np.asarray(params["emb"]).copy(),
        "state": np.asarray(params["blocks"][0]["att"]["time_state"]).copy(),
    }
    init_fn, step_fn = make_train_step(
        CFG, tc, loss_fn=loss_fn, train_type="states"
    )
    ts = init_fn(params)
    b = _batch(jax.random.PRNGKey(1))
    ts2, _ = step_fn(ts, b)
    after = {
        "emb": ts2.params["emb"],
        "state": ts2.params["blocks"][0]["att"]["time_state"],
    }
    np.testing.assert_allclose(before["emb"], after["emb"])  # frozen
    assert not np.allclose(before["state"], after["state"])  # trained


def test_sequence_parallel_wkv():
    """T sharded over 8 devices == single-device sequential reference."""
    from rwkv_lm_ext_tpu.ops import wkv_reference
    from rwkv_lm_ext_tpu.parallel.sequence import wkv6_sequence_parallel
    from jax.sharding import Mesh
    import numpy as onp

    devs = jax.devices()[:8]
    mesh = Mesh(onp.array(devs), ("sp",))
    B, T, H, N = 2, 64, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.uniform(ks[3], (B, T, H, N), minval=-6.0, maxval=0.5)
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    y_ref, s_ref = wkv_reference(r, k, v, w, u)
    y_sp, s_sp = wkv6_sequence_parallel(
        r, k, v, w, u, mesh=mesh, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(y_sp), y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_sp), s_ref, rtol=2e-4, atol=2e-4)


def test_sequence_parallel_full_model():
    """Full-model forward with T sharded over 8 devices == single device."""
    from jax.sharding import Mesh
    import numpy as onp

    from rwkv_lm_ext_tpu.parallel.sequence import (
        rwkv_forward_sequence_parallel,
    )

    mesh = Mesh(onp.array(jax.devices()[:8]), ("sp",))
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(20 + i), b["att"]["output"].shape
        )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 128)
    logits_ref, _ = rwkv_forward(params, CFG, tokens, wkv_backend="chunked")
    logits_sp = rwkv_forward_sequence_parallel(
        params, CFG, tokens, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(logits_sp), logits_ref, rtol=3e-4, atol=3e-4
    )


def test_sequence_parallel_gradients():
    """SP forward is trainable: grads through shard_map == single-device
    (long-context training sharded over chips)."""
    from jax.sharding import Mesh
    import numpy as onp

    from rwkv_lm_ext_tpu.parallel.sequence import (
        rwkv_forward_sequence_parallel,
    )

    mesh = Mesh(onp.array(jax.devices()[:4]), ("sp",))
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(30 + i), b["att"]["output"].shape
        )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 128)

    def loss_sp(p):
        lg = rwkv_forward_sequence_parallel(p, CFG, tokens, mesh=mesh)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    def loss_ref(p):
        lg, _ = rwkv_forward(p, CFG, tokens, wkv_backend="chunked")
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.grad(loss_ref)(params)
    leaves_sp = jax.tree_util.tree_leaves(g_sp)
    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    worst = 0.0
    for a, b in zip(leaves_sp, leaves_ref):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        worst = max(worst, float(jnp.abs(a - b).max()) / scale)
    assert worst < 5e-3, worst


def test_pipeline_parallel_loss_and_grads_match_single_device():
    """GPipe over pp=4 x dp=2: loss AND parameter gradients must match
    the plain single-device forward exactly (the pipeline is a pure
    re-scheduling of the same math; ppermute/where-selects are
    differentiable). Beyond the reference: it has no PP at all."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_lm_ext_tpu import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
    from rwkv_lm_ext_tpu.models.stacked import (
        stack_params_uniform,
        unstack_params_uniform,
    )
    from rwkv_lm_ext_tpu.parallel.pipeline import (
        make_pp_mesh,
        pipeline_loss,
    )

    cfg = ModelConfig(
        n_layer=4, n_embd=64, vocab_size=128, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.2 * jax.random.normal(
            jax.random.PRNGKey(40 + i), b["att"]["output"].shape
        )
    sparams = stack_params_uniform(params)
    mesh = make_pp_mesh(dp=2, pp=4)

    B, T = 8, 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 3, 120)
    labels = jnp.concatenate(
        [tokens[:, 1:], jnp.full((B, 1), -100, tokens.dtype)], axis=1
    )

    def ref_loss(sp):
        logits, _ = rwkv_forward(sp, cfg, tokens, wkv_backend="reference")
        # sp is the flat (unstacked) tree here
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        mask = (labels >= 0).astype(jnp.float32)
        gold = jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[..., None], axis=-1
        )[..., 0]
        return -jnp.sum(gold * mask) / jnp.sum(mask)

    def pp_loss(sp):
        return pipeline_loss(
            sp, cfg, tokens, labels, mesh, n_micro=4,
            wkv_backend="reference",
        )

    l_ref = jax.jit(ref_loss)(params)
    l_pp = jax.jit(pp_loss)(sparams)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=2e-5)

    g_ref = jax.jit(jax.grad(ref_loss))(params)
    # pp grads mirror the uniform stacked tree; unstack to compare
    g_pp = unstack_params_uniform(jax.jit(jax.grad(pp_loss))(sparams))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for k, v in flat_ref:
        key = jax.tree_util.keystr(k)
        scale = max(float(jnp.abs(v).max()), 1e-3)
        err = float(jnp.abs(flat_pp[key] - v).max()) / scale
        assert err < 2e-4, (key, err)


def test_pipeline_train_step_decreases_loss():
    """End-to-end PP TRAINING: adamw over the pipeline loss on a
    dp=2 x pp=4 mesh, stage-sharded params + moments; loss decreases."""
    import jax
    import jax.numpy as jnp

    from rwkv_lm_ext_tpu import ModelConfig, TrainConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.stacked import stack_params_uniform
    from rwkv_lm_ext_tpu.parallel.pipeline import make_pp_mesh
    from rwkv_lm_ext_tpu.train.loop import (
        make_pp_train_step,
        place_pp_train_state,
    )

    cfg = ModelConfig(
        n_layer=4, n_embd=64, vocab_size=128, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    tc = TrainConfig(lr_init=1e-2, warmup_steps=0, total_steps=4)
    sparams = stack_params_uniform(
        init_rwkv_params(jax.random.PRNGKey(0), cfg)
    )
    mesh = make_pp_mesh(dp=2, pp=4)

    init_fn, step_fn = make_pp_train_step(
        cfg, tc, mesh, n_micro=4, wkv_backend="reference", donate=False
    )
    ts = place_pp_train_state(init_fn(sparams), mesh)

    B, T = 8, 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 3, 120)
    labels = jnp.concatenate(
        [tokens[:, 1:], jnp.full((B, 1), -100, tokens.dtype)], axis=1
    )
    batch = {"input_ids": tokens, "labels": labels}

    losses = []
    for _ in range(3):
        ts, metrics = step_fn(ts, batch)
        losses.append(float(metrics["loss"]))
        assert losses[-1] == losses[-1], "NaN loss"
    assert losses[-1] < losses[0], losses


def test_engine_tp_mesh_matches_single_device():
    """Mesh-aware SERVING: a tp=2 (or dp x tp) sharded GenerationEngine
    produces the single-device engine's exact greedy output — the same
    checkpoint spans the ICI mesh for models beyond one chip's HBM
    (beyond the reference, which serves on one GPU only)."""
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    params = init_rwkv_params(jax.random.PRNGKey(3), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(90 + i), b["att"]["output"].shape
        )
    sp = SamplingParams(temperature=0.0, token_stop=())
    ref_eng = GenerationEngine(params, CFG, wkv_backend="chunked")
    expected = ref_eng.generate([5, 9, 23], max_tokens=8, sampling=sp)

    mesh = make_mesh(dp=1, tp=2)
    eng = GenerationEngine(params, CFG, mesh=mesh)
    assert eng.wkv_backend == "chunked"  # auto flips off the Pallas path
    # params actually sharded over tp
    sh = eng.params["blocks"][0]["att"]["receptance"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "tp")
    out = eng.generate([5, 9, 23], max_tokens=8, sampling=sp)
    assert out == expected


def test_continuous_batcher_on_tp_mesh():
    """Continuous batching inherits the mesh through engine.init_state:
    batched decode slots run tp-sharded and match standalone outputs."""
    from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    params = init_rwkv_params(jax.random.PRNGKey(3), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(90 + i), b["att"]["output"].shape
        )
    sp = SamplingParams(temperature=0.0, token_stop=())
    mesh = make_mesh(dp=1, tp=2)
    eng = GenerationEngine(params, CFG, mesh=mesh)
    expected = {
        tuple(p): eng.generate(p, max_tokens=4, sampling=sp)
        for p in ([5, 9, 23], [77, 3])
    }
    batcher = ContinuousBatcher(eng, n_slots=2, sampling=sp)
    rids = {batcher.submit(p, max_tokens=4): tuple(p)
            for p in ([5, 9, 23], [77, 3])}
    results = batcher.run()
    for rid, key in rids.items():
        assert results[rid] == expected[key]


def test_quantized_engine_on_tp_mesh():
    """Quantized serving on a tp mesh: QuantizedTensor leaves flatten
    into (q, scale) children — scale vectors and 4-bit packed blocks hit
    param_shardings' divisibility guard and replicate instead of
    erroring; outputs match the single-device quantized engine."""
    from rwkv_lm_ext_tpu.adapters.quant import quantize_tree
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    params = init_rwkv_params(jax.random.PRNGKey(3), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(90 + i), b["att"]["output"].shape
        )
    sp = SamplingParams(temperature=0.0, token_stop=())
    for mode in ("int8", "nf4"):
        qp = quantize_tree(params, mode=mode)
        ref = GenerationEngine(qp, CFG, wkv_backend="chunked")
        expected = ref.generate([5, 9, 23], max_tokens=5, sampling=sp)
        eng = GenerationEngine(qp, CFG, mesh=make_mesh(dp=1, tp=2))
        out = eng.generate([5, 9, 23], max_tokens=5, sampling=sp)
        assert out == expected, (mode, out, expected)


def test_continuous_batcher_on_dp_tp_mesh():
    """Throughput scale-out: the batcher's slot pool shards over dp
    (state batch axis) AND tp (heads) simultaneously; outputs match the
    single-device batcher exactly."""
    from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    params = init_rwkv_params(jax.random.PRNGKey(3), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(90 + i), b["att"]["output"].shape
        )
    sp = SamplingParams(temperature=0.0, token_stop=())
    prompts = [[5, 9, 23], [77, 3], [14, 60], [2, 4, 6]]

    ref_eng = GenerationEngine(params, CFG, wkv_backend="chunked")
    ref = ContinuousBatcher(ref_eng, n_slots=4, sampling=sp)
    ref_ids = [ref.submit(p, max_tokens=4) for p in prompts]
    expected = ref.run()

    mesh = make_mesh(dp=2, tp=2)
    eng = GenerationEngine(params, CFG, mesh=mesh)
    batcher = ContinuousBatcher(eng, n_slots=4, sampling=sp)
    rids = [batcher.submit(p, max_tokens=4) for p in prompts]
    results = batcher.run()
    for r_ref, r in zip(ref_ids, rids):
        assert results[r] == expected[r_ref]
