"""Per-row multi-adapter LoRA (adapters.slot_lora): different adapters
decode in ONE batched step. The reference flips a global active_adapter
between requests (src/layers.py:171-175) — exact parity target is
merge_lora (one adapter at a time); the slot formulation must match it
row-for-row in a mixed batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters import (
    LoraConfig,
    build_slot_lora,
    init_lora_params,
    merge_lora,
    set_slot_idx,
)
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)
LC = LoraConfig(r=4, alpha=16.0)


def _params():
    return init_rwkv_params(jax.random.PRNGKey(0), CFG)


def _adapter(params, seed, scale):
    ad = init_lora_params(jax.random.PRNGKey(seed), params, LC)
    for ab in ad.values():
        ab["B"] = scale * jnp.ones_like(ab["B"])
    return ad


def test_mixed_batch_matches_per_adapter_merge():
    """Rows [base, a1, a2] in one forward == three merge_lora forwards."""
    params = _params()
    a1 = _adapter(params, 1, 0.01)
    a2 = _adapter(params, 2, -0.02)
    slot, ids = build_slot_lora(params, {"a1": a1, "a2": a2}, LC)
    assert ids == {"base": 0, "a1": 1, "a2": 2}

    tokens = jax.random.randint(jax.random.PRNGKey(3), (3, 8), 0, 100)
    slot = set_slot_idx(slot, jnp.array([0, 1, 2], jnp.int32))
    l_mixed, _ = rwkv_forward(slot, CFG, tokens)

    l_base, _ = rwkv_forward(params, CFG, tokens)
    l_a1, _ = rwkv_forward(merge_lora(params, a1, LC), CFG, tokens)
    l_a2, _ = rwkv_forward(merge_lora(params, a2, LC), CFG, tokens)
    np.testing.assert_allclose(l_mixed[0], l_base[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(l_mixed[1], l_a1[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(l_mixed[2], l_a2[2], rtol=2e-5, atol=2e-5)
    # the adapters actually do something
    assert not np.allclose(l_a1[1], l_base[1])


def test_mixed_rank_adapters_zero_padded():
    """Per-adapter r differences are folded at build time (rank padded,
    scale into B) — each still matches its own merge."""
    params = _params()
    lc_small = LoraConfig(r=2, alpha=8.0)
    a1 = _adapter(params, 1, 0.01)
    a2 = init_lora_params(jax.random.PRNGKey(2), params, lc_small)
    for ab in a2.values():
        ab["B"] = -0.03 * jnp.ones_like(ab["B"])
    slot, ids = build_slot_lora(
        params, {"a1": a1, "a2": a2}, {"a1": LC, "a2": lc_small}
    )
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0, 100)
    slot = set_slot_idx(slot, jnp.array([1, 2], jnp.int32))
    l_mixed, _ = rwkv_forward(slot, CFG, tokens)
    l_a1, _ = rwkv_forward(merge_lora(params, a1, LC), CFG, tokens)
    l_a2, _ = rwkv_forward(
        merge_lora(params, a2, lc_small), CFG, tokens
    )
    np.testing.assert_allclose(l_mixed[0], l_a1[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(l_mixed[1], l_a2[1], rtol=2e-5, atol=2e-5)


def test_pissa_rejected():
    params = _params()
    a1 = _adapter(params, 1, 0.01)
    with pytest.raises(ValueError, match="PiSSA"):
        build_slot_lora(params, {"a1": a1}, LoraConfig(r=4, pissa=True))


def test_quantized_base_recurses():
    """SlotLoraLeaf over an int8 base: proj recursion dequantizes the
    base and adds the per-row delta — matches the dense merged path."""
    from rwkv_lm_ext_tpu.adapters.quant import dequantize_tree, quantize_tree

    params = _params()
    a1 = _adapter(params, 1, 0.01)
    qslot, _ = build_slot_lora(quantize_tree(params, "int8"), {"a1": a1}, LC)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 100)
    qslot = set_slot_idx(qslot, jnp.array([1], jnp.int32))
    l_q, _ = rwkv_forward(qslot, CFG, tokens)
    dense = merge_lora(
        dequantize_tree(quantize_tree(params, "int8")), a1, LC
    )
    l_d, _ = rwkv_forward(dense, CFG, tokens)
    np.testing.assert_allclose(l_q, l_d, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def slot_engine():
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine

    params = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(50 + i), b["att"]["output"].shape
        )
    a1 = _adapter(params, 11, 0.05)
    a2 = _adapter(params, 12, -0.05)
    slot, ids = build_slot_lora(params, {"chat": a1, "embed": a2}, LC)
    eng = GenerationEngine(
        slot, CFG, wkv_backend="reference", adapter_ids=ids
    )
    merged = {
        "base": params,
        "chat": merge_lora(params, a1, LC),
        "embed": merge_lora(params, a2, LC),
    }
    return eng, merged


def _greedy():
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    return SamplingParams(temperature=0.0, token_stop=())


def test_engine_generate_adapter(slot_engine):
    """generate(adapter=name) == generating on merge_lora'd params;
    no adapter == pristine base."""
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine

    eng, merged = slot_engine
    sp = _greedy()
    prompt = [5, 9, 23]
    for name in ("base", "chat", "embed"):
        ref_eng = GenerationEngine(
            merged[name], CFG, wkv_backend="reference"
        )
        want = ref_eng.generate(prompt, max_tokens=6, sampling=sp)
        got = eng.generate(
            prompt, max_tokens=6, sampling=sp,
            adapter=None if name == "base" else name,
        )
        assert got == want, (name, got, want)
    assert eng.generate(
        prompt, max_tokens=6, sampling=sp, adapter="chat"
    ) != eng.generate(prompt, max_tokens=6, sampling=sp)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.generate(prompt, max_tokens=2, sampling=sp, adapter="nope")


def test_batcher_mixed_adapter_pool(slot_engine):
    """A continuous-batching pool with different adapters per slot
    reproduces each request's standalone merged generation."""
    from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine

    eng, merged = slot_engine
    sp = _greedy()
    reqs = [
        ([5, 9, 23], "chat"), ([5, 9, 23], None), ([77, 3], "embed"),
        ([14, 60], "chat"), ([99], None),
    ]
    expected = []
    for prompt, name in reqs:
        ref = GenerationEngine(
            merged[name or "base"], CFG, wkv_backend="reference"
        )
        expected.append(ref.generate(prompt, max_tokens=5, sampling=sp))

    batcher = ContinuousBatcher(eng, n_slots=2, sampling=sp)
    rids = [
        batcher.submit(p, max_tokens=5, adapter=a) for p, a in reqs
    ]
    results = batcher.run()
    for rid, want, (p, a) in zip(rids, expected, reqs):
        assert results[rid] == want, (p, a, results[rid], want)
    with pytest.raises(ValueError, match="unknown adapter"):
        batcher.submit([1], max_tokens=1, adapter="nope")


def test_prefix_cache_salted_per_adapter():
    """With a prefix cache attached, states produced under one adapter
    must never resume another's prompt (salted keys)."""
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache

    params = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(50 + i), b["att"]["output"].shape
        )
    a1 = _adapter(params, 11, 0.05)
    slot, ids = build_slot_lora(params, {"chat": a1}, LC)
    cache = PrefixStateCache(capacity=8, min_prefix=2)
    eng = GenerationEngine(
        slot, CFG, wkv_backend="reference", adapter_ids=ids,
        state_cache=cache,
    )
    sp = _greedy()
    prompt = [5, 9, 23, 41]
    base_out = eng.generate(prompt, max_tokens=4, sampling=sp)
    chat_out = eng.generate(
        prompt, max_tokens=4, sampling=sp, adapter="chat"
    )
    assert base_out != chat_out
    # extended prompts resume from the cached states (strict-prefix
    # lookup); salting must keep the two adapters' states apart —
    # outputs must equal a cold engine's on the same extended prompt
    ext = prompt + [base_out[0]]
    hit_base = eng.generate(ext, max_tokens=4, sampling=sp)
    hit_chat = eng.generate(ext, max_tokens=4, sampling=sp, adapter="chat")
    assert cache.hits >= 2
    cold = GenerationEngine(
        slot, CFG, wkv_backend="reference", adapter_ids=ids
    )
    assert hit_base == cold.generate(ext, max_tokens=4, sampling=sp)
    assert hit_chat == cold.generate(
        ext, max_tokens=4, sampling=sp, adapter="chat"
    )
