"""Scan-over-layers forward == python-loop forward."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models import init_model_state, init_rwkv_params, rwkv_forward
from rwkv_lm_ext_tpu.models.stacked import (

    rwkv_forward_stacked,
    stack_params,
    unstack_params,
)

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=3, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


def _params():
    p = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(p["blocks"]):
        b["att"]["output"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(40 + i), b["att"]["output"].shape
        )
    return p


def test_stacked_matches_loop():
    params = _params()
    sp = stack_params(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 100)
    l_ref, s_ref = rwkv_forward(params, CFG, tokens, wkv_backend="chunked")
    l_st, s_st = rwkv_forward_stacked(sp, CFG, tokens, wkv_backend="chunked")
    np.testing.assert_allclose(l_st, l_ref, rtol=2e-4, atol=2e-4)
    for k in s_ref:
        np.testing.assert_allclose(s_st[k], s_ref[k], rtol=2e-4, atol=2e-4)


def test_stacked_state_threading_and_remat():
    params = _params()
    sp = stack_params(params)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, 100)
    full, _ = rwkv_forward_stacked(sp, CFG, tokens, remat=True)
    st = init_model_state(CFG, 1)
    l1, st = rwkv_forward_stacked(sp, CFG, tokens[:, :5], st)
    l2, st = rwkv_forward_stacked(sp, CFG, tokens[:, 5:], st)
    np.testing.assert_allclose(
        jnp.concatenate([l1, l2], 1), full, rtol=2e-4, atol=2e-4
    )


def test_roundtrip_unstack():
    params = _params()
    back = unstack_params(stack_params(params))
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, b)


def test_stacked_grads():
    params = _params()
    sp = stack_params(params)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 100)

    def loss(p):
        lg, _ = rwkv_forward_stacked(p, CFG, tokens, remat=True)
        return jnp.mean(lg**2)

    g = jax.grad(loss)(sp)
    gn = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g)))
    assert jnp.isfinite(gn) and gn > 0


def test_engine_and_heads_accept_stacked():
    """rwkv_forward transparently dispatches stacked trees — the engine and
    embedding heads work without changes."""
    from rwkv_lm_ext_tpu.infer import GenerationEngine, SamplingParams
    from rwkv_lm_ext_tpu.models.heads import embed_sequences

    params = _params()
    sp = stack_params(params)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 10), 4, 100)
    e_list = embed_sequences(params, CFG, tokens)
    e_stack = embed_sequences(sp, CFG, tokens)
    np.testing.assert_allclose(e_stack, e_list, rtol=2e-4, atol=2e-4)

    class Tok:
        def encode(self, s):
            return [ord(c) % 90 + 5 for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

        def streaming_decoder(self):
            class _D:
                def push(self, t): return ""
                def flush(self): return ""
            return _D()

    spp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    g_list = GenerationEngine(params, CFG, Tok(), chunk_len=8).generate(
        [5, 6, 7], max_tokens=5, sampling=spp
    )
    g_stack = GenerationEngine(sp, CFG, Tok(), chunk_len=8).generate(
        [5, 6, 7], max_tokens=5, sampling=spp
    )
    assert g_list == g_stack


def test_stacked_lora_merge_matches_unstacked():
    """merge_lora_stacked(stack(params), stack(adapter)) == stack(merge_lora)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rwkv_lm_ext_tpu.adapters.lora import (
        LoraConfig, init_lora_params, merge_lora, merge_lora_stacked,
        stack_adapter, unstack_adapter,
    )
    from rwkv_lm_ext_tpu.models.stacked import stack_params

    params = _params()
    lc = LoraConfig(r=4, alpha=16, parts=("att", "ffn", "emb"))
    adapter = init_lora_params(jax.random.PRNGKey(3), params, lc)
    # B=0 at init makes the merge a no-op; randomize to make the test real
    adapter = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.cos(jnp.arange(x.size, dtype=jnp.float32)
                                     ).reshape(x.shape), adapter)

    ref = stack_params(merge_lora(params, adapter, lc))
    got = merge_lora_stacked(stack_params(params), stack_adapter(adapter), lc)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=str(ka))

    # round-trip
    rt = unstack_adapter(stack_adapter(adapter))
    assert set(rt) == set(adapter)
    for k in adapter:
        np.testing.assert_array_equal(rt[k]["A"], adapter[k]["A"])


def test_uniform_stack_round_trip():
    """stack_params_uniform lifts ln0 out of block 0, stacks ALL layers
    leaf-for-leaf, and unstack_params_uniform restores the exact tree
    (the pipeline-parallel form: n_layer % pp instead of
    (n_layer-1) % pp)."""
    import jax
    import numpy as np
    from rwkv_lm_ext_tpu.models.stacked import (
        stack_params_uniform,
        unstack_any,
        unstack_params_uniform,
    )

    params = _params()
    sp = stack_params_uniform(params)
    assert "block0" not in sp and "ln0" in sp
    n = jax.tree_util.tree_leaves(sp["blocks_stacked"])[0].shape[0]
    assert n == len(params["blocks"])

    for rt in (unstack_params_uniform(sp), unstack_any(sp)):
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(rt),
        ):
            assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
