import pytest
"""LoRA / PiSSA adapter-tree transforms."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters import (
    AdapterRegistry,
    LoraConfig,
    init_lora_params,
    lora_state_dict_to_tree,
    lora_tree_to_state_dict,
    merge_lora,
    pissa_init,
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


def test_fresh_lora_is_identity():
    """B=0 at init -> merged model == base model (rwkvLinear.py:56)."""
    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    merged = merge_lora(params, adapter, LC)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 100)
    l0, _ = rwkv_forward(params, CFG, tokens)
    l1, _ = rwkv_forward(merged, CFG, tokens)
    np.testing.assert_allclose(l0, l1, atol=1e-6)
    assert len(adapter) == 2 * (5 + 3)  # 2 blocks x (5 att + 3 ffn)


def test_nonzero_lora_changes_logits():
    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    merged = merge_lora(params, adapter, LC)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 100)
    l0, _ = rwkv_forward(params, CFG, tokens)
    l1, _ = rwkv_forward(merged, CFG, tokens)
    assert not np.allclose(l0, l1)


def test_pissa_preserves_function():
    """residual + A@B == original weight -> same logits after re-merge."""
    params = _params()
    new_params, adapter = pissa_init(params, LoraConfig(r=4, pissa=True))
    # adapted weights differ from base
    assert not np.allclose(
        new_params["blocks"][0]["att"]["receptance"],
        params["blocks"][0]["att"]["receptance"],
    )
    merged = merge_lora(new_params, adapter, LoraConfig(r=4, pissa=True))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 100)
    l0, _ = rwkv_forward(params, CFG, tokens)
    l1, _ = rwkv_forward(merged, CFG, tokens)
    np.testing.assert_allclose(l0, l1, rtol=2e-4, atol=2e-4)


def test_pissa_svd_is_top_r():
    """PiSSA residual must have smaller norm than any random-r deflation."""
    params = _params()
    W = np.asarray(params["blocks"][0]["att"]["receptance"], np.float64)
    new_params, adapter = pissa_init(params, LoraConfig(r=8, pissa=True))
    res = np.asarray(new_params["blocks"][0]["att"]["receptance"], np.float64)
    s = np.linalg.svd(W, compute_uv=False)
    optimal = np.sqrt((s[8:] ** 2).sum())
    assert np.linalg.norm(res) <= optimal * 1.05


def test_lora_checkpoint_roundtrip():
    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.1 * jnp.ones_like(ab["B"])
    sd = lora_tree_to_state_dict(adapter, LC)
    back = lora_state_dict_to_tree(sd)
    assert set(back) == set(adapter)
    for k in adapter:
        np.testing.assert_allclose(adapter[k]["A"], back[k]["A"], atol=1e-6)
        np.testing.assert_allclose(adapter[k]["B"], back[k]["B"], atol=1e-6)


def test_hf_peft_key_format():
    sd = {
        "base_model.model.blocks.0.att.key.lora_A.embedding_lora.weight":
            np.ones((4, 64), np.float32),
        "base_model.model.blocks.0.att.key.lora_B.embedding_lora.weight":
            np.ones((64, 4), np.float32),
        "base_model.model.blocks.0.att.value.lora_A.other.weight":
            np.ones((4, 64), np.float32),
    }
    tree = lora_state_dict_to_tree(sd, adapter_name="embedding_lora")
    assert list(tree) == ["blocks.0.att.key"]
    assert tree["blocks.0.att.key"]["A"].shape == (64, 4)


def test_adapter_registry_hot_swap():
    params = _params()
    reg = AdapterRegistry(params)
    a1 = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in a1.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    a2 = init_lora_params(jax.random.PRNGKey(2), params, LC)
    reg.register("embedding", a1, LC)
    reg.register("rerank", a2, LC)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 100)
    l_def, _ = rwkv_forward(reg.materialize("default"), CFG, tokens)
    l_emb, _ = rwkv_forward(reg.materialize("embedding"), CFG, tokens)
    l_rr, _ = rwkv_forward(reg.materialize("rerank"), CFG, tokens)
    assert not np.allclose(l_def, l_emb)
    np.testing.assert_allclose(l_def, l_rr, atol=1e-6)  # fresh B=0 adapter
    # swap back and forth: cached, deterministic
    l_emb2, _ = rwkv_forward(reg.materialize("embedding"), CFG, tokens)
    np.testing.assert_allclose(l_emb, l_emb2, atol=0)


def test_merge_pissa_against_original_base():
    """Serving a trained PiSSA adapter on the ORIGINAL base must equal
    merging it onto the deflated base (src/layers.py:125-169 residual
    merge: W + A@B - A_init@B_init)."""
    from rwkv_lm_ext_tpu.adapters.lora import merge_pissa
    from rwkv_lm_ext_tpu.adapters.registry import AdapterRegistry

    params = _params()
    lc = LoraConfig(r=4, pissa=True)
    deflated, adapter0 = pissa_init(params, lc)
    # simulate training: perturb the adapter
    trained = {
        k: {"A": ab["A"] + 0.01, "B": ab["B"] - 0.02}
        for k, ab in adapter0.items()
    }
    want = merge_lora(deflated, trained, lc)
    got = merge_pissa(params, trained, adapter0, lc)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (1, 8), 0, 100)
    lw, _ = rwkv_forward(want, CFG, tokens)
    lg, _ = rwkv_forward(got, CFG, tokens)
    np.testing.assert_allclose(lw, lg, rtol=2e-4, atol=2e-4)

    reg = AdapterRegistry(params)
    reg.register("chat", trained, lc, pissa_init=adapter0)
    lr, _ = rwkv_forward(reg.materialize("chat"), CFG, tokens)
    np.testing.assert_allclose(lw, lr, rtol=2e-4, atol=2e-4)


def test_qlora_quantized_base_delta_leaf():
    """QLoRA: merge_lora over an int8-quantized frozen base keeps the
    base quantized (LoraDeltaLeaf), matches the dense merge numerically,
    and gradients flow to A/B through as_weight's materialization."""
    from rwkv_lm_ext_tpu.adapters.lora import LoraDeltaLeaf
    from rwkv_lm_ext_tpu.adapters.quant import quantize_tree

    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    qparams = quantize_tree(params, "int8")
    qmerged = merge_lora(qparams, adapter, LC)
    leaf = qmerged["blocks"][0]["att"]["receptance"]
    assert isinstance(leaf, LoraDeltaLeaf)

    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 100)
    # dense path on the dequantized base == lazy QLoRA path
    from rwkv_lm_ext_tpu.adapters.quant import dequantize_tree

    dense = merge_lora(dequantize_tree(qparams), adapter, LC)
    l_dense, _ = rwkv_forward(dense, CFG, tokens)
    l_q, _ = rwkv_forward(qmerged, CFG, tokens)
    np.testing.assert_allclose(l_q, l_dense, rtol=1e-4, atol=1e-4)

    def loss(ad):
        merged = merge_lora(qparams, ad, LC)
        lg, _ = rwkv_forward(merged, CFG, tokens)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(adapter)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_qlora_stacked_matches_flat(mode):
    """QLoRA on scan-over-layers trees: merge_lora_stacked with a
    quantized (int8 or nf4) base == the flat QLoRA merge."""
    from rwkv_lm_ext_tpu.adapters.lora import (
        merge_lora_stacked, stack_adapter,
    )
    from rwkv_lm_ext_tpu.adapters.quant import quantize_tree
    from rwkv_lm_ext_tpu.models.stacked import stack_params

    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 100)

    l_flat, _ = rwkv_forward(
        merge_lora(quantize_tree(params, mode), adapter, LC), CFG, tokens
    )
    sq = quantize_tree(stack_params(params), mode)
    l_stacked, _ = rwkv_forward(
        merge_lora_stacked(sq, stack_adapter(adapter), LC), CFG, tokens
    )
    np.testing.assert_allclose(l_stacked, l_flat, rtol=2e-4, atol=2e-4)


def test_unfused_lora_matches_merge_forward_and_grads():
    """apply_lora_unfused (LoraUnfusedLeaf through proj) must be
    numerically the merge path: same logits, same dLoss/dA, dLoss/dB —
    only the backward's cost differs (no weight-shaped cotangents)."""
    from rwkv_lm_ext_tpu.adapters import apply_lora_unfused
    from rwkv_lm_ext_tpu.adapters.lora import LoraUnfusedLeaf

    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 100)

    unfused = apply_lora_unfused(params, adapter, LC)
    assert isinstance(unfused["blocks"][0]["att"]["receptance"], LoraUnfusedLeaf)
    l_m, _ = rwkv_forward(merge_lora(params, adapter, LC), CFG, tokens)
    l_u, _ = rwkv_forward(unfused, CFG, tokens)
    np.testing.assert_allclose(l_u, l_m, rtol=1e-4, atol=1e-4)

    def loss(apply):
        def f(ad):
            lg, _ = rwkv_forward(apply(params, ad, LC), CFG, tokens)
            return jnp.mean(lg.astype(jnp.float32) ** 2)
        return f

    g_m = jax.grad(loss(merge_lora))(adapter)
    g_u = jax.grad(loss(apply_lora_unfused))(adapter)
    for k in adapter:
        np.testing.assert_allclose(
            g_u[k]["A"], g_m[k]["A"], rtol=1e-3, atol=1e-5, err_msg=k
        )
        np.testing.assert_allclose(
            g_u[k]["B"], g_m[k]["B"], rtol=1e-3, atol=1e-5, err_msg=k
        )


def test_unfused_lora_stacked_and_quant_base():
    """Stacked trees slice LoraUnfusedLeaf per layer inside the scan;
    a quantized base stays quantized under the unfused apply."""
    from rwkv_lm_ext_tpu.adapters import (
        apply_lora_unfused, apply_lora_unfused_stacked,
    )
    from rwkv_lm_ext_tpu.adapters.lora import stack_adapter
    from rwkv_lm_ext_tpu.adapters.quant import is_quantized, quantize_tree
    from rwkv_lm_ext_tpu.models.stacked import stack_params

    params = _params()
    adapter = init_lora_params(jax.random.PRNGKey(1), params, LC)
    for ab in adapter.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 100)

    l_flat, _ = rwkv_forward(apply_lora_unfused(params, adapter, LC), CFG, tokens)
    l_stk, _ = rwkv_forward(
        apply_lora_unfused_stacked(
            stack_params(params), stack_adapter(adapter), LC
        ), CFG, tokens,
    )
    np.testing.assert_allclose(l_stk, l_flat, rtol=2e-4, atol=2e-4)

    qp = quantize_tree(params, "int8")
    qu = apply_lora_unfused(qp, adapter, LC)
    assert is_quantized(qu["blocks"][0]["att"]["receptance"].base)
    l_q, _ = rwkv_forward(qu, CFG, tokens)
    l_dq, _ = rwkv_forward(merge_lora(qp, adapter, LC), CFG, tokens)
    np.testing.assert_allclose(l_q, l_dq, rtol=1e-3, atol=1e-3)


def test_transposed_base_backward_matches():
    """TransposedPair (stored W^T for the frozen base): forward and
    LoRA grads are identical to the plain unfused path — only the
    backward's dx contraction reads the stored transpose."""
    import jax
    import jax.numpy as jnp

    from rwkv_lm_ext_tpu.adapters import (
        LoraConfig,
        apply_lora_unfused,
        init_lora_params,
    )
    from rwkv_lm_ext_tpu.adapters.lora import add_transposed_bases
    from rwkv_lm_ext_tpu.config import ModelConfig
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=128, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    lc = LoraConfig(r=4, alpha=8.0)
    adapter = init_lora_params(jax.random.PRNGKey(1), params, lc)
    # non-zero B so adapter grads flow through both factors
    adapter = jax.tree_util.tree_map(
        lambda x: x + 0.01, adapter
    )
    paired = add_transposed_bases(params, adapter)
    tok = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 127)

    def loss(ad, frozen):
        merged = apply_lora_unfused(frozen, ad, lc)
        logits, _ = rwkv_forward(merged, cfg, tok)
        return jnp.mean(jnp.square(logits.astype(jnp.float32)))

    l0, g0 = jax.value_and_grad(loss)(adapter, params)
    l1, g1 = jax.value_and_grad(loss)(adapter, paired)
    assert jnp.allclose(l0, l1, rtol=1e-6), (l0, l1)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        assert jnp.allclose(a, b, rtol=1e-5, atol=1e-7)
