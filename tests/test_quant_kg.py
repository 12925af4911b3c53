import pytest
"""Weight-only quantization codecs + KG extraction pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters.quant import (
    dequantize_tree,
    quantize_int8,
    dequantize_int8,
    quantize_nf4,
    dequantize_nf4,
    quantize_tree,
)
from rwkv_lm_ext_tpu.apps.kg import (
    _extract_json,
    build_graph,
    cluster_graph,
    normalize_units,
)
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


def test_int8_roundtrip_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
    d = quantize_int8(w)
    back = dequantize_int8(d)
    err = jnp.abs(back - w).max() / jnp.abs(w).max()
    assert err < 0.01
    assert d.q.dtype == jnp.int8


def test_nf4_roundtrip_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96))
    d = quantize_nf4(w)
    back = dequantize_nf4(d)
    assert back.shape == w.shape
    err = float(jnp.abs(back - w).mean() / jnp.abs(w).mean())
    assert err < 0.12  # 4-bit: ~8% mean relative error expected
    assert d.q.dtype == jnp.uint8
    assert d.q.size == w.size // 2  # packed nibbles


def test_quantized_model_forward_close():
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(5 + i), b["att"]["output"].shape
        )
        b["ffn"]["value"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(15 + i), b["ffn"]["value"].shape
        )
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, 100)
    l_full, _ = rwkv_forward(params, CFG, tokens)
    qp = quantize_tree(params, "int8")
    l_q, _ = rwkv_forward(qp, CFG, tokens)  # dequant-on-use path
    # int8 quantization error stays small relative to logit scale
    denom = float(jnp.abs(l_full).max())
    assert float(jnp.abs(l_q - l_full).max()) / max(denom, 1e-6) < 0.15
    # explicit dequantize_tree round-trips the same forward
    l_dq, _ = rwkv_forward(dequantize_tree(qp), CFG, tokens)
    np.testing.assert_allclose(l_q, l_dq, atol=1e-5)


def _randomized_params(key=0):
    """Init params with the zero-init leaves (att.output, ffn.value)
    perturbed so block outputs are non-trivial — otherwise quantization
    error inside a block cannot reach the hidden states at all."""
    params = init_rwkv_params(jax.random.PRNGKey(key), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(5 + i), b["att"]["output"].shape
        )
        b["ffn"]["value"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(15 + i), b["ffn"]["value"].shape
        )
    return params


def test_int8c_native_compute_forward_and_embed_drift():
    """int8c: same codec as int8, but projections run natively on the
    int8 MXU path (models.rwkv.proj -> adapters.quant.int8_matmul) with
    dynamic per-token activation quantization. Logits must stay close to
    the full forward, and the BASELINE embedding-drift acceptance
    (cosine vs full <= 1e-3) must hold (VERDICT r1 #3)."""
    from rwkv_lm_ext_tpu.models.heads import EMB_ID, embed_sequences

    cfg = CFG
    params = _randomized_params()
    tokens = np.random.RandomState(1).randint(2, 100, (3, 24))
    for i, ln in enumerate([23, 16, 10]):
        tokens[i, ln] = EMB_ID
        tokens[i, ln + 1 :] = 0
    tokens = jnp.asarray(tokens)

    l_full, _ = rwkv_forward(params, cfg, tokens)
    qp = quantize_tree(params, "int8c", include_head=True)
    assert qp["blocks"][0]["att"]["key"].qformat == "int8c"
    l_q, _ = rwkv_forward(qp, cfg, tokens)
    denom = float(jnp.abs(l_full).max())
    assert float(jnp.abs(l_q - l_full).max()) / max(denom, 1e-6) < 0.15

    e_f = np.asarray(embed_sequences(params, cfg, tokens), np.float64)
    e_q = np.asarray(embed_sequences(qp, cfg, tokens), np.float64)
    cos = (e_f * e_q).sum(-1) / (
        np.linalg.norm(e_f, axis=-1) * np.linalg.norm(e_q, axis=-1)
    )
    assert float(1.0 - cos.min()) <= 1e-3, cos


@pytest.mark.parametrize("mode", ["int8", "int8c", "nf4"])
def test_quantize_tree_on_stacked_params(mode):
    """int8/nf4 quantization works on scan-over-
    layers (stacked) trees; both codecs quantize each layer independently
    (int8 per (layer, channel) scales; nf4 per-layer blocks) so the
    quantized stacked forward matches the quantized flat one."""
    from rwkv_lm_ext_tpu.models.stacked import stack_params

    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, 100)
    sp = stack_params(params)
    l_flat, _ = rwkv_forward(
        quantize_tree(params, mode, include_head=True), CFG, tokens
    )
    qsp = quantize_tree(sp, mode, include_head=True)
    l_stacked, _ = rwkv_forward(qsp, CFG, tokens)
    # all codecs quantize each layer independently, so stacked == flat
    # up to float associativity
    np.testing.assert_allclose(l_stacked, l_flat, rtol=1e-4, atol=1e-4)
    if mode != "int8c":
        # dequantize-on-use codecs round-trip exactly through an explicit
        # dequantize (int8c computes natively in int8, so it only agrees
        # with the dequantized bf16 matmul to quantization error)
        l_dq, _ = rwkv_forward(dequantize_tree(qsp), CFG, tokens)
        np.testing.assert_allclose(l_stacked, l_dq, atol=1e-5)


def test_nf4_stacked_roundtrip_matches_per_layer():
    """Stacked nf4 == per-layer nf4, layer by layer (the codec must keep
    the leading layer axis intact for lax.scan — ADVICE r1 medium)."""
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 24, 40))
    d = quantize_nf4(w, stacked=True)
    assert d.q.shape[0] == 3 and d.scale.shape[0] == 3
    back = dequantize_nf4(d)
    assert back.shape == w.shape
    for l in range(3):
        per_layer = dequantize_nf4(quantize_nf4(w[l]))
        np.testing.assert_allclose(back[l], per_layer, atol=1e-6)
        # a scan-style slice of the stacked leaf dequantizes standalone
        from rwkv_lm_ext_tpu.adapters.quant import QuantizedTensor

        sliced = QuantizedTensor("nf4", d.q[l], d.scale[l], d.shape, d.block, d.pad)
        np.testing.assert_allclose(dequantize_nf4(sliced), per_layer, atol=1e-6)


def test_json_recovery():
    assert _extract_json('noise {"entities": []} more')["entities"] == []
    assert _extract_json("no json here") is None
    nested = _extract_json('x {"a": {"b": 1}} y')
    assert nested == {"a": {"b": 1}}


def test_unit_normalization():
    assert normalize_units("3 km") == "3000 m"
    assert normalize_units("2.5kg") == "2.5kg"  # unknown unit passes through
    assert normalize_units("500 g") == "0.5 kg"
    assert normalize_units("plain text") == "plain text"


def test_graph_build_and_cluster():
    records = [
        {
            "entities": [
                {"name": "ACME", "type": "organization"},
                {"name": "Alice", "type": "person"},
            ],
            "relations": [{"head": "Alice", "type": "works_for", "tail": "ACME"}],
        },
        {
            "entities": [{"name": "3 km", "type": "quantity"}],
            "relations": [{"head": "road", "type": "measures", "tail": "3 km"}],
        },
        {
            "entities": [],
            "relations": [{"head": "Alice", "type": "works_for", "tail": "ACME"}],
        },
    ]
    g = build_graph(records)
    assert g["Alice"]["ACME"]["count"] == 2
    assert "3000 m" in g.nodes  # unit-normalized merge key
    comps = cluster_graph(g)
    assert len(comps) == 2
    assert {"ACME", "Alice"} <= set(comps[0]) or {"ACME", "Alice"} <= set(comps[1])


def test_fp4_roundtrip_and_tree():
    """bnb FP4 (e2m1) codebook variant (reference src/rwkvLinear.py:8-29
    supports 4bit/nf4/fp4/int8): roundtrip accuracy within the codebook's
    resolution and full-tree quantization through the forward."""
    import jax

    from rwkv_lm_ext_tpu import ModelConfig
    from rwkv_lm_ext_tpu.adapters.quant import (
        dequantize_nf4,
        quantize_nf4,
        quantize_tree,
    )
    from rwkv_lm_ext_tpu.models import init_rwkv_params
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.3
    d = quantize_nf4(w, fmt="fp4")
    assert d.qformat == "fp4"
    back = dequantize_nf4(d)
    # fp4's e2m1 grid is coarser than nf4 near the center; block-absmax
    # keeps the error within ~12% of each block's scale
    err = float(jnp.max(jnp.abs(back - w)))
    scale = float(jnp.max(jnp.abs(w)))
    assert err < 0.2 * scale

    cfg = ModelConfig(n_layer=2, n_embd=64, vocab_size=100, head_size=16,
                      dtype="float32", param_dtype="float32")
    params = init_rwkv_params(jax.random.PRNGKey(1), cfg)
    qp = quantize_tree(params, "fp4", include_head=True)
    assert qp["blocks"][0]["att"]["key"].qformat == "fp4"
    tokens = jnp.array([[5, 9, 23, 1]], jnp.int32)
    logits_q, _ = rwkv_forward(qp, cfg, tokens, wkv_backend="reference")
    logits_f, _ = rwkv_forward(params, cfg, tokens, wkv_backend="reference")
    # 4-bit weights: logits agree loosely, and are finite
    assert bool(jnp.all(jnp.isfinite(logits_q)))
    cos = jnp.sum(logits_q[0, -1] * logits_f[0, -1]) / (
        jnp.linalg.norm(logits_q[0, -1]) * jnp.linalg.norm(logits_f[0, -1])
    )
    assert float(cos) > 0.98


def test_quantize_rows_pallas_matches_xla_composition():
    """ops.quant_pallas: the fused one-pass activation quant must be
    element-exact vs the XLA composition it replaces (same fp32 absmax /
    round math), across tileable and fallback shapes."""
    from rwkv_lm_ext_tpu.ops.quant_pallas import (
        can_quantize_rows,
        quantize_rows,
        quantize_rows_xla,
    )

    shapes = [
        (64, 128),          # tileable, one block
        (4, 96, 256),       # tileable, >2D lead
        (8, 7, 128),        # M=56: _pick_rows=8 divides, Pallas path
        (12, 128),          # M=12: 12 % 8 != 0, M-indivisible fallback
        (16, 100),          # C not lane-aligned: falls back
    ]
    for i, shape in enumerate(shapes):
        x = jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
        q_ref, s_ref = quantize_rows_xla(x)
        q, s = quantize_rows(x, interpret=can_quantize_rows(x))
        assert q.dtype == jnp.int8 and s.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=0)
    # huge-C shapes whose minimum (8, C) fp32 block exceeds the VMEM
    # budget must be rejected, not tiled
    assert not can_quantize_rows(jnp.zeros((8, 128 * 1024), jnp.bfloat16))


def test_int8_matmul_grad_matches_xla_composition():
    """int8_matmul's custom_vjp replays the original XLA composition's
    gradient (training through an int8c base — QLoRA --quant int8c —
    must be unchanged by the fused forward)."""
    from rwkv_lm_ext_tpu.adapters.quant import int8_matmul
    from rwkv_lm_ext_tpu.ops.quant_pallas import quantize_rows_xla

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48))
    d = quantize_int8(w, compute=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 64))

    def loss_new(x):
        return jnp.sum(int8_matmul(x, d) ** 2)

    def loss_old(x):
        xq, sx = quantize_rows_xla(x)
        y = jax.lax.dot_general(
            xq, d.q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (y.astype(jnp.float32) * sx * d.scale).astype(jnp.float32)
        return jnp.sum(out ** 2)

    v_new, g_new = jax.value_and_grad(loss_new)(x0)
    v_old, g_old = jax.value_and_grad(loss_old)(x0)
    np.testing.assert_allclose(float(v_new), float(v_old), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old), rtol=1e-6)
