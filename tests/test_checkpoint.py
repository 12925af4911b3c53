"""Checkpoint round-trip: param tree -> torch .pth wire format -> param tree,
plus cross-validation against real torch.load/torch.save (torch is present
in the test image; the framework itself never imports it)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.checkpoint import (
    load_rwkv_checkpoint,
    params_to_state_dict,
    state_dict_to_params,
)
from rwkv_lm_ext_tpu.checkpoint.pth import (
    load_torch_pth,
    save_torch_pth,
    sniff_model_config,
)
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_roundtrip_via_pth(tmp_path):
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    sd = params_to_state_dict(params, CFG)
    path = str(tmp_path / "model.pth")
    save_torch_pth(path, sd)
    params2, cfg2 = load_rwkv_checkpoint(path, dtype="float32", param_dtype="float32")
    assert cfg2.n_layer == CFG.n_layer
    assert cfg2.n_embd == CFG.n_embd
    assert cfg2.vocab_size == CFG.vocab_size
    assert cfg2.version == 6.0
    assert cfg2.head_size == CFG.head_size
    _tree_allclose(params, params2)
    # identical logits through the loaded tree
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 100)
    l1, _ = rwkv_forward(params, CFG, tokens)
    l2, _ = rwkv_forward(params2, cfg2, tokens)
    np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_torch_reads_our_pth(tmp_path):
    torch = pytest.importorskip("torch")
    params = init_rwkv_params(jax.random.PRNGKey(2), CFG)
    sd = params_to_state_dict(params, CFG)
    path = str(tmp_path / "model.pth")
    save_torch_pth(path, sd)
    tsd = torch.load(path, map_location="cpu", weights_only=False)
    assert set(tsd.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(tsd[k].float().numpy(), sd[k], atol=1e-6)


def test_we_read_torch_pth(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "emb.weight": torch.randn(100, 64),
        "blocks.0.att.key.weight": torch.randn(64, 64, dtype=torch.bfloat16),
        "flag": torch.randn(3, 5, 7)[:, 1:4, ::2],  # non-contiguous view
    }
    path = str(tmp_path / "t.pth")
    torch.save(sd, path)
    ours = load_torch_pth(path)
    for k in sd:
        np.testing.assert_allclose(
            np.asarray(ours[k], np.float32),
            sd[k].contiguous().float().numpy(),
            atol=1e-6,
        )
    assert ours["blocks.0.att.key.weight"].dtype.name == "bfloat16"


def test_sniff_v6(tmp_path):
    params = init_rwkv_params(jax.random.PRNGKey(3), CFG)
    sd = params_to_state_dict(params, CFG)
    cfg = sniff_model_config(sd)
    assert (cfg.version, cfg.n_head, cfg.dim_ffn) == (6.0, 4, CFG.dim_ffn)


def test_sniff_and_roundtrip_v5(tmp_path):
    cfg5 = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=100, head_size=16, version=5.2,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(4), cfg5)
    sd = params_to_state_dict(params, cfg5)
    cfg_s = sniff_model_config(sd)
    assert cfg_s.version == 5.2
    params2 = state_dict_to_params(sd, cfg_s)
    _tree_allclose(params, params2)


def test_rwkv_model_prefix_stripped(tmp_path):
    params = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    sd = params_to_state_dict(params, CFG)
    sd = {f"rwkvModel.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "wrapped.pth")
    save_torch_pth(path, sd)
    params2, cfg2 = load_rwkv_checkpoint(path)
    _tree_allclose(params, params2)
