"""serve.cli: one command from checkpoints to endpoints (the runnable
equivalent of demo/states_runner.py + demo/fill_mask_api.py)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters import LoraConfig
from rwkv_lm_ext_tpu.adapters.lora import lora_tree_to_state_dict
from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth
from rwkv_lm_ext_tpu.models import init_rwkv_params

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

# world-vocab sized so the real WorldTokenizer's ids are in range
CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=65536, head_size=16,
    dtype="float32", param_dtype="float32",
)


def test_serve_cli_builds_and_serves(tmp_path):
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG, fast_init=True)
    model_pth = str(tmp_path / "base.pth")
    save_torch_pth(model_pth, params_to_state_dict(params, CFG))

    H, N = CFG.n_head, CFG.head_size
    states_pth = str(tmp_path / "states.pth")
    save_torch_pth(states_pth, {
        f"blocks.{i}.att.time_state":
            0.05 * np.random.RandomState(i).randn(H, N, N).astype(np.float32)
        for i in range(CFG.n_layer)
    })
    states_json = str(tmp_path / "states.json")
    with open(states_json, "w") as f:
        json.dump(
            {"echo": {"path": states_pth, "template": "do: {input}"}}, f
        )

    lc = LoraConfig(r=4, alpha=8)
    rng = np.random.RandomState(7)
    tree = {
        "blocks.0.att.receptance": {
            "A": jnp.asarray(rng.randn(64, 4), jnp.float32) * 0.05,
            "B": jnp.asarray(rng.randn(4, 64), jnp.float32) * 0.05,
        }
    }
    bi_pth = str(tmp_path / "bi.pth")
    save_torch_pth(bi_pth, lora_tree_to_state_dict(tree, lc))
    cross_sd = lora_tree_to_state_dict(tree, lc)
    cross_sd["score.weight"] = rng.randn(1, 64).astype(np.float32)
    cross_pth = str(tmp_path / "cross.pth")
    save_torch_pth(cross_pth, cross_sd)

    from rwkv_lm_ext_tpu.serve.cli import _parse, build_service

    args = _parse([
        "--model", model_pth, "--dtype", "float32",
        "--lora-r", "4", "--lora-alpha", "8",
        "--states-config", states_json,
        "--bi-adapter", bi_pth,
        "--cross-adapter", cross_pth,
    ])
    svc = build_service(args)

    out = svc.handle("/generate", {"prompt": "hi", "max_tokens": 3,
                                   "temperature": 0.0, "token_stop": []})
    assert isinstance(out["output"], str)
    out = svc.handle("/process_text", {"text": "abc", "action": "echo"})
    assert isinstance(out["output"], str)
    out = svc.handle(
        "/similarity", {"texts_a": ["hello"], "texts_b": ["hello", "zzz"]}
    )
    sims = np.asarray(out["similarity"])
    assert sims.shape == (1, 2)
    np.testing.assert_allclose(sims[0, 0], 1.0, atol=1e-4)
    out = svc.handle("/rerank", {"query": "q", "documents": ["a", "b"]})
    assert len(out["scores"]) == 2

    with pytest.raises(SystemExit):
        from rwkv_lm_ext_tpu.serve.cli import main

        main([])  # neither --model nor --encoder


def test_serve_cli_tp_mesh(tmp_path):
    """--tp shards the serving stack across the (virtual) mesh; outputs
    match the single-device service."""
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG, fast_init=True)
    model_pth = str(tmp_path / "base.pth")
    save_torch_pth(model_pth, params_to_state_dict(params, CFG))

    from rwkv_lm_ext_tpu.serve.cli import _parse, build_service

    # same prefill numerics on both paths for an exact match
    base_args = ["--model", model_pth, "--dtype", "float32",
                 "--wkv-backend", "chunked"]
    svc1 = build_service(_parse(base_args))
    svc2 = build_service(_parse(base_args + ["--tp", "2"]))
    assert svc2.engine.mesh is not None
    req = {"prompt": "hi", "max_tokens": 3,
           "temperature": 0.0, "token_stop": [],
           "alpha_presence": 0.0, "alpha_frequency": 0.0}
    out1 = svc1.handle("/generate", dict(req))
    out2 = svc2.handle("/generate", dict(req))
    assert out1["output"] == out2["output"]


def test_serve_cli_speculative_backend(tmp_path):
    """--draft-layers routes penalty-free /generate through speculative
    decoding (response says so); penalized requests fall back to the
    plain engine. Greedy outputs match across backends."""
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG, fast_init=True)
    model_pth = str(tmp_path / "base.pth")
    save_torch_pth(model_pth, params_to_state_dict(params, CFG))

    from rwkv_lm_ext_tpu.serve.cli import _parse, build_service

    svc = build_service(_parse([
        "--model", model_pth, "--dtype", "float32",
        "--draft-layers", "1", "--gamma", "3",
    ]))
    req = {"prompt": "hi", "max_tokens": 4, "temperature": 0.0,
           "token_stop": [], "alpha_presence": 0.0, "alpha_frequency": 0.0}
    out_spec = svc.handle("/generate", dict(req))
    assert out_spec["backend"] == "speculative"
    # penalized request -> plain engine
    out_pen = svc.handle("/generate", dict(req, alpha_presence=0.25))
    assert out_pen["backend"] == "engine"
    # greedy parity across backends (fp32, penalty-free)
    svc_plain = build_service(_parse(["--model", model_pth,
                                      "--dtype", "float32"]))
    out_eng = svc_plain.handle("/generate", dict(req))
    assert out_spec["output"] == out_eng["output"]
    # /stats reflects the routed backends and acceptance aggregates
    st = svc.handle("/stats", {})
    assert st["requests"]["/generate"] == 2
    assert st["speculative"]["rounds"] >= 1
    assert 0.0 <= st["speculative"]["acceptance"] <= 1.0


def test_serve_cli_v4_checkpoint_with_json_tokenizer(tmp_path):
    """A v4 Pile-style deployment end to end: v4 .pth (sniffed as 4.0)
    + HF tokenizer.json, served through the same CLI."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tk = Tokenizer(models.BPE())
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    tk.train_from_iterator(
        ["hello world"] * 4,
        trainers.BpeTrainer(
            vocab_size=300,
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        ),
    )
    tok_path = str(tmp_path / "tokenizer.json")
    tk.save(tok_path)

    from tests.test_rwkv4 import CFG as V4CFG, _v4_params

    v4cfg = V4CFG.__class__(**{
        **{f.name: getattr(V4CFG, f.name)
           for f in __import__("dataclasses").fields(V4CFG)
           if f.name in ("n_layer", "n_embd", "head_size", "dim_ffn",
                         "dtype", "param_dtype", "version")},
        "vocab_size": tk.get_vocab_size() + 8,
    })
    params = _v4_params(jax.random.PRNGKey(1), v4cfg)
    model_pth = str(tmp_path / "v4.pth")
    save_torch_pth(model_pth, params_to_state_dict(params, v4cfg))

    from rwkv_lm_ext_tpu.serve.cli import _parse, build_service

    svc = build_service(_parse([
        "--model", model_pth, "--dtype", "float32",
        "--tokenizer-json", tok_path,
    ]))
    assert svc.engine.cfg.version == 4.0
    out = svc.handle("/generate", {"prompt": "hello", "max_tokens": 3,
                                   "temperature": 0.0, "token_stop": []})
    assert isinstance(out["output"], str)


def test_serve_cli_cross_needs_head(tmp_path):
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG, fast_init=True)
    model_pth = str(tmp_path / "base.pth")
    save_torch_pth(model_pth, params_to_state_dict(params, CFG))
    lc = LoraConfig(r=4, alpha=8)
    tree = {
        "blocks.0.att.receptance": {
            "A": jnp.zeros((64, 4), jnp.float32),
            "B": jnp.zeros((4, 64), jnp.float32),
        }
    }
    cross_pth = str(tmp_path / "cross.pth")
    save_torch_pth(cross_pth, lora_tree_to_state_dict(tree, lc))

    from rwkv_lm_ext_tpu.serve.cli import _parse, build_service

    args = _parse(["--model", model_pth, "--dtype", "float32",
                   "--cross-adapter", cross_pth])
    with pytest.raises(SystemExit, match="score.weight"):
        build_service(args)
