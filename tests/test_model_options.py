"""Legacy model options: head_qk, tiny attention, MishGLU, pre_ffn,
pos_emb, dropout (reference src/model.py Block/RWKV optional paths)."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward

BASE = dict(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


def _run(cfg, seed=0, **kw):
    params = init_rwkv_params(jax.random.PRNGKey(seed), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 100)
    logits, state = rwkv_forward(params, cfg, tokens, **kw)
    assert jnp.isfinite(logits).all()
    return params, tokens, logits


def test_head_qk_copy_mechanism():
    cfg = ModelConfig(**BASE, head_qk=32)
    params, tokens, logits = _run(cfg)
    # head_k nonzero + head_q zero at init -> identical to plain head;
    # perturbing head_q activates the copy path
    params["head_q"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(7), params["head_q"].shape
    )
    l2, _ = rwkv_forward(params, cfg, tokens)
    assert not np.allclose(logits, l2)
    # the copy term scatters into *input token* logits
    diff = np.abs(np.asarray(l2 - logits))
    tok_cols = np.unique(np.asarray(tokens))
    col_mass = diff.sum(axis=(0, 1))
    assert col_mass.sum() > 0
    np.testing.assert_allclose(
        col_mass[tok_cols].sum(), col_mass.sum(), rtol=1e-6
    )


def test_tiny_attention():
    cfg = ModelConfig(**BASE, tiny_att_dim=16, tiny_att_layer=1)
    params, tokens, logits = _run(cfg)
    params["blocks"][1]["tiny_q"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(8), params["blocks"][1]["tiny_q"].shape
    )
    l2, _ = rwkv_forward(params, cfg, tokens)
    assert not np.allclose(logits, l2)


def test_mishglu():
    cfg = ModelConfig(**BASE, ffn_type="mishglu")
    params, tokens, logits = _run(cfg)
    assert "aa" in params["blocks"][0]["ffn"]


def test_pre_ffn_and_pos_emb():
    cfg = ModelConfig(**BASE, pre_ffn=1, my_pos_emb=16)
    params, tokens, logits = _run(cfg)
    assert "ffn_pre" in params["blocks"][0]
    params["blocks"][0]["pos_emb_x"] = 0.5 * jnp.ones_like(
        params["blocks"][0]["pos_emb_x"]
    )
    l2, _ = rwkv_forward(params, cfg, tokens)
    assert not np.allclose(logits, l2)


def test_dropout_train_vs_eval():
    cfg = ModelConfig(**BASE, dropout=0.5)
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 100)
    l_eval, _ = rwkv_forward(params, cfg, tokens)  # no rng -> deterministic
    l_eval2, _ = rwkv_forward(params, cfg, tokens)
    np.testing.assert_allclose(l_eval, l_eval2)
    l_a, _ = rwkv_forward(params, cfg, tokens, dropout_rng=jax.random.PRNGKey(2))
    l_b, _ = rwkv_forward(params, cfg, tokens, dropout_rng=jax.random.PRNGKey(3))
    assert not np.allclose(l_a, l_b)
