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


def test_remat_policies_match_gradients():
    """Selective remat policies (utils.remat) are numerically identical to
    full remat and no remat — loss and grads agree across all modes."""
    from rwkv_lm_ext_tpu.train.loop import sft_loss_fn
    from rwkv_lm_ext_tpu.utils.remat import normalize_remat

    cfg = ModelConfig(**BASE)
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 4, 100)
    batch = {"input_ids": tokens, "labels": tokens}

    def loss(p, mode):
        out = sft_loss_fn(p, cfg, batch, remat=mode)
        return out[0] if isinstance(out, tuple) else out

    ref_l = ref_g = None
    for mode in (False, True, "dots", "dots_nobatch"):
        l, g = jax.value_and_grad(lambda p: loss(p, mode))(params)
        if ref_l is None:
            ref_l, ref_g = l, g
        else:
            np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
            for a, b in zip(
                jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(ref_g)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
                )

    assert normalize_remat("on") is True
    assert normalize_remat("off") is False
    assert normalize_remat("dots") == "dots"
    assert normalize_remat(True) is True
    try:
        normalize_remat("bogus")
    except ValueError:
        pass
    else:
        raise AssertionError("bogus remat spec must raise")
