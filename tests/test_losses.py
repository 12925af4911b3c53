"""Loss semantics: CE+ignore, L2Wrap, InfoNCE/CoSENT/SimCSE, pooling."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.models.heads import first_token_position, pool_hidden
from rwkv_lm_ext_tpu.train.losses import (
    causal_lm_loss,
    cosent_loss,
    in_batch_infonce,
    l2_wrap_penalty,
    simcse_loss,
    symmetric_infonce,
)


def test_ce_ignore_index():
    logits = jnp.zeros((1, 4, 10)).at[0, :, 3].set(5.0)
    labels = jnp.array([[3, 3, -100, 7]])
    loss = causal_lm_loss(logits, labels, l2_wrap=False)
    # positions 0,1 near-zero loss; position 3 is wrong (label 7, logit 0)
    per_tok_right = -jax.nn.log_softmax(logits[0, 0])[3]
    per_tok_wrong = -jax.nn.log_softmax(logits[0, 3])[7]
    expect = (2 * per_tok_right + per_tok_wrong) / 3
    np.testing.assert_allclose(loss, expect, rtol=1e-6)


def test_l2_wrap_gradient_form():
    """grad of the penalty == factor * max at argmax (the reference's
    L2Wrap backward, src/model.py:936-974)."""
    logits = jnp.array([[[1.0, 3.0, 2.0], [0.5, 0.1, 4.0]]])  # B=1,T=2,V=3
    g = jax.grad(l2_wrap_penalty)(logits)
    B, T = 1, 2
    factor = 1e-4 / (B * T)
    expect = np.zeros((1, 2, 3), np.float32)
    expect[0, 0, 1] = factor * 3.0
    expect[0, 1, 2] = factor * 4.0
    np.testing.assert_allclose(g, expect, rtol=1e-5)


def test_in_batch_infonce_prefers_diagonal():
    q = jnp.eye(4, 8)
    pos_good = jnp.eye(4, 8)
    pos_bad = jnp.roll(jnp.eye(4, 8), 1, axis=0)
    assert float(in_batch_infonce(q, pos_good)) < float(
        in_batch_infonce(q, pos_bad)
    )
    # explicit negative raises the loss when it resembles the query
    neg = q
    assert float(in_batch_infonce(q, pos_good, neg)) > float(
        in_batch_infonce(q, pos_good)
    )


def test_cosent_orders_pairs():
    q = jnp.eye(4, 8)
    pos = jnp.eye(4, 8)                 # cos=1 pairs (label +1)
    neg = -jnp.eye(4, 8)                # cos=-1 (label -1)
    good = float(cosent_loss(q, pos, neg))
    # swap: negatives more similar than positives -> much larger loss
    bad = float(cosent_loss(q, -pos, -neg))
    assert good < bad


def test_symmetric_and_simcse():
    q = jnp.eye(3, 6)
    p = jnp.eye(3, 6)
    assert float(symmetric_infonce(q, p)) < float(
        symmetric_infonce(q, jnp.roll(p, 1, axis=0))
    )
    assert float(simcse_loss(q, p)) < float(simcse_loss(q, jnp.roll(p, 1, 0)))


def test_pooling_variants():
    B, T, C = 2, 5, 4
    x = jnp.arange(B * T * C, dtype=jnp.float32).reshape(B, T, C)
    alen = jnp.array([3, 4])
    last = pool_hidden(x, alen, "lasttoken")
    np.testing.assert_allclose(last[0], x[0, 3])
    np.testing.assert_allclose(last[1], x[1, 4])
    avg = pool_hidden(x, alen, "avg")
    np.testing.assert_allclose(avg[0], x[0, :3].mean(0), rtol=1e-6)
    wm = pool_hidden(x, alen, "weightedmean")
    # weightedmean: weights (i+1)/L over positions 0..L inclusive, / L
    L = 3.0
    weights = np.array([1, 2, 3, 4, 0]) / L
    expect = (np.asarray(x[0]) * weights[:, None]).sum(0) / L
    np.testing.assert_allclose(wm[0], expect, rtol=1e-6)


def test_first_token_position():
    t = jnp.array([[5, 1, 7], [9, 9, 9]])
    pos = first_token_position(t, 1)
    assert list(np.asarray(pos)) == [1, 0]  # absent -> argmax of zeros = 0


def test_kv_match_metrics():
    from rwkv_lm_ext_tpu.train.callbacks import kv_match_metrics

    class Tok:
        def encode(self, s):
            return [ord(c) for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

    gold = '{"a": ["x"], "b": ["y"]}'
    gold_ids = [ord(c) for c in gold] + [1]
    targets = np.full((1, 40), -100, np.int64)
    targets[0, 2 : 2 + len(gold_ids)] = gold_ids
    # perfect prediction -> zero "loss"
    pred = np.zeros((1, 40), np.int64)
    pred[0, 2 : 2 + len(gold_ids)] = gold_ids
    m = kv_match_metrics(Tok(), targets, pred)
    assert m == {"key_match_loss": 0.0, "value_match_loss": 0.0}
    # prediction missing value "y" -> value loss 5 * 1/2
    bad = pred.copy()
    bad[0, 2 + gold.index('"y"') + 1] = ord("z")
    m = kv_match_metrics(Tok(), targets, bad)
    assert m["key_match_loss"] == 0.0
    assert abs(m["value_match_loss"] - 2.5) < 1e-9
