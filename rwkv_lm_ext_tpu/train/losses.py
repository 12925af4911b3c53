"""Loss functions.

Ports the *semantics* of the reference's task losses to direct functional
form:
- causal LM CE with ignore_index=-100 + L2Wrap logit penalty
  (src/model.py:1244-1283, 936-974)
- in-batch-negative InfoNCE on cos_sim*20 with optional explicit-negative
  column (src/model_ext.py:1899-1911)
- CoSENT pairwise logsumexp (src/model_ext.py:1938-1959)
- symmetric InfoNCE with temperature (RwkvEncoderBiEncoder,
  src/model_ext.py:678-740)
- MLM CE (src/model_ext.py:644-650)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _ce_with_ignore(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross entropy over positions where labels != -100."""
    logits = logits.astype(jnp.float32)
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * valid
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def l2_wrap_penalty(logits: jax.Array) -> jax.Array:
    """Direct-loss form of the reference's L2Wrap gradient hook
    (src/model.py:936-974): pushes down the per-position max logit.
    grad matches factor * maxx at argmax with factor = 1e-4 / (B*T)."""
    mx = jnp.max(logits.astype(jnp.float32), axis=-1)
    return 1e-4 * 0.5 * jnp.mean(mx**2)


def causal_lm_loss(
    logits: jax.Array, labels: jax.Array, *, l2_wrap: bool = True
) -> jax.Array:
    """Next-token CE. `labels` already shifted/masked by the collator
    (-100 on prompt & padding, as the reference's SFT labels)."""
    loss = _ce_with_ignore(logits, labels)
    if l2_wrap:
        loss = loss + l2_wrap_penalty(logits)
    return loss


def mlm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return _ce_with_ignore(logits, labels)


def _cos_sim_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
    return a @ b.T


def _cos_sim_pairwise(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
    return jnp.sum(a * b, axis=-1)


def in_batch_infonce(
    query: jax.Array,
    positive: jax.Array,
    negative: Optional[jax.Array] = None,
    *,
    scale: float = 20.0,
) -> jax.Array:
    """CE over cos_sim(query, positives)*scale with diagonal targets;
    explicit negatives appended as one pairwise column
    (src/model_ext.py:1899-1911)."""
    scores = _cos_sim_matrix(query, positive) * scale  # (B,B)
    if negative is not None:
        neg_col = _cos_sim_pairwise(query, negative)[:, None] * scale
        scores = jnp.concatenate([scores, neg_col], axis=1)
    labels = jnp.arange(scores.shape[0])
    return _ce_with_ignore(scores, labels)


def cosent_loss(
    query: jax.Array,
    positive: jax.Array,
    negative: Optional[jax.Array] = None,
    *,
    scale: float = 20.0,
) -> jax.Array:
    """CoSENT: logsumexp over score differences of label-ordered pairs
    (src/model_ext.py:1938-1959, incl. its normalization by pair count)."""
    scores = _cos_sim_pairwise(query, positive)
    labels = jnp.ones(scores.shape[0])
    if negative is not None:
        scores = jnp.concatenate(
            [scores, _cos_sim_pairwise(query, negative)]
        )
        labels = jnp.concatenate([labels, -jnp.ones(negative.shape[0])])
    scores = scores * scale
    diff = scores[:, None] - scores[None, :]
    order = (labels[:, None] < labels[None, :]).astype(jnp.float32)
    diff = diff - (1.0 - order) * 1e12
    flat = jnp.concatenate([jnp.zeros((1,)), diff.reshape(-1)])
    return jax.nn.logsumexp(flat) / flat.shape[0]


def symmetric_infonce(
    query: jax.Array,
    positive: jax.Array,
    negative: Optional[jax.Array] = None,
    *,
    temperature: float = 0.05,
) -> jax.Array:
    """Bi-encoder symmetric InfoNCE (RwkvEncoderBiEncoder semantics,
    src/model_ext.py:678-740): query->candidates and positive->queries
    directions, averaged."""
    if negative is not None:
        cands = jnp.concatenate([positive, negative], axis=0)
    else:
        cands = positive
    s_qc = _cos_sim_matrix(query, cands) / temperature
    s_pq = _cos_sim_matrix(positive, query) / temperature
    labels = jnp.arange(query.shape[0])
    return 0.5 * (_ce_with_ignore(s_qc, labels) + _ce_with_ignore(s_pq, labels))


def group_softmax_loss(scores: jax.Array) -> jax.Array:
    """Group-softmax reranker training (RwkvEncoderForClassification,
    src/model_ext.py:652-675): scores (B, G) where column 0 is the positive
    candidate of each group; CE with target 0."""
    labels = jnp.zeros(scores.shape[0], jnp.int32)
    return _ce_with_ignore(scores.astype(jnp.float32), labels)


def simcse_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    *,
    temperature: float = 0.05,
) -> jax.Array:
    """SimCSE in-batch CE on cos_sim/temperature with diagonal targets —
    both the sentence-pair variant (train_askubuntu_simcse.py:357-373) and
    the dropout-noise variant (train_wiki1m_simcse.py, where emb_a/emb_b
    are two dropout-noised encodings of the same sentences)."""
    scores = _cos_sim_matrix(emb_a, emb_b) / temperature
    labels = jnp.arange(scores.shape[0])
    return _ce_with_ignore(scores, labels)


def classification_loss(
    scores: jax.Array, labels: jax.Array
) -> jax.Array:
    """MSE if scalar scores else CE (RwkvForClassification,
    src/model_ext.py:238-249)."""
    if scores.ndim == 1:
        return jnp.mean((scores - labels.astype(jnp.float32)) ** 2)
    return _ce_with_ignore(scores, labels)
