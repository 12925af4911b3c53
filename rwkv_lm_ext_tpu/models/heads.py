"""Task heads: sequence embedding, classification/reranking, MLM.

Functional equivalents of the reference's task models:
- RwkvForSequenceEmbedding (src/model_ext.py:1690-1790): pooling at the
  first embedding_id (=1) token, weightedmean/lasttoken/avg, optional
  dense+tanh MLP.
- RwkvForClassification (src/model_ext.py:172-302): score head over the
  hidden state at the first class_id (=1) position; cross-encoder scoring.
- MLM tied/untied head (src/model_ext.py:633-638 share_emb).

All heads consume the base model's hidden states from
`rwkv_forward(..., return_hidden=True, return_logits=False)`, so one base
forward serves every head (and adapters swap under them).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.config import CLS_ID, EMB_ID
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward


def first_token_position(tokens: jax.Array, token_id: int) -> jax.Array:
    """Index of the first occurrence of token_id per row (0 if absent) —
    the reference's `eq(idx, id).int().argmax(-1)` (model_ext.py:1765)."""
    return jnp.argmax((tokens == token_id).astype(jnp.int32), axis=-1)


def pool_hidden(
    x: jax.Array, actual_len: jax.Array, pooling_type: str = "weightedmean"
) -> jax.Array:
    """Pool (B,T,C) hidden states to (B,C).

    `actual_len` is the first-emb_id position. "weightedmean" uses the
    reference's TRAINING-side semantics (model_ext.py:1708-1738) — the
    default everywhere. "weightedmean_runtime" replicates the streaming
    runtime's off-by-one variant (model_run.py:779-791, actual_len+1 in
    the mask, the weight denominator AND the final divisor) for
    checkpoint compatibility with models tuned or served under the
    reference's serving stack; the two pools differ measurably (see
    tests/test_model.py::test_runtime_weightedmean_parity), so pick the
    one the checkpoint was trained against.
    """
    B, T, C = x.shape
    xf = x.astype(jnp.float32)
    pos = jnp.arange(T)[None, :]
    L = actual_len[:, None].astype(jnp.float32)
    if pooling_type == "weightedmean":
        mask = (pos <= actual_len[:, None]).astype(jnp.float32)
        weights = (jnp.arange(1, T + 1)[None, :].astype(jnp.float32) / L) * mask
        pooled = jnp.sum(xf * weights[..., None], axis=1) / L
    elif pooling_type == "weightedmean_runtime":
        L1 = L + 1.0
        mask = (pos <= (actual_len[:, None] + 1)).astype(jnp.float32)
        weights = (jnp.arange(1, T + 1)[None, :].astype(jnp.float32) / L1) * mask
        pooled = jnp.sum(xf * weights[..., None], axis=1) / L1
    elif pooling_type == "lasttoken":
        pooled = jnp.take_along_axis(
            xf, actual_len[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    elif pooling_type == "avg":
        mask = (pos < actual_len[:, None]).astype(jnp.float32)
        pooled = jnp.sum(xf * mask[..., None], axis=1) / L
    else:
        raise ValueError(f"unknown pooling_type {pooling_type!r}")
    return pooled


def embed_sequences(
    params: Dict,
    cfg,
    tokens: jax.Array,
    *,
    head_params: Optional[Dict] = None,
    pooling_type: str = "weightedmean",
    embedding_id: int = EMB_ID,
    wkv_backend: str = "auto",
    remat: bool = False,
    normalize: bool = False,
) -> jax.Array:
    """(B,T) token ids (emb_id-terminated, pad-padded) -> (B,C or D) embeds.

    head_params: {"dense": {"kernel","bias"}} enables the MLP+Tanh head
    (the reference's add_mlp, model_ext.py:1700-1704)."""
    hidden, _ = rwkv_forward(
        params, cfg, tokens,
        wkv_backend=wkv_backend, remat=remat,
        return_hidden=True, return_logits=False,
    )
    actual_len = first_token_position(tokens, embedding_id)
    emb = pool_hidden(hidden, actual_len, pooling_type)
    if head_params is not None and "dense" in head_params:
        d = head_params["dense"]
        emb = jnp.tanh(
            emb @ d["kernel"].astype(emb.dtype) + d["bias"].astype(emb.dtype)
        )
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-12)
    return emb


def classify_sequences(
    params: Dict,
    cfg,
    tokens: jax.Array,
    score_params: Dict,
    *,
    class_id: int = CLS_ID,
    wkv_backend: str = "auto",
    remat: bool = False,
) -> jax.Array:
    """Cross-encoder / classification scores at the first class_id position
    (RwkvForClassification, model_ext.py:172-302). score_params:
    {"kernel": (C, num_labels)} (no bias, matching the reference).
    Returns (B, num_labels), squeezed to (B,) when num_labels == 1."""
    hidden, _ = rwkv_forward(
        params, cfg, tokens,
        wkv_backend=wkv_backend, remat=remat,
        return_hidden=True, return_logits=False,
    )
    pos = first_token_position(tokens, class_id)
    pooled = jnp.take_along_axis(
        hidden, pos[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    scores = pooled.astype(jnp.float32) @ score_params["kernel"].astype(jnp.float32)
    if scores.shape[-1] == 1:
        scores = scores[..., 0]
    return scores


def mlm_logits(
    params: Dict,
    cfg,
    hidden: jax.Array,
    *,
    share_emb: bool = True,
    lm_head: Optional[jax.Array] = None,
) -> jax.Array:
    """MLM prediction head: tied to the embedding matrix (x @ emb.T,
    model_ext.py:633-638) or a separate projection."""
    if share_emb:
        return hidden.astype(jnp.float32) @ params["emb"].astype(jnp.float32).T
    assert lm_head is not None
    return hidden.astype(jnp.float32) @ lm_head.astype(jnp.float32)


def instructor_embed(
    params: Dict,
    cfg,
    tokens: jax.Array,
    inst_head: Dict,
    *,
    pooling_type: str = "weightedmean",
    embedding_id: int = EMB_ID,
    wkv_backend: str = "auto",
) -> jax.Array:
    """Instructor-style embedder (RwkvInstructorForSequenceEmbedding,
    src/model_ext.py:1042-1364): instruction-prefixed text -> pooled hidden
    -> dense(output_dim) -> LayerNorm. inst_head:
    {"dense": {"kernel","bias"}, "ln": {"scale","bias"}}."""
    from rwkv_lm_ext_tpu.models.rwkv import layer_norm

    hidden, _ = rwkv_forward(
        params, cfg, tokens, wkv_backend=wkv_backend,
        return_hidden=True, return_logits=False,
    )
    actual_len = first_token_position(tokens, embedding_id)
    emb = pool_hidden(hidden, actual_len, pooling_type)
    d = inst_head["dense"]
    emb = emb @ d["kernel"].astype(emb.dtype) + d["bias"].astype(emb.dtype)
    return layer_norm(emb, inst_head["ln"])


def embed_sequences_chunked(
    params: Dict,
    cfg,
    tokens: jax.Array,
    *,
    chunk_ctx: int,
    head_params: Optional[Dict] = None,
    pooling_type: str = "weightedmean",
    embedding_id: int = EMB_ID,
    wkv_backend: str = "auto",
) -> jax.Array:
    """Infinite-context embedder (RwkvStatesForSequenceEmbedding,
    src/model_ext.py:1366-1688): run the sequence in chunk_ctx pieces
    carrying recurrent state, reassemble the full hidden sequence, pool.
    O(chunk) activation memory for arbitrarily long inputs."""
    B, T = tokens.shape
    pad = (-T) % chunk_ctx
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad)))
    state = None
    pieces = []
    for s in range(0, T + pad, chunk_ctx):
        h, state = rwkv_forward(
            params, cfg, tokens[:, s : s + chunk_ctx], state,
            wkv_backend=wkv_backend,
            return_hidden=True, return_logits=False,
        )
        pieces.append(h)
    hidden = jnp.concatenate(pieces, axis=1)[:, :T]
    actual_len = first_token_position(tokens[:, :T], embedding_id)
    emb = pool_hidden(hidden, actual_len, pooling_type)
    if head_params is not None and "dense" in head_params:
        d = head_params["dense"]
        emb = jnp.tanh(
            emb @ d["kernel"].astype(emb.dtype) + d["bias"].astype(emb.dtype)
        )
    return emb


def init_embedding_head(key, cfg, output_dim: int = 0) -> Dict:
    """Parameters for the add_mlp dense+tanh head."""
    out = output_dim or cfg.n_embd
    k1, k2 = jax.random.split(key)
    lim = 1.0 / jnp.sqrt(cfg.n_embd)
    return {
        "dense": {
            "kernel": jax.random.uniform(
                k1, (cfg.n_embd, out), jnp.float32, -lim, lim
            ),
            "bias": jnp.zeros((out,), jnp.float32),
        }
    }


def init_classification_head(key, cfg, num_labels: int = 1) -> Dict:
    lim = 1.0 / jnp.sqrt(cfg.n_embd)
    return {
        "kernel": jax.random.uniform(
            key, (cfg.n_embd, num_labels), jnp.float32, -lim, lim
        )
    }
