"""Serving encoders: bi-encoder, cross-encoder, multi-adapter fusion.

Functional equivalents of the reference's serving wrappers
(src/model_run.py:900-1033 BiEncoder/CrossEncoder, :1102-1224 and
infer/encoders.py:27-201 BiCrossFusionEncoder): one base model, named
LoRA adapters hot-swapped per task. Where the reference flips module
state (set_adapter, "not thread-safe"), here each task resolves its own
merged weights from the AdapterRegistry, and text batches are bucketed to
fixed lengths so every XLA program compiles once.
"""
from __future__ import annotations

import bisect
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.adapters import AdapterRegistry, LoraConfig
from rwkv_lm_ext_tpu.config import CLS_ID, EMB_ID, PAD_ID, SEP_ID
from rwkv_lm_ext_tpu.models.heads import classify_sequences, embed_sequences

_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def _bucketize(ids: List[List[int]], buckets=_BUCKETS) -> int:
    longest = max(len(x) for x in ids)
    i = bisect.bisect_left(buckets, longest)
    return buckets[min(i, len(buckets) - 1)]


def _pad_batch(ids: List[List[int]], length: int, pad: int) -> np.ndarray:
    out = np.full((len(ids), length), pad, np.int32)
    for i, row in enumerate(ids):
        row = row[:length]
        out[i, : len(row)] = row
    return out


class BiEncoder:
    """Text -> embedding (RwkvForSequenceEmbedding serving,
    src/model_run.py:900-968): append emb_id, pooled hidden state."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        *,
        head_params: Optional[Dict] = None,
        pooling_type: str = "weightedmean",
        wkv_backend: str = "auto",
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.head_params = head_params
        self.pooling_type = pooling_type
        self._jit = {}
        self.wkv_backend = wkv_backend

    def _embed_fn(self, length: int):
        if length not in self._jit:
            cfg, pt, hp, be = (
                self.cfg, self.pooling_type, self.head_params, self.wkv_backend
            )

            @jax.jit
            def fn(params, tokens):
                return embed_sequences(
                    params, cfg, tokens,
                    head_params=hp, pooling_type=pt, wkv_backend=be,
                    normalize=True,
                )

            self._jit[length] = fn
        return self._jit[length]

    def encode_texts(
        self, texts: Sequence[str], *, batch_size: int = 32
    ) -> np.ndarray:
        ids = [
            self.tokenizer.encode(t)[:2047] + [EMB_ID] for t in texts
        ]
        out = np.zeros((len(texts), 0), np.float32)
        chunks = []
        for s in range(0, len(ids), batch_size):
            batch = ids[s : s + batch_size]
            L = _bucketize(batch)
            arr = _pad_batch(batch, L, PAD_ID)
            emb = self._embed_fn(L)(self.params, jnp.asarray(arr))
            chunks.append(np.asarray(emb, np.float32))
        return np.concatenate(chunks, axis=0)


class CrossEncoder:
    """(query, document) -> relevance score (src/model_run.py:971-1033):
    `q [sep] d [cls]`, score head at the cls position."""

    def __init__(
        self, params, cfg, tokenizer, score_params, *, wkv_backend="auto"
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.score_params = score_params
        self.wkv_backend = wkv_backend
        self._jit = {}

    def _score_fn(self, length: int):
        if length not in self._jit:
            cfg, sp, be = self.cfg, self.score_params, self.wkv_backend

            @jax.jit
            def fn(params, tokens):
                return classify_sequences(
                    params, cfg, tokens, sp, wkv_backend=be
                )

            self._jit[length] = fn
        return self._jit[length]

    def score_pairs(
        self, pairs: Sequence[Tuple[str, str]], *, batch_size: int = 32
    ) -> np.ndarray:
        rows = []
        for q, d in pairs:
            qi = self.tokenizer.encode(q)
            di = self.tokenizer.encode(d)
            budget = 2046
            if len(qi) + len(di) > budget:
                di = di[: max(budget - len(qi), 0)]
                qi = qi[: budget - len(di)]
            rows.append(qi + [SEP_ID] + di + [CLS_ID])
        outs = []
        for s in range(0, len(rows), batch_size):
            batch = rows[s : s + batch_size]
            L = _bucketize(batch)
            arr = _pad_batch(batch, L, PAD_ID)
            sc = self._score_fn(L)(self.params, jnp.asarray(arr))
            outs.append(np.asarray(sc, np.float32))
        return np.concatenate(outs, axis=0)


class BiCrossFusionEncoder:
    """One base model + named adapters for embedding / reranking / chat
    (infer/encoders.py BiCrossFusionEncoder, 3 adapters on one base).

    Adapter switches are pure lookups into the registry's merged-weight
    cache, so embed / rerank / generate can interleave freely."""

    def __init__(
        self,
        base_params,
        cfg,
        tokenizer,
        *,
        bi_adapter=None,
        bi_lora_cfg: Optional[LoraConfig] = None,
        bi_head_params: Optional[Dict] = None,
        cross_adapter=None,
        cross_lora_cfg: Optional[LoraConfig] = None,
        score_params: Optional[Dict] = None,
        chat_adapter=None,
        chat_lora_cfg: Optional[LoraConfig] = None,
        pooling_type: str = "weightedmean",
        wkv_backend: str = "auto",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.registry = AdapterRegistry(base_params)
        if bi_adapter is not None:
            self.registry.register(
                "bi_embedding_lora", bi_adapter, bi_lora_cfg or LoraConfig()
            )
        if cross_adapter is not None:
            self.registry.register(
                "cross_encoder_lora", cross_adapter,
                cross_lora_cfg or LoraConfig(),
            )
        if chat_adapter is not None:
            self.registry.register(
                "chat_lora", chat_adapter, chat_lora_cfg or LoraConfig()
            )
        bi_name = "bi_embedding_lora" if bi_adapter is not None else "default"
        cross_name = (
            "cross_encoder_lora" if cross_adapter is not None else "default"
        )
        self._bi = BiEncoder(
            self.registry.materialize(bi_name), cfg, tokenizer,
            head_params=bi_head_params, pooling_type=pooling_type,
            wkv_backend=wkv_backend,
        )
        self._cross = (
            CrossEncoder(
                self.registry.materialize(cross_name), cfg, tokenizer,
                score_params, wkv_backend=wkv_backend,
            )
            if score_params is not None
            else None
        )
        self._chat_params = self.registry.materialize(
            "chat_lora" if chat_adapter is not None else "default"
        )
        self._engine = None
        self.wkv_backend = wkv_backend

    def encode_texts(self, texts, **kw) -> np.ndarray:
        return self._bi.encode_texts(texts, **kw)

    def cross_encode_texts(self, pairs, **kw) -> np.ndarray:
        assert self._cross is not None, "no cross-encoder score head loaded"
        return self._cross.score_pairs(pairs, **kw)

    def _chat_engine(self):
        if self._engine is None:
            from rwkv_lm_ext_tpu.infer.engine import GenerationEngine

            self._engine = GenerationEngine(
                self._chat_params, self.cfg, self.tokenizer,
                wkv_backend=self.wkv_backend,
            )
        return self._engine

    def sampling_generate(self, prompt: str, **kw) -> str:
        return self._chat_engine().generate(prompt, **kw)

    def beam_generate(self, prompt: str, **kw):
        from rwkv_lm_ext_tpu.infer.beam import BeamParams, generate_beamsearch

        bp = kw.pop("beam_params", BeamParams())
        out = generate_beamsearch(self._chat_engine(), prompt, bp, **kw)
        return [
            (score, self.tokenizer.decode(ids)) for score, ids in out
        ]
