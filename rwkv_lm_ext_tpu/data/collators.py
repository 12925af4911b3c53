"""Batch collators (host-side numpy -> fixed-shape arrays).

Numpy re-implementations of the reference's collators:
- SFT pad         (data/custom_datasets.py pad_only_according_data)
- triplet         (pad_and_truncated_according_data + the simple
                   peft_train/data_collators.py:3-30 variant)
- cross-encoder   (cross_encoder_pad_and_truncated_according_data:
                   `q [sep] d [eos/cls]`, labels 1/0)
- MLM             (data/mae_dataset.py mlm_collator)
- MAE / DupMAE    (mae_collator / dup_mae_collator: encoder ids+labels,
                   decoder ids+labels, optional bag-of-words weights)
- whole-word masking over segment ids (mae_dataset.py:5-22)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from rwkv_lm_ext_tpu.config import EOS_ID, MASK_ID, PAD_ID, SEP_ID

IGNORE = -100


def _pad_to(ids: Sequence[int], length: int, pad: int) -> np.ndarray:
    out = np.full(length, pad, np.int32)
    n = min(len(ids), length)
    out[:n] = np.asarray(ids[:n], np.int32)
    return out


def sft_collate(
    examples: List[Dict], fixed_len: int, *, pad_id: int = PAD_ID
) -> Dict[str, np.ndarray]:
    """examples: {"input_ids": [...], "labels": [...]} (labels already
    -100-masked over the prompt). Shifts internally: model predicts t+1."""
    B = len(examples)
    input_ids = np.stack(
        [_pad_to(e["input_ids"], fixed_len, pad_id) for e in examples]
    )
    labels_raw = np.stack(
        [_pad_to(e["labels"], fixed_len, IGNORE) for e in examples]
    )
    # next-token alignment: labels[t] is the target for logits[t]
    labels = np.full_like(labels_raw, IGNORE)
    labels[:, :-1] = labels_raw[:, 1:]
    out = {"input_ids": input_ids, "labels": labels}
    if "adapter_id" in examples[0]:
        # multi-task SFT (adapters.slot_lora): per-example adapter routing
        out["adapter_ids"] = np.asarray(
            [e["adapter_id"] for e in examples], np.int32
        )
    return out


def triplet_collate(
    examples: List[Dict],
    fixed_len: int,
    *,
    emb_id: int = EOS_ID,
    pad_id: int = PAD_ID,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Contrastive triplets {"query","positive","negative"} -> three
    (B, fixed_len) arrays, each emb_id-terminated then padded. When a field
    holds multiple candidates, one is chosen (random, as
    peft_train/data_collators.py:14-18)."""
    rng = rng or np.random.default_rng(0)

    def pick(v):
        if v and isinstance(v[0], (list, tuple, np.ndarray)):
            return list(v[int(rng.integers(len(v)))])
        return list(v)

    out = {}
    for key in ("query", "positive", "negative"):
        if key not in examples[0]:
            continue
        rows = []
        for e in examples:
            ids = pick(e[key])[: fixed_len - 1] + [emb_id]
            rows.append(_pad_to(ids, fixed_len, pad_id))
        out[key] = np.stack(rows)
    return out


def cross_encoder_collate(
    examples: List[Dict],
    fixed_len: int,
    *,
    sep_id: int = SEP_ID,
    cls_id: int = EOS_ID,
    pad_id: int = PAD_ID,
) -> Dict[str, np.ndarray]:
    """Pairs {"query","document","label"} -> `q [sep] d [cls]` + labels
    (cross_encoder_pad_and_truncated_according_data,
    data/custom_datasets.py:118-148)."""
    rows, labels = [], []
    for e in examples:
        q = list(e["query"])
        d = list(e["document"])
        budget = fixed_len - 2
        if len(q) + len(d) > budget:
            d = d[: max(budget - len(q), 0)]
            q = q[: budget - len(d)]
        ids = q + [sep_id] + d + [cls_id]
        rows.append(_pad_to(ids, fixed_len, pad_id))
        labels.append(int(e.get("label", 1)))
    return {
        "input_ids": np.stack(rows),
        "labels": np.asarray(labels, np.int32),
    }


def whole_word_mask(
    lengths_ok: int,
    segment_ids: Sequence[int],
    mask_prob: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Mask whole words: segment_ids give word membership per token
    (mae_dataset.py:5-22). Returns a bool mask over the sequence."""
    seg = np.asarray(segment_ids)
    words = np.unique(seg[seg >= 0])
    n_mask = max(1, int(round(len(words) * mask_prob)))
    chosen = rng.choice(words, size=min(n_mask, len(words)), replace=False)
    return np.isin(seg, chosen)


def mlm_collate(
    examples: List[Dict],
    fixed_len: int,
    *,
    mask_prob: float = 0.15,
    mask_id: int = MASK_ID,
    pad_id: int = PAD_ID,
    emb_id: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """{"input_ids", optional "segment_ids"} -> masked ids + labels
    (-100 on unmasked), whole-word when segments given."""
    rng = np.random.default_rng(seed)
    ids_rows, label_rows = [], []
    for e in examples:
        ids = list(e["input_ids"])[:fixed_len]
        if emb_id is not None and (not ids or ids[-1] != emb_id):
            ids = ids[: fixed_len - 1] + [emb_id]
        ids_arr = _pad_to(ids, fixed_len, pad_id)
        n = len(ids)
        if "segment_ids" in e:
            seg = list(e["segment_ids"])[:n]
            mask = np.zeros(fixed_len, bool)
            mask[:n] = whole_word_mask(n, seg, mask_prob, rng)
        else:
            mask = np.zeros(fixed_len, bool)
            mask[:n] = rng.random(n) < mask_prob
            if not mask[:n].any():
                mask[int(rng.integers(n))] = True
        if emb_id is not None:
            mask &= ids_arr != emb_id
        labels = np.where(mask, ids_arr, IGNORE).astype(np.int32)
        masked = np.where(mask, mask_id, ids_arr).astype(np.int32)
        ids_rows.append(masked)
        label_rows.append(labels)
    return {
        "input_ids": np.stack(ids_rows),
        "labels": np.stack(label_rows),
    }


def mae_collate(
    examples: List[Dict],
    fixed_len: int,
    *,
    encoder_mask_prob: float = 0.3,
    decoder_mask_prob: float = 0.5,
    mask_id: int = MASK_ID,
    pad_id: int = PAD_ID,
    emb_id: int = EOS_ID,
    bag_of_words: bool = False,
    vocab_size: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """RetroMAE-style dual views (mae_collator, data/mae_dataset.py:24-120):
    an aggressively-masked encoder view (labels on masked positions) and a
    decoder view masked at a higher rate (labels on every real token).
    bag_of_words adds the DupMAE vocab-distribution target
    (dup_mae_collator)."""
    rng = np.random.default_rng(seed)
    enc = mlm_collate(
        examples, fixed_len,
        mask_prob=encoder_mask_prob, mask_id=mask_id, pad_id=pad_id,
        emb_id=emb_id, seed=seed,
    )
    dec_rows, dec_labels = [], []
    bow = []
    for e in examples:
        ids = list(e["input_ids"])[: fixed_len - 1] + [emb_id]
        arr = _pad_to(ids, fixed_len, pad_id)
        n = len(ids)
        mask = np.zeros(fixed_len, bool)
        mask[:n] = rng.random(n) < decoder_mask_prob
        mask &= arr != emb_id
        dec_rows.append(np.where(mask, mask_id, arr).astype(np.int32))
        lb = np.where(arr != pad_id, arr, IGNORE).astype(np.int32)
        dec_labels.append(lb)
        if bag_of_words:
            assert vocab_size is not None
            w = np.zeros(vocab_size, np.float32)
            uniq, cnt = np.unique(
                [t for t in ids if t not in (pad_id, emb_id)],
                return_counts=True,
            )
            if cnt.sum() > 0:
                w[uniq.astype(np.int64)] = cnt / cnt.sum()
            bow.append(w)
    out = {
        "encoder_input_ids": enc["input_ids"],
        "encoder_labels": enc["labels"],
        "decoder_input_ids": np.stack(dec_rows),
        "decoder_labels": np.stack(dec_labels),
    }
    if bag_of_words:
        out["bag_word_weight"] = np.stack(bow)
    return out
