"""GlmTokenizer (data/tokenizer_glm.py): the tiktoken-format path.

Round-2 review flagged this module as untested; tiktoken is importable in
this image, so the real Encoding path is exercised against a tiny
tiktoken-format `tokenizer.model` (base64 token + rank per line) — the
same wire format glm4 ships (reference tokenizer/tokenization_chatglm.py).
The byte-level table (all 256 single bytes) is a valid BPE base, so
encode/decode are real tiktoken round trips, not stubs.
"""
import base64
import os

import pytest

tiktoken = pytest.importorskip("tiktoken")

from rwkv_lm_ext_tpu.data.tokenizer_glm import (
    GLM_EMB_ID,
    GLM_MASK_ID,
    GLM_PAD_ID,
    GlmTokenizer,
    _SPECIALS,
)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("glm") / "tokenizer.model"
    lines = []
    for b in range(256):
        lines.append(
            base64.b64encode(bytes([b])).decode() + " " + str(b)
        )
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_constructs_from_tiktoken_model(model_path):
    tok = GlmTokenizer(model_path)
    assert tok._enc is not None and tok._hf is None
    # specials are appended after the mergeable ranks, in order
    assert tok._enc.encode_single_token("<|endoftext|>") == 256
    assert tok._enc.encode_single_token("[MASK]") == 257
    assert tok._enc.encode_single_token("<sop>") == 256 + _SPECIALS.index(
        "<sop>"
    )
    # the model-facing ids are the glm4 constants regardless of table size
    assert tok.emb_id == GLM_EMB_ID
    assert tok.mask_id == GLM_MASK_ID
    assert tok.pad_id == GLM_PAD_ID
    # vocab covers the special id range even for a tiny table
    assert tok.vocab_size >= GLM_PAD_ID + 1


def test_encode_decode_round_trip(model_path):
    tok = GlmTokenizer(model_path)
    for text in ("hello world", "Grüße, 世界!", "  spaces\n\nnewlines"):
        ids = tok.encode(text)
        assert ids and all(isinstance(i, int) for i in ids)
        assert tok.decode(ids) == text


def test_encode_special_text_as_plain(model_path):
    """disallowed_special=(): special strings in user text are encoded as
    plain bytes, never as control ids (the reference behavior for
    untrusted input)."""
    tok = GlmTokenizer(model_path)
    ids = tok.encode("x<|endoftext|>y")
    assert 256 not in ids
    assert tok.decode(ids) == "x<|endoftext|>y"


def test_decode_strips_model_special_ids(model_path):
    """Ids at/above GLM_EMB_ID (emb/mask/pad slots the models emit) are
    stripped before detokenization."""
    tok = GlmTokenizer(model_path)
    ids = tok.encode("ab")
    assert tok.decode(ids + [GLM_EMB_ID, GLM_PAD_ID]) == "ab"
