"""World tokenizer: round trips, greedy-longest-match, streaming decode."""
import pytest

from rwkv_lm_ext_tpu.data import WorldTokenizer


@pytest.fixture(scope="module")
def tok():
    return WorldTokenizer()


def test_vocab_size(tok):
    assert tok.vocab_size == 65530  # ids 1..65529 + reserved 0


@pytest.mark.parametrize(
    "text",
    [
        "Hello, world!",
        "The quick brown fox jumps over the lazy dog.",
        "你好，世界！这是一个测试。",
        "日本語のテキストもあります",
        "emoji: 🐱🤖 mixed with ASCII",
        "  leading/trailing spaces  ",
        "newlines\nand\ttabs",
    ],
)
def test_roundtrip(tok, text):
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert all(isinstance(i, int) and 0 < i < tok.vocab_size for i in ids)


def test_greedy_longest_match(tok):
    # "Hello" must not be split into single characters if a longer token exists
    ids = tok.encode("Hello")
    chars = [tok.encode(c) for c in "Hello"]
    assert len(ids) < sum(len(c) for c in chars)


def test_streaming_decoder(tok):
    text = "流式解码 streaming ✓"
    ids = tok.encode(text)
    dec = tok.streaming_decoder()
    out = "".join(dec.push(i) for i in ids) + dec.flush()
    assert out == text


def test_raw_bytes(tok):
    data = bytes(range(256))
    ids = tok.encode_bytes(data)
    assert tok.decode_bytes(ids) == data


def test_glm_tokenizer_reference_model():
    import os

    import pytest as _pytest

    path = "/root/reference/tokenizer/tokenizer.model"
    if not os.path.exists(path):
        _pytest.skip("glm tokenizer.model not available")
    _pytest.importorskip("tiktoken")
    from rwkv_lm_ext_tpu.data.tokenizer_glm import (
        GLM_MASK_ID,
        GlmTokenizer,
    )

    t = GlmTokenizer(path)
    for s in ["Hello 世界", "MLM masking test.", "你好，世界！"]:
        assert t.decode(t.encode(s)) == s
    # the [MASK] special must land on the reference's id (tests/test_mlm.py)
    assert t._enc.encode("[MASK]", allowed_special={"[MASK]"}) == [GLM_MASK_ID]
    assert t.mask_id == GLM_MASK_ID
