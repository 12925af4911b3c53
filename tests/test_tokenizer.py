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
