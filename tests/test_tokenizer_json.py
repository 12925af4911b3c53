"""JsonTokenizer (data/tokenizer_json.py): HF tokenizer.json wrapper —
the 20B_tokenizer.json format RWKV-4 Pile checkpoints use. A small
byte-level BPE is trained in-test, so encode/decode/streaming are real
`tokenizers` round trips."""
import pytest

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def tok_path(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tk = Tokenizer(models.BPE())
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()
    )
    tk.train_from_iterator(
        ["hello world", "the quick brown fox", "héllo wörld", "你好世界"] * 8,
        trainer,
    )
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tk.save(path)
    return path


def test_roundtrip(tok_path):
    from rwkv_lm_ext_tpu.data.tokenizer_json import JsonTokenizer

    tok = JsonTokenizer(tok_path)
    assert tok.vocab_size >= 256
    for text in ("hello world", "héllo wörld!", "你好世界 fox"):
        ids = tok.encode(text)
        assert ids and all(isinstance(i, int) for i in ids)
        assert tok.decode(ids) == text


def test_streaming_decoder_utf8_safe(tok_path):
    """Pushing token-by-token emits exactly the full decode, and no
    partial multi-byte character ever leaks."""
    from rwkv_lm_ext_tpu.data.tokenizer_json import JsonTokenizer

    tok = JsonTokenizer(tok_path)
    text = "héllo 你好世界 world"
    ids = tok.encode(text)
    dec = tok.streaming_decoder()
    pieces = [dec.push(t) for t in ids]
    pieces.append(dec.flush())
    assert "".join(pieces) == tok.decode(ids) == text
    assert all("�" not in p for p in pieces[:-1])


def test_streaming_decoder_recovers_after_invalid_byte(tok_path):
    """A token decoding to a permanent U+FFFD (lone continuation byte —
    routine when sampling a byte-level BPE) must not stall the stream:
    later pushes keep emitting, with the replacement char surfaced once
    it is no longer at the tail."""
    from rwkv_lm_ext_tpu.data.tokenizer_json import JsonTokenizer

    tok = JsonTokenizer(tok_path)
    bad = next(
        i for i in range(tok.vocab_size) if tok.decode([i]) == "�"
    )
    dec = tok.streaming_decoder()
    assert dec.push(bad) == ""  # trailing: still completable, held
    ids = tok.encode("hello")
    emitted = "".join(dec.push(t) for t in ids) + dec.flush()
    assert emitted.endswith("hello")  # the stream kept flowing
    assert emitted.startswith("�")    # the permanent FFFD surfaced


def test_engine_accepts_json_tokenizer(tok_path):
    """Duck-typed drop-in: GenerationEngine generates with it."""
    import jax

    from rwkv_lm_ext_tpu import ModelConfig
    from rwkv_lm_ext_tpu.data.tokenizer_json import JsonTokenizer
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    tok = JsonTokenizer(tok_path)
    cfg = ModelConfig(
        n_layer=1, n_embd=32, vocab_size=tok.vocab_size + 16,
        head_size=16, dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    eng = GenerationEngine(params, cfg, tok)
    out = eng.generate(
        "hello", max_tokens=3,
        sampling=SamplingParams(temperature=0.0, token_stop=()),
    )
    assert isinstance(out, str)
