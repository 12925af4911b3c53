"""RAG chat over a local corpus (the GUI demo equivalent) + profiling utils."""
import pytest
import jax
import numpy as np

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.apps.rag import LocalRetriever, RagChat
from rwkv_lm_ext_tpu.infer import GenerationEngine, SamplingParams
from rwkv_lm_ext_tpu.infer.encoders import BiEncoder
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.utils import Throughput, record_time

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
    dtype="float32", param_dtype="float32",
)


class CharTok:
    def encode(self, s):
        return [ord(c) % 60000 + 10 for c in s]

    def decode(self, ids):
        return "".join(chr((i - 10) % 60000) for i in ids)

    def streaming_decoder(self):
        class _D:
            def push(self, t): return ""
            def flush(self): return ""
        return _D()


def test_rag_retrieval_and_answer():
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(i), b["att"]["output"].shape
        )
    tok = CharTok()
    docs = [
        "the eiffel tower is in paris",
        "pandas eat bamboo",
        "the sky is blue",
    ]
    retr = LocalRetriever(BiEncoder(params, CFG, tok), docs)
    hits = retr.retrieve("the eiffel tower is in paris", k=2)
    assert hits[0][1] == docs[0]           # exact match ranks first
    retr.add(["new doc about oceans"])
    assert len(retr.documents) == 4
    chat = RagChat(GenerationEngine(params, CFG, tok), retr, top_k=2)
    out, sources = chat.answer(
        "the eiffel tower is in paris?", max_tokens=4,
        sampling=SamplingParams(temperature=0.0, top_p=1.0, token_stop=()),
    )
    assert isinstance(out, str) and len(sources) == 2
    assert docs[0] in sources


def test_throughput_meter():
    m = Throughput(ctx_len=512, real_bsz=8)
    assert m.step() == {}
    out = m.step()
    assert "it/s" in out and "Kt/s" in out
    assert abs(out["Kt/s"] - 512 * 8 * out["it/s"] / 1000) < 1e-6


def test_record_time(capsys):
    @record_time
    def f(x):
        return x + 1

    assert f(1) == 2
    assert "[time] f:" in capsys.readouterr().out
