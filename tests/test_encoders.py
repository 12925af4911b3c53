"""Serving encoders (BiEncoder/CrossEncoder/Fusion), states registry,
instructor + infinite-context embedders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.adapters import LoraConfig, init_lora_params
from rwkv_lm_ext_tpu.infer.encoders import (
    BiCrossFusionEncoder,
    BiEncoder,
    CrossEncoder,
)
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
from rwkv_lm_ext_tpu.infer.states_registry import StatesRegistry
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.heads import (

    embed_sequences,
    embed_sequences_chunked,
    init_classification_head,
    instructor_embed,
)

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
    dtype="float32", param_dtype="float32",
)


class CharTok:
    """Deterministic toy tokenizer (avoids loading the 65k vocab here)."""

    def encode(self, s):
        return [ord(c) % 60000 + 10 for c in s]

    def decode(self, ids):
        return "".join(chr((i - 10) % 60000) for i in ids)

    def streaming_decoder(self):
        from rwkv_lm_ext_tpu.data.tokenizer import StreamingDecoder

        class _D:
            def push(self, t):
                return ""

            def flush(self):
                return ""

        return _D()


@pytest.fixture(scope="module")
def params():
    p = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    keys = jax.random.split(jax.random.PRNGKey(1), len(p["blocks"]))
    for bk, b in zip(keys, p["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(bk, b["att"]["output"].shape)
    return p


def test_biencoder_similarity_sanity(params):
    be = BiEncoder(params, CFG, CharTok())
    embs = be.encode_texts(["hello world", "hello world", "zzzz qqqq"])
    assert embs.shape[0] == 3
    sim_same = embs[0] @ embs[1]
    sim_diff = embs[0] @ embs[2]
    np.testing.assert_allclose(sim_same, 1.0, atol=1e-4)
    assert sim_diff < sim_same


def test_biencoder_bucket_stability(params):
    """Same text must embed identically whatever batch it rides in."""
    be = BiEncoder(params, CFG, CharTok())
    solo = be.encode_texts(["stable text"])
    batched = be.encode_texts(["stable text", "x" * 100, "y" * 30])
    np.testing.assert_allclose(solo[0], batched[0], atol=2e-4)


def test_crossencoder_scores(params):
    score = init_classification_head(jax.random.PRNGKey(2), CFG, 1)
    ce = CrossEncoder(params, CFG, CharTok(), score)
    s = ce.score_pairs([("query", "good document"), ("query", "bad")])
    assert s.shape == (2,)
    assert np.isfinite(s).all()


def test_fusion_encoder_adapters(params):
    lc = LoraConfig(r=4)
    bi = init_lora_params(jax.random.PRNGKey(3), params, lc)
    for ab in bi.values():
        ab["B"] = 0.01 * jnp.ones_like(ab["B"])
    score = init_classification_head(jax.random.PRNGKey(4), CFG, 1)
    fusion = BiCrossFusionEncoder(
        params, CFG, CharTok(),
        bi_adapter=bi, bi_lora_cfg=lc, score_params=score,
    )
    e = fusion.encode_texts(["abc"])
    s = fusion.cross_encode_texts([("a", "b")])
    assert e.shape[0] == 1 and s.shape == (1,)
    # adapter actually applied: differs from base-model embedding
    base = BiEncoder(params, CFG, CharTok()).encode_texts(["abc"])
    assert not np.allclose(e[0], base[0])
    out = fusion.sampling_generate(
        "hi", max_tokens=3,
        sampling=SamplingParams(temperature=0.0, top_p=1.0, token_stop=()),
    )
    assert isinstance(out, str)


def test_states_registry(params):
    reg = StatesRegistry(CFG)
    wkv = 0.1 * np.ones((2, 4, 16, 16), np.float32)
    reg.register("kg_extract", wkv, template="extract: {input}")
    engine = GenerationEngine(params, CFG, CharTok(), chunk_len=8)
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    out_tuned = reg.generate(engine, "kg_extract", "text", max_tokens=4, sampling=sp)
    assert isinstance(out_tuned, str)
    # the tuned initial state must change the prefill logits
    ids = CharTok().encode("extract: text")
    l_plain, _ = engine.prefill(ids)
    l_tuned, _ = engine.prefill(ids, reg.initial_state("kg_extract", 1))
    assert not np.allclose(np.asarray(l_plain), np.asarray(l_tuned))


def test_states_registry_pth_roundtrip(params, tmp_path):
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    sd = {
        f"blocks.{i}.att.time_state": 0.05 * np.ones((4, 16, 16), np.float32)
        for i in range(2)
    }
    path = str(tmp_path / "states.pth")
    save_torch_pth(path, sd)
    reg = StatesRegistry(CFG)
    reg.register_pth("unit", path)
    st = reg.initial_state("unit", batch_size=2)
    from rwkv_lm_ext_tpu.models.state import unpack_wkv, wkv_state_shape

    assert st["wkv"].shape == (2, 2) + wkv_state_shape(4, 16)
    logical = unpack_wkv(st["wkv"], 16)
    assert logical.shape == (2, 2, 4, 16, 16)
    np.testing.assert_allclose(logical[0, 0], 0.05, atol=1e-7)


def test_instructor_and_chunked_embed(params):
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 4, 1000)
    tokens = tokens.at[:, -1].set(1)
    inst_head = {
        "dense": {
            "kernel": 0.1 * jax.random.normal(jax.random.PRNGKey(6), (64, 32)),
            "bias": jnp.zeros(32),
        },
        "ln": {"scale": jnp.ones(32), "bias": jnp.zeros(32)},
    }
    e = instructor_embed(params, CFG, tokens, inst_head)
    assert e.shape == (2, 32)
    # infinite-context chunked embedding == full-sequence embedding
    full = embed_sequences(params, CFG, tokens)
    chunked = embed_sequences_chunked(params, CFG, tokens, chunk_ctx=5)
    np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-4)
