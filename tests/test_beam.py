"""Beam search over batched recurrent state."""
import jax
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer import GenerationEngine, SamplingParams
from rwkv_lm_ext_tpu.infer.beam import BeamParams, generate_beamsearch
from rwkv_lm_ext_tpu.models import init_rwkv_params

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=50, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def engine():
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    keys = jax.random.split(jax.random.PRNGKey(1), len(params["blocks"]))
    for bk, b in zip(keys, params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(bk, b["att"]["output"].shape)
    return GenerationEngine(params, CFG, chunk_len=8)


def test_beam_returns_ranked_sequences(engine):
    bp = BeamParams(
        num_beams=6, num_groups=2, return_num_sequences=4,
        max_tokens=12, do_sample=False, eos_ids=(0,),
    )
    out = generate_beamsearch(engine, [5, 6, 7], bp)
    assert 1 <= len(out) <= 4
    scores = [s for s, _ in out]
    assert scores == sorted(scores, reverse=True)
    for _, ids in out:
        assert all(0 <= t < CFG.vocab_size for t in ids)
        assert 0 not in ids  # eos never inside a hypothesis


def test_beam_greedy_first_token_consistency(engine):
    """With one beam/group and no sampling, beam search's first token must
    equal greedy decoding's first token (same model, same state)."""
    bp = BeamParams(
        num_beams=1, num_groups=1, return_num_sequences=1,
        max_tokens=5, do_sample=False, eos_ids=(), repetition_penalty=1.0,
        length_penalty=0.0,
    )
    out = generate_beamsearch(engine, [5, 6, 7], bp)
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=(),
                        alpha_presence=0.0, alpha_frequency=0.0)
    greedy = engine.generate([5, 6, 7], max_tokens=5, sampling=sp)
    assert out[0][1] == greedy


def test_beam_sampled_mode_runs(engine):
    bp = BeamParams(
        num_beams=4, num_groups=2, return_num_sequences=2,
        max_tokens=8, do_sample=True, eos_ids=(0, 1),
    )
    out = generate_beamsearch(engine, [9, 10], bp, seed=3)
    assert len(out) >= 1
