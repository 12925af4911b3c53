"""Prompt prefix cache (infer.state_cache): cached-prefix generation
must be indistinguishable from uncached generation (the recurrent state
after a prefix IS the prefix), across the engine and the continuous
batcher, including after buffer donation by later decode steps."""
import jax
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache

pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=200, head_size=16,
    dtype="float32", param_dtype="float32",
)
GREEDY = SamplingParams(temperature=0.0, token_stop=())


@pytest.fixture(scope="module")
def params():
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    p = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    for i, b in enumerate(p["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(50 + i), b["att"]["output"].shape
        )
    return p


def test_lookup_insert_semantics():
    cache = PrefixStateCache(capacity=2, min_prefix=3)
    s = {"x": jax.numpy.arange(4.0)}
    cache.insert([1, 2], s)          # below min_prefix: ignored
    assert cache.stats()["entries"] == 0
    cache.insert([1, 2, 3], s)
    cache.insert([1, 2, 3, 4, 5], s)

    # strict prefix only: the exact key must NOT hit for itself
    hit, n = cache.lookup([1, 2, 3])
    assert hit is None and n == 0
    hit, n = cache.lookup([1, 2, 3, 4])
    assert n == 3
    # longest wins
    hit, n = cache.lookup([1, 2, 3, 4, 5, 6])
    assert n == 5
    # returned state is a private copy
    hit["x"] = None  # mutating the dict must not affect the cache
    hit2, _ = cache.lookup([1, 2, 3, 4, 5, 6])
    assert hit2["x"] is not None

    # LRU eviction: insert a third entry; [1,2,3] was used least recently?
    # both were hit above; touch [1,2,3] via lookup then insert to evict
    cache.lookup([1, 2, 3, 99])
    cache.insert([7, 8, 9, 10], s)
    assert cache.stats()["entries"] == 2
    hit, n = cache.lookup([1, 2, 3, 4, 5, 6])
    assert n == 3  # the 5-key was evicted (least recently used)


def test_engine_prefix_cache_exact_parity(params):
    """Cold vs warm cache vs no cache: identical greedy outputs; the
    warm path consumes the cached prefix (hits increment)."""
    plain = GenerationEngine(params, CFG, wkv_backend="reference")
    cache = PrefixStateCache(capacity=4, min_prefix=4)
    cached = GenerationEngine(
        params, CFG, wkv_backend="reference", state_cache=cache
    )

    system = [7, 21, 9, 13, 2, 40, 8, 33]          # shared "system prompt"
    p1 = system + [5, 9]
    p2 = system + [61, 3, 17]

    exp1 = plain.generate(p1, max_tokens=6, sampling=GREEDY)
    exp2 = plain.generate(p2, max_tokens=6, sampling=GREEDY)

    out1 = cached.generate(p1, max_tokens=6, sampling=GREEDY)
    assert out1 == exp1
    assert cache.stats()["entries"] >= 1

    # p2 shares the 8-token system prefix? Only full-prompt keys are
    # cached, and p1's full prompt is not a prefix of p2 — so re-run p1
    # (exact repeat must hit the cache via its own strict-prefix rule:
    # the cached key p1 is NOT a strict prefix of p1 — extend instead)
    out1b = cached.generate(p1 + [44], max_tokens=6, sampling=GREEDY)
    exp1b = plain.generate(p1 + [44], max_tokens=6, sampling=GREEDY)
    assert out1b == exp1b
    assert cache.hits >= 1

    out2 = cached.generate(p2, max_tokens=6, sampling=GREEDY)
    assert out2 == exp2


def test_cache_survives_donation(params):
    """Decode steps donate state buffers; cached entries must stay
    usable afterwards (they are private copies)."""
    cache = PrefixStateCache(capacity=4, min_prefix=4)
    eng = GenerationEngine(
        params, CFG, wkv_backend="reference", state_cache=cache
    )
    prompt = [7, 21, 9, 13, 2]
    first = eng.generate(prompt + [1, 2], max_tokens=8, sampling=GREEDY)
    # the 8 decode steps donated their state buffers; the cached prefix
    # entry must still produce the same continuation
    again = eng.generate(prompt + [1, 2, 3], max_tokens=8, sampling=GREEDY)
    plain = GenerationEngine(params, CFG, wkv_backend="reference")
    assert again == plain.generate(
        prompt + [1, 2, 3], max_tokens=8, sampling=GREEDY
    )
    assert first == plain.generate(
        prompt + [1, 2], max_tokens=8, sampling=GREEDY
    )
    assert cache.hits >= 1


def test_explicit_initial_state_bypasses_cache(params):
    """States-serving requests carry task-tuned initial states — the
    cache must neither serve nor store them."""
    from rwkv_lm_ext_tpu.models.state import init_model_state

    cache = PrefixStateCache(capacity=4, min_prefix=2)
    eng = GenerationEngine(
        params, CFG, wkv_backend="reference", state_cache=cache
    )
    st = init_model_state(CFG, 1)
    eng.prefill([5, 9, 23, 7, 2], state=st)
    assert cache.stats()["entries"] == 0
    assert cache.hits == 0 and cache.misses == 0


def test_batcher_admission_uses_cache(params):
    """Continuous-batching admission prefills through engine.prefill —
    shared prefixes hit the cache and outputs still match standalone."""
    from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher

    cache = PrefixStateCache(capacity=4, min_prefix=4)
    eng = GenerationEngine(
        params, CFG, wkv_backend="reference", state_cache=cache
    )
    plain = GenerationEngine(params, CFG, wkv_backend="reference")

    prompts = [[7, 21, 9, 13, 2, 5], [7, 21, 9, 13, 2, 5, 61, 3]]
    expected = [
        plain.generate(p, max_tokens=5, sampling=GREEDY) for p in prompts
    ]
    batcher = ContinuousBatcher(eng, n_slots=2, sampling=GREEDY)
    rids = [batcher.submit(p, max_tokens=5) for p in prompts]
    results = batcher.run()
    for rid, exp in zip(rids, expected):
        assert results[rid] == exp
    assert cache.hits >= 1


def test_identical_prompt_hits_boundary_state(params):
    """Chunk-boundary states are inserted during prefill, so a REPEATED
    identical prompt resumes from its last boundary (re-running only the
    final chunk) — and the logits/state are exactly the uncached run's."""
    cache = PrefixStateCache(capacity=8, min_prefix=4)
    eng = GenerationEngine(
        params, CFG, wkv_backend="reference", state_cache=cache,
        chunk_len=8,
    )
    prompt = [5 + (i % 60) for i in range(20)]  # multi-chunk
    l1, s1 = eng.prefill(prompt)
    h0 = cache.hits
    l2, s2 = eng.prefill(prompt)
    assert cache.hits > h0, "identical prompt must hit a boundary entry"
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in s1:
        np.testing.assert_allclose(
            np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-6, atol=1e-6
        )
