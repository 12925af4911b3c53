"""Speculative decoding (infer.speculative): greedy output must be
token-identical to the target model's own greedy decode for ANY draft
(the acceptance rule is exact argmax match), and the stats must reflect
the draft's quality."""
import jax
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams
from rwkv_lm_ext_tpu.infer.speculative import SpeculativeEngine

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

T_CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=160, head_size=16,
    dtype="float32", param_dtype="float32",
)
D_CFG = ModelConfig(
    n_layer=1, n_embd=32, vocab_size=160, head_size=16,
    dtype="float32", param_dtype="float32",
)

# engine greedy applies the default occurrence penalties; speculative
# decoding is penalty-free greedy, so compare against the same
PLAIN_GREEDY = SamplingParams(
    temperature=0.0, alpha_presence=0.0, alpha_frequency=0.0,
    token_stop=(),
)


def _params(cfg, seed):
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    params = init_rwkv_params(jax.random.PRNGKey(seed), cfg)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(seed * 100 + i), b["att"]["output"].shape
        )
    return params


@pytest.fixture(scope="module")
def target():
    return _params(T_CFG, 5)


@pytest.fixture(scope="module")
def draft():
    return _params(D_CFG, 9)


def test_matches_target_greedy_any_draft(target, draft):
    """An unrelated random draft (near-zero acceptance) still yields the
    target's exact greedy output — speculation is lossless."""
    eng = GenerationEngine(target, T_CFG, wkv_backend="reference")
    expected = eng.generate([5, 9, 23, 7], max_tokens=10,
                            sampling=PLAIN_GREEDY)
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=4,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    out, stats = spec.generate(
        [5, 9, 23, 7], max_tokens=10, token_stop=(), return_stats=True
    )
    assert out == expected, (out, expected)
    assert stats.rounds >= 1 and 0.0 <= stats.acceptance <= 1.0


def test_self_draft_full_acceptance(target):
    """Draft == target accepts everything: gamma+1 tokens per verify
    pass, zero correction passes."""
    eng = GenerationEngine(target, T_CFG, wkv_backend="reference")
    expected = eng.generate([5, 9, 23], max_tokens=9, sampling=PLAIN_GREEDY)
    spec = SpeculativeEngine(
        target, T_CFG, target, T_CFG, gamma=4,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    out, stats = spec.generate(
        [5, 9, 23], max_tokens=9, token_stop=(), return_stats=True
    )
    assert out == expected
    assert stats.acceptance == 1.0
    # prefill + one verify per round, no correction re-prefills
    assert stats.target_passes == 1 + stats.rounds
    assert stats.tokens_per_target_pass > 1.0


def test_truncated_self_draft(target):
    """The early-exit self-draft (first k blocks, shared buffers) is a
    valid draft: zero extra weight memory, lossless output."""
    from rwkv_lm_ext_tpu.infer.speculative import truncated_draft

    dparams, dcfg = truncated_draft(target, T_CFG, 1)
    assert dcfg.n_layer == 1
    assert dparams["blocks"][0] is target["blocks"][0]  # shared buffers
    assert dparams["emb"] is target["emb"]

    eng = GenerationEngine(target, T_CFG, wkv_backend="reference")
    expected = eng.generate([5, 9, 23], max_tokens=8, sampling=PLAIN_GREEDY)
    spec = SpeculativeEngine(
        target, T_CFG, dparams, dcfg, gamma=3,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    out = spec.generate([5, 9, 23], max_tokens=8, token_stop=())
    assert out == expected


def test_speculative_accept_preserves_target_distribution():
    """The rejection-sampling rule's statistical guarantee: the first
    emitted token (accepted draft token or resample) is distributed
    EXACTLY as the target p[0], for an arbitrary mismatched draft q."""
    import jax.numpy as jnp

    from rwkv_lm_ext_tpu.infer.speculative import speculative_accept

    V, N = 6, 40000
    p = jnp.asarray([[0.4, 0.3, 0.1, 0.1, 0.05, 0.05],
                     [0.1, 0.1, 0.2, 0.2, 0.2, 0.2]])   # (gamma+1=2, V)
    q = jnp.asarray([[0.05, 0.15, 0.3, 0.3, 0.1, 0.1]])  # (gamma=1, V)

    def one(key):
        k1, k2 = jax.random.split(key)
        cand = jax.random.categorical(k1, jnp.log(q)).astype(jnp.int32)
        j, nxt = speculative_accept(p, q, cand, k2)
        return jnp.where(j > 0, cand[0], nxt)

    toks = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), N))
    freq = jnp.bincount(toks, length=V) / N
    import numpy as np

    np.testing.assert_allclose(np.asarray(freq), np.asarray(p[0]),
                               atol=0.01)  # ~4 sigma at N=40k


def test_sampled_full_acceptance_with_self_draft(target):
    """draft == target with identical SamplingParams: p == q, so every
    proposal is accepted (u < 1 always) regardless of temperature."""
    spec = SpeculativeEngine(
        target, T_CFG, target, T_CFG, gamma=4,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    sp = SamplingParams(temperature=0.9, top_p=0.9, alpha_presence=0.0,
                        alpha_frequency=0.0, token_stop=())
    out, stats = spec.generate([5, 9, 23], max_tokens=10, sampling=sp,
                               return_stats=True)
    assert len(out) == 10
    assert stats.acceptance == 1.0
    assert stats.target_passes == 1 + stats.rounds


def test_sampled_runs_with_mismatched_draft(target, draft):
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=3,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    sp = SamplingParams(temperature=1.0, top_p=0.8, alpha_presence=0.0,
                        alpha_frequency=0.0, token_stop=())
    out, stats = spec.generate([5, 9], max_tokens=8, sampling=sp,
                               seed=3, return_stats=True)
    assert len(out) == 8
    assert 0.0 <= stats.acceptance <= 1.0


def test_greedy_honors_sampling_token_stop(target, draft):
    """A provided SamplingParams is the source of truth for token_stop
    in BOTH modes; greedy mode rejects token_ban (raw-argmax verify)."""
    eng = GenerationEngine(target, T_CFG, wkv_backend="reference")
    full = eng.generate([5, 9, 23], max_tokens=8, sampling=PLAIN_GREEDY)
    stop = full[3]
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=3,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    sp_stop = SamplingParams(temperature=0.0, alpha_presence=0.0,
                             alpha_frequency=0.0, token_stop=(stop,))
    out = spec.generate([5, 9, 23], max_tokens=8, sampling=sp_stop)
    assert out == full[:3]
    with pytest.raises(ValueError, match="token_ban"):
        spec.generate([5], sampling=SamplingParams(
            temperature=0.0, alpha_presence=0.0, alpha_frequency=0.0,
            token_ban=(1,),
        ))


def test_sampled_rejects_history_penalties(target, draft):
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=2,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    with pytest.raises(ValueError, match="penalt"):
        spec.generate([5], sampling=SamplingParams(temperature=1.0))


def test_stop_token(target, draft):
    eng = GenerationEngine(target, T_CFG, wkv_backend="reference")
    full = eng.generate([5, 9, 23], max_tokens=8, sampling=PLAIN_GREEDY)
    stop = full[3]
    expected = eng.generate(
        [5, 9, 23], max_tokens=8,
        sampling=SamplingParams(
            temperature=0.0, alpha_presence=0.0, alpha_frequency=0.0,
            token_stop=(stop,),
        ),
    )
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=3,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    out = spec.generate([5, 9, 23], max_tokens=8, token_stop=(stop,))
    assert out == expected == full[:3]


def test_callback_streams_every_emitted_token(target, draft):
    """generate(callback=...) sees exactly the emitted token ids, in
    order, across accepted bursts and corrections."""
    spec = SpeculativeEngine(
        target, T_CFG, draft, D_CFG, gamma=4,
        wkv_backend="reference", draft_wkv_backend="reference",
    )
    seen = []
    out = spec.generate(
        [5, 9, 23, 7], max_tokens=10, token_stop=(), callback=seen.append
    )
    assert seen == out, (seen, out)
