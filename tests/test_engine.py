"""Generation engine: prefill equivalence, decode loop, sampling pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer import GenerationEngine, SamplingParams
from rwkv_lm_ext_tpu.infer.engine import _chunk_plan
from rwkv_lm_ext_tpu.infer.sampling import (
    apply_top_k,
    apply_top_p,
    sample_token,
)
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def engine():
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    # make output projections nonzero so generation isn't degenerate
    keys = jax.random.split(jax.random.PRNGKey(1), len(params["blocks"]))
    for bk, b in zip(keys, params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(bk, b["att"]["output"].shape)
    return GenerationEngine(params, CFG, chunk_len=8)


def test_chunk_plan():
    assert _chunk_plan(17, 8) == [8, 8, 1]
    assert _chunk_plan(23, 8) == [8, 8, 4, 2, 1]
    assert _chunk_plan(3, 256) == [2, 1]
    assert _chunk_plan(256, 256) == [256]
    assert sum(_chunk_plan(1000, 64)) == 1000


def test_prefill_matches_full_forward(engine):
    prompt = list(range(1, 20))
    logits, state = engine.prefill(prompt)
    full, full_state = rwkv_forward(
        engine.params, CFG, jnp.asarray(prompt, jnp.int32)[None]
    )
    np.testing.assert_allclose(logits, full[0, -1], rtol=2e-4, atol=2e-4)
    for k in state:
        np.testing.assert_allclose(
            state[k], full_state[k], rtol=2e-4, atol=2e-4
        )


def test_generate_greedy_deterministic(engine):
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    a = engine.generate([5, 6, 7], max_tokens=10, sampling=sp)
    b = engine.generate([5, 6, 7], max_tokens=10, sampling=sp)
    assert a == b and len(a) == 10
    assert all(0 <= t < CFG.vocab_size for t in a)


def test_generate_stop_token(engine):
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    ids = engine.generate([5, 6, 7], max_tokens=5, sampling=sp)
    # now stop on the first generated token -> empty output
    sp2 = SamplingParams(temperature=0.0, top_p=1.0, token_stop=(ids[0],))
    ids2 = engine.generate([5, 6, 7], max_tokens=5, sampling=sp2)
    assert ids2 == []


def test_top_k_top_p():
    logits = jnp.array([1.0, 2.0, 3.0, 4.0, -1.0])
    lk = apply_top_k(logits, 2)
    assert jnp.isneginf(lk[0]) and jnp.isneginf(lk[1]) and jnp.isneginf(lk[4])
    assert lk[3] == 4.0
    lp = apply_top_p(logits, 0.5)  # top token has prob ~0.64 >= 0.5
    assert lp[3] == 4.0 and jnp.isneginf(lp[0])


def test_occurrence_penalties_reduce_repeats():
    sp = SamplingParams(
        temperature=0.0, top_p=1.0, alpha_presence=100.0, alpha_frequency=0.0
    )
    logits = jnp.array([10.0, 9.0, 8.0, 0.0])
    occ = jnp.zeros(4)
    t1, occ = sample_token(jax.random.PRNGKey(0), logits, occ, sp)
    t2, occ = sample_token(jax.random.PRNGKey(0), logits, occ, sp)
    t3, occ = sample_token(jax.random.PRNGKey(0), logits, occ, sp)
    assert (int(t1), int(t2), int(t3)) == (0, 1, 2)  # massive presence penalty


def test_sample_token_rows_matches_global():
    """sample_token_rows with uniform rows reproduces batched sample_token
    exactly (same key, same filters) across the knob space."""
    from rwkv_lm_ext_tpu.infer.sampling import sample_token_rows, slot_params

    B, V = 4, 50
    logits = jax.random.normal(jax.random.PRNGKey(7), (B, V))
    occ = jnp.zeros((B, V)).at[:, 3].set(2.0).at[:, 9].set(1.0)
    for sp in (
        SamplingParams(),
        SamplingParams(temperature=0.0),
        SamplingParams(temperature=0.7, top_p=0.5, repetition_penalty=1.3),
        SamplingParams(top_p=1.0, alpha_presence=0.9, alpha_frequency=0.2),
        SamplingParams(top_p_impl="bisect", categorical_impl="invcdf"),
        SamplingParams(top_k=5),
        SamplingParams(token_ban=(0, 1), alpha_decay=0.9),
    ):
        k = jax.random.PRNGKey(11)
        t_g, occ_g = sample_token(k, logits, occ, sp)
        t_r, occ_r = sample_token_rows(k, logits, occ, slot_params(B, sp), sp)
        assert (t_g == t_r).all(), sp
        np.testing.assert_allclose(occ_g, occ_r, rtol=1e-6)


def test_sample_token_rows_heterogeneous():
    """Rows carrying DIFFERENT knobs each match the per-row global call
    (greedy, so the shared key is irrelevant)."""
    from rwkv_lm_ext_tpu.infer.sampling import sample_token_rows, slot_params

    sps = [
        SamplingParams(temperature=0.0, alpha_presence=100.0),
        SamplingParams(temperature=0.0, repetition_penalty=5.0),
        SamplingParams(temperature=0.0),
    ]
    V = 40
    logits = jax.random.normal(jax.random.PRNGKey(3), (len(sps), V))
    occ = jnp.zeros((len(sps), V))
    # every row has "seen" its own argmax token, so the penalty rows move
    occ = occ.at[jnp.arange(len(sps)), jnp.argmax(logits, -1)].set(1.0)
    rows = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *[slot_params(1, sp) for sp in sps]
    )
    t_r, _ = sample_token_rows(
        jax.random.PRNGKey(0), logits, occ, rows, SamplingParams()
    )
    for i, sp in enumerate(sps):
        t_i, _ = sample_token(jax.random.PRNGKey(9), logits[i], occ[i], sp)
        assert int(t_r[i]) == int(t_i), (i, sp)
    assert int(t_r[0]) != int(t_r[2])  # the penalty actually changed row 0


def test_generate_with_carried_state(engine):
    """state carry: generating after a prefix equals prefilling the whole."""
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    _, state = engine.prefill([5, 6])
    out_a = engine.generate([7, 8], max_tokens=5, sampling=sp, state=state)
    out_b = engine.generate([5, 6, 7, 8], max_tokens=5, sampling=sp)
    assert out_a == out_b


def test_generate_on_device_matches_host_loop(engine):
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    host = engine.generate([5, 6, 7], max_tokens=10, sampling=sp)
    dev = engine.generate_on_device([5, 6, 7], max_tokens=10, sampling=sp)
    assert dev == host


def test_generate_on_device_stop(engine):
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    ids = engine.generate_on_device([5, 6, 7], max_tokens=6, sampling=sp)
    sp2 = SamplingParams(temperature=0.0, top_p=1.0, token_stop=(ids[2],))
    cut = engine.generate_on_device([5, 6, 7], max_tokens=6, sampling=sp2)
    assert cut == ids[:2]


def test_generate_batch(engine):
    sp = SamplingParams(temperature=0.0, top_p=1.0, token_stop=())
    outs = engine.generate_batch([[5, 6, 7], [9, 10, 11]], max_tokens=6, sampling=sp)
    assert len(outs) == 2 and all(len(o) == 6 for o in outs)
    # batched greedy row 0 with a same-length peer matches single-row greedy
    solo = engine.generate([5, 6, 7], max_tokens=6, sampling=sp)
    both = engine.generate_batch([[5, 6, 7], [5, 6, 7]], max_tokens=6, sampling=sp)
    assert both[0] == solo == both[1]


def test_top_p_bisect_matches_sort():
    from rwkv_lm_ext_tpu.infer.sampling import apply_top_p, apply_top_p_bisect

    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 1000)) * 3
    for p in (0.5, 0.85, 0.99):
        a = apply_top_p(logits, p)
        b = apply_top_p_bisect(logits, p)
        # identical keep-sets except tokens vanishingly close to the cutoff
        mismatch = jnp.mean(
            (jnp.isneginf(a) != jnp.isneginf(b)).astype(jnp.float32)
        )
        assert float(mismatch) < 2e-3, (p, float(mismatch))


def test_inverse_cdf_sampler():
    """invcdf categorical: matches the target distribution, respects -inf
    masking, and agrees with gumbel-max in aggregate."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rwkv_lm_ext_tpu.infer.sampling import sample_inverse_cdf

    logits = jnp.log(jnp.array([0.5, 0.2, 0.2, 0.1]))
    logits = jnp.concatenate([logits, jnp.full((4,), -jnp.inf)])
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = jax.vmap(lambda k: sample_inverse_cdf(k, logits))(keys)
    draws = np.asarray(draws)
    assert draws.max() <= 3, "sampled a -inf-masked token"
    freq = np.bincount(draws, minlength=8) / len(draws)
    np.testing.assert_allclose(freq[:4], [0.5, 0.2, 0.2, 0.1], atol=0.03)

    # batched rows draw independently
    bl = jnp.stack([logits, jnp.roll(logits, 4)])  # row 1: mass on 4..7
    tok = sample_inverse_cdf(jax.random.PRNGKey(1), bl)
    assert tok.shape == (2,) and int(tok[0]) <= 3 and int(tok[1]) >= 4
