"""K-tokens-per-dispatch decode blocks (VERDICT r4 #1/#2).

The block paths (ContinuousBatcher(block_size=K) and
GenerationEngine.generate(block_size=K)) must be OUTPUT-IDENTICAL to the
per-token paths: same rng split order, same stop rule, same budget
accounting — only the dispatch granularity changes. These tests pin that
equivalence plus the block-specific edges: stop mid-block, budget
exhaustion mid-block, cancellation between blocks, admission into a slot
frozen mid-block."""
import jax
import jax.numpy as jnp
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=200, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def engine():
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    params = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(50 + i), b["att"]["output"].shape
        )
    return GenerationEngine(params, CFG, wkv_backend="reference")


def test_engine_block_matches_per_token(engine):
    """generate(block_size=K) == generate(block_size=1) for greedy AND
    sampled decoding (same rng split order), including the final state."""
    for sp in (
        SamplingParams(temperature=0.0, token_stop=()),
        SamplingParams(temperature=1.0, top_p=0.9, token_stop=()),
    ):
        ref, st_ref = engine.generate(
            [5, 9, 23], max_tokens=11, sampling=sp, block_size=1,
            return_state=True, seed=7,
        )
        for k in (3, 8, 16):
            out, st = engine.generate(
                [5, 9, 23], max_tokens=11, sampling=sp, block_size=k,
                return_state=True, seed=7,
            )
            assert out == ref, (k, sp.temperature, out, ref)
            for a, b in zip(
                jax.tree_util.tree_leaves(st),
                jax.tree_util.tree_leaves(st_ref),
            ):
                assert jnp.allclose(a, b, atol=1e-5), k


def test_engine_block_stop_token(engine):
    """A stop sampled mid-block truncates the output and freezes the
    state exactly where the per-token loop would have broken."""
    sp0 = SamplingParams(temperature=0.0, token_stop=())
    full = engine.generate([5, 9, 23], max_tokens=8, sampling=sp0)
    stop = full[3]
    sp = SamplingParams(temperature=0.0, token_stop=(stop,))
    ref, st_ref = engine.generate(
        [5, 9, 23], max_tokens=8, sampling=sp, block_size=1,
        return_state=True,
    )
    assert ref == full[:3]
    out, st = engine.generate(
        [5, 9, 23], max_tokens=8, sampling=sp, block_size=8,
        return_state=True,
    )
    assert out == ref
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st_ref)
    ):
        assert jnp.allclose(a, b, atol=1e-5)


def test_batcher_block_matches_standalone(engine):
    """Block-mode batcher (K=4) with 2 slots over 5 requests of varying
    max_tokens reproduces per-request standalone generation — admission
    reuses slots whose previous request finished mid-block."""
    sp = SamplingParams(temperature=0.0, token_stop=())
    prompts = [
        [5, 9, 23], [77, 3], [14, 14, 14, 60], [99], [31, 8, 120, 44, 2],
    ]
    maxes = [6, 4, 9, 3, 5]
    expected = {
        i: engine.generate(p, max_tokens=m, sampling=sp)
        for i, (p, m) in enumerate(zip(prompts, maxes))
    }
    batcher = ContinuousBatcher(
        engine, n_slots=2, sampling=sp, block_size=4
    )
    rids = [
        batcher.submit(p, max_tokens=m) for p, m in zip(prompts, maxes)
    ]
    results = batcher.run()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        assert results[rid] == expected[i], (i, results[rid], expected[i])


def test_batcher_block_per_request_stop_and_sampling(engine):
    """Per-request stop tokens live in the device stop matrix; per-row
    sampling knobs still apply — both match standalone outputs."""
    sp0 = SamplingParams(temperature=0.0, token_stop=())
    full = engine.generate([5, 9, 23], max_tokens=9, sampling=sp0)
    stop = full[3]
    sp_stop = SamplingParams(temperature=0.0, token_stop=(stop,))
    sp_pen = SamplingParams(temperature=0.0, token_stop=(),
                            repetition_penalty=0.125)
    exp_stop = engine.generate([5, 9, 23], max_tokens=9, sampling=sp_stop)
    exp_pen = engine.generate([5, 9, 23], max_tokens=9, sampling=sp_pen)
    assert exp_stop != full and exp_pen != full

    batcher = ContinuousBatcher(
        engine, n_slots=3, sampling=sp0, block_size=4
    )
    r1 = batcher.submit([5, 9, 23], max_tokens=9)
    r2 = batcher.submit([5, 9, 23], max_tokens=9, sampling=sp_stop)
    r3 = batcher.submit([5, 9, 23], max_tokens=9, sampling=sp_pen)
    results = batcher.run()
    assert results[r1] == full
    assert results[r2] == exp_stop
    assert results[r3] == exp_pen


def test_batcher_block_cancel_partial_output(engine):
    """Cancel an active request between blocks: it retires with the
    tokens produced so far (a whole number of admission+block emissions),
    the freed slot serves the next request exactly, and a queued cancel
    drops empty (the VERDICT r4 #1 cancel-mid-K-block case)."""
    sp = SamplingParams(temperature=0.0, token_stop=())
    batcher = ContinuousBatcher(
        engine, n_slots=1, sampling=sp, block_size=4
    )
    ra = batcher.submit([5, 9, 23], max_tokens=100)
    rb = batcher.submit([77, 3], max_tokens=100)
    rc = batcher.submit([14, 60], max_tokens=5)
    for _ in range(2):
        batcher.step()  # admit A (+1 token) and run blocks
    assert batcher.cancel(ra) and batcher.cancel(rb)
    results = batcher.run()
    assert set(results) == {ra, rb, rc}
    # A emitted its admission token plus 1-2 blocks of 4
    assert 1 <= len(results[ra]) <= 9
    # partial output is a strict prefix of the uncancelled generation
    full_a = engine.generate([5, 9, 23], max_tokens=12, sampling=sp)
    assert results[ra] == full_a[: len(results[ra])]
    assert results[rb] == []
    want = engine.generate([14, 60], max_tokens=5, sampling=sp)
    assert results[rc] == want


def test_batcher_block_rejects_oversized_stop_set(engine):
    batcher = ContinuousBatcher(
        engine, n_slots=1, sampling=SamplingParams(temperature=0.0),
        block_size=4, max_stop_tokens=2,
    )
    with pytest.raises(ValueError, match="token_stop"):
        batcher.submit([5], sampling=SamplingParams(
            temperature=0.0, token_stop=(1, 2, 3)))


def test_batcher_block_driver_concurrent(engine):
    """BatcherDriver over a block-mode batcher serves concurrent callers
    with standalone-exact outputs (the serving configuration)."""
    import threading

    from rwkv_lm_ext_tpu.infer.continuous import BatcherDriver

    sp = SamplingParams(temperature=0.0, token_stop=())
    prompts = [[5, 9, 23], [77, 3], [14, 14, 60]]
    expected = [engine.generate(p, max_tokens=7, sampling=sp)
                for p in prompts]
    batcher = ContinuousBatcher(
        engine, n_slots=2, sampling=sp, block_size=4
    )
    batcher.warmup()
    driver = BatcherDriver(batcher)
    results = [None] * len(prompts)

    def worker(i):
        results[i] = driver.submit_and_wait(
            prompts[i], max_tokens=7, timeout=60
        )

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=90)
    driver.close()
    assert results == expected, (results, expected)


def test_batcher_block_cancel_sole_request_goes_idle(engine):
    """Cancelling the ONLY active request must also clear the row's
    device-side active flag — otherwise the pipelined dispatcher keeps
    re-launching blocks for the garbage row and busy never goes False
    (run() would spin forever)."""
    sp = SamplingParams(temperature=0.0, token_stop=())
    batcher = ContinuousBatcher(
        engine, n_slots=2, sampling=sp, block_size=4
    )
    ra = batcher.submit([5, 9, 23], max_tokens=10_000)
    for _ in range(3):
        batcher.step()
    batcher.cancel(ra)
    results = batcher.run()  # must terminate
    assert set(results) == {ra}
    assert 1 <= len(results[ra]) < 10_000
    assert not batcher.busy


def test_batcher_block_grouped_admission_with_cache(engine):
    """Same-length prompts admit as one batched prefill (grouped
    admission); with a prefix cache attached, repeated prompts resume
    from cached boundary states. Outputs must equal standalone
    generation in every case."""
    from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache

    old_cache = engine.state_cache
    engine.state_cache = PrefixStateCache(16)
    try:
        sp = SamplingParams(temperature=0.0, token_stop=())
        # same length -> one group; different content -> different rows
        # (> min_prefix=8 so chunk-boundary inserts actually cache)
        pa = [5, 9, 23] + list(range(40, 57))
        pb = [7, 11, 29] + list(range(80, 97))
        exp_a = engine.generate(pa, max_tokens=6, sampling=sp)
        exp_b = engine.generate(pb, max_tokens=6, sampling=sp)
        batcher = ContinuousBatcher(
            engine, n_slots=4, sampling=sp, block_size=4
        )
        r1 = batcher.submit(pa, max_tokens=6)
        r2 = batcher.submit(pb, max_tokens=6)
        res = batcher.run()
        assert res[r1] == exp_a and res[r2] == exp_b
        # repeat: now the cache resumes both prefixes mid-way
        r3 = batcher.submit(pa, max_tokens=6)
        r4 = batcher.submit(pb, max_tokens=6)
        res = batcher.run()
        assert res[r3] == exp_a and res[r4] == exp_b
        assert engine.state_cache.stats()["hits"] >= 1
    finally:
        engine.state_cache = old_cache
