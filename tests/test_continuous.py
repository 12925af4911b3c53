"""Continuous batching (infer.continuous): slot-pool decode with
mid-flight admission must reproduce per-request standalone generation
exactly under greedy sampling (rows of a batched RWKV decode are
independent; admission is a pure state scatter)."""
import jax
import jax.numpy as jnp
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=200, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def engine():
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    params = init_rwkv_params(jax.random.PRNGKey(5), CFG)
    # non-trivial residuals so different prompts diverge
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(50 + i), b["att"]["output"].shape
        )
    return GenerationEngine(params, CFG, wkv_backend="reference")


def test_matches_standalone_greedy(engine):
    sp = SamplingParams(temperature=0.0, token_stop=())
    prompts = [
        [5, 9, 23], [77, 3], [14, 14, 14, 60], [99], [31, 8, 120, 44, 2],
    ]
    maxes = [6, 4, 8, 3, 5]

    expected = {
        i: engine.generate(p, max_tokens=m, sampling=sp)
        for i, (p, m) in enumerate(zip(prompts, maxes))
    }

    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp)
    rids = [
        batcher.submit(p, max_tokens=m) for p, m in zip(prompts, maxes)
    ]
    results = batcher.run()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        assert results[rid] == expected[i], (i, results[rid], expected[i])


def test_stop_token_retires_slot(engine):
    # greedy decode of prompt [5,9,23] emits a deterministic sequence;
    # use its second token as the stop to force early retirement
    sp0 = SamplingParams(temperature=0.0, token_stop=())
    full = engine.generate([5, 9, 23], max_tokens=6, sampling=sp0)
    stop = full[2]
    sp = SamplingParams(temperature=0.0, token_stop=(stop,))
    expected = engine.generate([5, 9, 23], max_tokens=6, sampling=sp)

    batcher = ContinuousBatcher(engine, n_slots=1, sampling=sp)
    rid = batcher.submit([5, 9, 23], max_tokens=6)
    rid2 = batcher.submit([99], max_tokens=2)  # queued behind slot 0
    results = batcher.run()
    assert results[rid] == expected
    assert len(results[rid2]) == 2


def test_streaming_callback(engine):
    sp = SamplingParams(temperature=0.0, token_stop=())
    seen = []
    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp)
    rid = batcher.submit([5, 9, 23], max_tokens=4,
                         callback=lambda t: seen.append(t))
    results = batcher.run()
    assert seen == results[rid]


def test_batcher_driver_concurrent(engine):
    """BatcherDriver: concurrent submit_and_wait callers (HTTP-handler
    style threads) get the same greedy outputs as standalone generate."""
    import threading

    from rwkv_lm_ext_tpu.infer.continuous import BatcherDriver

    sp = SamplingParams(temperature=0.0, token_stop=())
    prompts = [[5, 9, 23], [77, 3], [14, 14, 60]]
    expected = [engine.generate(p, max_tokens=5, sampling=sp)
                for p in prompts]

    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp)
    batcher.warmup()
    driver = BatcherDriver(batcher)
    results = [None] * len(prompts)

    def worker(i):
        results[i] = driver.submit_and_wait(
            prompts[i], max_tokens=5, timeout=60
        )

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=90)
    driver.close()
    assert results == expected, (results, expected)


def test_per_request_sampling(engine):
    """Concurrent requests with DIFFERENT sampling knobs (scattered into
    the per-slot device rows) each match their standalone generation."""
    # repetition_penalty < 1 boosts already-seen tokens, so the greedy
    # trajectory provably diverges from the unpenalized one
    sp_a = SamplingParams(temperature=0.0, token_stop=(),
                          repetition_penalty=0.125)
    sp_b = SamplingParams(temperature=0.0, token_stop=(),
                          alpha_presence=-50.0, alpha_frequency=-5.0)
    sp_c = SamplingParams(temperature=0.0, token_stop=())
    exp = {
        k: engine.generate([5, 9, 23], max_tokens=6, sampling=sp)
        for k, sp in (("a", sp_a), ("b", sp_b), ("c", sp_c))
    }
    # the -50 presence "penalty" boosts seen tokens by +50, so request b
    # provably locks onto repeats and diverges from the default
    assert exp["b"] != exp["c"]

    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp_c)
    ra = batcher.submit([5, 9, 23], max_tokens=6, sampling=sp_a)
    rb = batcher.submit([5, 9, 23], max_tokens=6, sampling=sp_b)
    rc = batcher.submit([5, 9, 23], max_tokens=6)  # batcher default
    results = batcher.run()
    assert results[ra] == exp["a"]
    assert results[rb] == exp["b"]
    assert results[rc] == exp["c"]


def test_per_request_stop_tokens(engine):
    """token_stop is host-side per-request state: one request stops early
    on its own stop token while its neighbor runs to max_tokens."""
    sp0 = SamplingParams(temperature=0.0, token_stop=())
    full = engine.generate([5, 9, 23], max_tokens=6, sampling=sp0)
    stop = full[3]
    sp_stop = SamplingParams(temperature=0.0, token_stop=(stop,))
    exp_stop = engine.generate([5, 9, 23], max_tokens=6, sampling=sp_stop)
    assert exp_stop != full

    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp0)
    r1 = batcher.submit([5, 9, 23], max_tokens=6)
    r2 = batcher.submit([5, 9, 23], max_tokens=6, sampling=sp_stop)
    results = batcher.run()
    assert results[r1] == full
    assert results[r2] == exp_stop


def test_submit_rejects_global_knob_mismatch(engine):
    """top_k/token_ban/impl selectors are compiled into the shared step;
    a request that disagrees is rejected instead of silently ignored."""
    batcher = ContinuousBatcher(
        engine, n_slots=1, sampling=SamplingParams(temperature=0.0)
    )
    with pytest.raises(ValueError, match="top_k"):
        batcher.submit([5], sampling=SamplingParams(top_k=7))
    with pytest.raises(ValueError, match="token_ban"):
        batcher.submit([5], sampling=SamplingParams(token_ban=(2,)))
    # per-row knobs are fine
    batcher.submit([5], max_tokens=1,
                   sampling=SamplingParams(temperature=0.0, top_p=0.3))
    batcher.run()


def test_per_request_initial_states(engine):
    """States-conditioned requests (the reference's named-states serving,
    demo/states_runner.py) batch concurrently: each slot's output matches
    standalone generation from the same tuned initial state."""
    import numpy as np

    sp = SamplingParams(temperature=0.0, token_stop=())

    def tuned_state():
        st = engine.init_state(1)
        st = dict(st)
        st["wkv"] = st["wkv"] + 0.25 * jnp.asarray(
            np.random.RandomState(3).randn(*st["wkv"].shape), jnp.float32
        )
        return st

    exp_plain = engine.generate([5, 9, 23], max_tokens=5, sampling=sp)
    exp_tuned = engine.generate(
        [5, 9, 23], max_tokens=5, sampling=sp, state=tuned_state()
    )
    assert exp_plain != exp_tuned  # the state conditions the output

    batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp)
    r1 = batcher.submit([5, 9, 23], max_tokens=5)
    r2 = batcher.submit([5, 9, 23], max_tokens=5,
                        initial_state=tuned_state())
    results = batcher.run()
    assert results[r1] == exp_plain
    assert results[r2] == exp_tuned


def test_service_stream_cb_batcher_path(engine):
    """ServingService.generate(stream_cb=...) on the batcher path:
    incremental pieces concatenate to the final output."""
    from rwkv_lm_ext_tpu.serve.api import ServingService

    class CharTok:
        def encode(self, s):
            return [ord(c) % 180 + 10 for c in s]

        def decode(self, ids):
            return "".join(chr((i - 10) % 180 + 40) for i in ids)

        def streaming_decoder(self):
            outer = self

            class _D:
                def push(self, t):
                    return outer.decode([t])

                def flush(self):
                    return ""

            return _D()

    engine.tokenizer = CharTok()
    try:
        sp = SamplingParams(temperature=0.0, token_stop=())
        batcher = ContinuousBatcher(engine, n_slots=2, sampling=sp)
        svc = ServingService(
            engine=engine, batcher=batcher, tokenizer=engine.tokenizer
        )
        svc.warmup(max_tokens=1)
        pieces = []
        out = svc.generate(
            "abc", max_tokens=5, stream_cb=pieces.append,
            temperature=0.0, token_stop=[],
        )
        assert out["backend"] == "batcher"
        assert "".join(pieces) == out["output"]
        assert len(pieces) >= 1
        svc._driver.close()
    finally:
        engine.tokenizer = None


def test_cancel_queued_and_active(engine):
    """cancel(): an active request retires with its partial output on
    the next tick; a queued one drops with an empty result; the freed
    slot immediately serves the remaining request exactly."""
    sp = SamplingParams(temperature=0.0, token_stop=())
    batcher = ContinuousBatcher(engine, n_slots=1, sampling=sp)
    ra = batcher.submit([5, 9, 23], max_tokens=50)
    rb = batcher.submit([77, 3], max_tokens=50)
    rc = batcher.submit([14, 60], max_tokens=5)
    for _ in range(3):
        batcher.step()  # admits A, decodes 3 ticks
    assert batcher.cancel(ra) and batcher.cancel(rb)
    results = batcher.run()
    assert set(results) == {ra, rb, rc}
    # A: 1 admission token + 3 ticks, well short of max_tokens
    assert 1 <= len(results[ra]) <= 5
    assert results[rb] == []
    want = engine.generate([14, 60], max_tokens=5, sampling=sp)
    assert results[rc] == want
    # cancelling an unknown/finished rid is a no-op
    assert not batcher.cancel(ra)
    assert batcher.run() == {}


def test_driver_timeout_cancels(engine):
    """submit_and_wait(timeout=...) frees the slot instead of decoding
    to max_tokens for a departed caller, and drops the orphan result."""
    import time

    from rwkv_lm_ext_tpu.infer.continuous import BatcherDriver

    sp = SamplingParams(temperature=0.0, token_stop=())
    batcher = ContinuousBatcher(engine, n_slots=1, sampling=sp)
    batcher.warmup()
    driver = BatcherDriver(batcher)
    try:
        with pytest.raises(TimeoutError):
            driver.submit_and_wait([5, 9, 23], max_tokens=200_000,
                                   timeout=0.3)
        deadline = time.time() + 30
        while batcher.busy and time.time() < deadline:
            time.sleep(0.05)
        assert not batcher.busy, "cancelled request still occupies a slot"
        # pool still serves, and the abandoned result didn't leak
        want = engine.generate([77, 3], max_tokens=3, sampling=sp)
        assert driver.submit_and_wait([77, 3], max_tokens=3) == want
        assert driver._results == {}
        assert driver._abandoned == set()
    finally:
        driver.close()


def test_driver_cancel_event_returns_partial(engine):
    """submit_and_wait(cancel=event): setting the event mid-decode
    returns the partial output instead of blocking to max_tokens."""
    import threading
    import time

    from rwkv_lm_ext_tpu.infer.continuous import BatcherDriver

    sp = SamplingParams(temperature=0.0, token_stop=())
    batcher = ContinuousBatcher(engine, n_slots=1, sampling=sp)
    batcher.warmup()
    driver = BatcherDriver(batcher)
    try:
        ev = threading.Event()
        threading.Timer(0.4, ev.set).start()
        t0 = time.time()
        out = driver.submit_and_wait([5, 9, 23], max_tokens=200_000,
                                     cancel=ev)
        assert time.time() - t0 < 30
        assert 1 <= len(out) < 200_000
        deadline = time.time() + 30
        while batcher.busy and time.time() < deadline:
            time.sleep(0.05)
        assert not batcher.busy
    finally:
        driver.close()


def test_sse_disconnect_aborts_engine_generation(engine):
    """Closing the SSE iterator (client disconnect) aborts the engine
    backend's decode loop — the serving lock frees long before the
    departed request's max_tokens."""
    import time

    from rwkv_lm_ext_tpu.serve.api import ServingService

    class CharTok:
        def encode(self, s):
            return [ord(c) % 180 + 10 for c in s]

        def decode(self, ids):
            return "".join(chr((i - 10) % 180 + 40) for i in ids)

        def streaming_decoder(self):
            outer = self

            class _D:
                def push(self, t):
                    return outer.decode([t])

                def flush(self):
                    return ""

            return _D()

    engine.tokenizer = CharTok()
    try:
        svc = ServingService(engine=engine, tokenizer=engine.tokenizer)
        it = svc.generate_sse({
            "prompt": "ab", "max_tokens": 200_000,
            "temperature": 0.0, "token_stop": [],
        })
        assert next(it).startswith(b"data:")
        it.close()  # transport gone
        t0 = time.time()
        out = svc.generate("ab", max_tokens=2, temperature=0.0,
                           token_stop=[])
        assert out["backend"] == "engine"
        assert time.time() - t0 < 60, "aborted stream still holds the lock"
        st = svc.stats()
        assert st["generate_latency_ms"]["engine"]["count"] >= 1
    finally:
        engine.tokenizer = None
