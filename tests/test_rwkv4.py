"""RWKV-4 model family: forward vs an independent numpy golden, state
chaining, checkpoint round-trip with arch sniffing, and generation
through the shared engine (models/rwkv4.py; the reference serves v4 via
the `rwkv` pip package + cuda/operators.cu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.rwkv4 import init_v4_state, rwkv4_forward

CFG = ModelConfig(
    n_layer=2, n_embd=32, vocab_size=100, head_size=32, dim_ffn=128,
    dtype="float32", param_dtype="float32", version=4.0,
)


def _v4_params(key, cfg):
    C, F, V = cfg.n_embd, cfg.dim_ffn, cfg.vocab_size
    ks = iter(jax.random.split(key, 64))
    n = lambda *s: 0.3 * jax.random.normal(next(ks), s, jnp.float32)
    u = lambda *s: jax.random.uniform(next(ks), s, jnp.float32)

    def ln():
        return {"scale": 1.0 + 0.1 * n(C), "bias": 0.1 * n(C)}

    def block(i):
        b = {
            "ln1": ln(), "ln2": ln(),
            "att": {
                "time_mix_k": u(C), "time_mix_v": u(C), "time_mix_r": u(C),
                "time_decay": n(C), "time_first": n(C),
                "receptance": n(C, C), "key": n(C, C), "value": n(C, C),
                "output": n(C, C),
            },
            "ffn": {
                "time_mix_k": u(C), "time_mix_r": u(C),
                "key": n(C, F), "receptance": n(C, C), "value": n(F, C),
            },
        }
        if i == 0:
            b["ln0"] = ln()
        return b

    return {
        "emb": n(V, C),
        "blocks": [block(i) for i in range(cfg.n_layer)],
        "ln_out": ln(),
        "head": n(C, V),
    }


def _np_ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * np.asarray(
        p["scale"]) + np.asarray(p["bias"])


def _np_forward(params, cfg, tokens):
    """Independent sequential golden: per-token python loop, per-channel
    aa/bb/pp recurrence (the operators.cu math, written from scratch)."""
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    B, T = tokens.shape
    C = cfg.n_embd
    L = cfg.n_layer
    st = {
        "ax": np.zeros((L, B, C)), "aa": np.zeros((L, B, C)),
        "bb": np.zeros((L, B, C)), "pp": np.full((L, B, C), -1e38),
        "fx": np.zeros((L, B, C)),
    }
    logits = np.zeros((B, T, cfg.vocab_size))
    emb = np.asarray(params["emb"], np.float64)
    for t in range(T):
        x = emb[np.asarray(tokens)[:, t]]
        for i, bp in enumerate(params["blocks"]):
            if i == 0:
                x = _np_ln(x, bp["ln0"])
            a = bp["att"]
            xa = _np_ln(x, bp["ln1"])
            mk, mv, mr = (np.asarray(a[f"time_mix_{s}"]) for s in "kvr")
            xk = xa * mk + st["ax"][i] * (1 - mk)
            xv = xa * mv + st["ax"][i] * (1 - mv)
            xr = xa * mr + st["ax"][i] * (1 - mr)
            st["ax"][i] = xa
            r = sig(xr @ np.asarray(a["receptance"]))
            k = xk @ np.asarray(a["key"])
            v = xv @ np.asarray(a["value"])
            w = -np.exp(np.asarray(a["time_decay"], np.float64))
            uu = np.asarray(a["time_first"], np.float64)
            aa, bb, pp = st["aa"][i], st["bb"][i], st["pp"][i]
            ww = uu + k
            p = np.maximum(pp, ww)
            e1, e2 = np.exp(pp - p), np.exp(ww - p)
            y = (e1 * aa + e2 * v) / (e1 * bb + e2)
            ww = pp + w
            p = np.maximum(ww, k)
            e1, e2 = np.exp(ww - p), np.exp(k - p)
            st["aa"][i] = e1 * aa + e2 * v
            st["bb"][i] = e1 * bb + e2
            st["pp"][i] = p
            x = x + (r * y) @ np.asarray(a["output"])
            f = bp["ffn"]
            xf = _np_ln(x, bp["ln2"])
            mk, mr = np.asarray(f["time_mix_k"]), np.asarray(f["time_mix_r"])
            xk = xf * mk + st["fx"][i] * (1 - mk)
            xr = xf * mr + st["fx"][i] * (1 - mr)
            st["fx"][i] = xf
            kk = np.square(np.maximum(xk @ np.asarray(f["key"]), 0.0))
            x = x + sig(xr @ np.asarray(f["receptance"])) * (
                kk @ np.asarray(f["value"])
            )
        logits[:, t] = _np_ln(x, params["ln_out"]) @ np.asarray(params["head"])
    return logits


@pytest.fixture(scope="module")
def params():
    return _v4_params(jax.random.PRNGKey(0), CFG)


def test_v4_forward_matches_numpy_golden(params):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 100)
    got, _ = rwkv4_forward(params, CFG, tokens)
    want = _np_forward(params, CFG, tokens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_v4_dispatch_and_state_chaining(params):
    """rwkv_forward dispatches on version<5; chunked prefill chains the
    aa/bb/pp state exactly."""
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 100)
    full, s_full = rwkv_forward(params, CFG, tokens)
    l1, s = rwkv_forward(params, CFG, tokens[:, :3])
    l2, s = rwkv_forward(params, CFG, tokens[:, 3:], s)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([l1, l2], 1)), np.asarray(full),
        rtol=1e-5, atol=1e-5,
    )
    for k in s_full:
        np.testing.assert_allclose(
            np.asarray(s[k]), np.asarray(s_full[k]), rtol=1e-5, atol=1e-5
        )


def test_v4_checkpoint_roundtrip_and_sniffing(params, tmp_path):
    from rwkv_lm_ext_tpu.checkpoint import load_rwkv_checkpoint
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    path = str(tmp_path / "v4.pth")
    save_torch_pth(path, params_to_state_dict(params, CFG))
    loaded, cfg = load_rwkv_checkpoint(
        path, dtype="float32", param_dtype="float32"
    )
    assert cfg.version == 4.0
    assert "ln_x" not in loaded["blocks"][0]["att"]
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, 100)
    a, _ = rwkv4_forward(params, CFG, tokens)
    b, _ = rwkv_forward(loaded, cfg, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_v4_generation_through_engine(params):
    """The shared GenerationEngine serves v4: greedy decode equals a
    manual argmax loop over rwkv4_forward."""
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    eng = GenerationEngine(params, CFG, chunk_len=4)
    sp = SamplingParams(temperature=0.0, alpha_presence=0.0,
                        alpha_frequency=0.0, token_stop=())
    out = eng.generate([5, 9, 23], max_tokens=5, sampling=sp)

    logits, st = rwkv4_forward(params, CFG, jnp.asarray([[5, 9, 23]]))
    cur = int(jnp.argmax(logits[0, -1]))
    want = []
    for _ in range(5):
        want.append(cur)
        logits, st = rwkv4_forward(params, CFG, jnp.asarray([[cur]]), st)
        cur = int(jnp.argmax(logits[0, -1]))
    assert out == want


def test_v4_continuous_batching(params):
    """The slot-pool batcher serves v4 (state scatter works on the
    aa/bb/pp layout): outputs match standalone greedy generation."""
    from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

    sp = SamplingParams(temperature=0.0, alpha_presence=0.0,
                        alpha_frequency=0.0, token_stop=())
    eng = GenerationEngine(params, CFG)
    prompts = [[5, 9, 23], [77, 3]]
    expected = [eng.generate(p, max_tokens=4, sampling=sp) for p in prompts]
    batcher = ContinuousBatcher(eng, n_slots=2, sampling=sp)
    rids = [batcher.submit(p, max_tokens=4) for p in prompts]
    results = batcher.run()
    for rid, want in zip(rids, expected):
        assert results[rid] == want
