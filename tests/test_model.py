"""Model forward: one implementation must serve train/prefill/decode.

Checks that full-sequence forward == chunked-prefill forward == token-by-
token decode (the property the reference needs five model files to get,
src/model.py vs model_run.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models import init_model_state, init_rwkv_params, rwkv_forward

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG6 = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)
CFG5 = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16, version=5.2,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def params6():
    return init_rwkv_params(jax.random.PRNGKey(0), CFG6)


@pytest.fixture(scope="module")
def tokens():
    return jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 100)


def test_full_vs_chunked_prefill(params6, tokens):
    logits_full, state_full = rwkv_forward(
        params6, CFG6, tokens, wkv_backend="chunked", chunk_size=8
    )
    s = init_model_state(CFG6, 2)
    l1, s = rwkv_forward(
        params6, CFG6, tokens[:, :10], s, wkv_backend="chunked", chunk_size=8
    )
    l2, s = rwkv_forward(
        params6, CFG6, tokens[:, 10:], s, wkv_backend="chunked", chunk_size=8
    )
    np.testing.assert_allclose(
        jnp.concatenate([l1, l2], 1), logits_full, rtol=2e-4, atol=2e-4
    )
    for k in state_full:
        np.testing.assert_allclose(s[k], state_full[k], rtol=2e-4, atol=2e-4)


def test_decode_loop_matches_full(params6, tokens):
    logits_full, _ = rwkv_forward(
        params6, CFG6, tokens, wkv_backend="reference"
    )
    s = init_model_state(CFG6, 2)
    step = jax.jit(
        lambda tok, s: rwkv_forward(
            params6, CFG6, tok, s, wkv_backend="reference"
        )
    )
    outs = []
    for t in range(tokens.shape[1]):
        l, s = step(tokens[:, t : t + 1], s)
        outs.append(l)
    np.testing.assert_allclose(
        jnp.concatenate(outs, 1), logits_full, rtol=2e-4, atol=2e-4
    )


def test_packed_decode_loop_matches_full(params6, tokens):
    """T=1 decode via the default packed-state XLA step (backend 'chunked'
    routes T=1 to wkv6_decode_step_packed) == full reference forward."""
    logits_full, _ = rwkv_forward(
        params6, CFG6, tokens, wkv_backend="reference"
    )
    s = init_model_state(CFG6, 2)
    step = jax.jit(
        lambda tok, s: rwkv_forward(
            params6, CFG6, tok, s, wkv_backend="chunked"
        )
    )
    outs = []
    for t in range(tokens.shape[1]):
        l, s = step(tokens[:, t : t + 1], s)
        outs.append(l)
    np.testing.assert_allclose(
        jnp.concatenate(outs, 1), logits_full, rtol=2e-4, atol=2e-4
    )


def test_unstacked_state_decode_matches_stacked(params6, tokens):
    """Decode threading the unstacked per-layer state (the fast carry
    form for decode scans) == the stacked-dict state contract."""
    from rwkv_lm_ext_tpu.models.state import restack_state, unstack_state

    s = init_model_state(CFG6, 2)
    su = unstack_state(s)
    outs_s, outs_u = [], []
    for t in range(6):
        ls, s = rwkv_forward(params6, CFG6, tokens[:, t : t + 1], s)
        lu, su = rwkv_forward(params6, CFG6, tokens[:, t : t + 1], su)
        outs_s.append(ls)
        outs_u.append(lu)
    np.testing.assert_allclose(
        jnp.concatenate(outs_u, 1), jnp.concatenate(outs_s, 1),
        rtol=1e-5, atol=1e-5,
    )
    rs = restack_state(su)
    for k in s:
        np.testing.assert_allclose(rs[k], s[k], atol=1e-6)


def test_backends_agree_on_model(params6, tokens):
    l_ref, _ = rwkv_forward(params6, CFG6, tokens, wkv_backend="reference")
    l_chk, _ = rwkv_forward(params6, CFG6, tokens, wkv_backend="chunked")
    np.testing.assert_allclose(l_ref, l_chk, rtol=2e-4, atol=2e-4)


def test_remat_matches(params6, tokens):
    l_a, _ = rwkv_forward(params6, CFG6, tokens, wkv_backend="chunked")
    l_b, _ = rwkv_forward(
        params6, CFG6, tokens, wkv_backend="chunked", remat=True
    )
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5, atol=1e-5)


def test_v5_forward_runs_and_streams():
    params = init_rwkv_params(jax.random.PRNGKey(2), CFG5)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 100)
    lf, sf = rwkv_forward(params, CFG5, tokens, wkv_backend="reference")
    s = init_model_state(CFG5, 2)
    l1, s = rwkv_forward(params, CFG5, tokens[:, :7], s, wkv_backend="reference")
    l2, s = rwkv_forward(params, CFG5, tokens[:, 7:], s, wkv_backend="reference")
    np.testing.assert_allclose(
        jnp.concatenate([l1, l2], 1), lf, rtol=2e-4, atol=2e-4
    )
    assert lf.shape == (2, 16, 100)


def test_state_tuning_param_used():
    params = init_rwkv_params(jax.random.PRNGKey(4), CFG6, with_state_params=True)
    # the reference init zeroes att.output (residual branches start dead,
    # src/model.py:1321-1327) — give them weight so state changes reach logits
    for b in params["blocks"]:
        b["att"]["output"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(8), b["att"]["output"].shape
        )
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, 100)
    l0, _ = rwkv_forward(params, CFG6, tokens, use_state_params=True)
    # perturb one block's time_state -> logits must change
    params["blocks"][1]["att"]["time_state"] = (
        params["blocks"][1]["att"]["time_state"] + 1.0
    )
    l1, _ = rwkv_forward(params, CFG6, tokens, use_state_params=True)
    assert not np.allclose(l0, l1)
    # and without use_state_params it is ignored
    l2, _ = rwkv_forward(params, CFG6, tokens)
    l3, _ = rwkv_forward(params, CFG6, tokens)
    np.testing.assert_allclose(l2, l3)


def test_grad_flows():
    params = init_rwkv_params(jax.random.PRNGKey(6), CFG6)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (1, 12), 0, 100)

    def loss(p):
        logits, _ = rwkv_forward(p, CFG6, tokens, wkv_backend="chunked", remat=True)
        return jnp.mean(logits**2)

    g = jax.grad(loss)(params)
    gn = jnp.sqrt(
        sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g))
    )
    assert jnp.isfinite(gn) and gn > 0


def test_specialized_decode_step_matches_forward(params6, tokens):
    """models.decode.rwkv_decode_step (T-axis-free decode) == the generic
    rwkv_forward at T=1, logits AND carried state."""
    from rwkv_lm_ext_tpu.models.decode import decode_supported, rwkv_decode_step

    assert decode_supported(CFG6, params6)
    s_a = init_model_state(CFG6, 2)
    s_b = init_model_state(CFG6, 2)
    for t in range(6):
        lg_a, s_a = rwkv_forward(
            params6, CFG6, tokens[:, t : t + 1], s_a, wkv_backend="chunked"
        )
        lg_b, s_b = rwkv_decode_step(params6, CFG6, tokens[:, t], s_b)
        np.testing.assert_allclose(
            lg_b, lg_a[:, 0], rtol=2e-5, atol=2e-5
        )
    for k in s_a:
        np.testing.assert_allclose(s_b[k], s_a[k], rtol=2e-5, atol=2e-5)


def test_runtime_weightedmean_parity():
    """pooling_type="weightedmean_runtime" reproduces the reference
    STREAMING runtime's pooling (src/model_run.py:779-791: actual_len+1
    in mask, weights and divisor) exactly — and differs measurably from
    the training-side pooling (model_ext.py:1708), so serving a
    checkpoint tuned under the reference runtime needs this variant."""
    import numpy as np

    from rwkv_lm_ext_tpu.models.heads import pool_hidden

    rng = np.random.RandomState(0)
    B, T, C = 3, 10, 8
    x = rng.randn(B, T, C).astype(np.float32)
    actual_len = np.array([4, 9, 6], np.int32)

    # literal port of the reference runtime math (torch -> numpy)
    al = actual_len + 1
    mask = (np.arange(T)[None, :] <= al[:, None]).astype(np.float32)
    weights = (np.arange(1, T + 1)[None, :] / al[:, None]).astype(np.float32)
    weights = weights * mask
    ref = (x * weights[..., None]).sum(axis=1) / al[:, None]

    ours = np.asarray(
        pool_hidden(jnp.asarray(x), jnp.asarray(actual_len),
                    "weightedmean_runtime")
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    train_side = np.asarray(
        pool_hidden(jnp.asarray(x), jnp.asarray(actual_len), "weightedmean")
    )
    assert float(np.abs(train_side - ours).max()) > 1e-3
