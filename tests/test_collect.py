"""models.collect: per-position state collection for speculative rollback."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params, rwkv_forward
from rwkv_lm_ext_tpu.models.collect import rwkv_forward_collect, select_state

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("version", [6.0, 5.2])
def test_collect_states_match_prefix_forward(version):
    """states[j] must equal rwkv_forward's state after tokens[:, :j+1],
    and logits must match the plain forward."""
    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=100, head_size=16,
        dtype="float32", param_dtype="float32", version=version,
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 7), 0, 100)
    logits_ref, _ = rwkv_forward(params, cfg, toks, wkv_backend="reference")
    logits_c, states = rwkv_forward_collect(params, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(logits_c), np.asarray(logits_ref), rtol=2e-5, atol=2e-5
    )
    for j in [0, 3, 6]:
        _, st_ref = rwkv_forward(
            params, cfg, toks[:, : j + 1], wkv_backend="reference"
        )
        st_j = select_state(states, j)
        for k in ("att_shift", "wkv", "ffn_shift"):
            np.testing.assert_allclose(
                np.asarray(st_j[k]), np.asarray(st_ref[k]),
                rtol=2e-5, atol=2e-5, err_msg=f"{k} at j={j}",
            )


def test_collect_from_nonzero_state():
    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=100, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    warm = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 100)
    _, st0 = rwkv_forward(params, cfg, warm, wkv_backend="reference")
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, 100)
    _, states = rwkv_forward_collect(params, cfg, toks, st0)
    _, st_ref = rwkv_forward(
        params, cfg, jnp.concatenate([warm, toks], 1),
        wkv_backend="reference",
    )
    st_last = select_state(states, 3)
    for k in ("att_shift", "wkv", "ffn_shift"):
        np.testing.assert_allclose(
            np.asarray(st_last[k]), np.asarray(st_ref[k]),
            rtol=2e-5, atol=2e-5, err_msg=k,
        )
