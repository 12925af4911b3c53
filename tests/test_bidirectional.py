"""Bidirectional encoder family: average/fused modes, MAE, one-layer decoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.models.bidirectional import (

    dupmae_bow_loss,
    encode_sentence,
    encoder_forward,
    init_one_layer_decoder,
    mae_forward,
    sequence_lengths,
)

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=100, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    p = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    keys = jax.random.split(jax.random.PRNGKey(1), len(p["blocks"]))
    for bk, b in zip(keys, p["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(bk, b["att"]["output"].shape)
    return p


def _tokens(B=2, T=12):
    t = jax.random.randint(jax.random.PRNGKey(2), (B, T), 4, 100)
    t = t.at[0, 8].set(1)   # emb_id
    t = t.at[0, 9:].set(0)  # pad after emb
    t = t.at[1, -1].set(1)
    return t


def test_sequence_lengths():
    """Count of non-pad, non-emb tokens (the emb terminator is excluded
    from the bidirectional flip, matching create_mask/reverse_x_idx)."""
    t = _tokens()
    L = sequence_lengths(t)
    assert list(np.asarray(L)) == [8, 11]


@pytest.mark.parametrize("mode", ["average", "fused"])
def test_bidirectional_uses_future_context(params, mode):
    """Changing a FUTURE token (within the valid prefix) must change an
    earlier position's hidden state — impossible for a causal model."""
    t = _tokens()
    h0 = encoder_forward(params, CFG, t, mode=mode)
    t2 = t.at[1, 10].set(50)
    h1 = encoder_forward(params, CFG, t2, mode=mode)
    assert not np.allclose(h0[1, 0], h1[1, 0])
    # but row 0 (unchanged) is identical
    np.testing.assert_allclose(h0[0], h1[0], atol=1e-6)


@pytest.mark.parametrize("mode", ["average", "fused"])
def test_padding_does_not_leak(params, mode):
    """Extra trailing padding must not affect valid positions."""
    t = _tokens()
    h0 = encoder_forward(params, CFG, t, mode=mode)
    t2 = jnp.concatenate(
        [t, jnp.zeros((t.shape[0], 4), t.dtype)], axis=1
    )  # lengthen rows with more pads
    h1 = encoder_forward(params, CFG, t2, mode=mode)
    np.testing.assert_allclose(h0[0, :9], h1[0, :9], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h0[1, :12], h1[1, :12], rtol=1e-4, atol=1e-5)


def test_encode_sentence_position(params):
    t = _tokens()
    emb = encode_sentence(params, CFG, t)
    h = encoder_forward(params, CFG, t)
    np.testing.assert_allclose(emb[0], h[0, 8], atol=1e-6)
    np.testing.assert_allclose(emb[1], h[1, 11], atol=1e-6)


def test_mae_forward_shapes(params):
    p = dict(params)
    p["onelayer_decoder"] = init_one_layer_decoder(jax.random.PRNGKey(3), CFG)
    enc_ids = _tokens()
    dec_ids = _tokens()
    out = mae_forward(p, CFG, enc_ids, dec_ids, bidirectional=True)
    assert out["seq_emb"].shape == (2, 64)
    assert out["encoder_logits"].shape == (2, 12, 100)
    assert out["decoder_logits"].shape == (2, 12, 100)
    assert out["ot_logits"].shape == (2, 100)
    bow = jnp.ones((2, 100)) / 100.0
    loss = dupmae_bow_loss(out["ot_logits"], bow)
    assert jnp.isfinite(loss)


def test_mae_uni_adds_bottleneck(params):
    """Unidirectional MAE adds seq_emb to token states before the MLM head
    (src/model_ext.py:907-908) -> logits differ from plain hidden@emb.T."""
    enc_ids = _tokens()
    out_uni = mae_forward(params, CFG, enc_ids, bidirectional=False)
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

    hidden, _ = rwkv_forward(
        params, CFG, enc_ids, return_hidden=True, return_logits=False
    )
    plain = hidden @ jnp.asarray(params["emb"]).T
    assert not np.allclose(out_uni["encoder_logits"], plain)


def test_bi_streaming_forward(params):
    """Streaming bi runtime: 5-slot state threads across chunks; the
    embedding comes out finite and chunk-local reverse context changes it
    vs the causal hidden."""
    from rwkv_lm_ext_tpu.models.bidirectional import (
        bi_streaming_forward,
        embed_mae_streaming,
        init_bi_streaming_state,
    )
    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

    t = _tokens()
    h, state = bi_streaming_forward(params, CFG, t, is_last_chunk=True)
    assert h.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(h)).all()
    for k, v in state.items():
        assert np.isfinite(np.asarray(v)).all()
    # streaming chunks thread state (different from restarting each chunk)
    s0 = init_bi_streaming_state(CFG, 2)
    h1, s1 = bi_streaming_forward(params, CFG, t[:, :6], s0, is_last_chunk=False)
    h2, _ = bi_streaming_forward(params, CFG, t[:, 6:], s1, is_last_chunk=True)
    h2_fresh, _ = bi_streaming_forward(params, CFG, t[:, 6:], is_last_chunk=True)
    assert not np.allclose(np.asarray(h2), np.asarray(h2_fresh))
    # reverse pass contributes: differs from the causal hidden
    causal, _ = rwkv_forward(params, CFG, t, return_hidden=True, return_logits=False)
    assert not np.allclose(np.asarray(h), np.asarray(causal), atol=1e-3)
    # long-doc streaming embedding
    emb = embed_mae_streaming(params, CFG, t, chunk_ctx=4)
    assert emb.shape == (2, 64) and np.isfinite(np.asarray(emb)).all()


def test_bi_streaming_matches_reference_chunk_loop(params):
    """Strict parity of bi_streaming_forward with an independent golden
    that mirrors the reference's chunked bidirectional prefill
    (src/model_run.py:649-689 bi_att_forward + bi_block_forward) chunk by
    chunk on T = 3 x chunk: forward WKV state chains across chunks, the
    reverse pass runs r UNREVERSED against per-chunk-flipped k/v/w with
    its own chained state, and on the last chunk the final (emb) position
    stays in place through both flips.

    Documented divergence (STATUS.md): the reference's last-chunk output
    flip-back (model_run.py:684-686) re-appends the last row of the
    ALREADY-FLIPPED tensor — duplicating the reverse output of position 0
    and dropping the emb position's — which reads as a slicing bug. Both
    this golden and bi_streaming_forward keep the true final-row output,
    matching the reference's own k/v/w last-chunk construction
    (model_run.py:665-671)."""
    from rwkv_lm_ext_tpu.models.bidirectional import (
        bi_streaming_forward,
        init_bi_streaming_state,
    )
    from rwkv_lm_ext_tpu.models.rwkv import (
        channel_mix,
        layer_norm,
        tmix_v6_output,
        tmix_v6_projections,
    )
    from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_reference

    B, T, CH = 2, 12, 4
    H, N, C = CFG.n_head, CFG.head_size, CFG.n_embd
    tokens = jax.random.randint(jax.random.PRNGKey(5), (B, T), 4, 100)

    def flip_last(x, is_last):  # time-axis flip, emb slot pinned on last
        if not is_last:
            return jnp.flip(x, axis=1)
        return jnp.concatenate(
            [jnp.flip(x[:, :-1], axis=1), x[:, -1:]], axis=1
        )

    # ---- golden: explicit python state threading over 3 chunks ----
    n_layer = CFG.n_layer
    att_shift = [jnp.zeros((B, C), jnp.float32) for _ in range(n_layer)]
    ffn_shift = [jnp.zeros((B, C), jnp.float32) for _ in range(n_layer)]
    s_fwd = [jnp.zeros((B, H, N, N), jnp.float32) for _ in range(n_layer)]
    s_rev = [jnp.zeros((B, H, N, N), jnp.float32) for _ in range(n_layer)]
    golden_chunks = []
    for ci in range(3):
        is_last = ci == 2
        x = jnp.take(
            params["emb"], tokens[:, ci * CH : (ci + 1) * CH], axis=0
        ).astype(CFG.compute_dtype)
        for i, bp in enumerate(params["blocks"]):
            if i == 0 and "ln0" in bp:
                x = layer_norm(x, bp["ln0"])
            xln = layer_norm(x, bp["ln1"])
            r, k, v, g, w = tmix_v6_projections(
                bp["att"], CFG, xln, att_shift[i]
            )
            att_shift[i] = xln[:, -1].astype(jnp.float32)
            sh = lambda a: a.reshape(B, CH, H, N)
            y_f, s_fwd[i] = wkv_reference(
                sh(r), sh(k), sh(v), sh(w), bp["att"]["time_faaaa"], s_fwd[i]
            )
            y_r, s_rev[i] = wkv_reference(
                sh(r),
                sh(flip_last(k, is_last)),
                sh(flip_last(v, is_last)),
                sh(flip_last(w, is_last)),
                bp["att"]["time_faaaa"],
                s_rev[i],
            )
            out = tmix_v6_output(
                bp["att"], CFG, y_f.reshape(B, CH, C).astype(x.dtype), g
            )
            out_r = tmix_v6_output(
                bp["att"], CFG, y_r.reshape(B, CH, C).astype(x.dtype), g
            )
            x = x + out + flip_last(out_r, is_last)
            x2 = layer_norm(x, bp["ln2"])
            f_out, ffn_shift[i] = channel_mix(
                bp["ffn"], CFG, x2, ffn_shift[i], v6=CFG.version >= 6
            )
            x = x + f_out
        golden_chunks.append(layer_norm(x, params["ln_out"]))
    golden = jnp.concatenate(golden_chunks, axis=1)

    # ---- implementation under test, chained over the same chunks ----
    state = init_bi_streaming_state(CFG, B)
    pieces = []
    for ci in range(3):
        h, state = bi_streaming_forward(
            params, CFG, tokens[:, ci * CH : (ci + 1) * CH], state,
            is_last_chunk=(ci == 2), wkv_backend="reference",
        )
        pieces.append(h)
    got = jnp.concatenate(pieces, axis=1)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(golden), rtol=2e-5, atol=2e-5
    )
