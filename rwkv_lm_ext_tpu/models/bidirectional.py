"""Bidirectional RWKV blocks + encoder-family forwards.

Covers the reference's three bidirectional mechanisms with mode flags
instead of monkey-patching / file duplication:

- "average": full time-mix run on x and on the (valid-prefix-)reversed x,
  outputs averaged — the train-time monkey-patch bi_att_forward
  (src/model_ext.py:421-455) and the batch encoder runtime
  (src/model_encoder_run.py BiRWKV_Tmix_x060).
- "fused": shared projections, causal WKV pass + reverse WKV pass without
  the u bonus summed — the wkv6_bi CUDA kernel semantics
  (cuda/wkv6_bi_cuda.cu:23-111, streaming src/model_run_bi.py:305-330).

Encoder families built on these blocks:
- encoder_forward           (RwkvEncoder, src/model_ext.py:457-650)
- mae_forward + one-layer decoder (RwkvMAEForSequenceEmbedding +
  OneLayerDecoder/RWKV_Tmix_x060_Aggressive, src/model_ext.py:304-397,
  743-1040, incl. DupMAE bag-of-words logits)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.config import EMB_ID, MASK_ID, PAD_ID
from rwkv_lm_ext_tpu.models.rwkv import (
    channel_mix,
    layer_norm,
    tmix_v6_output,
    tmix_v6_projections,
    time_mix_v6,
)
from rwkv_lm_ext_tpu.ops import wkv6_bi
from rwkv_lm_ext_tpu.ops.wkv import _flip_valid_prefix


def sequence_lengths(
    tokens: jax.Array, *, pad_id: int = PAD_ID, emb_id: Optional[int] = EMB_ID
) -> jax.Array:
    """Reversed-prefix length per row: count of tokens that are neither pad
    nor emb — exactly the reference's create_mask + reverse_x_idx semantics
    (src/model_encoder_run.py:7-26: the emb terminator is excluded from the
    bidirectional flip)."""
    valid = tokens != pad_id
    if emb_id is not None:
        valid &= tokens != emb_id
    return jnp.sum(valid.astype(jnp.int32), axis=1)


def bi_time_mix(
    p: Dict,
    cfg,
    x: jax.Array,
    lengths: Optional[jax.Array],
    *,
    mode: str = "average",
    wkv_backend: str = "auto",
    chunk_size: int = 32,
) -> jax.Array:
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    zero_shift = jnp.zeros((B, C), jnp.float32)
    zero_wkv = jnp.zeros((B, H, N, N), jnp.float32)
    if mode == "average":
        # two full WKV passes (forward + valid-prefix-reversed), RAW outputs
        # averaged, then GroupNorm+gate applied ONCE with the forward gate —
        # exactly bi_att_forward_batch (src/model_encoder_run.py:64-75)
        from rwkv_lm_ext_tpu.ops import wkv

        def run_pass(xi):
            r, k, v, g, w = tmix_v6_projections(p, cfg, xi, zero_shift)
            y, _ = wkv(
                r.reshape(B, T, H, N),
                k.reshape(B, T, H, N),
                v.reshape(B, T, H, N),
                w.reshape(B, T, H, N),
                p["time_faaaa"],
                None,
                backend=wkv_backend,
                chunk_size=max(chunk_size, getattr(cfg, "fused_chunk", 0)),
                exact=getattr(cfg, "wkv_exact", True),
            )
            return y.reshape(B, T, C), g

        y_fwd, g_fwd = run_pass(x)
        if lengths is None:
            xr = jnp.flip(x, axis=1)
        else:
            xr = _flip_valid_prefix(x, lengths)
        y_rev, _ = run_pass(xr)
        if lengths is None:
            y_rev = jnp.flip(y_rev, axis=1)
        else:
            y_rev = _flip_valid_prefix(y_rev, lengths)
        y = (y_fwd + y_rev) / 2
        return tmix_v6_output(p, cfg, y.astype(x.dtype), g_fwd)
    if mode == "fused":
        r, k, v, g, w = tmix_v6_projections(p, cfg, x, zero_shift)
        y = wkv6_bi(
            r.reshape(B, T, H, N),
            k.reshape(B, T, H, N),
            v.reshape(B, T, H, N),
            w.reshape(B, T, H, N),
            p["time_faaaa"],
            lengths,
            backend=wkv_backend,
            chunk_size=max(chunk_size, getattr(cfg, "fused_chunk", 0)),
            exact=getattr(cfg, "wkv_exact", True),
        )
        return tmix_v6_output(p, cfg, y.reshape(B, T, C), g)
    raise ValueError(f"unknown bi mode {mode!r}")


def bi_block_forward(
    p: Dict,
    cfg,
    x: jax.Array,
    lengths: Optional[jax.Array],
    *,
    layer_id: int,
    mode: str = "average",
    wkv_backend: str = "auto",
    chunk_size: int = 32,
) -> jax.Array:
    """Bidirectional residual block (bi_block_forward,
    src/model_ext.py:439-455): att is bidirectional, ffn stays causal."""
    if layer_id == 0 and "ln0" in p:
        x = layer_norm(x, p["ln0"])
    x = x + bi_time_mix(
        p["att"], cfg, layer_norm(x, p["ln1"]), lengths,
        mode=mode, wkv_backend=wkv_backend, chunk_size=chunk_size,
    )
    B, C = x.shape[0], x.shape[2]
    ffn_out, _ = channel_mix(
        p["ffn"], cfg, layer_norm(x, p["ln2"]),
        jnp.zeros((B, C), jnp.float32), v6=cfg.version >= 6,
    )
    return x + ffn_out


def encoder_forward(
    params: Dict,
    cfg,
    tokens: jax.Array,
    *,
    mode: str = "average",
    pad_id: int = PAD_ID,
    emb_id: int = EMB_ID,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    remat: bool = False,
) -> jax.Array:
    """Bidirectional encoder: emb -> bi blocks -> ln_out. Returns hidden
    (B,T,C). Valid prefix per row ends at the first pad; pad and mask
    tokens are zeroed out of the reverse scan exactly as create_mask does
    (src/model_ext.py:398-417)."""
    dt = cfg.compute_dtype
    lengths = sequence_lengths(tokens, pad_id=pad_id, emb_id=emb_id)
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)

    def run(bp, x, layer_id):
        return bi_block_forward(
            bp, cfg, x, lengths,
            layer_id=layer_id, mode=mode,
            wkv_backend=wkv_backend, chunk_size=chunk_size,
        )

    for i, bp in enumerate(params["blocks"]):
        if remat:
            from rwkv_lm_ext_tpu.utils.remat import remat_wrap

            x = remat_wrap(run, remat, static_argnums=(2,))(bp, x, i)
        else:
            x = run(bp, x, i)
    return layer_norm(x, params["ln_out"])


def encode_sentence(
    params: Dict, cfg, tokens: jax.Array, *, mode: str = "average",
    emb_id: int = EMB_ID, **kw
) -> jax.Array:
    """Sentence embedding = hidden state at the emb_id position
    (RwkvEncoder.encode_sentence, src/model_encoder_run.py:303-307)."""
    hidden = encoder_forward(params, cfg, tokens, mode=mode, **kw)
    pos = jnp.argmax((tokens == emb_id).astype(jnp.int32), axis=-1)
    return jnp.take_along_axis(
        hidden, pos[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]


def aggressive_decoder_time_mix(
    p: Dict, cfg, x: jax.Array, x1: jax.Array,
    *, wkv_backend: str = "auto", chunk_size: int = 32,
) -> jax.Array:
    """RWKV_Tmix_x060_Aggressive (src/model_ext.py:304-356): r/g/w from the
    seq-embedding stream x, k/v from the decoder token stream x1."""
    from rwkv_lm_ext_tpu.ops import wkv

    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    zero = jnp.zeros((B, C), jnp.float32)
    r, _, _, g, w = tmix_v6_projections(p, cfg, x, zero)
    _, k, v, _, _ = tmix_v6_projections(p, cfg, x1, zero)
    y, _ = wkv(
        r.reshape(B, T, H, N),
        k.reshape(B, T, H, N),
        v.reshape(B, T, H, N),
        w.reshape(B, T, H, N),
        p["time_faaaa"],
        None,
        backend=wkv_backend,
        chunk_size=chunk_size,
    )
    return tmix_v6_output(p, cfg, y.reshape(B, T, C).astype(x.dtype), g)


def one_layer_decoder_forward(
    dec_params: Dict,
    cfg,
    seq_emb: jax.Array,
    decoder_ids: jax.Array,
    emb: jax.Array,
    *,
    wkv_backend: str = "auto",
) -> jax.Array:
    """OneLayerDecoder (src/model_ext.py:358-397): the sequence embedding
    broadcast over T is the query stream, decoder tokens the key/value
    stream; one block; own head. Returns (B,T,V) logits."""
    B, T = decoder_ids.shape
    dt = cfg.compute_dtype
    x = jnp.broadcast_to(seq_emb[:, None, :], (B, T, seq_emb.shape[-1])).astype(dt)
    x1 = jnp.take(emb, decoder_ids, axis=0).astype(dt)
    xa = layer_norm(x, dec_params["ln1"])
    x1a = layer_norm(x1, dec_params["ln1"])
    x = x + aggressive_decoder_time_mix(
        dec_params["att"], cfg, xa, x1a, wkv_backend=wkv_backend
    )
    ffn_out, _ = channel_mix(
        dec_params["ffn"], cfg, layer_norm(x, dec_params["ln2"]),
        jnp.zeros((B, x.shape[-1]), jnp.float32),
    )
    x = x + ffn_out
    x = layer_norm(x, dec_params["ln_out"])
    return x.astype(jnp.float32) @ dec_params["head"].astype(jnp.float32)


def mae_forward(
    params: Dict,
    cfg,
    encoder_ids: jax.Array,
    decoder_ids: Optional[jax.Array] = None,
    *,
    bidirectional: bool = True,
    mode: str = "average",
    emb_id: int = EMB_ID,
    wkv_backend: str = "auto",
    remat: bool = False,
) -> Dict[str, jax.Array]:
    """RetroMAE forward (RwkvMAEForSequenceEmbedding,
    src/model_ext.py:878-933): encoder hidden -> seq_emb at emb_id; the
    unidirectional variant adds seq_emb back onto token states before the
    tied MLM head; optional one-layer decoder over the bottleneck."""
    dt = cfg.compute_dtype
    if bidirectional:
        hidden = encoder_forward(
            params, cfg, encoder_ids, mode=mode,
            wkv_backend=wkv_backend, remat=remat,
        )
    else:
        from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

        hidden, _ = rwkv_forward(
            params, cfg, encoder_ids, wkv_backend=wkv_backend,
            remat=remat, return_hidden=True, return_logits=False,
        )
    pos = jnp.argmax((encoder_ids == emb_id).astype(jnp.int32), axis=-1)
    seq_emb = jnp.take_along_axis(
        hidden, pos[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    x = hidden
    if not bidirectional:
        x = x + seq_emb[:, None, :]  # (uni only, src/model_ext.py:907-908)
    enc_logits = x.astype(jnp.float32) @ params["emb"].astype(jnp.float32).T
    out = {"seq_emb": seq_emb, "encoder_logits": enc_logits}
    if decoder_ids is not None and "onelayer_decoder" in params:
        out["decoder_logits"] = one_layer_decoder_forward(
            params["onelayer_decoder"], cfg, seq_emb, decoder_ids,
            params["emb"], wkv_backend=wkv_backend,
        )
        # DupMAE bag-of-words logits: max-pool token logits over T
        # (ot_embedding, src/model_ext.py:868-876)
        out["ot_logits"] = jnp.max(out["decoder_logits"], axis=1)
    return out


def dupmae_bow_loss(
    ot_logits: jax.Array, bag_word_weight: jax.Array
) -> jax.Array:
    """decoder_ot_loss (src/model_ext.py:950-966): cross entropy between
    the max-pooled vocab logits and the document's bag-of-words dist."""
    logp = jax.nn.log_softmax(ot_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(bag_word_weight * logp, axis=-1))


def init_one_layer_decoder(key: jax.Array, cfg) -> Dict:
    """Parameters for OneLayerDecoder (att/ffn of layer 0 + head)."""
    from rwkv_lm_ext_tpu.models.init import (
        _att_params_v6,
        _ffn_params,
        _ln,
        _orthogonal,
    )

    dtype = cfg.params_dtype
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": _ln(cfg.n_embd, dtype),
        "ln2": _ln(cfg.n_embd, dtype),
        "ln_out": _ln(cfg.n_embd, dtype),
        "att": _att_params_v6(k1, cfg, 0, dtype),
        "ffn": _ffn_params(k2, cfg, 0, dtype),
        "head": _orthogonal(k3, cfg.n_embd, cfg.vocab_size, 0.5, dtype),
    }


# ---------------------------------------------------------------------------
# Streaming bidirectional runtime (the reference's third bi variant):
# src/model_run.py:649-689 bi_att_forward + the 5-slot state layout of
# :727-758. Per chunk: k/v/w are reversed WITHIN the chunk (last token kept
# in place on the final chunk), r and the gate are shared between passes,
# each pass is GroupNorm+gated separately, outputs SUMMED; forward and
# "reverse" WKV states both stream across chunks. The reverse context is
# chunk-local by construction — that is the reference's approximation for
# O(chunk) bidirectional encoding of long documents.
# ---------------------------------------------------------------------------


def init_bi_streaming_state(cfg, batch_size: int):
    """5-slot per-layer state (att_shift, wkv, wkv_rev, ffn_shift); WKV
    slots use the canonical tile-packed layout (models/state.py)."""
    from rwkv_lm_ext_tpu.models.state import wkv_state_shape

    L, B, C = cfg.n_layer, batch_size, cfg.n_embd
    H, N = cfg.n_head, cfg.head_size
    z = lambda s: jnp.zeros(s, jnp.float32)
    trail = wkv_state_shape(H, N)
    return {
        "att_shift": z((L, B, C)),
        "wkv": z((L, B) + trail),
        "wkv_rev": z((L, B) + trail),
        "ffn_shift": z((L, B, C)),
    }


def _chunk_reverse(x: jax.Array, is_last_chunk: bool) -> jax.Array:
    """Flip the time axis; on the last chunk the final token (the emb slot)
    stays in place (src/model_run.py:667-674)."""
    if not is_last_chunk:
        return jnp.flip(x, axis=1)
    body = jnp.flip(x[:, :-1], axis=1)
    return jnp.concatenate([body, x[:, -1:]], axis=1)


def bi_streaming_time_mix(
    p, cfg, x, att_shift, wkv_state, wkv_state_rev, *,
    is_last_chunk: bool, wkv_backend: str = "auto", chunk_size: int = 32,
):
    from rwkv_lm_ext_tpu.ops import wkv
    from rwkv_lm_ext_tpu.models.state import unpack_wkv

    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    wkv_state = unpack_wkv(wkv_state, N)
    wkv_state_rev = unpack_wkv(wkv_state_rev, N)
    r, k, v, g, w = tmix_v6_projections(p, cfg, x, att_shift)
    r4 = r.reshape(B, T, H, N)

    def run(kk, vv, ww, s0):
        y, s = wkv(
            r4, kk.reshape(B, T, H, N), vv.reshape(B, T, H, N),
            ww.reshape(B, T, H, N), p["time_faaaa"], s0,
            backend=wkv_backend, chunk_size=chunk_size,
        )
        return y.reshape(B, T, C), s

    y_fwd, s_new = run(k, v, w, wkv_state)
    k_r = _chunk_reverse(k, is_last_chunk)
    v_r = _chunk_reverse(v, is_last_chunk)
    w_r = _chunk_reverse(w, is_last_chunk)
    y_rev, s_rev_new = run(k_r, v_r, w_r, wkv_state_rev)

    out = tmix_v6_output(p, cfg, y_fwd.astype(x.dtype), g)
    out_rev = tmix_v6_output(p, cfg, y_rev.astype(x.dtype), g)
    out = out + _chunk_reverse(out_rev, is_last_chunk)
    from rwkv_lm_ext_tpu.models.state import pack_wkv

    return (
        out, x[:, -1].astype(jnp.float32), pack_wkv(s_new), pack_wkv(s_rev_new)
    )


def bi_streaming_forward(
    params, cfg, tokens, state=None, *, is_last_chunk: bool = True,
    wkv_backend: str = "auto", chunk_size: int = 32,
):
    """One chunk of the streaming bidirectional encoder; thread `state`
    across chunks and set is_last_chunk on the final one. Returns
    (hidden (B,T,C), new_state)."""
    B, T = tokens.shape
    dt = cfg.compute_dtype
    if state is None:
        state = init_bi_streaming_state(cfg, B)
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)
    att_s, wkv_s, wkv_r, ffn_s = [], [], [], []
    for i, bp in enumerate(params["blocks"]):
        if i == 0 and "ln0" in bp:
            x = layer_norm(x, bp["ln0"])
        att_out, a_s, s_new, s_rev = bi_streaming_time_mix(
            bp["att"], cfg, layer_norm(x, bp["ln1"]),
            state["att_shift"][i], state["wkv"][i], state["wkv_rev"][i],
            is_last_chunk=is_last_chunk,
            wkv_backend=wkv_backend, chunk_size=chunk_size,
        )
        x = x + att_out
        ffn_out, f_s = channel_mix(
            bp["ffn"], cfg, layer_norm(x, bp["ln2"]),
            state["ffn_shift"][i], v6=cfg.version >= 6,
        )
        x = x + ffn_out
        att_s.append(a_s); wkv_s.append(s_new)
        wkv_r.append(s_rev); ffn_s.append(f_s)
    new_state = {
        "att_shift": jnp.stack(att_s),
        "wkv": jnp.stack(wkv_s),
        "wkv_rev": jnp.stack(wkv_r),
        "ffn_shift": jnp.stack(ffn_s),
    }
    return layer_norm(x, params["ln_out"]), new_state


def embed_mae_streaming(
    params, cfg, tokens, *, chunk_ctx: int, emb_id: int = EMB_ID,
    wkv_backend: str = "auto",
):
    """Chunked bidirectional embedding of long inputs with O(chunk)
    memory (the RwkvMAEForSequenceEmbedding streaming path,
    src/model_run.py:727-758): runs bi_streaming_forward chunk by chunk
    and returns the hidden state at the emb_id position."""
    B, T = tokens.shape
    pad = (-T) % chunk_ctx
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad)))
    state = None
    pieces = []
    total = T + pad
    for s in range(0, total, chunk_ctx):
        last = s + chunk_ctx >= total
        h, state = bi_streaming_forward(
            params, cfg, tokens[:, s : s + chunk_ctx], state,
            is_last_chunk=last, wkv_backend=wkv_backend,
        )
        pieces.append(h)
    hidden = jnp.concatenate(pieces, axis=1)[:, :T]
    pos = jnp.argmax((tokens[:, :T] == emb_id).astype(jnp.int32), axis=-1)
    return jnp.take_along_axis(
        hidden, pos[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
