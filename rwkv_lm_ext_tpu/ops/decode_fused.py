"""Fused T=1 decode "glue" kernels: the non-GEMM op chains between the
big projections, each collapsed into one Pallas program over (B, C).

STATUS round-2 profiling pinned the residual decode cost (~3.3 ms/step of
10.5 at 1B6 B=64) on FUSION GRANULARITY: the per-layer glue — LayerNorm,
token shift, ddlerp, decay low-rank — lowers to ~15 small XLA ops per
layer whose fixed scheduling costs dominate their trivial math. These
kernels are the first stage of the whole-block decode program (VERDICT r2
item 8): one program per (B-block) computes the entire attention prologue
(ln1 + shift + ddlerp + decay, reference src/model.py:434-459 jit_func +
:440-449 decay) and a second the FFN prologue (ln2 + shift + mix,
src/model.py:577-585), leaving only the MXU GEMMs and the packed WKV step
to XLA.

Unlike ops/ddlerp_pallas.py (which grids over (B, T-blocks) and carries a
shift row across T), decode has T=1: the whole batch is a handful of
8-aligned row blocks and every weight is resident — D=32/Dd=64 low-rank
matmuls included (w1 0.64 MB, w2 0.64 MB at 1B6).

Numerics: fp32 LN/lerp arithmetic with compute-dtype MXU operands and
fp32 accumulation for the ddlerp low-rank, fp32 operands for the decay
low-rank — exactly the dtype discipline of the unfused decode chain, so
fused-vs-unfused parity is bf16-rounding tight (the only delta is the
lerp adds, fp32 here vs compute dtype there).

Backward: decode is inference-only; a recompute-through-jnp custom_vjp
keeps autodiff working for completeness.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bb(B: int, C: int) -> int | None:
    """Largest divisor of B that is 8-row aligned and keeps ~12 fp32
    (BB, C) live values under a conservative VMEM budget."""
    cap = max(8, (6 << 20) // (C * 4 * 12) // 8 * 8)
    for bb in range(min(B, cap), 0, -1):
        if B % bb == 0 and bb % 8 == 0:
            return bb
    return None


# ---------------------------------------------------------------- att prep


def _att_prep_ref(x, shift, ln_scale, ln_bias, maas, w1, w2, dw1, dw2,
                  time_decay, eps):
    """jnp composition (backward + fallback). maas: (6, C) stacked
    [x, w, k, v, r, g]. Returns xr, xk, xv, xg (x.dtype), w fp32, xn fp32."""
    f = jnp.float32
    od = x.dtype                       # MXU operand dtype = compute dtype
    xf = x.astype(f)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(f) + ln_bias.astype(f)
    xx = shift.astype(f) - xn
    xxx = xn + xx * maas[0].astype(f)
    D = w2.shape[1]
    h = jnp.tanh(
        jax.lax.dot_general(
            xxx.astype(od), w1.astype(od),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
    )
    mixed = []
    for i in range(5):
        m_i = jax.lax.dot_general(
            h[:, i * D:(i + 1) * D].astype(od), w2[i].astype(od),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
        mixed.append(xn + xx * (maas[1 + i].astype(f) + m_i))
    xw, xk, xv, xr, xg = mixed
    hw = jnp.tanh(
        jax.lax.dot_general(
            xw.astype(f), dw1.astype(f),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
    )
    ww = jax.lax.dot_general(
        hw, dw2.astype(f),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    w = time_decay.astype(f) + ww
    dt = x.dtype
    return (xr.astype(dt), xk.astype(dt), xv.astype(dt), xg.astype(dt),
            w, xn)


def _att_prep_kernel(
    x_ref, shift_ref, lnsc_ref, lnbi_ref, maas_ref,
    w1_ref, w2_ref, dw1_ref, dw2_ref, td_ref,
    xr_ref, xk_ref, xv_ref, xg_ref, w_ref, xn_ref,
    *, D: int, eps: float,
):
    f = jnp.float32
    od = xr_ref.dtype                  # MXU operand dtype = compute dtype
    xf = x_ref[:, :].astype(f)                       # (BB, C)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * lnsc_ref[0, :].astype(f) + lnbi_ref[0, :].astype(f)
    xx = shift_ref[:, :].astype(f) - xn

    maas = maas_ref[:, :].astype(f)                  # (6, C)
    xxx = xn + xx * maas[0][None, :]
    h = jnp.tanh(
        jax.lax.dot_general(
            xxx.astype(od), w1_ref[:, :].astype(od),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
    )                                                # (BB, 5D)
    outs = []
    for i in range(5):
        m_i = jax.lax.dot_general(
            h[:, i * D:(i + 1) * D].astype(od), w2_ref[i].astype(od),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
        outs.append(xn + xx * (maas[1 + i][None, :] + m_i))
    xw, xk, xv, xr, xg = outs

    hw = jnp.tanh(
        jax.lax.dot_general(
            xw.astype(f), dw1_ref[:, :].astype(f),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
    )
    ww = jax.lax.dot_general(
        hw, dw2_ref[:, :].astype(f),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    w_ref[:, :] = td_ref[0, :].astype(f) + ww

    dt = xr_ref.dtype
    xr_ref[:, :] = xr.astype(dt)
    xk_ref[:, :] = xk.astype(dt)
    xv_ref[:, :] = xv.astype(dt)
    xg_ref[:, :] = xg.astype(dt)
    xn_ref[:, :] = xn


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def att_prep_fused(x, shift, ln_scale, ln_bias, maas, w1, w2, dw1, dw2,
                   time_decay, eps, interpret=None):
    """Fused attention prologue for one decode step.

    x (B, C) compute dtype; shift (B, C) fp32 (previous ln1 row);
    ln_scale/ln_bias/time_decay (C,); maas (6, C) stacked
    [maa_x, maa_w, maa_k, maa_v, maa_r, maa_g]; w1 (C, 5D); w2 (5, D, C);
    dw1 (C, Dd); dw2 (Dd, C).

    Returns (xr, xk, xv, xg) in x.dtype, w (B, C) fp32 raw log-decay,
    xn (B, C) fp32 — the ln1 output, which is both the next shift row and
    the input the caller no longer needs to recompute."""
    B, C = x.shape
    D = w2.shape[1]
    BB = _pick_bb(B, C)
    if BB is None:
        return _att_prep_ref(x, shift, ln_scale, ln_bias, maas, w1, w2,
                             dw1, dw2, time_decay, eps)
    if interpret is None:
        from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

        interpret = not pallas_available()
    f = jnp.float32
    row = lambda: pl.BlockSpec((BB, C), lambda b: (b, 0))
    cvec = lambda: pl.BlockSpec((1, C), lambda b: (0, 0))
    const = lambda sh: pl.BlockSpec(sh, lambda b: (0,) * len(sh))
    return pl.pallas_call(
        functools.partial(_att_prep_kernel, D=D, eps=eps),
        grid=(B // BB,),
        in_specs=[
            row(), row(),
            cvec(), cvec(),
            const((6, C)),
            const(w1.shape), const(w2.shape),
            const(dw1.shape), const(dw2.shape),
            cvec(),
        ],
        out_specs=[row(), row(), row(), row(), row(), row()],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), f),
            jax.ShapeDtypeStruct((B, C), f),
        ],
        interpret=interpret,
    )(
        x, shift.astype(f),
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        maas,
        w1, w2, dw1, dw2,
        time_decay.reshape(1, C),
    )


def _att_prep_fwd(x, shift, ln_scale, ln_bias, maas, w1, w2, dw1, dw2,
                  time_decay, eps, interpret):
    out = att_prep_fused(x, shift, ln_scale, ln_bias, maas, w1, w2, dw1,
                         dw2, time_decay, eps, interpret)
    return out, (x, shift, ln_scale, ln_bias, maas, w1, w2, dw1, dw2,
                 time_decay)


def _att_prep_bwd(eps, interpret, res, cts):
    def fn(*args):
        return _att_prep_ref(*args, eps)

    _, vjp = jax.vjp(fn, *res)
    return vjp(cts)


att_prep_fused.defvjp(_att_prep_fwd, _att_prep_bwd)


# ---------------------------------------------------------------- ffn prep


def _ffn_prep_ref(x, shift, ln_scale, ln_bias, maa_k, maa_r, eps):
    f = jnp.float32
    xf = x.astype(f)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(f) + ln_bias.astype(f)
    xx = shift.astype(f) - xn
    xk = xn + xx * maa_k.astype(f)
    xr = xn + xx * maa_r.astype(f)
    dt = x.dtype
    return xk.astype(dt), xr.astype(dt), xn


def _ffn_prep_kernel(
    x_ref, shift_ref, lnsc_ref, lnbi_ref, mk_ref, mr_ref,
    xk_ref, xr_ref, xn_ref, *, eps: float,
):
    f = jnp.float32
    xf = x_ref[:, :].astype(f)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * lnsc_ref[0, :].astype(f) + lnbi_ref[0, :].astype(f)
    xx = shift_ref[:, :].astype(f) - xn
    dt = xk_ref.dtype
    xk_ref[:, :] = (xn + xx * mk_ref[0, :].astype(f)).astype(dt)
    xr_ref[:, :] = (xn + xx * mr_ref[0, :].astype(f)).astype(dt)
    xn_ref[:, :] = xn


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ffn_prep_fused(x, shift, ln_scale, ln_bias, maa_k, maa_r, eps,
                   interpret=None):
    """Fused channel-mix prologue: ln2 + token shift + k/r mix.
    Returns (xk, xr) in x.dtype and xn (B, C) fp32 (the next ffn shift)."""
    B, C = x.shape
    BB = _pick_bb(B, C)
    if BB is None:
        return _ffn_prep_ref(x, shift, ln_scale, ln_bias, maa_k, maa_r, eps)
    if interpret is None:
        from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

        interpret = not pallas_available()
    f = jnp.float32
    row = lambda: pl.BlockSpec((BB, C), lambda b: (b, 0))
    cvec = lambda: pl.BlockSpec((1, C), lambda b: (0, 0))
    return pl.pallas_call(
        functools.partial(_ffn_prep_kernel, eps=eps),
        grid=(B // BB,),
        in_specs=[row(), row(), cvec(), cvec(), cvec(), cvec()],
        out_specs=[row(), row(), row()],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), f),
        ],
        interpret=interpret,
    )(
        x, shift.astype(f),
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        maa_k.reshape(1, C), maa_r.reshape(1, C),
    )


def _ffn_prep_fwd(x, shift, ln_scale, ln_bias, maa_k, maa_r, eps,
                  interpret):
    out = ffn_prep_fused(x, shift, ln_scale, ln_bias, maa_k, maa_r, eps,
                         interpret)
    return out, (x, shift, ln_scale, ln_bias, maa_k, maa_r)


def _ffn_prep_bwd(eps, interpret, res, cts):
    def fn(*args):
        return _ffn_prep_ref(*args, eps)

    _, vjp = jax.vjp(fn, *res)
    return vjp(cts)


ffn_prep_fused.defvjp(_ffn_prep_fwd, _ffn_prep_bwd)


# ------------------------------------------------------------ ffn block


def _ffn_block_ref(x, shift, ln_scale, ln_bias, maa_k, maa_r,
                   wk, wv, wr, eps):
    """jnp composition of the whole channel-mix block at T=1 (backward +
    fallback): ln2 + shift + mix + key/relu^2/value/receptance + gated
    residual. Returns (x + ffn_out, xn)."""
    f = jnp.float32
    od = x.dtype
    xk, xr, xn = _ffn_prep_ref(x, shift, ln_scale, ln_bias, maa_k, maa_r,
                               eps)
    k = jnp.square(jnp.maximum(
        jax.lax.dot_general(
            xk, wk.astype(od),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        ).astype(od), 0,
    ))
    kv = jax.lax.dot_general(
        k, wv.astype(od),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    r = jax.lax.dot_general(
        xr, wr.astype(od),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )
    out = jax.nn.sigmoid(r) * kv
    return (x.astype(f) + out).astype(od), xn


def _ffn_block_kernel(
    x_ref, shift_ref, lnsc_ref, lnbi_ref, mk_ref, mr_ref,
    wk_ref, wv_ref, wr_ref,
    out_ref, xn_ref,
    xk_s, xr_s, kv_s,
    *, eps: float, NK: int, FT: int,
):
    """Phase-gridded channel-mix block: t=0 prep; t in [1, NK] fused
    key+value tiles — each step computes one F-block of
    k = relu^2(xk @ Wk[:, blk]) and immediately contracts it into
    kv += k_blk @ Wv[blk, :] (no (B, F) scratch round trip; both weight
    tiles stream in the same step); t > NK receptance col-tiles + gated
    residual write. Scratch persists across the sequential TPU grid."""
    f = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _prep():
        xf = x_ref[:, :].astype(f)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
        var = jnp.maximum(m2 - mu * mu, 0.0)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lnsc_ref[0, :].astype(f) + lnbi_ref[0, :].astype(f)
        xx = shift_ref[:, :].astype(f) - xn
        od = xk_s.dtype
        xk_s[:, :] = (xn + xx * mk_ref[0, :].astype(f)).astype(od)
        xr_s[:, :] = (xn + xx * mr_ref[0, :].astype(f)).astype(od)
        xn_ref[:, :] = xn
        kv_s[:, :] = jnp.zeros_like(kv_s)

    @pl.when((t >= 1) & (t <= NK))
    def _key_value():
        blk = jax.lax.dot_general(
            xk_s[:, :], wk_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        ).astype(xk_s.dtype)
        blk = jnp.square(jnp.maximum(blk, 0))
        kv_s[:, :] = kv_s[:, :] + jax.lax.dot_general(
            blk, wv_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )

    @pl.when(t > NK)
    def _receptance():
        CB = wr_ref.shape[1]
        cb = (t - NK - 1) * CB
        r = jax.lax.dot_general(
            xr_s[:, :], wr_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f,
        )
        kv = kv_s[:, pl.ds(cb, CB)]
        xres = x_ref[:, pl.ds(cb, CB)].astype(f)
        out_ref[:, :] = (
            xres + jax.nn.sigmoid(r) * kv
        ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ffn_block_fused(x, shift, ln_scale, ln_bias, maa_k, maa_r,
                    wk, wv, wr, eps, interpret=None):
    """Whole channel-mix block for one decode step as ONE Pallas program:
    ln2 + token shift + k/r mix + key (C,F) + relu^2 + value (F,C) +
    receptance (C,C) + sigmoid-gated residual, with the three weight
    matrices streamed through VMEM in 512-wide tiles (~64 MB/layer at
    1B6 — the full FFN weight traffic rides one kernel's DMA pipeline
    instead of ~8 XLA ops with scheduling gaps between them).

    x (B, C) compute dtype; shift (B, C) fp32; wk (C, F); wv (F, C);
    wr (C, C). Returns (x + ffn_out (B, C) x.dtype, xn (B, C) fp32 —
    the next ffn shift). Reference: src/model.py:616-644 at T=1."""
    B, C = x.shape
    F = wk.shape[1]
    FT = 512
    CB = 512
    if (
        B % 8 != 0 or C % CB != 0 or F % FT != 0
        or _pick_bb(B, C) != B
    ):
        return _ffn_block_ref(x, shift, ln_scale, ln_bias, maa_k, maa_r,
                              wk, wv, wr, eps)
    if interpret is None:
        from rwkv_lm_ext_tpu.ops.wkv_pallas import pallas_available

        interpret = not pallas_available()
    f = jnp.float32
    NK, NR = F // FT, C // CB
    G = 1 + NK + NR

    def wkv_idx_k(t):
        return (0, jnp.clip(t - 1, 0, NK - 1))

    def wkv_idx_v(t):
        return (jnp.clip(t - 1, 0, NK - 1), 0)

    def wr_idx(t):
        return (0, jnp.clip(t - NK - 1, 0, NR - 1))

    full = lambda: pl.BlockSpec((B, C), lambda t: (0, 0))
    cvec = lambda: pl.BlockSpec((1, C), lambda t: (0, 0))
    out, xn = pl.pallas_call(
        functools.partial(
            _ffn_block_kernel, eps=eps, NK=NK, FT=FT
        ),
        grid=(G,),
        in_specs=[
            full(), full(),
            cvec(), cvec(), cvec(), cvec(),
            pl.BlockSpec((C, FT), wkv_idx_k),
            pl.BlockSpec((FT, C), wkv_idx_v),
            pl.BlockSpec((C, CB), wr_idx),
        ],
        out_specs=[
            pl.BlockSpec((B, CB), wr_idx),
            pl.BlockSpec((B, C), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), f),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), f),
        ],
        interpret=interpret,
    )(
        x, shift.astype(f),
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        maa_k.reshape(1, C), maa_r.reshape(1, C),
        wk, wv, wr,
    )
    return out, xn


def _ffn_block_fwd(x, shift, ln_scale, ln_bias, maa_k, maa_r, wk, wv, wr,
                   eps, interpret):
    out = ffn_block_fused(x, shift, ln_scale, ln_bias, maa_k, maa_r,
                          wk, wv, wr, eps, interpret)
    return out, (x, shift, ln_scale, ln_bias, maa_k, maa_r, wk, wv, wr)


def _ffn_block_bwd(eps, interpret, res, cts):
    def fn(*args):
        return _ffn_block_ref(*args, eps)

    _, vjp = jax.vjp(fn, *res)
    return vjp(cts)


ffn_block_fused.defvjp(_ffn_block_fwd, _ffn_block_bwd)
