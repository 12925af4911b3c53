"""Fused time-mix prologue: LayerNorm(ln1) + token shift + ddlerp.

Produces the five mixed streams (xw, xk, xv, xr, xg) of RWKV-6's
data-dependent lerp (src/model.py:434-459 jit_func, first half) in one
pass over the residual stream. Unfused, XLA materializes: the ln1 output,
the shifted stream, xx, xxx, the (5,B,T,C) ddlerp offsets (640MB at 1B6
B64xT512) and five lerp outputs — this kernel keeps everything except the
five outputs in VMEM.

Grid (B, T/TB): a scratch row carries the previous block's last ln'd token
for the cross-block token shift (the shift state seeds block 0).

Backward: hand-written Pallas adjoint (reverse T-block grid). Per block it
recomputes the forward LN/shift/ddlerp quantities from x (residuals are
just the primal inputs), then runs the chain d(out_i) -> dm_i -> dh ->
dxxx -> dxx/dxn -> dx. The token-shift coupling dprev[t] -> dxn[t-1]
crosses block boundaries via a VMEM carry, mirroring the forward carry in
the opposite direction; dprev[0] of the first block is dshift. Weight
grads (dw1/dw2/dmaa/dscale/dbias) accumulate in constant-index output
blocks that stay resident in VMEM for the whole grid (same pattern as du
in the WKV backward). Geometries the kernel can't tile fall back to
recompute through the jnp composition.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prologue_kernel(
    x_ref, shift_ref, lnsc_ref, lnbi_ref,
    maax_ref, maaw_ref, maak_ref, maav_ref, maar_ref, maag_ref,
    w1_ref, w2_ref,
    xw_ref, xk_ref, xv_ref, xr_ref, xg_ref, xln_ref,
    carry,                     # VMEM (1, C) f32: previous ln'd row
    *, TB: int, C: int, D: int, eps: float,
):
    c = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)            # (TB, C)
    # LayerNorm(ln1)
    mu = jnp.mean(x, axis=1, keepdims=True)
    m2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * lnsc_ref[0].astype(jnp.float32) + lnbi_ref[0].astype(jnp.float32)

    # token shift: prev[t] = xn[t-1]; row 0 comes from the carry (block 0
    # seeds it from the shift state, which is already ln'd by the caller
    # contract — see prologue() wrapper)
    @pl.when(c == 0)
    def _():
        carry[0, :] = shift_ref[0, 0].astype(jnp.float32)

    prev_first = carry[0, :][None, :]
    prev_rest = xn[: TB - 1, :]
    prev = jnp.concatenate([prev_first, prev_rest], axis=0)
    carry[0, :] = xn[TB - 1, :]

    xx = prev - xn
    xxx = xn + xx * maax_ref[0].astype(jnp.float32)
    h = jnp.tanh(
        jax.lax.dot_general(
            xxx, w1_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                           # (TB, 5D)
    outs = (xw_ref, xk_ref, xv_ref, xr_ref, xg_ref)
    maas = (maaw_ref, maak_ref, maav_ref, maar_ref, maag_ref)
    for i in range(5):
        m_i = jax.lax.dot_general(
            h[:, i * D : (i + 1) * D], w2_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # (TB, C)
        mixed = xn + xx * (maas[i][0].astype(jnp.float32) + m_i)
        outs[i][0] = mixed.astype(outs[i].dtype)
    xln_ref[0] = xn.astype(xln_ref.dtype)


def _prologue_ref(x, shift, ln_scale, ln_bias, maa, w1, w2, eps):
    """jnp composition (backward recompute + CPU fallback). `maa` is the
    stacked (6, C): [x, w, k, v, r, g]."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    prev = jnp.concatenate([shift[:, None, :].astype(jnp.float32), xn[:, :-1]], axis=1)
    xx = prev - xn
    xxx = xn + xx * maa[0].astype(jnp.float32)
    B, T, C = x.shape
    D = w1.shape[1] // 5
    h = jnp.tanh(xxx @ w1.astype(jnp.float32)).reshape(B, T, 5, D)
    m = jnp.einsum("btfd,fdc->fbtc", h, w2.astype(jnp.float32))
    outs = tuple(
        (xn + xx * (maa[i + 1].astype(jnp.float32) + m[i])).astype(x.dtype)
        for i in range(5)
    )
    return outs + (xn.astype(x.dtype),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _prologue(x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret):
    return _prologue_impl(x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret)


def _prologue_impl(x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret):
    B, T, C = x.shape
    D = w1.shape[1] // 5
    TB = min(128, T)
    if T % TB != 0 or C % 128 != 0 or D % 8 != 0:
        return _prologue_ref(x, shift, ln_scale, ln_bias, maa, w1, w2, eps)
    NTB = T // TB

    lane = pl.BlockSpec((1, TB, C), lambda b, c: (b, c, 0))
    vec = lambda: pl.BlockSpec((1, 1, C), lambda b, c: (0, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_prologue_kernel, TB=TB, C=C, D=D, eps=eps),
        grid=(B, NTB),
        in_specs=[
            lane,
            pl.BlockSpec((1, 1, C), lambda b, c: (b, 0, 0)),   # shift (B,1,C)
            vec(), vec(),                                       # ln scale/bias
            vec(), vec(), vec(), vec(), vec(), vec(),           # maa x,w,k,v,r,g
            pl.BlockSpec((C, 5 * D), lambda b, c: (0, 0)),      # w1
            pl.BlockSpec((5, D, C), lambda b, c: (0, 0, 0)),    # w2
        ],
        out_specs=[lane] * 6,
        out_shape=[jax.ShapeDtypeStruct((B, T, C), x.dtype)] * 6,
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(
        x,
        shift[:, None, :],
        ln_scale.reshape(1, 1, C), ln_bias.reshape(1, 1, C),
        maa[0].reshape(1, 1, C), maa[1].reshape(1, 1, C),
        maa[2].reshape(1, 1, C), maa[3].reshape(1, 1, C),
        maa[4].reshape(1, 1, C), maa[5].reshape(1, 1, C),
        w1, w2,
    )
    return tuple(outs)


def _prologue_fwd(x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret):
    out = _prologue_impl(x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret)
    return out, (x, shift, ln_scale, ln_bias, maa, w1, w2)


def _ln_rows(x, sc, bi, eps):
    """LN of (R, C) rows in fp32; returns (xn_raw, rstd, xn)."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    m2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn_raw = (x - mu) * rstd
    return xn_raw, rstd, xn_raw * sc + bi


def _prologue_bwd_kernel(
    x_ref, xprev_ref, shift_ref, lnsc_ref, lnbi_ref,
    maax_ref, maaw_ref, maak_ref, maav_ref, maar_ref, maag_ref,
    w1_ref, w2_ref,
    d0_ref, d1_ref, d2_ref, d3_ref, d4_ref, dxln_ref,
    dx_ref, dshift_ref, dsc_ref, dbi_ref, dmaa_ref, dw1_ref, dw2_ref,
    carry,                     # VMEM (1, C) f32: dprev[0] of the later block
    *, TB: int, C: int, D: int, NTB: int, eps: float,
):
    # grid axis 1 walks T-blocks in REVERSE (index maps flip it)
    b = pl.program_id(0)
    c = pl.program_id(1)
    is_first_block = c == NTB - 1          # actual T-block 0

    @pl.when((b == 0) & (c == 0))
    def _():
        dsc_ref[0, 0] = jnp.zeros_like(dsc_ref[0, 0])
        dbi_ref[0, 0] = jnp.zeros_like(dbi_ref[0, 0])
        dmaa_ref[:, :] = jnp.zeros_like(dmaa_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        dw2_ref[:, :, :] = jnp.zeros_like(dw2_ref)

    @pl.when(c == 0)
    def _():
        carry[0, :] = jnp.zeros((C,), jnp.float32)

    sc = lnsc_ref[0].astype(jnp.float32)        # (1, C)
    bi = lnbi_ref[0].astype(jnp.float32)
    maax = maax_ref[0].astype(jnp.float32)

    # ---- recompute forward quantities for this block ----
    x = x_ref[0].astype(jnp.float32)            # (TB, C)
    xn_raw, rstd, xn = _ln_rows(x, sc, bi, eps)
    prow = xprev_ref[0, 0].astype(jnp.float32)  # (1, C) last row of prev blk
    _, _, pn = _ln_rows(prow, sc, bi, eps)
    shift_row = shift_ref[0, 0].astype(jnp.float32)[None, :]
    prev_first = jnp.where(is_first_block, shift_row, pn)
    prev = jnp.concatenate([prev_first, xn[: TB - 1, :]], axis=0)
    xx = prev - xn
    xxx = xn + xx * maax
    h = jnp.tanh(
        jax.lax.dot_general(
            xxx, w1_ref[:, :].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                           # (TB, 5D)

    # ---- adjoint chain ----
    dxln = dxln_ref[0].astype(jnp.float32)
    d_refs = (d0_ref, d1_ref, d2_ref, d3_ref, d4_ref)
    maas = (maaw_ref, maak_ref, maav_ref, maar_ref, maag_ref)
    dxx = jnp.zeros((TB, C), jnp.float32)
    dxn = dxln
    dh_parts = []
    for i in range(5):
        d_i = d_refs[i][0].astype(jnp.float32)          # (TB, C)
        w2_i = w2_ref[i].astype(jnp.float32)            # (D, C)
        m_i = jax.lax.dot_general(
            h[:, i * D : (i + 1) * D], w2_i,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxx += d_i * (maas[i][0].astype(jnp.float32) + m_i)
        dxn += d_i
        dm_i = d_i * xx
        dmaa_ref[i + 1 : i + 2, :] = dmaa_ref[i + 1 : i + 2, :] + jnp.sum(
            dm_i, axis=0, keepdims=True
        )
        dh_parts.append(
            jax.lax.dot_general(
                dm_i, w2_i,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dw2_ref[i] = dw2_ref[i] + jax.lax.dot_general(
            h[:, i * D : (i + 1) * D], dm_i,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dh = jnp.concatenate(dh_parts, axis=1)              # (TB, 5D)
    dpre = dh * (1.0 - h * h)
    dxxx = jax.lax.dot_general(
        dpre, w1_ref[:, :].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1_ref[:, :] = dw1_ref[:, :] + jax.lax.dot_general(
        xxx, dpre,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dmaa_ref[0:1, :] = dmaa_ref[0:1, :] + jnp.sum(
        dxxx * xx, axis=0, keepdims=True
    )
    dxx += dxxx * maax
    dxn += dxxx

    # xx = prev - xn
    dprev = dxx
    dxn = dxn - dxx
    # prev[t] = xn[t-1]: within-block shift + cross-block carry on last row
    dxn = dxn + jnp.concatenate([dprev[1:, :], carry[0, :][None, :]], axis=0)
    carry[0, :] = dprev[0, :]

    @pl.when(is_first_block)
    def _():
        dshift_ref[0, 0] = dprev[0, :].astype(dshift_ref.dtype)

    # LN backward (xn = xn_raw*sc + bi)
    dsc_ref[0, 0] = dsc_ref[0, 0] + jnp.sum(dxn * xn_raw, axis=0)
    dbi_ref[0, 0] = dbi_ref[0, 0] + jnp.sum(dxn, axis=0)
    dxnr = dxn * sc
    dx = rstd * (
        dxnr
        - jnp.mean(dxnr, axis=1, keepdims=True)
        - xn_raw * jnp.mean(dxnr * xn_raw, axis=1, keepdims=True)
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _prologue_bwd_pallas(x, shift, ln_scale, ln_bias, maa, w1, w2, eps,
                         interpret, cts):
    B, T, C = x.shape
    D = w1.shape[1] // 5
    TB = min(64, T)                 # smaller than fwd's 128: more live bufs
    NTB = T // TB
    d5 = cts[:5]
    dxln = cts[5]

    lane_rev = pl.BlockSpec((1, TB, C), lambda b, c: (b, NTB - 1 - c, 0))
    vec = lambda: pl.BlockSpec((1, 1, C), lambda b, c: (0, 0, 0))
    # last row of the PREVIOUS T-block, gathered in XLA (index maps must
    # stay affine for Mosaic): xprev_rows[:, j] = x[:, j*TB - 1]; the j=0
    # entry is a don't-care (the kernel uses shift there)
    # 4D so the trailing block dims (1, C) equal the array dims (Mosaic's
    # block-shape rule for non-8-aligned middle dims)
    xprev_rows = jnp.roll(x[:, TB - 1 :: TB, :], 1, axis=1)[:, :, None, :]
    xprev = pl.BlockSpec((1, 1, 1, C), lambda b, c: (b, NTB - 1 - c, 0, 0))
    const2 = lambda shape: pl.BlockSpec(shape, lambda b, c: (0,) * len(shape))

    outs = pl.pallas_call(
        functools.partial(
            _prologue_bwd_kernel, TB=TB, C=C, D=D, NTB=NTB, eps=eps
        ),
        grid=(B, NTB),
        in_specs=[
            lane_rev,
            xprev,
            pl.BlockSpec((1, 1, C), lambda b, c: (b, 0, 0)),   # shift
            vec(), vec(),                                       # ln scale/bias
            vec(), vec(), vec(), vec(), vec(), vec(),           # maa x,w,k,v,r,g
            const2((C, 5 * D)),                                 # w1
            const2((5, D, C)),                                  # w2
            lane_rev, lane_rev, lane_rev, lane_rev, lane_rev,   # d(out_i)
            lane_rev,                                           # dxln
        ],
        out_specs=[
            lane_rev,                                           # dx
            pl.BlockSpec((1, 1, C), lambda b, c: (b, 0, 0)),    # dshift
            pl.BlockSpec((1, 1, C), lambda b, c: (0, 0, 0)),    # dscale
            pl.BlockSpec((1, 1, C), lambda b, c: (0, 0, 0)),    # dbias
            const2((6, C)),                                     # dmaa
            const2((C, 5 * D)),                                 # dw1
            const2((5, D, C)),                                  # dw2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((6, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 5 * D), jnp.float32),
            jax.ShapeDtypeStruct((5, D, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(
        x,
        xprev_rows,
        shift[:, None, :],
        ln_scale.reshape(1, 1, C), ln_bias.reshape(1, 1, C),
        maa[0].reshape(1, 1, C), maa[1].reshape(1, 1, C),
        maa[2].reshape(1, 1, C), maa[3].reshape(1, 1, C),
        maa[4].reshape(1, 1, C), maa[5].reshape(1, 1, C),
        w1, w2,
        d5[0], d5[1], d5[2], d5[3], d5[4], dxln,
    )
    dx, dshift, dsc, dbi, dmaa, dw1, dw2 = outs
    return (
        dx,
        dshift[:, 0, :].astype(shift.dtype),
        dsc.reshape(C).astype(ln_scale.dtype),
        dbi.reshape(C).astype(ln_bias.dtype),
        dmaa.astype(maa.dtype),
        dw1.astype(w1.dtype),
        dw2.astype(w2.dtype),
    )


def _prologue_bwd(eps, interpret, res, cts):
    x, shift, ln_scale, ln_bias, maa, w1, w2 = res
    B, T, C = x.shape
    D = w1.shape[1] // 5
    TB = min(64, T)
    if T % TB == 0 and C % 128 == 0 and D % 8 == 0:
        return _prologue_bwd_pallas(
            x, shift, ln_scale, ln_bias, maa, w1, w2, eps, interpret, cts
        )

    def f(x, shift, ln_scale, ln_bias, maa, w1, w2):
        return _prologue_ref(x, shift, ln_scale, ln_bias, maa, w1, w2, eps)

    _, vjp = jax.vjp(f, x, shift, ln_scale, ln_bias, maa, w1, w2)
    return vjp(cts)


_prologue.defvjp(_prologue_fwd, _prologue_bwd)


def tmix_prologue(
    x: jax.Array,
    shift_ln: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    maa_stack: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Returns (xw, xk, xv, xr, xg, x_ln).

    NOTE the contract difference from the unfused path: `shift_ln` is the
    LN'D previous token (the model state carries raw x; callers must LN it
    once per chunk — see models.rwkv.time_mix_v6's fused branch).
    maa_stack: (6, C) stacked [time_maa_x, w, k, v, r, g]."""
    return _prologue(
        x, shift_ln, ln_scale, ln_bias, maa_stack, w1, w2, eps, interpret
    )
