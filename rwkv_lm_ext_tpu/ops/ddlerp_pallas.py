"""Fused time-mix prologue: LayerNorm(ln1) + token shift + ddlerp.

Produces the five mixed streams (xw, xk, xv, xr, xg) of RWKV-6's
data-dependent lerp (src/model.py:434-459 jit_func, first half) in one
pass over the residual stream. Unfused, XLA materializes: the ln1 output,
the shifted stream, xx, xxx, the (5,B,T,C) ddlerp offsets (640MB at 1B6
B64xT512) and five lerp outputs — this kernel keeps everything except the
five outputs in VMEM.

Grid (B, T/TB): a scratch row carries the previous block's last ln'd token
for the cross-block token shift (the shift state seeds block 0).

Backward: custom_vjp recompute through the jnp composition.
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


def _prologue_bwd(eps, interpret, res, cts):
    x, shift, ln_scale, ln_bias, maa, w1, w2 = res

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
