"""RWKV-4 WKV op (log-space stable recurrence).

The recurrence of the `rwkv` pip package's serving kernel
(cuda/operators.cu:12-30, used by the reference's
infer/rwkv_states_runner.py): per channel, a softmax-like accumulator pair
(aa, bb) tracked with a running max exponent pp for stability:

    ww = u + k[t];  p = max(pp, ww)
    y[t] = (e^{pp-p}·aa + e^{ww-p}·v[t]) / (e^{pp-p}·bb + e^{ww-p})
    ww = pp + w;    p = max(ww, k[t])
    aa = e^{ww-p}·aa + e^{k[t]-p}·v[t];  bb = e^{ww-p}·bb + e^{k[t]-p};  pp = p

w is the (negative) per-channel decay, u the bonus. State = (aa, bb, pp).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def wkv4(
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    initial_state: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """k, v: (B, T, C); w, u: (C,) (w <= 0 decay). Returns (y (B,T,C) fp32,
    (aa, bb, pp) final state each (B, C))."""
    B, T, C = k.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    if initial_state is None:
        aa = jnp.zeros((B, C), jnp.float32)
        bb = jnp.zeros((B, C), jnp.float32)
        pp = jnp.full((B, C), -1e38, jnp.float32)
    else:
        aa, bb, pp = (s.astype(jnp.float32) for s in initial_state)

    def step(carry, inp):
        aa, bb, pp = carry
        kt, vt = inp
        ww = uf + kt
        p = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - p)
        e2 = jnp.exp(ww - p)
        y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        ww = pp + wf
        p = jnp.maximum(ww, kt)
        e1 = jnp.exp(ww - p)
        e2 = jnp.exp(kt - p)
        return (e1 * aa + e2 * vt, e1 * bb + e2, p), y

    (aa, bb, pp), ys = jax.lax.scan(
        step, (aa, bb, pp), (jnp.moveaxis(kf, 1, 0), jnp.moveaxis(vf, 1, 0))
    )
    return jnp.moveaxis(ys, 0, 1), (aa, bb, pp)
