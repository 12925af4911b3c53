"""Transposed (j,i) packed-layout decode kernel experiment (STATUS item:
"decode headroom"; the packed op measures ~2x its 53 us/layer HBM
roofline at 1B6 B=64).

Idea: the canonical packed state holds logical (i, j) with j minor
(lane c of plane p = (p*K + c//N, c%N)). The decode step needs THREE
per-i spreads (decay, k, r — one stacked one-hot MXU matmul today) and
one per-j tile (v — free lane concats). Packing the TRANSPOSE (lane c of
plane p = (j, i) = (p*K + c//N, c%N)) swaps the roles: decay/k/r become
free lane-concat TILES and v the single spread; the y_j = sum_i r_i S[i,j]
reduction becomes a one-hot FOLD matmul (contraction over all N*N lanes).
MXU work drops ~1.5x (134M spread + 134M fold vs 402M per program at
BT=4 H=32 N=64); VPU gains two tile materializations.

Measures (chained-scan, one fetch, per the bench methodology):
  packed-XLA      canonical layout, wkv6_decode_step_packed (default)
  packed-pallas   canonical layout, wkv6_decode_step_packed_pallas
  transT-pallas   transposed layout, kernel below
All three consume/produce their own layout inside the scan so the layout
conversion cost is NOT in the loop (a real deployment would flip the
canonical layout). Numerics are checked against _decode_ref first.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rwkv_lm_ext_tpu.ops.wkv_decode import (
    _decode_ref,
    wkv6_decode_step_packed,
    wkv6_decode_step_packed_pallas,
    _pick_bt_packed,
)

B = int(os.environ.get("B", "64"))
H, N = 32, 64
C = H * N * 1  # per-layer geometry only; this benches the OP, not the model
EPS = 64e-5
ITERS = int(os.environ.get("ITERS", "200"))
SHORT = int(os.environ.get("SHORT", "40"))


def pack_T(s_logical):
    """(B,H,N,N) logical (i,j) -> transposed packed (B,H,P,128) of S^T."""
    n = s_logical.shape[-1]
    return jnp.swapaxes(s_logical, -1, -2).reshape(
        s_logical.shape[:-2] + ((n * n) // 128, 128)
    )


def unpack_T(s_packed, n):
    return jnp.swapaxes(
        s_packed.reshape(s_packed.shape[:-2] + (n, n)), -1, -2
    )


def _transT_kernel(
    r_ref, k_ref, v_ref, w_ref, g_ref, u_ref, sc_ref, bi_ref,
    msp_ref, mfold_ref, s_ref,
    out_ref, snew_ref,
    *, BT: int, H: int, N: int, eps: float,
):
    """Transposed-layout decode step. Lane q = j*N + i (j major):
    per-i quantities tile (concat), per-j v spreads (one matmul), y folds
    over the i-lanes of each j-group (one matmul)."""
    f = jnp.float32
    bf = jnp.bfloat16
    K = 128 // N
    P = (N * N) // 128
    QT = BT * H

    r2 = r_ref[:, :].astype(f)
    k2 = k_ref[:, :].astype(f)
    v2 = v_ref[:, :].astype(f)
    g2 = g_ref[:, :].astype(f)
    w2 = w_ref[:, :]
    decay = jnp.exp(-jnp.exp(w2))
    S = s_ref[:, :]                                    # (QT, P*128) fp32

    u2 = u_ref[:, :].astype(f)
    sc = sc_ref[:, :].astype(f)
    bi = bi_ref[:, :].astype(f)
    if BT > 1:
        u2 = jnp.concatenate([u2] * BT, axis=0)
        sc = jnp.concatenate([sc] * BT, axis=0)
        bi = jnp.concatenate([bi] * BT, axis=0)
    bonus = jnp.sum(r2 * u2 * k2, axis=1, keepdims=True)

    def tile(x):                                       # (QT,N)->(QT,P*128)
        rep = jnp.concatenate([x] * K, axis=1)
        return jnp.concatenate([rep] * P, axis=1)

    def hilo(x):
        hi = x.astype(bf)
        lo = (x - hi.astype(f)).astype(bf)
        return hi, lo

    # single spread: v_j broadcast over the N i-lanes of each j-group
    vhi, vlo = hilo(v2)
    Xv = jnp.concatenate([vhi, vlo], axis=1)           # (QT, 2N)
    spread_v = jax.lax.dot_general(
        Xv, msp_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )                                                  # (QT, P*128)

    snew_ref[:, :] = tile(decay) * S + tile(k2) * spread_v

    # y_j = sum_i r_i S[i,j]: fold the i-lanes of each j-group
    t = tile(r2) * S                                   # (QT, P*128) fp32
    thi, tlo = hilo(t)
    X = jnp.concatenate([thi, tlo], axis=0)            # (2QT, P*128)
    folded = jax.lax.dot_general(
        X, mfold_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f,
    )                                                  # (2QT, N)
    y = folded[:QT] + folded[QT:] + bonus * v2

    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    out_ref[:, :] = ((yn * sc + bi) * g2).astype(out_ref.dtype)


def decode_step_transT(r, k, v, w, g, u, ln_scale, ln_bias, sT_packed, eps,
                       interpret=False):
    H, N = u.shape
    B = r.shape[0]
    K, P = 128 // N, (N * N) // 128
    BT = _pick_bt_packed(B, H, N)
    assert BT is not None and K >= 2
    QT = BT * H

    r2 = r.reshape(B * H, N)
    k2 = k.reshape(B * H, N)
    v2 = v.reshape(B * H, N)
    w2 = w.astype(jnp.float32).reshape(B * H, N)
    g2 = g.reshape(B * H, N)
    s2 = sT_packed.reshape(B * H, P * 128)

    j_idx = jnp.arange(N)[:, None]
    q_idx = jnp.arange(P * 128)[None, :]
    msp1 = (j_idx == q_idx // N).astype(jnp.bfloat16)  # spread by j-group
    Msp = jnp.concatenate([msp1, msp1], axis=0)        # (2N, P*128) hi+lo
    Mfold = (q_idx.T // N == j_idx.T).astype(jnp.bfloat16)  # (P*128, N)

    qrow = lambda: pl.BlockSpec((QT, N), lambda b: (b, 0))
    smat = pl.BlockSpec((QT, P * 128), lambda b: (b, 0))
    hconst = lambda: pl.BlockSpec((H, N), lambda b: (0, 0))
    cconst = lambda sh: pl.BlockSpec(sh, lambda b: (0, 0))
    out, snew = pl.pallas_call(
        functools.partial(_transT_kernel, BT=BT, H=H, N=N, eps=eps),
        grid=(B // BT,),
        in_specs=[
            qrow(), qrow(), qrow(), qrow(), qrow(),
            hconst(), hconst(), hconst(),
            cconst((2 * N, P * 128)), cconst((P * 128, N)),
            smat,
        ],
        out_specs=[qrow(), smat],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N), g.dtype),
            jax.ShapeDtypeStruct((B * H, P * 128), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * N * N,
            bytes_accessed=2 * B * H * N * N * 4,
            transcendentals=2 * B * H * N,
        ),
    )(
        r2, k2, v2, w2, g2,
        u.reshape(H, N), ln_scale.reshape(H, N), ln_bias.reshape(H, N),
        Msp, Mfold,
        s2,
    )
    return out.reshape(B, H * N), snew.reshape(B, H, P, 128)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    bf = jnp.bfloat16
    r = jax.random.normal(ks[0], (B, H * N), bf)
    k = jax.random.normal(ks[1], (B, H * N), bf)
    v = jax.random.normal(ks[2], (B, H * N), bf)
    w = jax.random.uniform(ks[3], (B, H * N), jnp.float32, -3.0, -0.3)
    g = jax.random.normal(ks[4], (B, H * N), bf)
    u = 0.5 * jax.random.normal(ks[5], (H, N), jnp.float32)
    sc = 1.0 + 0.1 * jax.random.normal(ks[6], (H * N,), jnp.float32)
    bi = 0.1 * jax.random.normal(ks[7], (H * N,), jnp.float32)
    s_log = 0.1 * jax.random.normal(ks[8], (B, H, N, N), jnp.float32)

    # ---- numerics vs the logical reference ----
    o_ref, s_ref = _decode_ref(
        *(x.reshape(B, H, N) for x in (r, k, v)),
        w.reshape(B, H, N), g.reshape(B, H, N), u, sc, bi, s_log, EPS
    )
    o_t, s_t = decode_step_transT(r, k, v, w, g, u, sc, bi, pack_T(s_log), EPS)
    err_o = float(jnp.abs(o_t.astype(jnp.float32)
                          - o_ref.astype(jnp.float32)).max())
    err_s = float(jnp.abs(unpack_T(s_t, N) - s_ref).max())
    print(json.dumps({"check": "transT", "max_out_err": err_o,
                      "max_state_err": err_s}))
    # bf16 output I/O: one ulp at the output magnitude (state is fp32-exact)
    scale_o = float(jnp.abs(o_ref.astype(jnp.float32)).max())
    assert err_o < 2e-2 * max(scale_o, 1.0) and err_s < 1e-2

    # ---- chained-scan op timing (state is the data dependency) ----
    from rwkv_lm_ext_tpu.models.state import pack_wkv

    def timed(name, step, s0):
        def mk(n):
            @jax.jit
            def f(s):
                def body(st, _):
                    # the state carry is the data chain; summing o into
                    # the scan output keeps the y path alive
                    o, st2 = step(r, k, v, w, g, u, sc, bi, st)
                    return st2, jnp.sum(o.astype(jnp.float32))
                st, ys = jax.lax.scan(body, s, None, length=n)
                return jnp.sum(ys) + jnp.sum(st)
            return f
        f1, fn = mk(SHORT), mk(ITERS)
        float(f1(s0)); float(fn(s0))
        t0 = time.perf_counter(); float(fn(s0)); dtn = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f1(s0)); dt1 = time.perf_counter() - t0
        per = (dtn - dt1) / (ITERS - SHORT)
        print(json.dumps({"variant": name, "us_per_op": round(per * 1e6, 1)}),
              flush=True)

    timed("packed-xla",
          lambda *a: wkv6_decode_step_packed(*a[:9], eps=EPS),
          pack_wkv(s_log))
    timed("packed-pallas",
          lambda *a: wkv6_decode_step_packed_pallas(*a[:9], EPS),
          pack_wkv(s_log))
    timed("transT-pallas",
          lambda *a: decode_step_transT(*a[:9], EPS),
          pack_T(s_log))


if __name__ == "__main__":
    main()
