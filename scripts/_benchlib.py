"""Shared timing harness for the bench/ablate scripts.

Every benchmark body must be DATA-CHAINED: the scan carry must feed the
next iteration's computation, otherwise XLA's loop-invariant code motion
computes the body once and the scan times a constant add. (Round 3's
encoder-train bench made exactly this mistake — the 41.4 Kt/s number it
produced implied >270 TFLOP/s on a chip whose measured matmul roofline
was 186. See VERDICT.md round 3, weak #1.)

``time_scan`` also runs an ELISION CANARY: the wall time of the
length-N scan must exceed the length-1 scan by at least
``canary_frac`` body-times per extra iteration. A hoisted body makes
t(N) ~= t(1) and the canary raises instead of returning a bogus number.
"""
import time

import jax
import jax.numpy as jnp


def _fetch(x):
    return float(
        jax.tree_util.tree_reduce(
            lambda a, v: a + float(jnp.sum(jnp.asarray(v, jnp.float32))), x, 0.0
        )
    )


def time_scan(body, carry0, iters, *, const=(), canary_frac=0.4, warmups=1):
    """Time one data-chained scan body; return seconds per iteration.

    ``body(carry, *const) -> carry`` MUST thread the carry into the
    computation (e.g. perturb the input tokens from the previous
    iteration's output/grads). Constant per-call overhead is removed by
    differencing a length-1 and a length-``iters`` scan.

    Anything large the body needs besides the carry (params!) must go in
    ``const`` so it enters the jitted function as an argument — closing
    over device arrays bakes them in as compile-time constants (GBs of
    captured constants, minutes of extra compile).

    Raises RuntimeError if the measured per-iteration time is below
    ``canary_frac`` of the single-iteration time — the signature of XLA
    hoisting the (loop-invariant) body out of the scan.
    """
    if iters < 2:
        raise ValueError("iters must be >= 2 to difference out overhead")

    def make(n):
        @jax.jit
        def f(c, cst):
            def sbody(cc, _):
                return body(cc, *cst), None
            c, _ = jax.lax.scan(sbody, c, None, length=n)
            # ONE scalar out: per-leaf outputs would mean one host
            # round-trip per leaf (30+ s on the remote-TPU tunnel for a
            # TrainState carry)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                c, jnp.float32(0),
            )
        return f

    f1, fn = make(1), make(iters)
    c0 = jax.device_put(carry0)
    _fetch(f1(c0, const))
    _fetch(fn(c0, const))
    for _ in range(warmups):
        _fetch(fn(c0, const))
    t0 = time.perf_counter()
    _fetch(fn(c0, const))
    tn = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(f1(c0, const))
    t1 = time.perf_counter() - t0
    per = (tn - t1) / (iters - 1)
    if per < canary_frac * t1:
        raise RuntimeError(
            f"elision canary tripped: t({iters})={tn * 1e3:.1f} ms vs "
            f"t(1)={t1 * 1e3:.1f} ms implies {per * 1e3:.1f} ms/iter "
            f"(< {canary_frac:.0%} of t(1)). The scan body is not "
            "data-chained — XLA hoisted loop-invariant work out of the "
            "timing loop; this measurement is invalid."
        )
    return per


def perturb_tokens(toks, signal, lo=4, hi=60000):
    """Derive a token perturbation from a (grad/output) signal so the next
    scan iteration depends on the previous one's computation."""
    d = (jnp.abs(signal).sum() * 1e3).astype(jnp.int32) % 7
    return lo + (toks + d - lo) % (hi - lo)
