"""Tracing / profiling utilities.

The reference has only wall-clock prints (SURVEY §5); here: a
jax.profiler trace context (view in TensorBoard/Perfetto), a wall-clock
decorator, and a throughput meter matching the reference's logged
`REAL it/s` / `Kt/s` metrics (src/trainer.py:121-129).
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device profile around a code block:

        with profile_trace("/tmp/trace"):
            step_fn(ts, batch)[1]["loss"].block_until_ready()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def record_time(fn=None, *, name: Optional[str] = None):
    """Wall-clock decorator (the reference's vestigial record_time,
    src/utils.py:6-14, made useful)."""

    def wrap(f):
        label = name or f.__name__

        @functools.wraps(f)
        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = f(*a, **kw)
            print(f"[time] {label}: {time.perf_counter() - t0:.4f}s")
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


class Throughput:
    """it/s and Kt/s meter with EMA smoothing."""

    def __init__(self, ctx_len: int, real_bsz: int, *, ema: float = 0.9):
        self.ctx_len = ctx_len
        self.real_bsz = real_bsz
        self.ema = ema
        self._last = None
        self._its = None

    def step(self) -> dict:
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            its = 1.0 / dt if dt > 0 else float("inf")
            self._its = (
                its
                if self._its is None
                else self.ema * self._its + (1 - self.ema) * its
            )
            out = {
                "it/s": self._its,
                "Kt/s": self.ctx_len * self.real_bsz * self._its / 1000.0,
            }
        self._last = now
        return out
