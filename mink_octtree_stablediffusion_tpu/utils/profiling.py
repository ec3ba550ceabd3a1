"""Profiling / timing helpers.

The reference relies on Lightning `profiler="simple"` + wall-clock `Timer`
(`examples/diffusion.py:837`, `examples/common.py:32-60`); here: a `Timer`
with the same min/max/avg reporting, a `trace` context manager around the
JAX profiler (TensorBoard-viewable), and a `step_timer` decorator for
per-step device-synchronized timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class Timer:
    """Wall-clock timer with running stats (reference `common.py:32-60`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self.min = float("inf")
        self.max = 0.0
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.calls += 1
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)
        return dt

    @property
    def avg(self) -> float:
        return self.total / max(self.calls, 1)

    def __str__(self):
        return (f"Timer(calls={self.calls}, avg={self.avg:.4f}s, "
                f"min={self.min:.4f}s, max={self.max:.4f}s)")


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace (open in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synced_time(fn, *args, iters: int = 10, warmup: int = 1, **kw) -> float:
    """Mean device-synchronized seconds per call of a jitted function."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
