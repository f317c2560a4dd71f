"""Profiling / tracing helpers.

The reference brackets every outer iteration with ``time.perf_counter``
(archetypal_analysis.py:451-531) and exposes ``avg_time_per_iter`` /
``cost_deltas``; this framework keeps those as first-class outputs and
adds device-level tracing via ``jax.profiler`` for kernel-level
analysis.
"""

import contextlib
import time

import jax

__all__ = ["trace", "Timer", "block_and_time"]


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler device trace into ``log_dir`` (view with
    TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer with per-lap records."""

    def __init__(self):
        self.laps = []
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.laps.append(time.perf_counter() - self._start)

    @property
    def total(self):
        return sum(self.laps)

    @property
    def mean(self):
        return self.total / len(self.laps) if self.laps else 0.0


def block_and_time(fn, *args, repeats=1, **kwargs):
    """Run ``fn`` ``repeats`` times, blocking on device completion;
    returns ``(result, seconds_per_call)`` excluding the first
    (compile) call."""
    result = jax.block_until_ready(fn(*args, **kwargs))
    start = time.perf_counter()
    for _ in range(repeats):
        result = jax.block_until_ready(fn(*args, **kwargs))
    return result, (time.perf_counter() - start) / max(repeats, 1)
