"""Tracing / profiling utilities (SURVEY.md §5.1; reference: gttic/gttoc
hierarchical timers + verbosity prints).

- `scope(name)`: jax.named_scope wrapper — stages show up in xprof/today's
  TensorBoard trace viewer with solver-meaningful names
  (linearize/assemble/factorize/backsolve/retract).
- `trace(logdir)`: context manager around jax.profiler.trace for capturing a
  device trace of a solve.
- `time_fn`: wall-clock a jitted callable (compile excluded, best-of-k) —
  the measurement discipline used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax

scope = jax.named_scope  # usage: with profiling.scope("factorize"): ...


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed computation."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, repeats: int = 3, **kwargs) -> tuple[float, Any]:
    """(best_seconds, last_result): runs once to compile, then best-of-k."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
