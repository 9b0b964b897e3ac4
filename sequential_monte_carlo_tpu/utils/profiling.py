"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference's only observability is @printf progress lines
(smc_samplers.jl:110,143,168,270,309). Here:

  * phases of the sampler step are wrapped in ``jax.named_scope`` so XLA/
    profiler traces show propagate / reweight / resample / rejuvenate
    sections;
  * :func:`trace` captures a jax.profiler trace of an arbitrary callable to
    a TensorBoard-compatible directory;
  * per-step statistical telemetry is returned as arrays (StepInfo), not
    printed.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace: ``with trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, repeats: int = 3, warmup: int = 1, **kwargs):
    """Wall-clock a jitted callable (device-synchronized). Returns
    (best_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
