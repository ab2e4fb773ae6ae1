"""Timing + profiling harness for BASELINE metrics.

The reference's only notion of time is the matplotlib animation interval
(SURVEY.md section 5).  This module provides:
  * :func:`timed` - median wall time with a device->host transfer fence
    (``block_until_ready`` is a no-op on remote-tunneled TPU platforms, so
    a scalar fetch is the only reliable completion barrier);
  * :func:`steps_per_second` - throughput helper for the bench harness;
  * :func:`trace` - ``jax.profiler`` trace context for kernel-level
    inspection (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def _fence(out):
    """Force completion by pulling one scalar per leaf to the host."""
    leaves = jax.tree.leaves(out)
    acc = 0.0
    for leaf in leaves:
        if hasattr(leaf, "ravel") and leaf.size:
            acc += float(jnp.ravel(leaf)[0])
    return acc


def timed(fn, *args, reps: int = 5, warmup: int = 1):
    """Median wall-clock seconds of ``fn(*args)``, completion-fenced."""
    for _ in range(warmup):
        _fence(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def steps_per_second(fn, *args, work_items: int, reps: int = 5):
    """work_items / median-time - the BASELINE throughput metric shape."""
    return work_items / timed(fn, *args, reps=reps)


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
