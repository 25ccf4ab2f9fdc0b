"""Profiling helpers (the reference ships perf/flamegraph recipes,
/root/reference/bench/benches/justfile; here: jax.profiler traces and an
amortized wall-clock timer that cancels fixed dispatch latency).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/smtpu_trace"):
    """Capture a jax.profiler trace around a block; view with XProf/TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed_amortized(fn, reps: int = 5, probes: int = 3) -> float:
    """Steady-state seconds per fn() call, with fixed per-dispatch sync
    latency cancelled: time batches of 1 and reps+1 enqueued back-to-back
    (device executes sequentially), per-run = (t_many - t_one) / reps.

    fn must return a device array; a tiny host fetch provides the sync.
    """

    def sync(r):
        np.asarray(r).ravel()[:1]

    sync(fn())  # compile + warm

    def batch(m):
        t0 = time.perf_counter()
        r = None
        for _ in range(m):
            r = fn()
        sync(r)
        return time.perf_counter() - t0

    t_one = min(batch(1) for _ in range(probes))
    t_many = min(batch(reps + 1) for _ in range(max(probes - 1, 1)))
    return max((t_many - t_one) / reps, 1e-9)
