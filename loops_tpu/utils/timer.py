"""Device timing (reference: util/timer.hxx:19-52).

The reference times with device events; the JAX analog is wall-clock
around ``jax.block_until_ready`` after a compile-warming call, with a
best-of-N loop to shave dispatch jitter.
"""
from __future__ import annotations

import time

import jax


class Timer:
    """Context-manager + accumulator timer over block_until_ready."""

    def __init__(self):
        self._t0 = None
        self.milliseconds = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.milliseconds = (time.perf_counter() - self._t0) * 1e3
        return self.milliseconds

    @property
    def seconds(self):
        return self.milliseconds / 1e3


def time_fn(fn, *args, warmup: int = 1, iters: int = 10,
            reduction=min) -> float:
    """Milliseconds per call of ``fn(*args)``; compiles first, then takes
    ``reduction`` (default min) over ``iters`` timed calls."""
    for _ in range(max(warmup, 1)):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(reduction(times))
