"""Profiling and throughput instrumentation.

The reference has none ("really we should actually profile the sampling",
``tests/testStoppingApproximation.py:5-6``); SURVEY.md §5 calls for
jax.profiler traces + per-stage timing + steps/sec.  This module provides:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-compatible trace directory.
* :class:`Throughput` — running walker-steps/sec meter for sampler loops.
* :func:`time_jitted` — compile-vs-steady-state timing of a jitted callable.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a device trace: ``with trace('dir'): run_step()``."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Throughput:
    """Walker-steps/sec meter, reported incrementally like the drivers'
    per-step progress prints (``tests/simultFit.py:736,780``)."""

    n_walkers: int
    t0: float = dataclasses.field(default_factory=time.perf_counter)
    steps: int = 0

    def update(self, n_steps: int) -> float:
        self.steps += n_steps
        return self.rate

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps * self.n_walkers / dt if dt > 0 else 0.0


def time_jitted(fn: Callable, *args, n_iters: int = 3) -> dict:
    """Time a jittable callable: first call (compile) vs steady state."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady_s = (time.perf_counter() - t0) / n_iters
    return {"compile_s": compile_s, "steady_s": steady_s}
