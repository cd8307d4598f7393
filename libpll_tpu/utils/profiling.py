"""Tracing / profiling helpers (SURVEY §5.1).

The reference's only measurement tooling is the 20-replicate wall-clock mode
of its test runner (`test/runtest.py:137-263`); the rebuild exposes the TPU
equivalents: `jax.profiler` trace capture plus a robust wall-clock timer for
jitted functions.

Timing note (also in BASELINE.md): on some remote-TPU platforms
``block_until_ready`` does not fence device work, so ``time_jitted`` chains
K data-dependent invocations inside one jit, ends in a scalar readback, and
reports (t_K − t_1)/(K − 1) — which also cancels the host↔device readback
latency from the measurement.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a `jax.profiler` trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(make_chain: Callable[[int], Callable], *args,
                k: int = 5, reps: int = 3) -> float:
    """Seconds per invocation of a chained jitted function.

    ``make_chain(k)`` must return a jitted callable running the workload k
    times with data dependencies between iterations and returning a scalar.
    """
    f1, fk = make_chain(1), make_chain(k)

    def best(f):
        float(f(*args))  # compile + warm
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(fk) - best(f1)) / (k - 1)


class KernelTimer:
    """Accumulate named wall-clock measurements (host-side, coarse)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{name}: {self.totals[name]*1e3:.2f} ms "
                 f"({self.counts[name]}x)"
                 for name in sorted(self.totals)]
        return "\n".join(lines)
