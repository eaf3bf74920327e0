"""Benchmark timing + profiling helpers.

Replaces the reference's rdtsc/clock_gettime harness with min-of-N
methodology (main.cpp:72-118, 798-807) adapted to the TPU reality that
host-side per-call timing through a dispatch tunnel is unreliable
(docs/KERNEL_NOTES.md): the trustworthy device number is the *slope* of
wall time against the number of serially-chained passes executed inside a
single jit — fixed dispatch/readback overhead cancels exactly.

`trace()` wraps jax.profiler for on-device timeline capture, the analog of
the reference's vendored IACA markers (iacaMarks.h) for hot-loop analysis.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Sequence


@dataclass
class Timing:
    min_s: float
    mean_s: float
    runs: int

    def mib_s(self, nbytes: int) -> float:
        return nbytes / (1 << 20) / self.min_s


def time_min(fn: Callable[[], object], runs: int = 3, warmup: int = 1) -> Timing:
    """min/mean wall time of fn() over `runs` (reference: min-of-N runs)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return Timing(min(ts), sum(ts) / len(ts), runs)


def slope_per_pass(
    make_chain: Callable[[int], Callable[[], object]],
    lo: int = 1,
    hi: int = 9,
    runs: int = 3,
) -> float:
    """Seconds per pass from the slope of wall(hi) - wall(lo).

    `make_chain(n)` must return a zero-arg callable that executes n
    serially-dependent passes inside one jit and blocks on a *small*
    readback (large readbacks bury the slope in transfer noise).
    """
    f_lo, f_hi = make_chain(lo), make_chain(hi)
    f_lo()
    f_hi()  # compile + warm
    t_lo = min(time_min(f_lo, runs=1, warmup=0).min_s for _ in range(runs))
    t_hi = min(time_min(f_hi, runs=1, warmup=0).min_s for _ in range(runs))
    return (t_hi - t_lo) / (hi - lo)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hsrans_trace"):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
