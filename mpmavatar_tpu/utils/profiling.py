"""Tracing / profiling utilities.

TPU equivalent of the reference's ``wp.ScopedTimer`` phase dict
(/root/reference/warp_mpm/mpm_solver.py:288-541): within one fused XLA
program the per-phase breakdown lives in the profiler trace
(``jax.named_scope`` annotations label the substep phases); wall-clock
phase timing is available via ``PhaseTimer`` for non-fused host loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


named_scope = jax.named_scope  # re-export: used to label substep phases


class PhaseTimer:
    """Host-side phase accumulator (print_time_profile equivalent,
    mpm_solver.py:538-541)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def print_time_profile(self):
        print("MPM Time profile:")
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            print(f"  {k}: {self.totals[k]:.3f}s over {self.counts[k]} calls")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
