"""Tracing / profiling hooks (SURVEY.md §5: the reference ships none; the
rebuild adds jax.profiler traces + per-phase step timing as first-class).

Usage:
    with trace_if("/tmp/tb"):            # writes a TensorBoard trace
        run_steps()

    timer = PhaseTimer()
    with timer.phase("sample"): ...
    with timer.phase("update_f_v"): ...
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace_if(logdir: Optional[str]):
    """jax.profiler trace when a logdir is given, no-op otherwise."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock per-phase accumulator (blocks on device completion so the
    numbers mean something under async dispatch)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {f"time/{k}_ms_": 1000.0 * v / max(self.counts[k], 1)
                for k, v in self.totals.items()}

    def reset(self):
        self.totals.clear()
        self.counts.clear()
