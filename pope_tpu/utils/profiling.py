"""Tracing/profiling (the reference InferenceProfiler equivalent).

Reference behavior: src/utils/profiler.py:7-35 — a profiler wrapper with
labeled regions synchronized around device work, plus a build_profiler
factory (inference / pytorch / passthrough). TPU-native: jax.profiler traces
+ named scopes; region timing forces completion with block_until_ready the
way the reference calls torch.cuda.synchronize (:19-27).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class InferenceProfiler:
    """Accumulating region timer with device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str, sync_on=None):
        with jax.named_scope(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                if sync_on is not None:
                    jax.block_until_ready(sync_on)
                dt = time.perf_counter() - t0
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> str:
        lines = ["region                          total_s   calls   mean_ms"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30}  {total:7.3f}  {n:6d}  {1000*total/max(n,1):8.2f}")
        return "\n".join(lines)


class PassThroughProfiler:
    @contextlib.contextmanager
    def profile(self, name: str, sync_on=None):
        yield

    def summary(self) -> str:
        return "(passthrough profiler)"


def build_profiler(name: Optional[str] = None):
    """'inference' -> region timer; 'trace:<dir>' -> jax.profiler trace
    context factory; None/other -> passthrough (profiler.py:30-35)."""
    if name == "inference":
        return InferenceProfiler()
    if name and name.startswith("trace:"):
        log_dir = name.split(":", 1)[1]

        class TraceProfiler(PassThroughProfiler):
            @contextlib.contextmanager
            def profile(self, region: str, sync_on=None):
                with jax.profiler.trace(log_dir):
                    with jax.named_scope(region):
                        yield

        return TraceProfiler()
    return PassThroughProfiler()
