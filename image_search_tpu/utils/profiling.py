"""Profiling hooks: per-stage wall timing + the JAX trace server.

SURVEY.md §5 tracing row: the reference has none; here
``maybe_start_profiler(port)`` exposes the standard ``jax.profiler`` server
(connect with TensorBoard / xprof to see per-op TPU timelines), and
``StageTimer`` gives cheap named stage breakdowns (decode / H2D / forward /
top-k) for the ingest and query paths.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


def maybe_start_profiler(port: Optional[int]) -> bool:
    if not port:
        return False
    import jax

    jax.profiler.start_server(port)
    log.info("jax.profiler trace server listening on %d", port)
    return True


class StageTimer:
    """Accumulates wall time per named stage across iterations."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._open: Dict[str, float] = {}

    def start(self, stage: str) -> None:
        self._open[stage] = time.perf_counter()

    def stop(self, stage: str) -> None:
        t0 = self._open.pop(stage)
        dt = time.perf_counter() - t0
        self.totals[stage] = self.totals.get(stage, 0.0) + dt
        self.counts[stage] = self.counts.get(stage, 0) + 1

    class _Ctx:
        def __init__(self, timer, stage):
            self.timer, self.stage = timer, stage

        def __enter__(self):
            self.timer.start(self.stage)

        def __exit__(self, *exc):
            self.timer.stop(self.stage)
            return False

    def stage(self, name: str) -> "_Ctx":
        return self._Ctx(self, name)

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return " | ".join(
            f"{k}: {v:.3f}s ({100 * v / total:.0f}%, n={self.counts[k]})" for k, v in rows
        )
