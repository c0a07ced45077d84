"""Frame/section timing: the reference's RESET_TIME/PRINT_TIME macros and
aggregating `timing_profiler` (count/total/max/avg per label,
profiler.cpp:14-50, 3DWorld.h:1323-1328) as a label -> stats registry,
plus `jax.profiler` trace hooks for xprof.

Note on measuring device work: always force results (e.g.
`float(x.sum())`) inside a timed scope — async dispatch otherwise makes
wall times meaningless (and the axon relay memoizes identical-input
dispatches; see the project verify skill).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class _Entry:
    count: int = 0
    total: float = 0.0
    tmax: float = 0.0

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


@dataclass
class TimingProfiler:
    """timing_profiler equivalent: register(label) accumulates stats."""

    entries: dict = field(default_factory=dict)
    enabled: bool = True

    def register(self, label: str, seconds: float) -> None:
        if not self.enabled:
            return
        e = self.entries.setdefault(label, _Entry())
        e.count += 1
        e.total += seconds
        e.tmax = max(e.tmax, seconds)

    @contextlib.contextmanager
    def time(self, label: str):
        """with profiler.time("physics"): ...  (RESET_TIME/PRINT_TIME)"""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.register(label, time.perf_counter() - t0)

    def report(self) -> str:
        """print_timing_profiler-style table."""
        lines = [f"{'label':<32} {'count':>8} {'total_ms':>10} {'avg_ms':>9} {'max_ms':>9}"]
        for k in sorted(self.entries):
            e = self.entries[k]
            lines.append(f"{k:<32} {e.count:>8} {e.total * 1e3:>10.2f} "
                         f"{e.avg * 1e3:>9.3f} {e.tmax * 1e3:>9.3f}")
        return "\n".join(lines)

    def clear(self) -> None:
        self.entries.clear()


GLOBAL_PROFILER = TimingProfiler()
timer = GLOBAL_PROFILER.time


@contextlib.contextmanager
def device_trace(log_dir: str):
    """xprof trace scope (TPU equivalent of gpu_timer_t)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
