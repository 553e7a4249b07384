"""Profiling utilities: jax.profiler traces + step metric counters.

TPU-native replacement for the reference's cProfile helper
(/root/reference/scripts/cprof_stat.py) and wall-clock benchmark prints:
traces capture device timelines viewable in XProf/TensorBoard, and
StepMetrics keeps structured per-phase throughput counters.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Wrap a region in a jax.profiler trace when ``trace_dir`` is set."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepMetrics:
    """Accumulates named phase timings and byte counts."""

    phases: dict[str, float] = field(default_factory=dict)
    counters: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def add(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def throughput(self, bytes_counter: str, phase: str) -> float:
        secs = self.phases.get(phase, 0.0)
        return self.counters.get(bytes_counter, 0.0) / max(secs, 1e-9)

    def as_dict(self) -> dict[str, float]:
        out = {f"seconds/{k}": v for k, v in self.phases.items()}
        out.update({f"count/{k}": v for k, v in self.counters.items()})
        return out


__all__ = ["maybe_trace", "StepMetrics"]
