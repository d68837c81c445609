"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md sec 5: the only timing
evidence is a notebook comment). Here: jax.profiler trace capture around
any code block, and a lightweight phase timer the trainers use to report
preprocess/train/refine breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class PhaseTimer:
    """Accumulating named-phase wall timer.

    with timer.phase("assemble"): ...
    print(timer.report())
    """

    def __init__(self):
        self.times: OrderedDict[str, float] = OrderedDict()
        self.counts: OrderedDict[str, int] = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{'phase':<24} {'secs':>9} {'calls':>6} {'%':>6}"]
        for name, t in self.times.items():
            lines.append(
                f"{name:<24} {t:>9.3f} {self.counts[name]:>6} "
                f"{100 * t / max(total, 1e-12):>5.1f}%")
        lines.append(f"{'TOTAL':<24} {total:>9.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
