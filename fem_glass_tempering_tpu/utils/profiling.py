"""Phase timing + jax.profiler integration.

The reference's entire observability surface is one wall-clock print
(SURVEY.md §5). Here: nested named phase timers with a report, and a
context manager around jax.profiler for device traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'phase':<24}{'total_s':>10}{'calls':>8}{'avg_ms':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<24}{t:>10.3f}{c:>8}{t / c * 1e3:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (TensorBoard 'profile' plugin /
    Perfetto). Usage: `with device_trace('/tmp/trace'): prob.solve()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_cache_stats() -> str:
    """Summarize jit cache usage for compile-time debugging."""
    import jax

    try:
        from jax._src import compilation_cache  # noqa: F401
        return "compilation cache: enabled"
    except Exception:
        return "compilation cache: unavailable"
