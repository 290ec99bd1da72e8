"""Tracing / profiling utilities.

The reference's only observability is per-iteration `@timed` wall time +
allocated bytes written to `*_times.csv` / `*_allocations.csv`
(myopic_bayesopt.jl:224-234, adaptive_bayesopt.jl:508-520). The TPU-native
equivalent is (a) structured XLA traces via jax.profiler, viewable in
TensorBoard/Perfetto, and (b) a lightweight per-phase wall-clock
accumulator for the experiment harness.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["trace", "annotate", "PhaseTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block into log_dir.

    View with TensorBoard's profile plugin or ui.perfetto.dev. Usage:

        with profiling.trace("/tmp/jax-trace"):
            acquire(state, rnstream, restarts)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate wall seconds per named phase (the @timed analog).

    Blocks until async dispatch completes only if the caller blocks;
    wrap device calls with `block_until_ready` for accurate numbers.

        t = PhaseTimer()
        with t.phase("acquisition"):
            xnext = acquire(...); xnext.block_until_ready()
        t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = [
            f"{name}: total {self.totals[name]:.3f}s over "
            f"{self.counts[name]} calls (mean {self.mean(name):.3f}s)"
            for name in sorted(self.totals)
        ]
        out = "\n".join(lines)
        print(out)
        return out


def device_memory_stats(device=None) -> dict:
    """Memory stats of a device ({} when the backend exposes none)."""
    device = device or jax.local_devices()[0]
    try:
        return dict(device.memory_stats() or {})
    except Exception:
        return {}
