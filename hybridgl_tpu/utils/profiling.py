"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5: tqdm only).
Here every pipeline stage can be wrapped in a named trace annotation that
shows up in a TPU profiler capture, plus a lightweight host-side stage
timer for quick "where does the time go" summaries without a trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """jax.profiler annotation (shows up in xprof/tensorboard captures)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time per named stage. ``block=True`` inserts a
    device sync so async dispatch doesn't hide the cost (only use while
    profiling — syncing destroys pipelining)."""

    def __init__(self, block: bool = False):
        self.block = block
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if self.block:
            (jax.device_put(0.0) + 0).block_until_ready()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1e-9
        lines = [f"{'stage':<24}{'total_s':>10}{'calls':>8}{'avg_ms':>10}{'pct':>7}"]
        for name, t in rows:
            n = self.counts[name]
            lines.append(
                f"{name:<24}{t:>10.3f}{n:>8}{1000 * t / max(n, 1):>10.2f}"
                f"{100 * t / total:>6.1f}%"
            )
        return "\n".join(lines)
