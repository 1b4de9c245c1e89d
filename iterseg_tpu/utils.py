"""Observability utilities: phase timers and device profiler traces.

The reference's tracing story is tqdm bars and ad-hoc prints (SURVEY.md §5);
here profiling is first-class: a ``phase_timer`` accumulates wall-clock per
pipeline stage (the dict `AffinityPipeline.segment(profile=...)` fills), and
``device_trace`` wraps ``jax.profiler`` for TensorBoard-readable traces of
the on-device programs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

__all__ = ["phase_timer", "device_trace", "Stopwatch"]


class Stopwatch:
    """Accumulating named phase timer."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self):
        total = sum(self.times.values())
        lines = [f"total {total:.3f}s"]
        for k, v in sorted(self.times.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:24s} {v:8.3f}s ({v / max(total, 1e-9):5.1%})")
        return "\n".join(lines)


@contextlib.contextmanager
def phase_timer(profile: Optional[dict], name: str):
    """Accumulate elapsed seconds into ``profile[name]`` (no-op if None)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if profile is not None:
            profile[name] = profile.get(name, 0.0) + (
                time.perf_counter() - t0
            )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
