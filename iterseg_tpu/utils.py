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

__all__ = ["phase_timer", "device_trace", "Stopwatch",
           "enable_compilation_cache"]


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


def enable_compilation_cache(cache_dir: Optional[str] = None):
    """Point XLA's persistent compilation cache at a host-local directory.

    Cold-start cost on TPU is dominated by XLA compiles (a cold
    ``iterseg_tpu serve`` process measured 271 s on the bench chip, the
    warm one 44 s — benchmarks/RESULTS.md); the persistent cache makes the
    *second process* as warm as the second volume. Resolution order:
    explicit ``cache_dir`` argument → ``ITERSEG_TPU_COMPILE_CACHE`` env var
    (empty string disables) → ``~/.cache/iterseg_tpu/jax``. Returns the
    directory in use, or None when disabled.

    Called automatically by the CLI (``python -m iterseg_tpu``) and
    ``bench.py``; library users opt in by calling this once before the
    first traced computation.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("ITERSEG_TPU_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "iterseg_tpu", "jax"
        )
    if not cache_dir:
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the default 1s floor skips most of the U-Net's per-chunk programs;
    # cache everything — entries are small next to the volumes processed
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
