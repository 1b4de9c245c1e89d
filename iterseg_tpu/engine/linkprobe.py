"""Host↔device link bandwidth probe + the measured decision table.

Two production defaults depend on the host link's bandwidth, not on the
chip (benchmarks/RESULTS.md, "Microbatch sizing" and the watershed
engineering curve):

==========================  =========================================
quantity                    measured decision curve (v5e, 256³)
==========================  =========================================
U-Net microbatch            B=8 on slow links (finer upload/compute
                            overlap: with-upload makespan favours 8 on
                            the ~50 MB/s tunnel) vs B=16 on fast links
                            (pure-compute optimum, 0.505 s vs 0.55 s;
                            boundary unmeasured between 65 MB/s and
                            PCIe class — threshold set at 200 MB/s)
``device_flood=True``       the Pallas device flood beats the host
                            heap END-TO-END above ~38 MB/s at every
                            mask density (below, the label download
                            exceeds the host flood it replaces on
                            sparse masks) — True resolves to "pallas"
                            on fast links and to the exact host flood
                            on slower ones
==========================  =========================================

The probe uploads a small buffer a few times and fences each upload by
downloading one element (``block_until_ready`` acks before execution
through this machine's tunnel — CLAUDE.md), then reports the median
MB/s.  It runs once per process, lazily, only on a real TPU backend —
the CPU test mesh has no host link, so ``measure_link_mbps`` returns
``None`` there and every consumer keeps its slow-link (status quo)
default.  Tests monkeypatch :func:`measure_link_mbps` to pin both
branches.
"""
from __future__ import annotations

import time

import numpy as np

__all__ = [
    "MEASURED",
    "measure_link_mbps",
    "reset_cache",
]

MEASURED = {
    # microbatch cap: 8 below the threshold, 16 at/above it
    "microbatch_slow_link": 8,
    "microbatch_fast_link": 16,
    "microbatch_threshold_mbps": 200.0,
    # device_flood=True -> "pallas" at/above this, host flood below
    "device_flood_crossover_mbps": 38.0,
}

_PROBE_BYTES = 2 * 2 ** 20
_cache: list = []  # [None] = probed-and-unavailable; [float] = MB/s


def reset_cache():
    _cache.clear()


def measure_link_mbps(n_runs=3):
    """Median host→device bandwidth in MB/s, or ``None`` when no real
    link exists (non-TPU backend) or the probe fails.  Cached for the
    process (one ~6 MB, sub-second measurement at first use)."""
    if _cache:
        return _cache[0]
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() != "tpu":
            _cache.append(None)
            return None
        buf = np.empty(_PROBE_BYTES, np.uint8)
        buf[:] = 7
        # warm: compile the fence program + first transfer
        x = jnp.asarray(buf)
        np.asarray(x[:1])
        times = []
        for i in range(n_runs):
            buf[0] = i  # defeat any upload dedup/caching
            t0 = time.perf_counter()
            x = jnp.asarray(buf)
            np.asarray(x[:1])  # fence: consuming bytes, not block_until_ready
            times.append(time.perf_counter() - t0)
        mbps = _PROBE_BYTES / float(np.median(times)) / 2 ** 20
        _cache.append(float(mbps))
    except Exception:
        _cache.append(None)
    return _cache[0]
