"""Host↔device link bandwidth probe + the measured decision table.

Two production defaults depend on the host link's bandwidth, not on the
chip (benchmarks/RESULTS.md, "Microbatch sizing" and the watershed
engineering curve):

==========================  =========================================
quantity                    measured decision curve (v5e, 256³)
==========================  =========================================
U-Net microbatch            B=8 on slow links (finer upload/compute
                            overlap) vs B=16 on fast links (pure-
                            compute optimum, 0.505 s vs 0.55 s);
                            boundary DERIVED at 186 MB/s — see the
                            makespan derivation below
``device_flood=True``       the Pallas device flood beats the host
                            heap END-TO-END above ~38 MB/s at every
                            mask density (below, the label download
                            exceeds the host flood it replaces on
                            sparse masks) — True resolves to "pallas"
                            on fast links and to the exact host flood
                            on slower ones
==========================  =========================================

Microbatch-threshold provenance (round 5, closes the interpolated-
boundary caveat): the B=8↔16 crossover is derived from the two-stage
pipeline makespan ``T(B) = u_B + (n-1)·max(u_B, c_B) + c_B`` (n = 32/B
microbatches at the 256³ geometry; u_B = per-microbatch upload, c_B =
per-microbatch compute) with every constant MEASURED on chip: total
compute 0.55 s at B=8 vs 0.505 s at B=16 (the round-3 batch sweep,
benchmarks/RESULTS.md "Microbatch sizing"), and 8.375 MB per B=8
microbatch (33.5 MB u16 over 4 microbatches).  In the compute-bound
regime both schedules pay their full compute plus ONE exposed fill
upload, so switching to B=16 saves 45 ms of compute but doubles the
fill to one extra B=8-sized upload: crossover where
``8.375 MB / W = 0.045 s`` → **W* = 186 MB/s**.  Below ~61 MB/s both
are upload-bound and B=8 wins outright (its compute tail is 115 ms
shorter), between 61 and 186 MB/s the 45 ms saving never covers the
fill cost — the model has a single crossover, so the mid-band pick is
B=8 everywhere under 186 (pinned in tests/test_linkprobe.py).

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
    # microbatch cap: 8 below the threshold, 16 at/above it; the
    # threshold is DERIVED from on-chip measured constants via the
    # pipeline makespan model (module docstring), not interpolated
    "microbatch_slow_link": 8,
    "microbatch_fast_link": 16,
    "microbatch_threshold_mbps": 186.0,
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
