"""Paired A/B measurement of the exact-mode speculative host flood.

``device_flood="exact"`` overlaps the exact host flood under the
certificate fence on a worker thread (``AffinityPipeline._flood_exact``,
round 5): on fallback-bound inputs (the trained-checkpoint bench fixture
is chaotic-plateau — always ``fallback:unresolved``) the serial tail
(gather download + C++ flood, ~0.3–0.5 s) disappears into the ~2 s the
host previously spent blocked on the certificate scalars.

Because the tunnel's run-to-run bandwidth swings ~2× (CLAUDE.md), the
probe INTERLEAVES speculative-on and speculative-off runs in one session
and reports the paired per-run delta alongside the medians — the same
protocol bench.py uses for bf16.  Labels are asserted equal between the
two settings every pair (both halves are exact, so this is a smoke
check, not the proof — that's tests/test_flood_exact.py).

Run on the TPU:  python benchmarks/spec_overlap_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iterseg_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/jax_cache")

import numpy as np  # noqa: E402

from bench import CHUNK, MARGIN, get_params, make_volume  # noqa: E402


def main(n_pairs=8):
    from iterseg_tpu.engine.device_pipeline import AffinityPipeline
    from iterseg_tpu.engine.predict import UNetModel

    vol_u16 = np.round(make_volume() * 65535.0).astype(np.uint16)
    pipe = AffinityPipeline(UNetModel(get_params()), chunk_size=CHUNK,
                            margin=MARGIN, normalize=True,
                            device_flood="exact")
    pipe.segment(vol_u16)  # warm (compile cache makes this cheap)
    times = {"spec": [], "serial": []}
    paths = set()
    for i in range(n_pairs):
        labs = {}
        # ABBA: alternate which setting runs first, so a decaying
        # congestion trend cancels out of the paired deltas instead of
        # penalising whichever always went first
        order = (("spec", True), ("serial", False))
        if i % 2:
            order = order[::-1]
        for name, flag in order:
            pipe.speculative_flood = flag
            prof = {}
            t0 = time.perf_counter()
            labs[name] = pipe.segment(vol_u16, profile=prof)
            times[name].append(time.perf_counter() - t0)
            paths.add(prof.get("flood_exact_path"))
            sys.stderr.write(
                f"[{name}] {times[name][-1]:.2f}s path="
                f"{prof.get('flood_exact_path')} "
                f"spec={prof.get('flood_speculative', False)}\n"
            )
        assert np.array_equal(labs["spec"], labs["serial"])
    deltas = [s - p for p, s in zip(times["spec"], times["serial"])]
    print(json.dumps({
        "fixture": "bench 256^3, trained checkpoint, exact mode",
        "paths_seen": sorted(p for p in paths if p),
        "speculative_median_sec": round(float(np.median(times["spec"])), 3),
        "serial_median_sec": round(float(np.median(times["serial"])), 3),
        "paired_delta_sec": round(float(np.median(deltas)), 3),
        "paired_deltas": [round(d, 3) for d in deltas],
        "spec_runs": [round(t, 2) for t in times["spec"]],
        "serial_runs": [round(t, 2) for t in times["serial"]],
    }))


if __name__ == "__main__":
    main()
