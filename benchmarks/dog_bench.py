"""DoG-blob-watershed benchmark (BASELINE config #1): classical no-NN
segmentation of a synthetic 64³ blob volume, plus a 256³ scaling point.

Run: python benchmarks/dog_bench.py
"""
import json
import os
import sys
import time

# the session pre-imports jax, so env vars are too late — set the
# persistent compile cache through jax.config (effective either way)
def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_compile_cache()

import numpy as np
from scipy import ndimage as ndi


def blob_volume(size, n, seed=0):
    r = np.random.default_rng(seed)
    vol = np.zeros((size,) * 3, np.float32)
    coords = np.stack([r.integers(2, size - 2, size=n) for _ in range(3)], 1)
    vol[tuple(coords.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.0, 2.0, 2.0))
    return (vol / vol.max()).astype(np.float32)


def main():
    sys.path.insert(0, ".")
    from iterseg_tpu.engine.segmentation import dog_blob_watershed

    for size, n in ((64, 60), (256, 4000)):
        vol = blob_volume(size, n)
        # warmup (device gaussian compiles)
        dog_blob_watershed(None, vol, None, "warm", debug=True)
        # median of >=5 runs: the host tunnel's bandwidth swings ~2x
        # run-to-run (CLAUDE.md), so a single sample is weather, not speed
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            labels = dog_blob_watershed(None, vol, None, f"timed{i}",
                                        debug=True)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        voxels = vol.size
        print(json.dumps({
            "metric": f"DoG-blob-watershed end-to-end on {size}^3",
            "value": round(voxels / dt, 1),
            "unit": "voxels/sec",
            "objects": int(labels.max()),
            "seconds": round(dt, 2),
            "runs": [round(t, 2) for t in ts],
        }))
        if size == 256:
            # production-shaped secondary: u16 source data (real
            # microscopy dtype) through the 4D stack path, which ships
            # the frame in its source dtype (half the upload bytes) and
            # normalises on device
            u16 = np.round(vol * 65535.0).astype(np.uint16)[None]
            dog_blob_watershed(None, u16, None, "warm16", debug=True)
            ts16 = []
            for i in range(5):
                t0 = time.perf_counter()
                out = dog_blob_watershed(None, u16, None, f"t16{i}",
                                         debug=True)
                ts16.append(time.perf_counter() - t0)
            dt16 = float(np.median(ts16))
            print(json.dumps({
                "metric": f"DoG-blob-watershed on {size}^3, u16 source",
                "value": round(voxels / dt16, 1),
                "unit": "voxels/sec",
                "objects": int(np.asarray(out[0]).max()),
                "seconds": round(dt16, 2),
                "runs": [round(t, 2) for t in ts16],
            }))


if __name__ == "__main__":
    main()
