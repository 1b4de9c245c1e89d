"""4D pipelined throughput (BASELINE config #3): frame t+1's device
program overlaps frame t's host flood in ``AffinityPipeline.segment_stack``.

Measures seconds/frame and voxels/s on a T-frame 256^3 stack and prints
one JSON line, alongside the single-volume rate from the same process so
the pipelining gain is same-weather (the tunnel swings ~2x between
sessions). Run on the real chip: ``python benchmarks/stack_bench.py [T]``.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import CHUNK, MARGIN, SIZE, _enable_compile_cache, get_params, \
    make_volume  # noqa: E402


def main(n_frames=4, n_runs=3):
    _enable_compile_cache()
    from iterseg_tpu.engine.predict import UNetModel
    from iterseg_tpu.engine.device_pipeline import AffinityPipeline

    frames = [
        np.round(make_volume(SIZE, n_blobs=4000, seed=s) * 65535.0)
        .astype(np.uint16)
        for s in range(n_frames)
    ]
    stack = np.stack(frames)
    model = UNetModel(get_params())
    pipe = AffinityPipeline(model, chunk_size=CHUNK, margin=MARGIN,
                            normalize=True)

    pipe.segment(frames[0])  # compile all programs
    t0 = time.perf_counter()
    pipe.segment(frames[0])
    single = time.perf_counter() - t0

    out = np.zeros(stack.shape, np.int32)
    for _ in pipe.segment_stack(stack, out):  # warm the 4D path
        pass
    times = []
    for _ in range(n_runs):
        out[:] = 0  # warm-restart skips labelled frames: reset
        t0 = time.perf_counter()
        for _ in pipe.segment_stack(stack, out):
            pass
        times.append(time.perf_counter() - t0)
        sys.stderr.write(f"stack run {times[-1]:.2f}s "
                         f"({times[-1] / n_frames:.2f}s/frame)\n")
    assert out.max() > 0
    dt = float(np.median(times))
    voxels = stack.size
    print(json.dumps({
        "metric": f"pipelined 4D affinity segmentation, {n_frames}x{SIZE}^3",
        "sec_per_frame": round(dt / n_frames, 3),
        "voxels_per_sec": round(voxels / dt, 1),
        "single_volume_sec": round(single, 3),
        "pipelining_gain": round(single * n_frames / dt, 3),
        "run_seconds": [round(t, 2) for t in times],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
