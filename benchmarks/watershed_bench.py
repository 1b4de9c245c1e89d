"""Watershed-only benchmark (twin of the reference's self-harness at
watershed.py:254-298): synthetic blob volume → pseudo-affinities →
segment_output_image, timing native C++ vs the pure-Python oracle, and
asserting their equality (the reference's own correctness criterion).

Run: python benchmarks/watershed_bench.py [size]
"""
import sys
import time

import numpy as np
from scipy import ndimage as ndi


def main(length=128):
    sys.path.insert(0, ".")
    from iterseg_tpu.ops.watershed import segment_output_image

    r = np.random.default_rng(0)
    noise = r.random((length,) * 3)
    sm = ndi.gaussian_filter(noise, 4.0)
    foreground = sm > np.quantile(sm, 0.65)
    centroids = ndi.distance_transform_edt(foreground)
    g = np.gradient(foreground.astype(float))
    volume = np.stack(
        [np.abs(g[0]), np.abs(g[1]), np.abs(g[2]), centroids, foreground],
        axis=0,
    ).astype(np.float32)

    start = time.time()
    segment_output_image(volume, (0, 1, 2), 3, 4, absolute_thresh=0.5)
    print(f"warmup (incl. device compile): {time.time() - start:.3f}s")

    start = time.time()
    labels, _, _ = segment_output_image(volume, (0, 1, 2), 3, 4,
                                        absolute_thresh=0.5)
    t_native = time.time() - start
    print(f"native C++ flood pipeline: {t_native:.3f}s "
          f"({labels.max()} objects)")

    start = time.time()
    labels_py, _, _ = segment_output_image(volume, (0, 1, 2), 3, 4,
                                           absolute_thresh=0.5, py_func=True)
    t_py = time.time() - start
    print(f"pure-python oracle: {t_py:.3f}s  (native speedup "
          f"{t_py / t_native:.1f}x)")
    print("native and python are equal:", bool(np.all(labels == labels_py)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
