"""Device-flood modes tour: approximate kernels, telemetry, exact mode.

Segments one synthetic volume four ways through the public registry and
prints what each mode guarantees:

* default            — exact host heap flood (the parity contract)
* device_flood="xla" — approximate on-device flood, with
  ``flood_telemetry=True`` reporting the rigorous per-run disagreement
  bound (``flood_disagreement_bound``)
* device_flood=True  — bandwidth-adaptive (Pallas above the measured
  link crossover, exact host flood below; `engine/linkprobe`)
* device_flood="exact" — the hybrid certificate + host-repair flood:
  labels BIT-EQUAL to the default (asserted), with the per-run
  uncertainty telemetry (docs/exact_flood.md)

Run (CPU works; a TPU uses the compiled kernels):

    python examples/device_flood_modes.py [out_dir]
"""
import os
import sys

import numpy as np
from scipy import ndimage as ndi

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from iterseg_tpu.engine.device_pipeline import AffinityPipeline  # noqa: E402
from iterseg_tpu.engine.predict import load_unet  # noqa: E402
from iterseg_tpu.engine.segmentation import segmenters  # noqa: E402


def blob_volume(shape=(10, 96, 96), n=30, seed=0):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(2, s - 2, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    return vol / vol.max()


def main(out_dir=None, shape=(10, 96, 96)):
    if out_dir is None:
        out_dir = sys.argv[1] if len(sys.argv) > 1 else None
    vol = blob_volume(shape)
    seg = segmenters["affinity-unet-watershed"]
    kw = dict(chunk_size=shape, margin=(1, 16, 16), debug=True)

    print("== default (exact host flood) ==")
    ref = np.asarray(seg(None, vol, out_dir, "default", None, **kw))
    print(f"   labels: {ref.max()} objects")

    print("== device_flood='xla' + flood_telemetry ==")
    model = load_unet(None)
    pipe = AffinityPipeline(model, chunk_size=shape,
                            margin=(1, 16, 16), device_flood="xla",
                            flood_telemetry=True)
    prof = {}
    approx = np.asarray(pipe.segment(vol, profile=prof))
    agree = (approx[ref > 0] == ref[ref > 0]).mean() if ref.max() else 1.0
    print(f"   measured agreement {agree:.4f}; rigorous bound "
          f"{prof['flood_disagreement_bound']:.4f} "
          f"(uncertain {prof['flood_uncertain_frac']:.4f})")

    print("== device_flood=True (bandwidth-adaptive) ==")
    print("   resolves to:",
          AffinityPipeline.normalize_device_flood(True) or "host flood")

    print("== device_flood='exact' (bit-equal hybrid) ==")
    pipe_exact = AffinityPipeline(model, chunk_size=shape,
                                  margin=(1, 16, 16),
                                  device_flood="exact")
    prof = {}
    exact = np.asarray(pipe_exact.segment(vol, profile=prof))
    assert np.array_equal(exact, ref), "exact mode must be bit-equal"
    print(f"   bit-equal to default: True; path "
          f"{prof.get('flood_exact_path')}, uncertain "
          f"{prof.get('flood_uncertain_frac', 0.0):.4f}")


if __name__ == "__main__":
    main()
