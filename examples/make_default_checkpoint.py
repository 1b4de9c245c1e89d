"""Regenerate the bundled default U-Net checkpoint.

Trains the reference architecture (``UNetSpec(1, 5)``, channels
``('z-1', 'y-1', 'x-1', 'mask', 'centreness-log')``) on synthetic
blob fixtures — random gaussian-smoothed point fields with EDT-derived
instance labels, the same fixture class the test-suite uses — through
the PUBLIC training path (``run_experiment``), then copies the final
checkpoint to ``--out``.  See ``iterseg_tpu/data/README.md`` for the
provenance of the committed blob.

Runs fine on the CPU mesh (slow: minutes per epoch at the default
size); on a TPU it is quick.

    python examples/make_default_checkpoint.py \
        --out iterseg_tpu/data/default_unet.npz
"""
import argparse
import os
import shutil
import sys
import tempfile

import numpy as np
from scipy import ndimage as ndi

# runnable from anywhere without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def blob_frame(shape=(16, 256, 256), n=160, seed=0):
    """One synthetic (image, instance-labels) frame."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(2, s - 2, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    vol /= vol.max()
    mask = vol > 0.1
    dist = ndi.distance_transform_edt(mask)
    peaks = (dist == ndi.maximum_filter(dist, size=3)) & mask
    markers, _ = ndi.label(peaks)
    from iterseg_tpu.ops.watershed import image_watershed

    labels = image_watershed(
        (-dist).astype(np.float32), markers.astype(np.int32), mask
    )
    noisy = np.clip(
        vol + r.normal(0, 0.03, vol.shape).astype(np.float32), 0, 1
    )
    return noisy, labels.astype(np.uint32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="iterseg_tpu/data/default_unet.npz")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--shape", type=int, nargs=3, default=(16, 256, 256))
    ap.add_argument("--n-each", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--train-shape", type=int, nargs=3,
                    default=(10, 256, 256))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from iterseg_tpu.train.experiments import (
        get_experiment_dict,
        run_experiment,
    )

    frames = [blob_frame(tuple(args.shape), seed=args.seed + i)
              for i in range(args.frames)]
    images = [f[0] for f in frames]
    labels = [f[1] for f in frames]

    channels = (("z-1", "y-1", "x-1", "mask", "centreness-log"),)
    exp = get_experiment_dict(
        list(channels), ["default"],
        conditions_list=[{"epochs": args.epochs}],
        name="default-unet", n_each=args.n_each, validation_prop=0.2,
        scale=(4, 1, 1),
    )
    exp["get_train_data"]["shape"] = tuple(args.train_shape)

    workdir = tempfile.mkdtemp(prefix="default_unet_train_")
    try:
        u_paths = run_experiment(exp, images, labels, workdir)
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        shutil.copyfile(u_paths[0], args.out)
        print(f"checkpoint -> {args.out}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
