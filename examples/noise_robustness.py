"""Noise-robustness study (reference examples/add_noise.py +
segment_noisy.py + assess_noisy.py + collate_noise_series.py, collapsed
into one headless driver): add increasing uniform noise to images, segment
each series with both segmenters, assess against GT, and collate a VI /
count-difference line plot over noise level.
"""
import os
import sys

import numpy as np
import pandas as pd

from iterseg_tpu import Viewer
from iterseg_tpu.engine.segmentation import (
    affinity_unet_watershed,
    dog_blob_watershed,
)
from iterseg_tpu.widgets import _assess_segmentation


def add_noise_func(img, percent, rng):
    noise = percent / 100
    return img + rng.random(img.shape) * noise * img.max()


def run(image, gt, out_dir, unet=None,
        percentages=(0.5, 1, 2, 4, 8, 16, 32), segment_kwargs=None,
        assess_kwargs=None):
    """``segment_kwargs`` / ``assess_kwargs`` (e.g. ``chunk_size``,
    ``margin``) forward to the segmenters / the assessment — the defaults
    are the reference geometry (10, 256, 256)."""
    rng = np.random.default_rng(0)
    for p in percentages:
        noisy = add_noise_func(image, p, rng).astype(np.float32)
        for name, func, kwargs in (
            ("DoG", dog_blob_watershed, {}),
            ("PS", affinity_unet_watershed,
             {"unet_or_config_file": unet}),
        ):
            sd = os.path.join(out_dir, f"{p}%")
            os.makedirs(sd, exist_ok=True)
            seg = func(None, noisy, None, f"{name}_{p}%", debug=True,
                       **{**(segment_kwargs or {}), **kwargs})
            _assess_segmentation(
                gt, seg, save_dir=sd, save_prefix=f"{name}_{p}",
                name=f"{name}_{p}%", show=False,
                **(assess_kwargs or {}),
            )
    # collate
    dfs = []
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith("_scores.csv"):
                dfs.append(pd.read_csv(os.path.join(root, f)))
    df = pd.concat(dfs).reset_index(drop=True)
    df["percent_noise"] = df["model_name"].apply(
        lambda s: float(s[s.find("_") + 1:-1])
    )
    df["model"] = df["model_name"].apply(lambda s: s[: s.find("_")])
    df.to_csv(os.path.join(out_dir, "noise_series_collated.csv"))
    return df


if __name__ == "__main__":
    image = np.load(sys.argv[1])
    gt = np.load(sys.argv[2])
    out_dir = sys.argv[3]
    unet = sys.argv[4] if len(sys.argv) > 4 else None
    run(image, gt, out_dir, unet)
