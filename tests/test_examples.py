"""The examples/ scripts are the headless API documentation (reference
examples/*.py, SURVEY §2.1): prove they actually run end-to-end at test
scale on the CPU mesh."""
import functools
import os
import runpy
import subprocess
import sys

import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.io.zarr_io import load_ome_zarr, zarr_save

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def blobby(shape=(6, 64, 64), n=12, seed=3):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    for c in np.stack([r.integers(2, s - 2, size=n) for s in shape], 1):
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    return (vol / vol.max()).astype(np.float32)


@pytest.fixture(scope="module")
def tiny_unet(tmp_path_factory):
    from iterseg_tpu.models.convert import save_checkpoint
    from iterseg_tpu.models.unet import UNetSpec, init_params

    path = tmp_path_factory.mktemp("ckpt") / "tiny_unet.npz"
    return str(save_checkpoint(init_params(UNetSpec(1, 5), seed=0), path))


def test_predict_from_path_example(tmp_path, tiny_unet, monkeypatch):
    """examples/predict_from_path.py: a directory of zarr frames ->
    labels OME-Zarr (run via runpy; the segmenter is re-geometried to
    test scale through the module attribute the example imports)."""
    import iterseg_tpu.engine.segmentation as seg_mod

    frames = tmp_path / "frames"
    frames.mkdir()
    for t in range(2):
        zarr_save(str(frames / f"t{t}.zarr"), blobby(seed=3 + t))
    out = tmp_path / "out"
    out.mkdir()

    monkeypatch.setattr(
        seg_mod, "affinity_unet_watershed",
        functools.partial(seg_mod.affinity_unet_watershed,
                          chunk_size=(6, 64, 64), margin=(1, 8, 8)),
    )
    monkeypatch.setattr(sys, "argv", [
        "predict_from_path.py", str(frames), str(out), tiny_unet, "pred",
    ])
    runpy.run_path(os.path.join(EXAMPLES, "predict_from_path.py"),
                   run_name="__main__")

    [(data, meta, layer_type)] = load_ome_zarr(str(out / "pred.ome.zarr"))
    assert layer_type == "labels"
    assert np.asarray(data).shape == (2, 6, 64, 64)
    assert np.asarray(data).max() > 0


def test_noise_robustness_example(tmp_path, tiny_unet):
    """examples/noise_robustness.py: noise sweep -> both segmenters ->
    assessment CSVs -> collated dataframe."""
    sys.path.insert(0, EXAMPLES)
    try:
        import noise_robustness as nr
    finally:
        sys.path.pop(0)

    image = blobby(n=40, seed=5)
    gt, _ = ndi.label(image > 0.3)
    assert gt.max() >= 5
    # the assessment chunk grid must yield >=2 scored chunks: single-row
    # columns are dropped by the reference's len>1 stats filter
    df = nr.run(
        image, gt, str(tmp_path), unet=tiny_unet, percentages=(8,),
        segment_kwargs={"chunk_size": (6, 64, 64), "margin": (1, 8, 8)},
        assess_kwargs={"chunk_size": (6, 32, 32), "margin": (1, 8, 8),
                       "exclude_chunks_less_than": 1},
    )
    assert set(df["model"]) == {"DoG", "PS"}
    assert (df["percent_noise"] == 8.0).all()
    assert os.path.exists(tmp_path / "noise_series_collated.csv")


def test_multihost_example_single_host(tmp_path):
    """examples/multihost_segment.py runs single-host (no --port) as a
    real subprocess on a pre-made tiny input zarr."""
    zarr_save(str(tmp_path / "in.zarr"),
              np.stack([blobby(seed=7), blobby(seed=8)]))
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env(extra_pythonpath=[os.path.dirname(EXAMPLES)])
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "multihost_segment.py"),
         "--input", str(tmp_path / "in.zarr"),
         "--output", str(tmp_path / "out.zarr")],
        # 21s in isolation with the axon-free env (the old axon-client
        # subprocess wedged the tunnel: 93s, >600s flakes); headroom for
        # the suite sharing this host's single core
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "host segmented frames" in proc.stdout
    from iterseg_tpu.io.zarr_io import open_zarr

    out = np.asarray(open_zarr(str(tmp_path / "out.zarr")))
    assert out.shape == (2, 6, 64, 64) and out.max() > 0


def test_iterative_loop_example(tmp_path):
    """examples/iterative_loop.py: the full flywheel — DoG first pass ->
    assess -> ROI harvest -> train -> U-Net second pass -> assess ->
    round-over-round comparison figure."""
    sys.path.insert(0, EXAMPLES)
    try:
        import iterative_loop as il
    finally:
        sys.path.pop(0)

    image, gt = il.synthetic_stack(shape=(2, 8, 64, 64), n_blobs=40, seed=1)
    assert gt.max() >= 10
    out = il.run(
        image, gt, str(tmp_path), train_shape=(8, 48, 48),
        chunk_size=(8, 64, 64), margin=(1, 8, 8),
        assess_kwargs={"chunk_size": (6, 32, 32), "margin": (1, 8, 8),
                       "exclude_chunks_less_than": 1},
        epochs=1, n_each=4, show=False,
    )
    assert os.path.exists(out["unet_path"])
    assert out["labels"]["round0"].shape == image.shape
    assert out["labels"]["round1"].shape == image.shape
    # the DoG first pass must find objects; the 4-step U-Net may
    # legitimately find none at this scale (the flagship widget test
    # makes the same concession)
    assert out["labels"]["round0"].max() > 0
    # one stats frame per round, and the collated figure on disk
    for r in ("round0", "round1"):
        assert out[r]["model_name"].iloc[0].startswith(r)
        assert os.path.exists(
            tmp_path / "comparison" / f"{r}_{r}-"
            f"{'DoG' if r == 'round0' else 'unet'}_scores.csv"
        )
    assert os.path.exists(
        tmp_path / "comparison" / "iterative-rounds_metric_plots.pdf"
    ) or any(f.startswith("iterative-rounds") for f in
             os.listdir(tmp_path / "comparison"))


def test_sharded_train_example(tmp_path):
    """examples/sharded_train.py trains over the 8-device CPU mesh and
    saves a checkpoint + loss CSV."""
    import pandas as pd

    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env(
        n_devices=8, extra_pythonpath=[os.path.dirname(EXAMPLES)])
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "sharded_train.py"),
         str(tmp_path / "out"), "1", "4"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "{'data': 2, 'space': 4}" in proc.stdout
    df = pd.read_csv(tmp_path / "out" / "loss_sharded.csv")
    assert len(df) == 2  # 1 epoch x ceil(4 chunks / dp=2) steps
    assert np.isfinite(df["loss"]).all()


def test_device_flood_modes_example(tmp_path):
    """examples/device_flood_modes.py: the four flood modes through the
    public API — asserts exact-mode bit-equality internally."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "device_flood_modes",
        os.path.join(EXAMPLES, "device_flood_modes.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(out_dir=None, shape=(10, 64, 64))
