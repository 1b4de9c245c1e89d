"""The ``python -m iterseg_tpu`` CLI: thin argparse layer over the same
headless API the widgets drive — labels/CSVs must come out of the exact
library paths (iterseg_tpu/cli.py)."""
import os

import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.cli import build_parser, main
from iterseg_tpu.io.zarr_io import open_zarr


def _blob_stack(shape=(2, 8, 64, 64), n=40, seed=0):
    r = np.random.default_rng(seed)
    frames, gts = [], []
    for _ in range(shape[0]):
        vol = np.zeros(shape[1:], np.float32)
        coords = np.stack([r.integers(2, s - 2, size=n)
                           for s in shape[1:]], 1)
        vol[tuple(coords.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1.0, 2.0, 2.0))
        vol /= vol.max()
        gt, _ = ndi.label(vol > 0.3)
        frames.append(vol)
        gts.append(gt.astype(np.int32))
    return np.stack(frames), np.stack(gts)


def _save_zarr(path, data, dtype):
    arr = open_zarr(path, shape=data.shape,
                    chunks=(1,) + data.shape[1:], dtype=dtype)
    arr[...] = data.astype(dtype)
    return str(path)


@pytest.fixture(scope="module")
def stack_zarrs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli-data")
    image, gt = _blob_stack()
    ip = _save_zarr(d / "images.zarr", image, np.float32)
    gp = _save_zarr(d / "gt.zarr", gt, np.int32)
    return ip, gp, image.shape


def test_parser_tuple_args():
    ap = build_parser()
    args = ap.parse_args([
        "segment", "--input", "a", "--output-dir", "b",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
        "--scale", "4,1,1",
    ])
    assert args.chunk_size == (8, 64, 64)
    assert args.margin == (1, 8, 8)
    assert args.scale == (4.0, 1.0, 1.0)
    with pytest.raises(SystemExit):
        ap.parse_args(["segment", "--input", "a", "--output-dir", "b",
                       "--chunk-size", "8,64"])


def test_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "affinity-unet-watershed" in out
    assert "DoG-blob-watershed" in out
    assert "devices:" in out


def test_segment_unknown_segmenter(tmp_path, capsys):
    rc = main(["segment", "--input", "x", "--output-dir", str(tmp_path),
               "--segmenter", "nope"])
    assert rc == 2
    assert "registered" in capsys.readouterr().err


def test_segment_dog_zarr_roundtrip(stack_zarrs, tmp_path, capsys):
    """segment on a tzyx zarr store → saved .ome.zarr, path on stdout."""
    from iterseg_tpu.io.zarr_io import load_ome_zarr

    ip, _, shape = stack_zarrs
    rc = main([
        "segment", "--input", ip, "--output-dir", str(tmp_path),
        "--name", "cli-dog", "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
    ])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert printed == str(tmp_path / "cli-dog.ome.zarr")
    [(data, meta, layer_type)] = load_ome_zarr(printed)
    assert layer_type == "labels"
    arr = np.asarray(data)
    assert arr.shape == shape and arr.max() > 0


def test_segment_device_flood_exact_flag(stack_zarrs, tmp_path, capsys):
    """--device-flood exact drives the hybrid-exact flood through the
    CLI and stays BIT-EQUAL to the default run."""
    from iterseg_tpu.io.zarr_io import load_ome_zarr

    ip, _, shape = stack_zarrs
    rc = main([
        "segment", "--input", ip, "--output-dir", str(tmp_path),
        "--name", "cli-dog-exact", "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
        "--device-flood", "exact",
    ])
    assert rc == 0
    rc = main([
        "segment", "--input", ip, "--output-dir", str(tmp_path),
        "--name", "cli-dog-ref", "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
    ])
    assert rc == 0
    [(a, _m1, _t1)] = load_ome_zarr(str(tmp_path / "cli-dog-exact.ome.zarr"))
    [(b, _m2, _t2)] = load_ome_zarr(str(tmp_path / "cli-dog-ref.ome.zarr"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segment_pyramid_levels(stack_zarrs, tmp_path, capsys):
    """--pyramid-levels appends stride-downsampled NGFF levels; level 0
    stays the exact labels."""
    from iterseg_tpu.io.zarr_io import ome_metadata, open_zarr

    ip, _, _ = stack_zarrs
    rc = main([
        "segment", "--input", ip, "--output-dir", str(tmp_path),
        "--name", "pyr", "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
        "--pyramid-levels", "1",
    ])
    assert rc == 0
    out = tmp_path / "pyr.ome.zarr"
    ds = ome_metadata(out)["multiscales"][0]["datasets"]
    assert [d["path"] for d in ds] == ["0", "1"]
    lvl0 = np.asarray(open_zarr(out / "0")[...])
    lvl1 = np.asarray(open_zarr(out / "1")[...])
    np.testing.assert_array_equal(lvl1, lvl0[..., ::2, ::2])


def test_assess_csvs(stack_zarrs, tmp_path, capsys):
    """assess GT-vs-GT (perfect segmentation): scores CSV lands with
    zero VI rows."""
    import pandas as pd

    _, gp, _ = stack_zarrs
    rc = main([
        "assess", "--ground-truth", gp, "--segmentation", gp,
        "--output-dir", str(tmp_path), "--prefix", "cli", "--name", "self",
        "--chunk-size", "6,32,32", "--margin", "1,8,8",
        "--exclude-chunks-less-than", "1",
    ])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert printed == str(tmp_path / "cli_self_scores.csv")
    scores = pd.read_csv(printed)
    assert len(scores) > 0
    assert np.allclose(scores["VI: GT | Output"], 0.0)


def test_pod_segment_single_host(stack_zarrs, tmp_path, capsys):
    """pod-segment without a coordinator = single-host SPMD degenerate
    case: all frames segmented into the shared output zarr, pod-sharded
    metrics CSVs written against GT."""
    ip, gp, shape = stack_zarrs
    out = tmp_path / "pod-out.zarr"
    rc = main([
        "pod-segment", "--input", ip, "--output", str(out),
        "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8",
        "--gt", gp, "--metrics-dir", str(tmp_path),
        "--prefix", "cli-pod", "--exclude-chunks-less-than", "1",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "host frames: [0, 1]" in printed
    seg = np.asarray(open_zarr(str(out)))
    assert seg.shape == shape and seg.max() > 0
    assert os.path.exists(tmp_path / "cli-pod_pod_scores.csv")


def test_serve_once(tmp_path, capsys):
    """serve --once drains a watch directory: OME-Zarr labels + .done
    markers per input, served paths on stdout."""
    from iterseg_tpu.io.zarr_io import load_ome_zarr

    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    image, _ = _blob_stack(shape=(1, 8, 64, 64))
    _save_zarr(w / "vol.zarr", image[0], np.float32)
    rc = main([
        "serve", "--watch-dir", str(w), "--output-dir", str(o),
        "--segmenter", "DoG-blob-watershed",
        "--chunk-size", "8,64,64", "--margin", "1,8,8", "--once",
    ])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert printed == str(o / "vol.ome.zarr")
    assert (o / "vol.done").exists()
    [(data, _, lt)] = load_ome_zarr(printed)
    assert lt == "labels" and np.asarray(data).max() > 0


def test_train_tiny(stack_zarrs, tmp_path, capsys):
    """train at test scale via --train-shape; prints the fresh .npz from
    unet_paths.txt and writes the meta JSON."""
    ip, gp, _ = stack_zarrs
    rc = main([
        "train", "--images", ip, "--labels", gp,
        "--output-dir", str(tmp_path), "--training-name", "cli-unet",
        "--epochs", "1", "--n-each", "2", "--validation-prop", "0.5",
        "--train-shape", "8,48,48", "--no-predict",
    ])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert printed.endswith(".npz") and os.path.exists(printed)
    metas = [f for f in os.listdir(tmp_path) if f.endswith("_meta.json")]
    assert len(metas) == 1


def test_convert_roundtrip(tmp_path, capsys):
    """convert: .npz -> .pt -> orbax -> .npz, parameters bit-preserved
    through every hop."""
    from iterseg_tpu.models.convert import load_checkpoint, save_checkpoint
    from iterseg_tpu.models.unet import UNetSpec, init_params

    params = init_params(UNetSpec(1, 5), seed=0)
    src = save_checkpoint(params, str(tmp_path / "src.npz"))

    hops = [str(tmp_path / "a.pt"), str(tmp_path / "orbax-dir"),
            str(tmp_path / "back.npz")]
    prev = src
    for out in hops:
        assert main(["convert", "--input", prev, "--output", out]) == 0
        assert capsys.readouterr().out.strip().splitlines()[-1] == out
        prev = out

    final = load_checkpoint(prev)
    orig = load_checkpoint(src)
    assert set(final) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(np.asarray(final[k]),
                                      np.asarray(orig[k]))
