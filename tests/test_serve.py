"""Compile-once serve-many mode (engine/serve.py): warm-config reuse,
bit-identity with one-shot runs, and the watch-directory protocol."""
import os

import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.engine.serve import (SegmentationServer, scan_watch_dir,
                                      watch)
from iterseg_tpu.io.zarr_io import load_ome_zarr, open_zarr

CHUNK, MARGIN = (8, 64, 64), (1, 8, 8)


def _blobs(shape=(8, 64, 64), n=40, seed=0):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    for c in np.stack([r.integers(2, s - 2, size=n) for s in shape], 1):
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    return (vol / vol.max()).astype(np.float32)


def _save_zarr(path, data):
    arr = open_zarr(path, shape=data.shape, chunks=data.shape,
                    dtype=np.float32)
    arr[...] = data
    return str(path)


def test_server_warm_reuse_and_identity(tmp_path):
    """Two volumes through one server: the config (model, pipeline cache)
    is built once and reused, and labels bit-match the one-shot
    segmenter-registry path on the same volume."""
    from iterseg_tpu.engine.segmentation import segmenters

    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    v0, v1 = _blobs(seed=0), _blobs(seed=1)
    out0 = server.segment_to(v0, tmp_path / "a.ome.zarr", name="a")
    cfg = server._config
    assert cfg is not None and cfg.get("pipeline_cache")
    out1 = server.segment_to(v1, tmp_path / "b.ome.zarr", name="b")
    assert server._config is cfg  # warm: prepped exactly once

    ref = segmenters["DoG-blob-watershed"](
        None, v1, str(tmp_path / "ref"), "oneshot",
        chunk_size=CHUNK, margin=MARGIN,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref))
    assert np.asarray(out0).max() > 0


def test_server_shape_change(tmp_path):
    """A zyx shape change mid-stream resizes the scratch, not the model."""
    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    server.segment_to(_blobs(), tmp_path / "a.ome.zarr")
    out = server.segment_to(_blobs(shape=(6, 32, 32), n=10),
                            tmp_path / "b.ome.zarr")
    assert np.asarray(out).shape == (6, 32, 32)


def test_server_affinity_warm_identity(tmp_path):
    """The affinity path serves warm too: one U-Net load + one pipeline
    cache across volumes, labels bit-equal the one-shot registry run."""
    from iterseg_tpu.engine.segmentation import segmenters

    server = SegmentationServer("affinity-unet-watershed",
                                chunk_size=CHUNK, margin=MARGIN)
    v = _blobs(seed=3)
    out0 = server.segment_to(v, tmp_path / "a.ome.zarr")
    model = server._config["unet"]
    out1 = server.segment_to(_blobs(seed=4), tmp_path / "b.ome.zarr")
    assert server._config["unet"] is model  # loaded exactly once

    ref = segmenters["affinity-unet-watershed"](
        None, v, str(tmp_path / "ref"), "oneshot", None,
        chunk_size=CHUNK, margin=MARGIN,
    )
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))
    assert np.asarray(out1).shape == v.shape


def test_server_unknown_segmenter():
    with pytest.raises(ValueError, match="unknown segmenter"):
        SegmentationServer("nope")


def test_watch_protocol(tmp_path):
    """watch(once=True) drains pending inputs, writes .done markers,
    skips already-served stores on the next drain, and picks up new
    arrivals; half-written stores (no .zarray) are ignored."""
    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    _save_zarr(w / "v0.zarr", _blobs(seed=0))
    _save_zarr(w / "v1.zarr", _blobs(seed=1))
    os.makedirs(w / "half.zarr")  # producer still writing: no .zarray

    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    done = watch(str(w), str(o), server, once=True)
    assert done == ["v0", "v1"]
    for stem in done:
        assert (o / f"{stem}.done").exists()
        [(data, _, lt)] = load_ome_zarr(str(o / f"{stem}.ome.zarr"))
        assert lt == "labels" and np.asarray(data).max() > 0

    # drained: nothing pending, second pass is a no-op
    assert scan_watch_dir(str(w), str(o)) == []
    mtime = os.path.getmtime(o / "v0.done")
    assert watch(str(w), str(o), server, once=True) == []
    assert os.path.getmtime(o / "v0.done") == mtime

    # a new arrival is picked up alone
    _save_zarr(w / "v2.zarr", _blobs(seed=2))
    assert watch(str(w), str(o), server, once=True) == ["v2"]


def test_watch_crash_resume(tmp_path):
    """A crashed serve (no .done marker, output store partially filled)
    resumes via the per-frame warm restart: already-labelled frames are
    left untouched, only the missing frames are segmented."""
    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    stack = np.stack([_blobs(seed=0), _blobs(seed=1)])
    arr = open_zarr(w / "stack.zarr", shape=stack.shape,
                    chunks=(1,) + stack.shape[1:], dtype=np.float32)
    arr[...] = stack

    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    assert watch(str(w), str(o), server, once=True) == ["stack"]

    # simulate the crash: marker gone, frame 1 never finished, frame 0
    # carries labels a human might already have proofread
    os.remove(o / "stack.done")
    out = open_zarr(str(o / "stack.ome.zarr" / "0"))
    out[0] = np.full(stack.shape[1:], 7, dtype=np.int32)
    out[1] = np.zeros(stack.shape[1:], np.int32)

    assert watch(str(w), str(o), server, once=True) == ["stack"]
    assert (o / "stack.done").exists()
    resumed = np.asarray(open_zarr(str(o / "stack.ome.zarr" / "0")))
    np.testing.assert_array_equal(resumed[0], 7)  # skipped, not redone
    assert resumed[1].max() > 0                   # finished the tail


def test_watch_failure_retries(tmp_path, capsys):
    """A broken input is reported, gets no marker, and does not block
    the rest of the queue."""
    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    bad = w / "bad.zarr"
    os.makedirs(bad)
    (bad / ".zarray").write_text("not json")
    _save_zarr(w / "good.zarr", _blobs())

    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    done = watch(str(w), str(o), server, once=True)
    assert done == ["good"]
    assert not (o / "bad.done").exists()
    assert "ERROR serving" in capsys.readouterr().out
    # still pending for the next poll
    assert [s for _, s, _ in scan_watch_dir(str(w), str(o))] == ["bad"]


def test_watch_serves_ome_root_stores(tmp_path):
    """An OME-Zarr export (group root, array at 0/) in the watch dir is
    servable, not treated as half-written."""
    from iterseg_tpu.io.zarr_io import save_labels_to_ome

    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    vol = _blobs()
    save_labels_to_ome(
        w / "ome-vol.zarr", data=vol,
        layer_meta={"scale": (1.0,) * 3, "translate": (0.0,) * 3,
                    "name": "v"},
    )
    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    assert watch(str(w), str(o), server, once=True) == ["ome-vol"]
    [(data, _, lt)] = load_ome_zarr(str(o / "ome-vol.ome.zarr"))
    assert lt == "labels" and np.asarray(data).max() > 0


def test_watch_stem_collision(tmp_path):
    """A store and a tiff sharing a base name are BOTH served — the
    later source under the deterministic <base>-<ext> alias — across
    separate drains (markers record their source)."""
    from PIL import Image

    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    _save_zarr(w / "vol.zarr", _blobs(seed=0))
    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    assert watch(str(w), str(o), server, once=True) == ["vol"]

    # a different volume arrives as vol.tif: served under vol-tif
    frames = [Image.fromarray(z) for z in _blobs(seed=1)]
    frames[0].save(w / "vol.tif", save_all=True, append_images=frames[1:])
    assert watch(str(w), str(o), server, once=True) == ["vol-tif"]
    assert (o / "vol-tif.done").exists() and (o / "vol.done").exists()
    # both drained; nothing pending, nothing shadowed
    assert watch(str(w), str(o), server, once=True) == []


def test_watch_errors_collected(tmp_path):
    """errors=[] collects failures (the CLI exits nonzero on a failed
    --once drain)."""
    from iterseg_tpu.cli import main

    w, o = tmp_path / "in", tmp_path / "out"
    os.makedirs(w)
    bad = w / "bad.zarr"
    os.makedirs(bad)
    (bad / ".zarray").write_text("not json")
    server = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    errors = []
    assert watch(str(w), str(o), server, once=True, errors=errors) == []
    assert len(errors) == 1 and errors[0][0].endswith("bad.zarr")
    assert main(["serve", "--watch-dir", str(w), "--output-dir", str(o),
                 "--segmenter", "DoG-blob-watershed", "--once"]) == 1


def test_server_multi_device_frames_identical(tmp_path):
    """devices= round-robins a stack's frames across chips (CPU-mesh
    stand-ins here); labels bit-equal the single-device serve."""
    import jax

    stack = np.stack([_blobs(seed=s) for s in range(3)])
    single = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                                margin=MARGIN)
    out1 = single.segment_to(stack, tmp_path / "one.ome.zarr")

    multi = SegmentationServer("DoG-blob-watershed", chunk_size=CHUNK,
                               margin=MARGIN, devices=jax.devices()[:2])
    out2 = multi.segment_to(stack, tmp_path / "two.ome.zarr")
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.asarray(out1).max() > 0
