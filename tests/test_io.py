"""tensorstore-backed zarr / OME-Zarr I/O tests."""
import json
import numpy as np
import pytest

from iterseg_tpu.io.zarr_io import (
    open_zarr,
    zarr_save,
    zarr_open,
    save_labels_to_ome,
    load_ome_zarr,
    ome_metadata,
    is_ome_labels,
    get_napari_reader,
)


def test_open_zarr_create_and_reopen(tmp_path):
    p = tmp_path / "test.zarr"
    arr = open_zarr(p, shape=(4, 8, 8), chunks=(1, 8, 8), dtype=np.int32)
    assert arr.shape == (4, 8, 8)
    arr[1] = np.full((8, 8), 7, np.int32)
    arr2 = open_zarr(p)
    np.testing.assert_array_equal(arr2[1], 7)
    np.testing.assert_array_equal(arr2[0], 0)


def test_zarr_save_roundtrip(tmp_path, rng):
    data = rng.random((3, 5, 6)).astype(np.float32)
    p = tmp_path / "vol.zarr"
    zarr_save(p, data)
    loaded = zarr_open(p)
    np.testing.assert_array_equal(np.asarray(loaded), data)


def test_ome_zarr_roundtrip(tmp_path):
    p = tmp_path / "labels.ome.zarr"
    meta = {"scale": (1, 4, 1, 1), "translate": (0, 0, 0, 0), "name": "seg"}
    arr = save_labels_to_ome(
        p, layer_meta=meta, shape=(2, 4, 16, 16), chunks=(1, 4, 16, 16),
        dtype=np.int32,
    )
    arr[0] = np.arange(4 * 16 * 16).reshape(4, 16, 16).astype(np.int32)
    # metadata round trip
    ome = ome_metadata(p)
    assert is_ome_labels(ome)
    assert ome["multiscales"][0]["axes"][1]["name"] == "z"
    [(data, layer_meta, layer_type)] = load_ome_zarr(p)
    assert layer_type == "labels"
    np.testing.assert_allclose(layer_meta["scale"], (1, 4, 1, 1))
    assert data.shape == (2, 4, 16, 16)
    np.testing.assert_array_equal(
        data[0], np.arange(4 * 16 * 16).reshape(4, 16, 16)
    )


def test_napari_reader_hook(tmp_path):
    assert get_napari_reader("x.ome.zarr") is not None
    assert get_napari_reader("x.zarr") is None


def test_warm_restart_pattern(tmp_path):
    """output_labels zarr supports frame-wise any() scans (warm restart)."""
    p = tmp_path / "labels.zarr"
    arr = open_zarr(p, shape=(3, 4, 8, 8), chunks=(1, 4, 8, 8),
                    dtype=np.int32)
    arr[1] = np.ones((4, 8, 8), np.int32)
    flags = [bool(np.any(arr[t])) for t in range(3)]
    assert flags == [False, True, False]


def _image_ome_meta(with_omero=True):
    meta = {
        "multiscales": [{
            "version": "0.4",
            "name": "img",
            "axes": [
                {"name": "c", "type": "channel"},
                {"name": "z", "type": "space", "unit": "micrometer"},
                {"name": "y", "type": "space", "unit": "micrometer"},
                {"name": "x", "type": "space", "unit": "micrometer"},
            ],
            "datasets": [{
                "path": "0",
                "coordinateTransformations": [
                    {"type": "scale", "scale": [1.0, 4.0, 1.0, 1.0]},
                ],
            }],
        }],
    }
    if with_omero:
        meta["omero"] = {"channels": [
            {"label": "nuclei", "color": "00ff00", "active": True,
             "window": {"start": 10.0, "end": 200.0, "min": 0.0,
                        "max": 255.0}},
            {"label": "membrane", "color": "magenta", "active": False,
             "window": {"start": 0.0, "end": 90.0, "min": 0.0,
                        "max": 255.0}},
        ]}
    return meta


def test_ome_channel_metadata_recovered():
    from iterseg_tpu.io.zarr_io import ome_to_napari

    meta, layer_type = ome_to_napari(_image_ome_meta())
    assert layer_type == "image"
    assert meta["channel_axis"] == 0
    assert meta["contrast_limits"] == [(10.0, 200.0), (0.0, 90.0)]
    assert meta["name"] == ["nuclei", "membrane"]
    # bare hex colors get the leading '#'; names pass through
    assert meta["colormap"] == ["#00ff00", "magenta"]
    assert meta["visible"] == [True, False]


def test_ome_channel_metadata_unwraps_single_channel():
    from iterseg_tpu.io.zarr_io import ome_to_napari

    m = _image_ome_meta()
    m["multiscales"][0]["axes"] = m["multiscales"][0]["axes"][1:]  # no c axis
    m["omero"]["channels"] = m["omero"]["channels"][:1]
    meta, _ = ome_to_napari(m)
    assert meta["channel_axis"] is None
    assert meta["contrast_limits"] == (10.0, 200.0)
    assert meta["name"] == "nuclei"
    assert meta["colormap"] == "#00ff00"
    assert meta["visible"] is True


def test_ome_partial_channel_metadata_raises():
    from iterseg_tpu.io.zarr_io import ome_to_napari

    m = _image_ome_meta()
    del m["omero"]["channels"][0]["label"]  # partial names
    with np.testing.assert_raises(ValueError):
        ome_to_napari(m)


def test_ome_without_omero_falls_back_to_multiscales_name():
    from iterseg_tpu.io.zarr_io import ome_to_napari

    meta, _ = ome_to_napari(_image_ome_meta(with_omero=False))
    assert meta["name"] == "img"
    assert meta["contrast_limits"] is None


def test_ome_reader_returns_channel_meta(tmp_path):
    import json

    from iterseg_tpu.io.zarr_io import load_ome_zarr, open_zarr

    p = tmp_path / "img.ome.zarr"
    p.mkdir()
    with open(p / ".zgroup", "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(p / ".zattrs", "w") as f:
        json.dump(_image_ome_meta(), f)
    arr = open_zarr(p / "0", shape=(2, 4, 8, 8), chunks=(1, 4, 8, 8),
                    dtype=np.uint16)
    arr[...] = np.arange(2 * 4 * 8 * 8, dtype=np.uint16).reshape(2, 4, 8, 8)
    [(data, meta, layer_type)] = load_ome_zarr(p)
    assert layer_type == "image"
    assert meta["contrast_limits"] == [(10.0, 200.0), (0.0, 90.0)]
    assert meta["name"] == ["nuclei", "membrane"]
    np.testing.assert_allclose(meta["scale"], (4.0, 1.0, 1.0))


def test_add_pyramid_levels_labels(tmp_path):
    """Label pyramids: nearest (stride) levels appended to an existing
    store, scale transformations doubled in y/x only, level 0 untouched,
    idempotent re-run, and the reader still returns exact level 0."""
    import json

    from iterseg_tpu.io.zarr_io import (add_pyramid_levels, load_ome_zarr,
                                        ome_metadata, open_zarr,
                                        save_labels_to_ome)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 9, size=(3, 4, 128, 96)).astype(np.uint32)
    p = tmp_path / "labels.ome.zarr"
    save_labels_to_ome(
        p, data=labels,
        layer_meta={"scale": (1.0, 4.0, 1.0, 1.0),
                    "translate": (0.0, 0.0, 0.0, 0.0), "name": "lab"},
        chunks=(1, 4, 128, 96),
    )
    paths = add_pyramid_levels(p, n_levels=2, min_yx=8)
    assert paths == ["0", "1", "2"]

    meta = ome_metadata(p)
    ds = meta["multiscales"][0]["datasets"]
    scales = [
        [t["scale"] for t in d["coordinateTransformations"]
         if t["type"] == "scale"][0]
        for d in ds
    ]
    assert scales[1] == [1.0, 4.0, 2.0, 2.0]
    assert scales[2] == [1.0, 4.0, 4.0, 4.0]

    lvl0 = np.asarray(open_zarr(p / "0")[...])
    lvl1 = np.asarray(open_zarr(p / "1")[...])
    lvl2 = np.asarray(open_zarr(p / "2")[...])
    np.testing.assert_array_equal(lvl0, labels)           # untouched
    np.testing.assert_array_equal(lvl1, labels[..., ::2, ::2])
    np.testing.assert_array_equal(lvl2, labels[..., ::4, ::4])
    assert lvl1.dtype == labels.dtype

    # idempotent: already at the target depth, nothing re-appended
    assert add_pyramid_levels(p, n_levels=2, min_yx=8) == ["0", "1", "2"]
    assert len(ome_metadata(p)["multiscales"][0]["datasets"]) == 3

    # labels reader contract: still the exact highest-resolution level
    [(data, meta2, lt)] = load_ome_zarr(p)
    assert lt == "labels"
    np.testing.assert_array_equal(np.asarray(data[...]), labels)
    np.testing.assert_allclose(meta2["scale"], (1.0, 4.0, 1.0, 1.0))


def test_add_pyramid_levels_image_mean_and_floor(tmp_path):
    """Image pyramids: 2x2 block means, odd trailing columns cropped
    (floor semantics), early stop at min_yx, and the multiscale reader
    returns the level list."""
    import json

    from iterseg_tpu.io.zarr_io import (add_pyramid_levels, load_ome_zarr,
                                        open_zarr)

    img = np.arange(4 * 16 * 17, dtype=np.float32).reshape(4, 16, 17)
    p = tmp_path / "img.ome.zarr"
    p.mkdir()
    with open(p / ".zgroup", "w") as f:
        json.dump({"zarr_format": 2}, f)
    attrs = {"multiscales": [{
        "version": "0.4", "name": "img",
        "axes": [
            {"name": "z", "type": "space", "unit": "micrometer"},
            {"name": "y", "type": "space", "unit": "micrometer"},
            {"name": "x", "type": "space", "unit": "micrometer"},
        ],
        "datasets": [{"path": "0", "coordinateTransformations": [
            {"type": "scale", "scale": [4.0, 1.0, 1.0]},
        ]}],
    }]}
    with open(p / ".zattrs", "w") as f:
        json.dump(attrs, f)
    arr = open_zarr(p / "0", shape=img.shape, chunks=img.shape,
                    dtype=np.float32)
    arr[...] = img

    # min_yx=8: level 1 is (4, 8, 8); level 2 (y=4) is refused
    paths = add_pyramid_levels(p, n_levels=5, min_yx=8)
    assert paths == ["0", "1"]
    lvl1 = np.asarray(open_zarr(p / "1")[...])
    assert lvl1.shape == (4, 8, 8)
    # 2x2 block mean of the even-cropped base, exact
    crop = img[:, :16, :16]
    expected = crop.reshape(4, 8, 2, 8, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(lvl1, expected)

    [(data, _, lt)] = load_ome_zarr(p)
    assert lt == "image" and isinstance(data, list) and len(data) == 2


class TestZarrMiniFallback:
    """The no-tensorstore fallback (io/zarr_mini): self-consistent
    round-trips, cross-compat with tensorstore stores (zlib both ways),
    and the forced-fallback gate in open_zarr."""

    def test_roundtrip_and_rmw(self, tmp_path):
        from iterseg_tpu.io import zarr_mini

        r = np.random.default_rng(0)
        data = r.integers(0, 1000, size=(3, 20, 33, 17)).astype(np.uint32)
        arr = zarr_mini.create(tmp_path / "a.zarr", data.shape,
                               chunks=(1, 8, 16, 16), dtype=np.uint32)
        arr[...] = data
        re = zarr_mini.open_array(tmp_path / "a.zarr")
        np.testing.assert_array_equal(re[...], data)
        # partial read-modify-write across chunk boundaries
        arr[1, 5:15, 10:25, 3:12] = 7
        data[1, 5:15, 10:25, 3:12] = 7
        np.testing.assert_array_equal(arr[...], data)
        # int indexing squeezes, like zarr/tensorstore
        np.testing.assert_array_equal(arr[1], data[1])
        assert arr[1].shape == data[1].shape
        # fill value for never-written chunks
        b = zarr_mini.create(tmp_path / "b.zarr", (10, 10), chunks=(4, 4),
                             dtype=np.float32)
        assert (b[...] == 0).all()
        # negative int + ellipsis selections
        np.testing.assert_array_equal(arr[-1], data[-1])
        np.testing.assert_array_equal(arr[..., 2], data[..., 2])
        # strided slices must raise loudly, not silently mis-read
        with pytest.raises(TypeError, match="contiguous"):
            arr[::2]

    def test_tensorstore_reads_mini_store(self, tmp_path):
        import tensorstore as ts

        from iterseg_tpu.io import zarr_mini

        r = np.random.default_rng(1)
        data = r.random((9, 13, 21)).astype(np.float32)
        arr = zarr_mini.create(tmp_path / "m.zarr", data.shape,
                               chunks=(4, 8, 8), dtype=np.float32)
        arr[...] = data
        store = ts.open({
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": str(tmp_path / "m.zarr")},
        }, open=True).result()
        np.testing.assert_array_equal(
            np.asarray(store.read().result()), data
        )

    def test_mini_reads_tensorstore_zlib_store(self, tmp_path):
        import tensorstore as ts

        from iterseg_tpu.io import zarr_mini

        r = np.random.default_rng(2)
        data = r.integers(0, 99, size=(7, 18, 11)).astype(np.int32)
        store = ts.open({
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": str(tmp_path / "t.zarr")},
            "metadata": {
                "shape": list(data.shape), "chunks": [4, 8, 8],
                "dtype": "<i4",
                "compressor": {"id": "zlib", "level": 3},
            },
        }, create=True, open=True).result()
        store.write(data).result()
        arr = zarr_mini.open_array(tmp_path / "t.zarr")
        np.testing.assert_array_equal(arr[...], data)

    def test_blosc_store_names_the_fix(self, tmp_path):
        from iterseg_tpu.io import zarr_io, zarr_mini

        arr = zarr_io.open_zarr(tmp_path / "bl.zarr", shape=(6, 6),
                                chunks=(3, 3), dtype=np.uint32)
        arr[...] = np.uint32(5)
        mini = zarr_mini.open_array(tmp_path / "bl.zarr")
        with pytest.raises(ValueError, match="tensorstore"):
            mini[...]

    def test_open_zarr_forced_fallback(self, tmp_path, monkeypatch):
        from iterseg_tpu.io import zarr_io, zarr_mini

        monkeypatch.setenv("ITERSEG_TPU_NO_TENSORSTORE", "1")
        zarr_io._WARNED_FALLBACK.clear()
        with pytest.warns(RuntimeWarning, match="tensorstore"):
            arr = zarr_io.open_zarr(tmp_path / "f.zarr", shape=(5, 8, 8),
                                    chunks=(2, 4, 4), dtype=np.uint32)
        assert isinstance(arr, zarr_mini.MiniZarrArray)
        arr[2] = np.arange(64, dtype=np.uint32).reshape(8, 8)
        # async shim behaves like the tensorstore future
        arr.write_async((slice(0, 1),), np.ones((1, 8, 8), np.uint32)
                        ).result()
        monkeypatch.delenv("ITERSEG_TPU_NO_TENSORSTORE")
        # the same store reopens through tensorstore (zlib-compatible)
        ts_arr = zarr_io.open_zarr(tmp_path / "f.zarr")
        np.testing.assert_array_equal(
            ts_arr[2], np.arange(64, dtype=np.uint32).reshape(8, 8)
        )
        assert (ts_arr[0] == 1).all()

    def test_ome_save_through_fallback(self, tmp_path, monkeypatch):
        """The OME-Zarr writer path works on a tensorstore-less host."""
        from iterseg_tpu.io import zarr_io

        monkeypatch.setenv("ITERSEG_TPU_NO_TENSORSTORE", "1")
        zarr_io._WARNED_FALLBACK.clear()
        labels = np.arange(2 * 4 * 6 * 6).reshape(2, 4, 6, 6).astype(
            np.uint32)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            arr = zarr_io.save_labels_to_ome(
                str(tmp_path / "l.ome.zarr"), data=labels,
                layer_meta={"scale": (1, 4, 1, 1),
                            "translate": (0, 0, 0, 0), "name": "l"},
            )
        np.testing.assert_array_equal(arr[...], labels)
        loaded = zarr_io.load_ome_zarr(str(tmp_path / "l.ome.zarr"))
        (data, meta, kind) = loaded[0]
        assert kind == "labels"
        np.testing.assert_array_equal(np.asarray(data), labels)
