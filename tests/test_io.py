"""tensorstore-backed zarr / OME-Zarr I/O tests."""
import json
import numpy as np

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
