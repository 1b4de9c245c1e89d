"""LoG kernel + blob_log + functional LoG blob_watershed tests.

The reference ships ``blob_watershed`` disabled with a broken config fn
(iterseg segmentation.py:412-540); our working equivalent is validated here:
``gaussian_laplace`` against the scipy oracle, ``blob_log`` behaviourally
(the skimage oracle is not installed in this env), and the segmenter
end-to-end against a literal composition of its documented steps.
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.ops.filters import gaussian, gaussian_laplace
from iterseg_tpu.ops.blob import blob_log
from iterseg_tpu.engine.segmentation import (
    blob_watershed_for_chunks,
    blob_watershed_prep_config,
)


class TestGaussianLaplace:
    def test_matches_scipy_f32(self, rng):
        img = rng.random((10, 24, 24)).astype(np.float32)
        for sigma in (1.0, 2.0, (0.8, 1.5, 1.5)):
            ours = np.asarray(gaussian_laplace(img, sigma))
            ref = ndi.gaussian_laplace(img, sigma)
            np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_matches_scipy_f64_input(self, rng):
        """f64 input computes in f32 under default JAX (no x64) — parity to
        f32 tolerance against the scipy f64 oracle."""
        img = rng.random((8, 16, 16))
        ours = np.asarray(gaussian_laplace(img, 1.3))
        ref = ndi.gaussian_laplace(img, 1.3)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_wide_kernel_beyond_axis(self, rng):
        """Radius (4σ) wider than the axis — scipy 'reflect' tiling parity."""
        img = rng.random((6, 12, 12)).astype(np.float32)
        ours = np.asarray(gaussian_laplace(img, 3.0))
        ref = ndi.gaussian_laplace(img, 3.0)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_2d(self, rng):
        img = rng.random((32, 32)).astype(np.float32)
        ours = np.asarray(gaussian_laplace(img, 2.0))
        ref = ndi.gaussian_laplace(img, 2.0)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def point_blob_volume(centers, shape=(16, 48, 48), sigma=1.2):
    vol = np.zeros(shape, np.float32)
    for c in centers:
        vol[c] = 1.0
    vol = ndi.gaussian_filter(vol, sigma)
    vol /= vol.max()
    vol[vol < 1e-4] = 0.0  # true zero background so the EDT landscape is real
    return vol


class TestBlobLog:
    def test_finds_isolated_blobs(self):
        centers = [(8, 10, 10), (8, 30, 30), (4, 20, 40)]
        vol = point_blob_volume(centers)
        blobs = blob_log(vol, min_sigma=1, max_sigma=3, num_sigma=5,
                         threshold=0.02)
        assert len(blobs) >= len(centers)
        found = blobs[:, :3]
        for c in centers:
            d = np.abs(found - np.array(c)).max(axis=1).min()
            assert d <= 2, (c, d)

    def test_threshold_suppresses(self):
        vol = np.zeros((8, 24, 24), np.float32)
        vol[4, 12, 12] = 0.05  # dim blob
        vol = ndi.gaussian_filter(vol, 1.2)
        blobs = blob_log(vol, min_sigma=1, max_sigma=2, num_sigma=4,
                         threshold=0.5)
        assert len(blobs) == 0

    def test_sigma_estimates_scale(self):
        """A wider blob must detect at a larger sigma than a narrow one."""
        narrow = point_blob_volume([(8, 16, 16)], shape=(16, 32, 32),
                                   sigma=1.0)
        wide = point_blob_volume([(8, 16, 16)], shape=(16, 32, 32),
                                 sigma=3.0)
        b_n = blob_log(narrow, min_sigma=1, max_sigma=5, num_sigma=9,
                       threshold=0.01)
        b_w = blob_log(wide, min_sigma=1, max_sigma=5, num_sigma=9,
                       threshold=0.01)
        assert len(b_n) >= 1 and len(b_w) >= 1
        # take the detection closest to the centre for each
        def centre_sigma(blobs):
            d = np.abs(blobs[:, :3] - np.array([8, 16, 16])).max(axis=1)
            return blobs[np.argmin(d), -1]
        assert centre_sigma(b_w) > centre_sigma(b_n)

    def test_log_scale_and_anisotropic(self):
        vol = point_blob_volume([(8, 16, 16)], shape=(16, 32, 32), sigma=1.5)
        b = blob_log(vol, min_sigma=(1, 1, 1), max_sigma=(2, 3, 3),
                     num_sigma=4, threshold=0.01, log_scale=True)
        assert b.shape[1] == 6  # zyx + per-axis sigma
        assert len(b) >= 1

    def test_empty_image(self):
        b = blob_log(np.zeros((8, 16, 16), np.float32), min_sigma=1,
                     max_sigma=2, num_sigma=3, threshold=0.1)
        assert b.shape == (0, 4)


class TestBlobWatershedSegmenter:
    def test_prep_config_defaults_and_json(self, tmp_path):
        cfg = blob_watershed_prep_config(None, None, None)
        assert cfg == {"min_sigma": 1, "max_sigma": 30, "num_sigma": 10,
                       "threshold": 0.1, "gaus_sigma": 2}
        p = tmp_path / "log.json"
        p.write_text('{"max_sigma": 4, "threshold": 0.05}')
        cfg = blob_watershed_prep_config(None, str(p), None)
        assert cfg["max_sigma"] == 4 and cfg["threshold"] == 0.05
        assert cfg["min_sigma"] == 1  # untouched default

    def test_end_to_end_matches_literal_composition(self):
        centers = [(8, 10, 10), (8, 30, 30), (4, 20, 40)]
        vol = point_blob_volume(centers)
        # the wrapper contract hands a by-1-padded output scratch
        out_pad = np.zeros(tuple(s + 2 for s in vol.shape), np.int32)
        blob_watershed_for_chunks(
            vol, out_pad, (10, 256, 256), (1, 64, 64),
            min_sigma=1, max_sigma=3, num_sigma=5, threshold=0.02,
            gaus_sigma=2,
        )
        out = out_pad[1:-1, 1:-1, 1:-1]
        # literal composition of the documented steps
        from iterseg_tpu.ops.threshold import threshold_otsu_np
        from iterseg_tpu.ops import watershed as ws

        blobs = blob_log(vol, min_sigma=1, max_sigma=3, num_sigma=5,
                         threshold=0.02)
        smoothed = np.asarray(gaussian(vol, 2.0))
        mask = vol > threshold_otsu_np(smoothed)
        distance = ndi.distance_transform_edt(vol)
        pts = np.zeros(vol.shape, bool)
        pts[tuple(blobs[:, :3].T.astype(int))] = True
        markers, _ = ndi.label(pts)
        ref = ws.image_watershed(
            (-distance).astype(np.float32), markers, mask, py_func=True
        )
        np.testing.assert_array_equal(out, ref)
        # all three seeded objects present
        assert out.max() >= len(centers)
        for c in centers:
            assert out[c] > 0
