"""Classical kernel library parity tests (vs scipy / numpy oracles)."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.ops.filters import gaussian, maximum_filter, dog_image
from iterseg_tpu.ops.threshold import threshold_otsu, threshold_otsu_np
from iterseg_tpu.ops.peaks import peak_local_max
from iterseg_tpu.ops.edt import edt, edt_np
from iterseg_tpu.ops.cc import label_jax, label_np, size_band_filter


class TestGaussian:
    @pytest.mark.parametrize("sigma", [1.0, 2.0, (0, 1, 1), 0.5])
    def test_matches_scipy_nearest(self, rng, sigma):
        x = rng.random((12, 20, 18)).astype(np.float32)
        ours = np.asarray(gaussian(x, sigma))
        ref = ndi.gaussian_filter(x.astype(np.float64), sigma, mode="nearest")
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_2d(self, rng):
        x = rng.random((33, 47)).astype(np.float32)
        ours = np.asarray(gaussian(x, 1.5))
        ref = ndi.gaussian_filter(x.astype(np.float64), 1.5, mode="nearest")
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_dog(self, rng):
        x = rng.random((10, 16, 16)).astype(np.float32)
        ours = np.asarray(dog_image(x, 1.0, 1.5))
        ref = ndi.gaussian_filter(x, 1.0, mode="nearest") - ndi.gaussian_filter(
            x, 1.5, mode="nearest"
        )
        np.testing.assert_allclose(ours, ref, atol=2e-6)


class TestMaxFilter:
    def test_matches_scipy(self, rng):
        x = rng.random((9, 14, 11)).astype(np.float32)
        ours = np.asarray(maximum_filter(x, 3, mode="nearest"))
        ref = ndi.maximum_filter(x, size=3, mode="nearest")
        np.testing.assert_array_equal(ours, ref)


class TestOtsu:
    def test_device_matches_oracle(self, rng):
        x = (rng.random((20, 30, 30)) ** 2).astype(np.float32)
        t_dev = float(threshold_otsu(x))
        t_np = float(threshold_otsu_np(x))
        # same bin (bin width tolerance)
        width = (x.max() - x.min()) / 256
        assert abs(t_dev - t_np) < width / 2 + 1e-6

    def test_bimodal(self):
        x = np.concatenate([np.full(500, 0.1), np.full(500, 0.9)]).astype(
            np.float32
        )
        t = float(threshold_otsu(x.reshape(10, 10, 10)))
        assert 0.1 < t < 0.9


class TestPeaks:
    def test_simple_peaks(self):
        img = np.zeros((10, 20, 20), np.float32)
        img[5, 5, 5] = 1.0
        img[5, 15, 15] = 0.8
        img[5, 5, 7] = 0.5  # within spacing 1? chebyshev dist 2 from (5,5,5)
        coords = peak_local_max(img, threshold_abs=0.04)
        got = {tuple(c) for c in coords}
        assert (5, 5, 5) in got and (5, 15, 15) in got and (5, 5, 7) in got

    def test_threshold_and_border(self):
        img = np.zeros((8, 8, 8), np.float32)
        img[0, 4, 4] = 1.0  # border voxel: excluded
        img[4, 4, 4] = 0.03  # below threshold
        coords = peak_local_max(img, threshold_abs=0.04)
        assert len(coords) == 0

    def test_plateau_spacing(self):
        img = np.zeros((6, 10, 10), np.float32)
        img[3, 4, 4] = 1.0
        img[3, 4, 5] = 1.0  # adjacent equal peak -> thinned to one
        coords = peak_local_max(img, threshold_abs=0.04)
        assert len(coords) == 1
        # raster order tie-break keeps (3, 4, 4)
        assert tuple(coords[0]) == (3, 4, 4)


class TestEDT:
    def test_matches_scipy(self, blobs):
        small = blobs[:24, :24, :24]
        ours = np.asarray(edt(small))
        ref = edt_np(small)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_2d(self, rng):
        m = rng.random((32, 32)) > 0.3
        np.testing.assert_allclose(
            np.asarray(edt(m)), edt_np(m), atol=1e-3
        )


class TestCC:
    def test_label_jax_matches_scipy(self, blobs):
        small = blobs[:24, :24, :24]
        ours, n_ours = label_jax(small)
        ref, n_ref = label_np(small)
        assert int(n_ours) == n_ref
        np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_label_jax_2d(self, rng):
        m = rng.random((20, 20)) > 0.5
        ours, n_ours = label_jax(m)
        ref, n_ref = label_np(m)
        assert int(n_ours) == n_ref
        np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_label_device_overflow_guard(self):
        from iterseg_tpu.ops.cc import label_device, label_jax

        # 27 isolated voxels > max_labels=8: label_jax must still report
        # the TRUE count; label_device must retry and number correctly
        m = np.zeros((6, 6, 6), bool)
        m[::2, ::2, ::2] = True
        _, num = label_jax(m, max_labels=8)
        assert int(num) == 27
        ours, n_ours = label_device(m, max_labels=8)
        ref, n_ref = label_np(m)
        assert int(n_ours) == n_ref == 27
        np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_size_band_filter(self):
        mask = np.zeros((10, 20, 20), bool)
        mask[2:4, 2:4, 2:4] = True  # size 8 < 10 -> dropped
        mask[5:8, 5:10, 5:10] = True  # size 75 -> kept
        centroids = np.array([[3, 3, 3], [6, 7, 7]])
        new_mask, new_cent = size_band_filter(mask, centroids, 10, 1000)
        assert new_mask.sum() == 75
        assert len(new_cent) == 1 and tuple(new_cent[0]) == (6, 7, 7)


class TestNativeKernels:
    def test_label_cc6_matches_scipy(self, blobs):
        from iterseg_tpu import native
        from scipy import ndimage as ndi

        try:
            labels, num = native.label_cc6(blobs)
        except native.NativeUnavailable:
            pytest.skip("no native toolchain")
        ref, n_ref = ndi.label(blobs)
        assert num == n_ref
        np.testing.assert_array_equal(labels, ref)

    def test_ensure_spacing_native_matches_python(self, rng):
        from iterseg_tpu import native
        from iterseg_tpu.ops import peaks as P

        coords = rng.integers(0, 60, size=(5000, 3))
        try:
            keep = native.ensure_spacing_cheb(coords, 1)
        except native.NativeUnavailable:
            pytest.skip("no native toolchain")
        # python grid fallback (force by using float coords)
        ref = P._ensure_spacing(coords.astype(np.float64), 1.0)
        np.testing.assert_array_equal(coords[keep], ref.astype(np.int64))

    def test_native_edt3d_matches_scipy_bitwise(self, blobs):
        from iterseg_tpu import native

        try:
            ours = native.edt3d(blobs)
        except native.NativeUnavailable:
            pytest.skip("no native toolchain")
        ref = ndi.distance_transform_edt(blobs)
        np.testing.assert_array_equal(ours, ref)

    def test_band_filter_runs_matches_bfs_and_scipy(self, rng, blobs):
        from iterseg_tpu import native

        fixtures = [
            blobs,
            rng.random((9, 33, 41)) > 0.5,  # salt-and-pepper, many runs
            np.zeros((4, 5, 6), bool),
            np.ones((4, 5, 6), bool),
        ]
        for lo, hi in [(10, 10_000_000), (2, 9), (1, 2)]:
            for m in fixtures:
                try:
                    fast = native.band_filter_cc6(m.copy(), lo, hi)
                    slow = native.band_filter_bfs(m.copy(), lo, hi)
                except native.NativeUnavailable:
                    pytest.skip("no native toolchain")
                np.testing.assert_array_equal(fast, slow)
                # scipy oracle
                lab, _ = ndi.label(m)
                sizes = np.bincount(lab.ravel())
                bad = (sizes < lo) | (sizes >= hi)
                bad[0] = False
                ref = m & ~np.isin(lab, np.flatnonzero(bad))
                np.testing.assert_array_equal(fast, ref)
