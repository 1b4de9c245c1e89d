"""Watershed kernel equivalence tests.

The correctness bar mirrors the reference's own harness
(watershed.py:254-298): the fast kernel must produce labels identical to the
pure-Python heap oracle on a dense synthetic fixture.
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.ops.watershed import (
    affinity_watershed,
    image_watershed,
    segment_output_image,
)
from iterseg_tpu.ops.watershed_oracle import affinity_flood_py, image_flood_py


def _scharr_like(x, axis):
    """Gradient-magnitude affinity stand-in (central difference)."""
    g = np.gradient(x.astype(float), axis=axis)
    return np.abs(g)


def make_fixture(shape=(32, 32, 32), seed=0):
    """Dense blobs + EDT centroids + gradient pseudo-affinities, in the
    spirit of the reference's binary_blobs harness."""
    r = np.random.default_rng(seed)
    noise = r.random(shape)
    fg = ndi.gaussian_filter(noise, 3.0)
    fg = fg > np.quantile(fg, 0.65)
    cent = ndi.distance_transform_edt(fg)
    affz, affy, affx = [_scharr_like(fg.astype(float), i) for i in range(3)]
    volume = np.stack([affz, affy, affx, cent, fg], axis=0).astype(np.float32)
    return volume, fg


class TestAffinityFlood:
    def test_native_equals_oracle(self):
        volume, fg = make_fixture()
        labels, seeds, mask = segment_output_image(
            volume, (0, 1, 2), 3, 4, absolute_thresh=0.5
        )
        labels_py, seeds_py, mask_py = segment_output_image(
            volume, (0, 1, 2), 3, 4, absolute_thresh=0.5, py_func=True
        )
        np.testing.assert_array_equal(seeds, seeds_py)
        np.testing.assert_array_equal(mask, mask_py)
        np.testing.assert_array_equal(labels, labels_py)
        assert labels.max() > 3  # actually segmented something

    def test_tie_heavy_affinities(self):
        """Adversarial: quantised affinities force heavy heap ties; the
        age/index tie-breaks must still match the oracle exactly."""
        shape = (12, 16, 16)
        r = np.random.default_rng(1)
        aff = (r.integers(0, 3, size=(3,) + shape) / 2.0).astype(np.float32)
        mask = np.pad(np.ones([s - 2 for s in shape], bool), 1)
        seeds = np.array([[3, 3, 3], [8, 12, 12], [5, 8, 3], [6, 6, 9]])
        ours = affinity_watershed(aff, seeds, mask.copy())
        ref = affinity_flood_py(aff, seeds, mask.copy())
        np.testing.assert_array_equal(ours, ref)

    def test_labels_fill_mask(self):
        volume, fg = make_fixture()
        labels, seeds, mask = segment_output_image(
            volume, (0, 1, 2), 3, 4, absolute_thresh=0.5
        )
        # every masked voxel connected to a seed component gets a label;
        # labels only appear within the (padded) mask
        inner_mask = mask[1:-1, 1:-1, 1:-1]
        assert np.all(labels[~inner_mask] == 0)

    def test_device_vs_host_featuremaps(self):
        volume, fg = make_fixture()
        l_dev, s_dev, m_dev = segment_output_image(
            volume, (0, 1, 2), 3, 4, absolute_thresh=0.5,
            device_featuremaps=True,
        )
        l_host, s_host, m_host = segment_output_image(
            volume, (0, 1, 2), 3, 4, absolute_thresh=0.5,
            device_featuremaps=False,
        )
        np.testing.assert_array_equal(l_dev, l_host)

    def test_otsu_mask_path(self):
        volume, fg = make_fixture()
        labels, seeds, mask = segment_output_image(volume, (0, 1, 2), 3, 4)
        assert labels.max() > 0


class TestImageWatershed:
    def test_native_equals_oracle(self, blobs):
        small = blobs[:24, :24, :24]
        distance = ndi.distance_transform_edt(small)
        peaks = distance > 0.7 * distance.max()
        markers, _ = ndi.label(peaks)
        ours = image_watershed(-distance, markers, small)
        ref = image_flood_py(
            (-distance).astype(np.float32), markers, small
        )
        np.testing.assert_array_equal(ours, ref)

    def test_markers_preserved(self, blobs):
        small = blobs[:16, :16, :16]
        distance = ndi.distance_transform_edt(small)
        markers, n = ndi.label(distance > 0.6 * distance.max())
        out = image_watershed(-distance, markers, small)
        for m in range(1, n + 1):
            sel = markers == m
            assert np.all(out[sel] == m)

    def test_bucket_flood_equals_heap(self, blobs):
        """The discrete-priority bucket flood (DoG fast path) reproduces
        the (value, age, index) heap order bit-exactly — incl. the
        tie-heavy case of many voxels sharing one squared distance."""
        from iterseg_tpu import native
        from iterseg_tpu.ops.watershed_oracle import neighbor_offsets

        for vol in (blobs[:24, :24, :24], blobs[:10, :40, :40]):
            mask = np.pad(vol, 1, constant_values=False)
            d2 = np.round(
                ndi.distance_transform_edt(mask) ** 2
            ).astype(np.int32)
            peaks = d2 > 0.5 * d2.max()
            markers, _ = ndi.label(peaks)
            offsets, _ = neighbor_offsets(mask.shape)

            img_r = np.where(mask, -np.sqrt(d2.astype(np.float64)), 0.0)
            img_r = img_r.astype(np.float32).ravel()
            out_heap = np.where(mask, markers, 0).astype(np.int32).ravel()
            locs = np.flatnonzero(out_heap).astype(np.int64)
            val_chan = np.zeros(len(offsets), dtype=np.int64)
            try:
                native.priority_flood(
                    img_r[None], offsets, val_chan, offsets, locs,
                    img_r[locs], mask.ravel(), out_heap,
                )
            except native.NativeUnavailable:
                import pytest

                pytest.skip("no native toolchain")

            keys = np.where(mask, d2, 0).astype(np.int32).ravel()
            out_bucket = np.where(mask, markers, 0).astype(np.int32).ravel()
            native.bucket_flood_image(
                keys, offsets, locs, mask.ravel(), out_bucket,
            )
            np.testing.assert_array_equal(out_bucket, out_heap)
