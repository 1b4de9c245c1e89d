"""Augmentation distribution tests + blob_dog behaviour tests."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.train.augment import (
    augment_images,
    augment_intensity,
    augment_order,
    continuous_choice,
    random_noise,
)
from iterseg_tpu.ops.blob import blob_dog


class TestContinuousChoice:
    def test_truncation_bounds(self):
        rng = np.random.default_rng(0)
        vals = [
            float(continuous_choice(0.8, 1.2, 0.05, loc=1.0, rng=rng))
            for _ in range(200)
        ]
        assert min(vals) >= 0.8 and max(vals) <= 1.2
        assert abs(np.mean(vals) - 1.0) < 0.02


class TestAugmentIntensity:
    def test_range_clipped_without_noise(self):
        rng = np.random.default_rng(1)
        img = rng.random((4, 16, 16)).astype(np.float32)
        out = augment_intensity(img, noise_prob=0.0, rng=rng)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_noise_modes(self):
        rng = np.random.default_rng(2)
        img = rng.random((4, 8, 8))
        for mode in ("gaussian", "speckle", "poisson", "localvar"):
            out = random_noise(img, mode=mode, var=0.001, rng=rng)
            assert out.shape == img.shape
            assert out.min() >= 0.0 and out.max() <= 1.0
            assert not np.array_equal(out, img)


class TestAugmentOrder:
    def test_joint_transforms_consistent(self):
        """Image and labels must receive the identical geometric op."""
        rng = np.random.default_rng(3)
        img = rng.random((4, 8, 8))
        lab = (img > 0.5).astype(int)
        for _ in range(20):
            out = augment_order([img, lab], mirror_prob=0.5,
                                transpose_prob=0.5, rng=rng)
            np.testing.assert_array_equal(out[0] > 0.5, out[1] > 0)

    def test_only_last_two_axes(self):
        rng = np.random.default_rng(4)
        img = np.arange(4 * 8 * 8).reshape(4, 8, 8).astype(float)
        for _ in range(20):
            (out,) = augment_order([img], mirror_prob=1.0,
                                   transpose_prob=1.0, rng=rng)
            # z-profile of sums is invariant under yx mirror/transpose
            np.testing.assert_allclose(out.sum(axis=(1, 2)),
                                       img.sum(axis=(1, 2)))


class TestAugmentImages:
    def test_dict_labels_keep_keys(self):
        rng = np.random.default_rng(5)
        img = rng.random((4, 8, 8))
        labels = {"a": (img > 0.5).astype(float), "b": img.copy()}
        gt = (img > 0.3).astype(int)
        im2, labs2, gt2 = augment_images(img, labels, gt, rng=rng)
        assert set(labs2) == {"a", "b"}
        assert gt2.shape == gt.shape

    def test_no_augment_prob_zero(self):
        rng = np.random.default_rng(6)
        img = rng.random((4, 8, 8))
        im2, lab2 = augment_images(img, img.copy(), augment_prob=0.0,
                                   rng=rng)
        np.testing.assert_array_equal(im2, img)


class TestBlobDog:
    def test_finds_isolated_blobs(self):
        vol = np.zeros((16, 48, 48), np.float32)
        centers = [(8, 10, 10), (8, 30, 30), (4, 20, 40)]
        for c in centers:
            vol[c] = 1.0
        vol = ndi.gaussian_filter(vol, 1.2)
        vol /= vol.max()
        blobs = blob_dog(vol, min_sigma=1, max_sigma=2, threshold=0.02)
        assert len(blobs) >= len(centers)
        found = blobs[:, :3]
        for c in centers:
            d = np.abs(found - np.array(c)).max(axis=1).min()
            assert d <= 2, (c, d)

    def test_threshold_suppresses(self):
        vol = np.zeros((8, 24, 24), np.float32)
        vol[4, 12, 12] = 0.05  # dim blob
        vol = ndi.gaussian_filter(vol, 1.2)
        blobs = blob_dog(vol, min_sigma=1, max_sigma=2, threshold=0.5)
        assert len(blobs) == 0

    def test_overlap_pruning(self):
        vol = np.zeros((8, 24, 24), np.float32)
        vol[4, 10, 10] = 1.0
        vol[4, 10, 12] = 0.9  # overlapping neighbour
        vol = ndi.gaussian_filter(vol, 1.5)
        vol /= vol.max()
        blobs = blob_dog(vol, min_sigma=1, max_sigma=2, threshold=0.02,
                         overlap=0.3)
        # overlapping detections pruned to one
        xs = blobs[:, 2]
        assert (np.abs(xs - 10) <= 3).sum() <= 1 or len(blobs) <= 2
