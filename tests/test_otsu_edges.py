"""Adversarial Otsu binning parity: voxel values exactly on bin edges.

``np.histogram`` on float32 data runs its whole fast path in f32 (data is
cast to the f32 bin-edge dtype), applying a decrement/increment correction
against the edges because the scaled-index computation can err by 1 ULP
near them. The device histogram (``ops.threshold._histogram_f32``) emulates
that computation op-for-op; these fixtures put values bit-exactly ON
interior bin edges (and one f32 ulp either side) where an uncorrected
scaled-floor binning diverges.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from iterseg_tpu.ops.threshold import (
    _histogram_f32,
    threshold_otsu,
    threshold_otsu_np,
)


def _np_hist(x, nbins=256):
    return np.histogram(x, nbins, range=(x.min(), x.max()))


def _assert_device_matches_numpy(x, nbins=256):
    counts, edges = _np_hist(x, nbins)
    dev_counts, dev_edges = _histogram_f32(jnp.asarray(x).ravel(), nbins)
    np.testing.assert_array_equal(np.asarray(dev_edges), edges)
    np.testing.assert_array_equal(np.asarray(dev_counts), counts)
    t_dev = np.asarray(threshold_otsu(jnp.asarray(x), nbins))
    t_host = threshold_otsu_np(x, nbins)
    assert t_dev.dtype == np.float32
    assert np.float32(t_host).dtype == np.float32
    np.testing.assert_array_equal(t_dev, np.float32(t_host))


def test_values_exactly_on_interior_bin_edges():
    r = np.random.default_rng(0)
    x = (r.random(20000) * 3.7 + 1.3).astype(np.float32)
    _, edges = _np_hist(x)
    take = edges[r.integers(1, 255, 500)].astype(np.float32)
    # exact edge hits, plus straddlers one f32 ulp either side
    x[:500] = take
    x[500:1000] = np.nextafter(take, np.float32(-np.inf))
    x[1000:1500] = np.nextafter(take, np.float32(np.inf))
    _assert_device_matches_numpy(x)


def test_edge_values_with_awkward_range():
    # a range whose bin width is inexact in f32 (1/3-ish), maximising
    # scaled-index rounding error
    r = np.random.default_rng(1)
    lo, hi = np.float32(0.1), np.float32(0.1 + 85.33333)
    x = (r.random(5000).astype(np.float32) * (hi - lo)) + lo
    x[0], x[1] = lo, hi  # pin the range
    _, edges = _np_hist(x)
    x[2:702] = edges[r.integers(1, 255, 700)].astype(np.float32)
    _assert_device_matches_numpy(x)


def test_integer_valued_edges():
    # lo=0, hi=256: every edge is an exact small integer; voxels on edges
    # are the classic adversarial case for floor-binning
    r = np.random.default_rng(2)
    x = r.integers(0, 257, 10000).astype(np.float32)
    assert x.min() == 0 and x.max() == 256
    _assert_device_matches_numpy(x)


def test_extremes_and_near_extremes():
    r = np.random.default_rng(3)
    x = r.random(4096).astype(np.float32)
    x[0] = x.min()
    x[1] = x.max()
    x[2] = np.nextafter(x.max(), np.float32(-np.inf))
    x[3] = np.nextafter(x.min(), np.float32(np.inf))
    _assert_device_matches_numpy(x)


def test_constant_image():
    # np._get_outer_edges widens a zero range to [v-0.5, v+0.5]
    x = np.full(100, 0.73, np.float32)
    _assert_device_matches_numpy(x)


def test_two_level_image():
    x = np.array([0.0] * 60 + [1.0] * 40, np.float32)
    _assert_device_matches_numpy(x)


@pytest.mark.parametrize("seed", range(5))
def test_random_smooth_images(seed):
    r = np.random.default_rng(seed)
    x = r.normal(0.4, 0.2, 8000).astype(np.float32)
    _assert_device_matches_numpy(x)
