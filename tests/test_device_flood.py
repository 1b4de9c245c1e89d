"""On-device wavefront flood prototype: invariants + pinned agreement.

The wavefront kernel is an *approximation* of the sequential heap flood
(see ``ops/device_flood.py`` — exact parallel simulation would need heap
time, which is sequential).  These tests pin what holds exactly and the
measured oracle agreement on deterministic fixtures, so a regression in
either the recurrence or the tie-breaks is caught.
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.ops.device_flood import (
    wavefront_affinity_flood,
    wavefront_image_flood,
)
from iterseg_tpu.ops.watershed import image_watershed
from iterseg_tpu.ops.watershed_oracle import affinity_flood_py


def make_case(shape=(12, 20, 20), n_seeds=6, seed=0, quantised=False):
    r = np.random.default_rng(seed)
    if quantised:
        aff = (r.integers(0, 3, size=(3,) + shape) / 2.0).astype(np.float32)
    else:
        aff = r.random((3,) + shape).astype(np.float32)
    mask = np.pad(np.ones([s - 2 for s in shape], bool), 1)
    coords = np.stack(
        [r.integers(2, s - 2, size=n_seeds) for s in shape], axis=1
    )
    # distinct voxels (duplicate seeds would double-label in the oracle)
    coords = np.unique(coords, axis=0)
    return aff, coords, mask


def smooth_case(shape=(16, 40, 40), n=20, seed=0):
    """Realistic fixture class: smooth affinity field with ridge structure
    at object boundaries, seeds at object peaks — what a trained U-Net
    actually emits (vs ``make_case``'s white noise, whose basins are
    chaotic: pop order on uncorrelated keys is a near-random permutation
    no parallel recurrence can track)."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
    vol /= vol.max()
    aff = np.stack([1.0 - vol] * 3).astype(np.float32)
    mask = vol > 0.08
    for a in range(3):
        mask[(slice(None),) * a + (0,)] = False
        mask[(slice(None),) * a + (-1,)] = False
    mx = ndi.maximum_filter(vol, size=5)
    seeds = np.argwhere((vol == mx) & mask)
    return aff, seeds, mask


class TestWavefrontFlood:
    @pytest.mark.parametrize("mode", ["claim", "minimax"])
    def test_invariants(self, mode):
        aff, coords, mask = make_case()
        labels, n_iters, converged = wavefront_affinity_flood(
            aff, coords, mask, mode=mode
        )
        assert converged
        # every masked voxel reachable from a seed is labelled, none else
        reach = np.zeros(mask.shape, np.int32)
        reach[tuple(coords.T)] = 1
        comp, _ = ndi.label(mask)
        seeded_comps = set(comp[tuple(coords.T)]) - {0}
        reachable = mask & np.isin(comp, sorted(seeded_comps))
        assert ((labels > 0) == reachable).all()
        assert labels.max() <= len(coords)
        # seeds keep their own ids
        np.testing.assert_array_equal(
            labels[tuple(coords.T)],
            np.arange(1, len(coords) + 1),
        )

    def test_claim_agreement_pinned_smooth(self):
        """Deterministic smooth fixtures -> deterministic agreement.  On
        the realistic input class the claim recurrence tracks the oracle
        closely; pin a floor so a tie-break or recurrence regression is
        visible.  (Measured at commit time: 0.941-0.981 on these small
        dense CI fixtures; 0.989-0.996 on (32,64,64)/40-blob fixtures
        whose blob density matches production.)"""
        scores = []
        for s in range(3):
            aff, coords, mask = smooth_case(seed=s)
            oracle = affinity_flood_py(aff, coords, mask.copy())
            got, _, converged = wavefront_affinity_flood(
                aff, coords, mask, mode="claim"
            )
            assert converged
            m = mask & (oracle > 0)
            scores.append((got[m] == oracle[m]).mean())
        assert np.mean(scores) > 0.95, scores

    def test_white_noise_agreement_floor(self):
        """White-noise affinities are the chaotic worst case (documented
        non-goal); pin only a loose floor to catch total breakage."""
        aff, coords, mask = make_case(seed=0)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        got, _, converged = wavefront_affinity_flood(
            aff, coords, mask, mode="claim"
        )
        assert converged
        m = mask & (oracle > 0)
        assert (got[m] == oracle[m]).mean() > 0.5

    def test_minimax_below_claim(self):
        """The claim recurrence is the better oracle approximation on
        the realistic class — that ordering is the reason it exists."""
        aff, coords, mask = smooth_case(seed=7)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        m = mask & (oracle > 0)
        agr = {}
        for mode in ("claim", "minimax"):
            got, _, _ = wavefront_affinity_flood(aff, coords, mask, mode=mode)
            agr[mode] = (got[m] == oracle[m]).mean()
        assert agr["claim"] >= agr["minimax"], agr

    def test_single_seed_exact(self):
        """With one seed there is nothing to disagree about: every
        reachable voxel must get label 1 — exact vs the oracle."""
        aff, coords, mask = make_case(n_seeds=1, seed=3)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        got, _, converged = wavefront_affinity_flood(aff, coords, mask)
        assert converged
        np.testing.assert_array_equal(got, oracle)


def edt_case(shape=(16, 48, 48), n=25, seed=0):
    """The DoG segmenter's flood landscape: blobs -> mask, image = -EDT,
    markers at the distance peaks (segmentation.py:638-646 semantics)."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.0, 2.0, 2.0))
    vol /= vol.max()
    mask = vol > 0.15
    dist = ndi.distance_transform_edt(mask)
    image = (-dist).astype(np.float32)
    mx = ndi.maximum_filter(dist, size=3)
    peaks = np.argwhere((dist == mx) & mask)
    markers = np.zeros(shape, np.int32)
    markers[tuple(peaks.T)] = 1
    markers, _ = ndi.label(markers)
    return image, markers, mask


class TestWavefrontImageFlood:
    """The node-keyed flood of the DoG path (skimage watershed on -EDT)."""

    def test_invariants(self):
        image, markers, mask = edt_case()
        labels, _, converged = wavefront_image_flood(image, markers, mask)
        assert converged
        comp, _ = ndi.label(mask)
        seeded = set(comp[markers > 0]) - {0}
        reachable = mask & np.isin(comp, sorted(seeded))
        assert ((labels > 0) == reachable).all()
        # markers keep their own ids
        m = markers > 0
        np.testing.assert_array_equal(labels[m], markers[m])
        assert set(np.unique(labels)) == set(np.unique(
            np.where(reachable, labels, 0)))

    def test_agreement_pinned_edt(self):
        """EDT landscapes are smooth basins — the claim recurrence tracks
        the exact heap closely there. Pin a floor (measured 0.986-0.997
        at commit time on these fixtures)."""
        scores = []
        for s in range(3):
            image, markers, mask = edt_case(seed=s)
            exact = image_watershed(image, markers, mask)
            got, _, converged = wavefront_image_flood(image, markers, mask)
            assert converged
            m = mask & (exact > 0)
            scores.append((got[m] == exact[m]).mean())
        assert np.mean(scores) > 0.97, scores

    def test_single_marker_exact(self):
        image, markers, mask = edt_case(n=1, seed=2)
        markers = (markers > 0).astype(np.int32)  # one id
        exact = image_watershed(image, markers, mask)
        got, _, converged = wavefront_image_flood(image, markers, mask)
        assert converged
        np.testing.assert_array_equal(got, exact)

    def test_coords_convention(self):
        """(n, 3) coordinate markers label 1..n in row order, matching
        the affinity wrapper's convention."""
        image, markers, mask = edt_case(seed=4)
        # one voxel per id (multi-voxel markers would re-number)
        coords = np.array([np.argwhere(markers == i)[0]
                           for i in range(1, int(markers.max()) + 1)])
        single = np.zeros_like(markers)
        single[tuple(coords.T)] = np.arange(1, len(coords) + 1)
        a, _, _ = wavefront_image_flood(image, single, mask)
        b, _, _ = wavefront_image_flood(image, coords, mask)
        np.testing.assert_array_equal(a, b)
