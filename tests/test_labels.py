"""Label-grammar parity tests vs literal re-derivations of the reference
algorithms (per-voxel loops), plus structural checks."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.train.labels import (
    get_training_labels,
    is_binary_channel,
    nth_affinity,
    get_centreness,
    get_centre_offsets,
    get_semantic_labels,
    get_gauss_centroids,
    smooth,
)


@pytest.fixture(scope="module")
def labels_vol():
    r = np.random.default_rng(7)
    vol = np.zeros((8, 24, 24), np.float32)
    for i, c in enumerate(
        np.stack([r.integers(1, s - 1, size=10) for s in vol.shape], 1)
    ):
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    labels, _ = ndi.label(vol > 0.3 * vol.max())
    return labels


def _nth_affinity_oracle(labels, n, axis):
    """Literal re-derivation of the reference loop (labels.py:87-109)."""
    affinities = []
    labs_pad = np.pad(labels, n, mode="reflect")
    for i in range(labels.shape[axis]):
        s_0 = [slice(None)] * labs_pad.ndim
        s_0[axis] = slice(i, i + 1)
        s_n = [slice(None)] * labs_pad.ndim
        s_n[axis] = slice(i + n, i + n + 1)
        new = np.squeeze(labs_pad[tuple(s_0)] - labs_pad[tuple(s_n)])
        affinities.append(new)
    affinities = np.stack(affinities, axis=axis)
    s_ = [slice(n, -n)] * labs_pad.ndim
    s_[axis] = slice(None)
    affinities = affinities[tuple(s_)]
    return np.where(affinities != 0, 1.0, 0.0)


class TestAffinities:
    @pytest.mark.parametrize("axis", [0, 1, 2])
    @pytest.mark.parametrize("n", [1, 2])
    def test_matches_literal_oracle(self, labels_vol, axis, n):
        ours = nth_affinity(labels_vol, n, axis)
        ref = _nth_affinity_oracle(labels_vol, n, axis)
        np.testing.assert_array_equal(ours, ref)

    def test_boundary_voxels_marked(self):
        lab = np.zeros((4, 6, 6), int)
        lab[:, :3, :] = 1
        lab[:, 3:, :] = 2
        a = nth_affinity(lab, 1, 1)
        # boundary along y is at the 1->2 transition
        assert a[:, 3, :].min() == 1.0
        assert a[:, 1, :].max() == 0.0


def _centreness_oracle(labels, scale, log=False):
    """Literal per-voxel re-derivation (labels.py:143-205)."""
    scale = np.array(scale)
    new = np.zeros(labels.shape, dtype=np.float32)
    for slc, lab in zip(ndi.find_objects(labels),
                        range(1, labels.max() + 1)):
        if slc is None:
            continue
        mask = labels[slc] == lab
        c = np.mean(np.argwhere(mask), axis=0)
        indices = np.argwhere(mask > 0)
        distances = []
        for i in range(indices.shape[0]):
            diff = (c - indices[i]) * scale
            dist = np.linalg.norm(diff)
            if log and abs(dist) > 0:
                dist = np.log(dist)
            distances.append(dist)
        distances = np.array(distances)
        if log:
            distances = distances + np.abs(distances.min())
        with np.errstate(invalid="ignore", divide="ignore"):
            values = 1 - distances / distances.max()
        out = np.zeros(mask.shape, np.float32)
        out[tuple(indices.T)] = values
        new[slc] += out
    return np.nan_to_num(new)


class TestCentreness:
    def test_matches_literal_oracle(self, labels_vol):
        ours = get_centreness(labels_vol, scale=(4, 1, 1))
        ref = _centreness_oracle(labels_vol, (4, 1, 1))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_log_matches_literal_oracle(self, labels_vol):
        ours = get_centreness(labels_vol, scale=(4, 1, 1), log=True)
        ref = _centreness_oracle(labels_vol, (4, 1, 1), log=True)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_single_voxel_object_is_zeroed(self):
        lab = np.zeros((4, 8, 8), int)
        lab[2, 3, 3] = 1
        out = get_centreness(lab)
        assert np.all(out == 0)  # nan -> 0 (reference nan_to_num)


class TestOffsets:
    def test_background_is_half(self, labels_vol):
        offs = get_centre_offsets(labels_vol, (4, 1, 1))
        assert offs.shape == (3,) + labels_vol.shape
        bg = labels_vol == 0
        for a in range(3):
            assert np.all(offs[a][bg] == 0.5)

    def test_values_in_unit_range(self, labels_vol):
        offs = get_centre_offsets(labels_vol, (4, 1, 1))
        assert offs.min() >= 0.0 and offs.max() <= 1.0


class TestMask:
    def test_default_includes_label_one(self):
        lab = np.array([[0, 1, 2], [0, 1, 2]])
        np.testing.assert_array_equal(
            get_semantic_labels(lab), [[0, 1, 1], [0, 1, 1]]
        )

    def test_reference_quirk_mode(self):
        lab = np.array([[0, 1, 2], [0, 1, 2]])
        np.testing.assert_array_equal(
            get_semantic_labels(lab, exclude_label_one=True),
            [[0, 0, 1], [0, 0, 1]],
        )


class TestGrammar:
    def test_stack_shapes_and_channels(self, labels_vol):
        chans = ("z-1", "y-1", "x-1", "mask", "centreness-log")
        out = get_training_labels(labels_vol, chans, scale=(4, 1, 1))
        assert out.shape == (5,) + labels_vol.shape
        # affinity channels binary
        assert set(np.unique(out[0])) <= {0.0, 1.0}
        # mask binary
        assert set(np.unique(out[3])) <= {0.0, 1.0}
        # centreness in [0, 1]
        assert out[4].min() >= 0 and out[4].max() <= 1

    def test_smooth_suffix(self, labels_vol):
        out = get_training_labels(labels_vol, ("z-1-smooth",), (4, 1, 1))
        raw = get_training_labels(labels_vol, ("z-1",), (4, 1, 1))
        assert not np.array_equal(out, raw)
        np.testing.assert_allclose(out[0], smooth(raw[0]), atol=1e-6)

    def test_offsets_channels(self, labels_vol):
        out = get_training_labels(
            labels_vol, ("offsets-z", "offsets-y", "offsets-x"), (4, 1, 1)
        )
        ref = get_centre_offsets(labels_vol, (4, 1, 1))
        np.testing.assert_allclose(out, ref)

    def test_unknown_channel_raises(self, labels_vol):
        with pytest.raises(ValueError, match="Unrecognised channel"):
            get_training_labels(labels_vol, ("bogus",))

    def test_centroid_gauss(self, labels_vol):
        out = get_training_labels(labels_vol, ("centroid-gauss",))
        assert out.min() >= 0 and out.max() == 1.0


class TestBinaryChannelGrammar:
    """is_binary_channel drives the training loop's compact u8 label
    uploads; its verdicts must match what get_training_labels actually
    produces for each grammar channel."""

    def test_classification(self):
        binary = ["z-1", "y-1", "x-1", "z-2", "x-3", "mask"]
        continuous = [
            "centreness", "centreness-log", "centroid-gauss",
            "offsets-z", "offsets-y", "offsets-x",
            "z-1-smooth", "mask-smooth", "centreness-smooth",
        ]
        for c in binary:
            assert is_binary_channel(c), c
        for c in continuous:
            assert not is_binary_channel(c), c

    def test_verdict_matches_produced_values(self, labels_vol):
        for chan in ["z-1", "y-2", "x-1", "mask", "centreness",
                     "centreness-log", "offsets-z", "z-1-smooth"]:
            out = get_training_labels(labels_vol, (chan,))
            vals = np.unique(out)
            if is_binary_channel(chan):
                assert set(vals.tolist()) <= {0.0, 1.0}, chan
