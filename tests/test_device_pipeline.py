"""Device-resident pipeline equivalence vs the generic path."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.engine.device_pipeline import AffinityPipeline
from iterseg_tpu.engine.predict import UNetModel, predict_volume
from iterseg_tpu.models.unet import UNetSpec, init_params
from iterseg_tpu.ops.watershed import segment_output_image


@pytest.fixture(scope="module")
def model():
    """The shipped trained checkpoint: saturated feature maps make
    cross-compilation label agreement meaningful (random-weight nets
    produce ~0.5 noise whose Otsu threshold flips chaotically between XLA
    programs)."""
    import os

    from iterseg_tpu.engine.predict import DEFAULT_UNET_PATH, load_unet

    if os.path.exists(DEFAULT_UNET_PATH):
        return load_unet(DEFAULT_UNET_PATH)
    return UNetModel(init_params(UNetSpec(1, 5), seed=0))


def blob_volume(shape=(6, 64, 64), n=20, seed=2):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    for c in np.stack([r.integers(1, s - 1, size=n) for s in shape], 1):
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    vol = vol / vol.max() + 0.01
    return (vol / vol.max()).astype(np.float32)


class TestTransferCapacity:
    def test_quarter_octave_properties(self):
        from iterseg_tpu.engine.device_pipeline import _transfer_capacity

        big = 1 << 30
        prev = 0
        for n in [1, 100, 1023, 1024, 1025, 1536, 1537, 2047, 2048,
                  277123, 262144, 262145, 524288, 1 << 20, (1 << 20) + 1]:
            cap = _transfer_capacity(n, big)
            assert cap >= n                      # always fits the live rows
            assert cap >= prev or True           # (caps not called sorted)
            assert cap <= max(2 * n, 1024)       # never worse than pow2
            if n > 1024:
                assert cap - n < n / 4 + 1       # dead tail <= 25%
                base = 1 << (n.bit_length() - 1)
                assert cap % (base >> 2) == 0    # on a quarter-octave step
            prev = cap
        # exact powers of two round-trip unchanged
        for e in range(11, 24):
            assert _transfer_capacity(1 << e, big) == 1 << e
        # the limit clamps, the minimum floors
        assert _transfer_capacity(5, big) == 1024
        assert _transfer_capacity(1 << 20, 9999) == 9999
        assert _transfer_capacity(3, 100) == 100

    def test_pick_capacity_reuses_compiled_shapes(self):
        """Per-frame mask-size drift across quarter-octave steps must not
        compile a fresh gather when one within the old pow2 waste bound
        already exists (each compile is ~5 s on the real chip)."""
        from iterseg_tpu.engine.device_pipeline import (
            _GATHER_CACHE, _pick_capacity, _transfer_capacity)

        kind = "unit-test-kind"  # private namespace in the shared cache
        big = 1 << 30
        try:
            # nothing cached: fresh quarter-octave pick
            assert _pick_capacity(kind, 277123, big) == \
                _transfer_capacity(277123, big)
            # frame 1 compiled at 327680; frame 2 drifts one step up
            # (331000 -> fresh pick 360448) but 2^19 = 524288 is within
            # the old pow2 bound... only if cached. Cache 524288:
            _GATHER_CACHE[(kind, 524288)] = object()
            assert _pick_capacity(kind, 331000, big) == 524288
            # a cached capacity SMALLER than the fresh pick that still
            # fits n wins (least waste, zero compiles)
            _GATHER_CACHE[(kind, 340000)] = object()
            assert _pick_capacity(kind, 331000, big) == 340000
            # cached capacities that don't fit n are ignored
            assert _pick_capacity(kind, 600000, big) == \
                _transfer_capacity(600000, big)
        finally:
            for key in [k for k in _GATHER_CACHE
                        if len(k) == 2 and k[0] == kind]:
                del _GATHER_CACHE[key]


class TestAffinityPipeline:
    def test_matches_generic_path(self, model):
        vol = blob_volume()
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        labels_fast = pipe.segment(vol)

        out_vol = predict_volume(model, vol, chunk_size=(6, 64, 64),
                                 margin=(1, 8, 8))
        labels_ref, seeds, mask = segment_output_image(
            out_vol, (0, 1, 2), thresholding_channel=3, centroids_channel=4
        )
        assert labels_fast.shape == labels_ref.shape
        # bit-exact: both paths run the same compiled forward and feature
        # prep programs (get_feature_program / _prep_feature_maps), and the
        # remaining stages are exact arithmetic
        np.testing.assert_array_equal(labels_fast, labels_ref)

    def test_multichunk_grid(self, model):
        vol = blob_volume(shape=(6, 96, 96), n=40)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 16, 16))
        labels_fast = pipe.segment(vol)
        out_vol = predict_volume(model, vol, chunk_size=(6, 64, 64),
                                 margin=(1, 16, 16))
        labels_ref, _, _ = segment_output_image(
            out_vol, (0, 1, 2), thresholding_channel=3, centroids_channel=4
        )
        np.testing.assert_array_equal(labels_fast, labels_ref)

    def test_absolute_thresh(self, model):
        vol = blob_volume()
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8), absolute_thresh=0.5)
        labels_fast = pipe.segment(vol)
        out_vol = predict_volume(model, vol, chunk_size=(6, 64, 64),
                                 margin=(1, 8, 8))
        labels_ref, _, _ = segment_output_image(
            out_vol, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            absolute_thresh=0.5,
        )
        np.testing.assert_array_equal(labels_fast, labels_ref)

    def test_absolute_thresh_not_f32_representable(self, model):
        """A python-float threshold like 0.4 has no exact f32 form; under
        NEP 50 the host compares it in f32 (weak scalar) and the device
        must match exactly."""
        vol = blob_volume(seed=9)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8), absolute_thresh=0.4)
        labels_fast = pipe.segment(vol)
        out_vol = predict_volume(model, vol, chunk_size=(6, 64, 64),
                                 margin=(1, 8, 8))
        labels_ref, _, _ = segment_output_image(
            out_vol, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            absolute_thresh=0.4,
        )
        np.testing.assert_array_equal(labels_fast, labels_ref)

    def test_absolute_thresh_numpy_float64_scalar(self, model):
        """np.float64 scalars are NOT NEP-50 weak: the host compares in
        float64, so the device must use the largest f32 whose f32-compare
        agrees with the f64-compare (a voxel equal to np.float32(0.4)
        must PASS the mask: f32(0.4) > 0.4 holds in f64)."""
        vol = blob_volume(seed=9)
        t = np.float64(0.4)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8), absolute_thresh=t)
        labels_fast = pipe.segment(vol)
        out_vol = predict_volume(model, vol, chunk_size=(6, 64, 64),
                                 margin=(1, 8, 8))
        labels_ref, _, _ = segment_output_image(
            out_vol, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            absolute_thresh=t,
        )
        np.testing.assert_array_equal(labels_fast, labels_ref)

    def test_deterministic(self, model):
        """Same pipeline, same input -> bit-identical labels."""
        vol = blob_volume()
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        a = pipe.segment(vol)
        b = pipe.segment(vol)
        np.testing.assert_array_equal(a, b)

    def test_program_cache_reuse(self, model):
        vol = blob_volume()
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        prof = {}
        pipe.segment(vol, profile=prof)
        assert len(pipe._programs) == 1
        pipe.segment(blob_volume(seed=5), profile=prof)
        assert len(pipe._programs) == 1  # same shape -> cached program

    def test_leaf_mutation_invalidates_feature_programs(self):
        """Replacing a leaf array inside the SAME params dict must not
        serve the stale compiled constants (cache fingerprints leaf ids,
        not just the dict object)."""
        import jax

        # private model: this test mutates params in place, which would
        # poison the module-scoped shared fixture for later tests
        import os

        from iterseg_tpu.engine.predict import DEFAULT_UNET_PATH, load_unet

        if os.path.exists(DEFAULT_UNET_PATH):
            model = load_unet(DEFAULT_UNET_PATH)
        else:
            model = UNetModel(init_params(UNetSpec(1, 5), seed=0))
        vol = blob_volume()
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        before = pipe.segment(vol).copy()
        old_fp = model._feature_programs_params
        # in-place leaf swap WITHOUT reassigning model.params; target the
        # first conv kernel (ndim >= 3) — leaf 0 in tree order is a
        # BatchNorm bias, which is all-zero at init, so zeroing it would
        # be a no-op on a fresh model
        flat = jax.tree_util.tree_leaves_with_path(model.params)
        k0 = next(p for p, leaf in flat if leaf.ndim >= 3)

        def zero_first(path, leaf):
            return jax.numpy.zeros_like(leaf) if path == k0 else leaf

        mutated = jax.tree_util.tree_map_with_path(zero_first, model.params)
        # copy the new leaves back into the existing dict structure
        for (path, _), (_, new_leaf) in zip(
            flat, jax.tree_util.tree_leaves_with_path(mutated)
        ):
            node = model.params
            for p in path[:-1]:
                node = node[p.key if hasattr(p, "key") else p.idx]
            last = path[-1]
            node[last.key if hasattr(last, "key") else last.idx] = new_leaf
        after = pipe.segment(vol)
        assert model._feature_programs_params != old_fp
        assert not np.array_equal(before, after)


class TestSegmentStack:
    def test_pipelined_4d_matches_per_frame(self, model):
        vols = [blob_volume(seed=s) for s in (3, 4, 5)]
        stack = np.stack(vols)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        out = np.zeros(stack.shape, np.int32)
        ts = list(pipe.segment_stack(stack, out))
        assert ts == [0, 1, 2]
        for t, vol in enumerate(vols):
            ref = pipe.segment(vol)
            np.testing.assert_array_equal(out[t], ref)

    def test_pipelined_integer_stack_matches_float_path(self, model):
        """Integer 4D stacks stay in their source dtype over the link and
        /max on device — labels must equal the host-normalised f32 path
        (prepare_volume) exactly."""
        from iterseg_tpu.core.volume import prepare_volume

        vols_u16 = [
            np.round(blob_volume(seed=s) * 65535.0).astype(np.uint16)
            for s in (3, 4)
        ]
        stack = np.stack(vols_u16)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        out = np.zeros(stack.shape, np.int32)
        ts = list(pipe.segment_stack(stack, out))
        assert ts == [0, 1]
        for t, vol in enumerate(vols_u16):
            ref = pipe.segment(prepare_volume(vol.astype(np.float32)))
            np.testing.assert_array_equal(out[t], ref)

    def test_warm_restart_skips(self, model):
        vols = [blob_volume(seed=s) for s in (3, 4)]
        stack = np.stack(vols)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        out = np.zeros(stack.shape, np.int32)
        out[0] = 1  # pre-labelled frame
        ts = list(pipe.segment_stack(stack, out))
        assert ts == [1]
        assert np.all(out[0] == 1)

    def test_wrapper_uses_pipelined_path(self, model, tmp_path, monkeypatch):
        from iterseg_tpu.engine.segmentation import affinity_unet_watershed
        from iterseg_tpu.models.convert import save_checkpoint

        ck = save_checkpoint(model.params, tmp_path / "m.npz")
        stack = np.stack([blob_volume(seed=7), blob_volume(seed=8)])
        out = affinity_unet_watershed(
            None, stack, save_dir=str(tmp_path), name="st",
            unet_or_config_file=str(ck),
            chunk_size=(6, 64, 64), margin=(1, 8, 8),
        )
        a = np.asarray(out[0])
        assert a.max() >= 0 and a.shape == stack.shape[1:]


class TestFrameParallel:
    def test_multi_device_frames_match_single(self, model):
        """Frames round-robined across the CPU mesh == sequential labels."""
        import jax

        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs multiple devices")
        vols = [blob_volume(seed=s) for s in (11, 12, 13, 14)]
        stack = np.stack(vols)
        pipe = AffinityPipeline(model, chunk_size=(6, 64, 64),
                                margin=(1, 8, 8))
        out_multi = np.zeros(stack.shape, np.int32)
        ts = list(pipe.segment_stack(stack, out_multi,
                                     devices=devices[:4]))
        assert ts == [0, 1, 2, 3]
        out_single = np.zeros(stack.shape, np.int32)
        list(pipe.segment_stack(stack, out_single, skip_labelled=False))
        np.testing.assert_array_equal(out_multi, out_single)


class TestDoGPipeline:
    def test_matches_host_path(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline
        from iterseg_tpu.engine.segmentation import (
            dog_blob_watershed_for_chunks,
        )

        vol = blob_volume(shape=(10, 48, 48), n=14, seed=21)
        pipe = DoGPipeline()
        fast = pipe.segment(vol)
        ref_out = np.zeros(tuple(s + 2 for s in vol.shape), np.int32)
        dog_blob_watershed_for_chunks(
            vol, ref_out, None, None, 1, 1.5, 0.02,
            use_device_pipeline=False,
        )
        assert fast.shape == ref_out.shape
        # bit-exact: the device ships the SQUARED EDT (exact integers) and
        # the host takes the f64 sqrt, reproducing scipy's f64 EDT
        np.testing.assert_array_equal(fast, ref_out)

    def test_deterministic(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol = blob_volume(shape=(10, 48, 48), n=14, seed=22)
        pipe = DoGPipeline()
        a = pipe.segment(vol)
        b = pipe.segment(vol)
        np.testing.assert_array_equal(a, b)

    def test_registry_path_uses_pipeline(self, tmp_path):
        from iterseg_tpu.engine.segmentation import dog_blob_watershed

        vol = blob_volume(shape=(10, 48, 48), n=14, seed=23)
        labels = dog_blob_watershed(None, vol, None, "dp", debug=True)
        assert labels.shape == vol.shape
        assert labels.max() > 5


class TestDeviceFloodMode:
    """Opt-in approximate on-device wavefront flood (``device_flood=True``).

    Mask, threshold and seed selection are the exact host code either way;
    only the flood differs (ops/device_flood — approximate by design, see
    benchmarks/watershed_crossover.py for when it wins). These tests pin
    the invariants that hold exactly and the agreement on smooth fixtures.
    """

    def _synthetic_outs(self, shape=(20, 48, 48), n=24, seed=0):
        """Craft a ``_finalize`` input tuple without a model: smooth blob
        affinities, mask from a threshold, seeds at blob peaks."""
        import jax.numpy as jnp

        r = np.random.default_rng(seed)
        vol = np.zeros(shape, np.float32)
        pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
        vol /= vol.max()
        aff = np.stack([1.0 - vol] * 3).astype(np.float32)
        aff_pad = jnp.asarray(
            np.pad(aff, ((0, 0), (1, 1), (1, 1), (1, 1)))
        )
        mask = vol > 0.08
        mx = ndi.maximum_filter(vol, size=5)
        peaks = np.argwhere((vol == mx) & mask)
        order = np.zeros(512, np.int64)
        flat = np.ravel_multi_index(tuple(peaks.T), shape)
        order[: len(flat)] = flat
        outs = (
            aff_pad,
            jnp.asarray(np.packbits(mask.ravel())),
            jnp.asarray(order),
            jnp.int32(len(flat)),
            jnp.float32(0.08),
            jnp.asarray(vol),
        )
        return shape, outs

    def test_finalize_invariants_and_agreement(self):
        zyx, outs = self._synthetic_outs()
        host = AffinityPipeline(None, cand_capacity=512)
        dev = AffinityPipeline(None, cand_capacity=512, device_flood=True)
        prof = {}
        labels_host = host._finalize(zyx, outs)
        labels_dev = dev._finalize(zyx, outs, profile=prof)
        assert labels_dev.shape == labels_host.shape == zyx
        # identical mask/seed selection => identical label support and ids
        np.testing.assert_array_equal(labels_dev > 0, labels_host > 0)
        assert set(np.unique(labels_dev)) == set(np.unique(labels_host))
        sel = labels_host > 0
        agree = (labels_dev[sel] == labels_host[sel]).mean()
        assert agree > 0.95, agree
        # the device-flood phases were actually taken (not the host path)
        assert "device_flood" in prof and "flood" not in prof

    def test_finalize_deterministic(self):
        zyx, outs = self._synthetic_outs(seed=3)
        dev = AffinityPipeline(None, cand_capacity=512, device_flood=True)
        a = dev._finalize(zyx, outs)
        b = dev._finalize(zyx, outs)
        np.testing.assert_array_equal(a, b)

    def test_finalize_out_buffer(self):
        zyx, outs = self._synthetic_outs(seed=5)
        dev = AffinityPipeline(None, cand_capacity=512, device_flood=True)
        pshape = tuple(s + 2 for s in zyx)
        out = np.full(int(np.prod(pshape)), -1, np.int32)
        labels = dev._finalize(zyx, outs, out=out)
        np.testing.assert_array_equal(
            labels, out.reshape(pshape)[1:-1, 1:-1, 1:-1]
        )

    def test_full_segment_support_equality(self, model):
        """End-to-end through the real forward: the device-flood mode must
        keep the exact mask/seed machinery (identical support, ids) while
        the flood itself may differ within tolerance."""
        vol = blob_volume(shape=(6, 64, 64), n=12, seed=9)
        kw = dict(chunk_size=(6, 64, 64), margin=(1, 8, 8))
        labels_host = AffinityPipeline(model, **kw).segment(vol)
        labels_dev = AffinityPipeline(
            model, device_flood=True, **kw
        ).segment(vol)
        np.testing.assert_array_equal(labels_dev > 0, labels_host > 0)
        assert set(np.unique(labels_dev)) == set(np.unique(labels_host))
        sel = labels_host > 0
        if sel.any():
            agree = (labels_dev[sel] == labels_host[sel]).mean()
            assert agree > 0.8, agree


class TestDoGDeviceFloodMode:
    """Opt-in on-device EDT watershed for the DoG pipeline
    (``device_flood="xla"`` — the image-flood recurrence of
    ops/device_flood; the exact host bucket flood stays the default)."""

    def test_segment_invariants_and_agreement(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol = blob_volume(shape=(12, 48, 48), n=16, seed=31)
        host = DoGPipeline()
        dev = DoGPipeline(device_flood="xla")
        prof = {}
        labels_host = host.segment(vol)
        labels_dev = dev.segment(vol, profile=prof)
        assert labels_dev.shape == labels_host.shape
        # identical mask/marker machinery => identical support and ids
        np.testing.assert_array_equal(labels_dev > 0, labels_host > 0)
        assert set(np.unique(labels_dev)) == set(np.unique(labels_host))
        sel = labels_host > 0
        agree = (labels_dev[sel] == labels_host[sel]).mean()
        assert agree > 0.9, agree
        # the device-flood phase was taken, not the host flood/gather
        assert "device_flood" in prof
        assert "flood" not in prof and "gather_distance" not in prof

    def test_true_normalises_to_backend_default(self):
        import jax
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        expected = "pallas" if jax.default_backend() == "tpu" else "xla"
        assert DoGPipeline(device_flood=True).device_flood == expected
        assert DoGPipeline(device_flood="pallas").device_flood == "pallas"
        with pytest.raises(AssertionError):
            DoGPipeline(device_flood="cuda")

    def test_deterministic_and_out_buffer(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol = blob_volume(shape=(12, 48, 48), n=16, seed=32)
        dev = DoGPipeline(device_flood="xla")
        a = dev.segment(vol)
        out = np.full(tuple(s + 2 for s in vol.shape), -1, np.int32)
        b = dev.segment(vol, out=out)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(out, b)

    def test_registry_plumbing(self):
        """``dog_blob_watershed(..., device_flood=...)`` reaches the
        pipeline (support/ids equal to the default run)."""
        from iterseg_tpu.engine.segmentation import dog_blob_watershed

        vol = blob_volume(shape=(12, 48, 48), n=16, seed=33)
        ref = dog_blob_watershed(None, vol, None, "a", debug=True)
        got = dog_blob_watershed(None, vol, None, "b", debug=True,
                                 device_flood="xla")
        np.testing.assert_array_equal(got > 0, ref > 0)
        assert set(np.unique(got)) == set(np.unique(ref))

    def test_stack_device_flood(self):
        """The pipelined 4D path honours device_flood per frame."""
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        stack = np.stack([blob_volume(shape=(10, 40, 40), n=10, seed=s)
                          for s in (34, 35)])
        dev = DoGPipeline(device_flood="xla")
        host = DoGPipeline()
        out_dev = np.zeros(stack.shape, np.int32)
        out_host = np.zeros(stack.shape, np.int32)
        list(dev.segment_stack(stack, out_dev, skip_labelled=False))
        list(host.segment_stack(stack, out_host, skip_labelled=False))
        np.testing.assert_array_equal(out_dev > 0, out_host > 0)
        for t in range(2):
            assert (set(np.unique(out_dev[t]))
                    == set(np.unique(out_host[t])))


class TestDoGStack:
    """Pipelined 4D DoG path (DoGPipeline.segment_stack)."""

    def test_stack_matches_per_frame_host_path(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline
        from iterseg_tpu.engine.segmentation import (
            dog_blob_watershed, dog_blob_watershed_for_chunks)

        f0 = blob_volume(shape=(10, 48, 48), n=14, seed=31)
        f1 = blob_volume(shape=(10, 48, 48), n=10, seed=32)
        stack = np.stack([f0, f1])
        # public 4D path (now pipelined)
        out = dog_blob_watershed(None, stack, save_dir=None,
                                 name="dog-stack", debug=True)
        # per-frame generic host path (bit-exact oracle)
        for t, frame in enumerate((f0, f1)):
            ref = np.zeros(tuple(s + 2 for s in frame.shape), np.int32)
            dog_blob_watershed_for_chunks(
                frame, ref, None, None, 1, 1.5, 0.02,
                use_device_pipeline=False,
            )
            np.testing.assert_array_equal(
                np.asarray(out[t]), ref[1:-1, 1:-1, 1:-1]
            )

    def test_multi_device_frames_match_single(self):
        import jax

        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs multiple devices")
        stack = np.stack([
            blob_volume(shape=(10, 48, 48), n=12, seed=s)
            for s in (41, 42, 43)
        ])
        pipe = DoGPipeline()
        out_multi = np.zeros(stack.shape, np.int32)
        ts = list(pipe.segment_stack(stack, out_multi,
                                     devices=devices[:3]))
        assert ts == [0, 1, 2]
        out_single = np.zeros(stack.shape, np.int32)
        list(pipe.segment_stack(stack, out_single, skip_labelled=False))
        np.testing.assert_array_equal(out_multi, out_single)

    def test_warm_restart_skips(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        stack = np.stack([
            blob_volume(shape=(10, 48, 48), n=12, seed=s) for s in (51, 52)
        ])
        pipe = DoGPipeline()
        out = np.zeros(stack.shape, np.int32)
        list(pipe.segment_stack(stack, out))
        before = out.copy()
        ts = list(pipe.segment_stack(stack, out))
        assert ts == []
        np.testing.assert_array_equal(out, before)

    def test_integer_stack_matches_float_path(self):
        """Integer DoG 4D stacks stay in their source dtype over the link
        and /max on device — labels must equal the host-normalised f32
        path (prepare_volume) exactly."""
        from iterseg_tpu.core.volume import prepare_volume
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vols_u16 = [
            np.round(blob_volume(shape=(10, 48, 48), n=12, seed=s)
                     * 65535.0).astype(np.uint16)
            for s in (61, 62)
        ]
        stack = np.stack(vols_u16)
        pipe = DoGPipeline()
        out = np.zeros(stack.shape, np.int32)
        ts = list(pipe.segment_stack(stack, out))
        assert ts == [0, 1]
        for t, vol in enumerate(vols_u16):
            ref = pipe.segment(prepare_volume(vol.astype(np.float32)))
            np.testing.assert_array_equal(out[t], ref[1:-1, 1:-1, 1:-1])


class TestReviewHardening:
    """Fixes from the round-3 deep review: overflow exactness, no-native
    oracle fallbacks, grid guards."""

    def test_dog_candidate_overflow_exact(self):
        """n_cand > cand_capacity: the host recomputes the full candidate
        ranking from the downloaded cube — labels stay bit-equal."""
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol = blob_volume(shape=(10, 48, 48), n=14, seed=30)
        ref = DoGPipeline().segment(vol)
        tiny = DoGPipeline(cand_capacity=8)
        np.testing.assert_array_equal(tiny.segment(vol), ref)

    def test_no_native_fallback_exact(self, model, monkeypatch):
        """ITERSEG_TPU_NO_NATIVE=1: both pipelines fall back to the exact
        pure-python heap oracles instead of raising NativeUnavailable."""
        from iterseg_tpu import native
        from iterseg_tpu.engine.device_pipeline import (AffinityPipeline,
                                                        DoGPipeline)

        vol = blob_volume(shape=(6, 32, 32), n=8, seed=31)
        aff_pipe = AffinityPipeline(model, chunk_size=(6, 32, 32),
                                    margin=(1, 4, 4))
        ref_aff = aff_pipe.segment(vol)
        ref_dog = DoGPipeline().segment(vol)

        monkeypatch.setenv("ITERSEG_TPU_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_lib", None)
        got_aff = AffinityPipeline(model, chunk_size=(6, 32, 32),
                                   margin=(1, 4, 4)).segment(vol)
        got_dog = DoGPipeline().segment(vol)
        np.testing.assert_array_equal(got_aff, ref_aff)
        np.testing.assert_array_equal(got_dog, ref_dog)

    def test_valid_grid_small_chunk_axes(self):
        """chunk axes below the hardware minima are bumped up, never
        producing negative pads or zero-size chunks."""
        from iterseg_tpu.engine.device_pipeline import _valid_grid

        pads, padded, chunk, marg = _valid_grid(
            (10, 100, 100), (1, 8, 8), (1, 4, 4)
        )
        assert all(p[1] >= 0 for p in pads)
        assert chunk == (2, 16, 16)
        assert all(m >= 0 for m in marg)
        # small-volume padding still behaves as before
        pads, padded, chunk, marg = _valid_grid(
            (1, 8, 8), (10, 256, 256), (1, 64, 64)
        )
        assert padded == (2, 16, 16) and chunk == (2, 16, 16)

    def test_pallas_flood_rejects_degenerate_params(self):
        from iterseg_tpu.ops.pallas_flood import pallas_flood_jit

        aff = np.zeros((3, 8, 16, 128), np.float32)
        seeds = np.zeros((8, 16, 128), np.int32)
        mask = np.zeros((8, 16, 128), bool)
        with pytest.raises(ValueError, match="inner_cap"):
            pallas_flood_jit(aff, seeds, mask, inner_cap=0)
        with pytest.raises(ValueError, match="multiple of 8"):
            pallas_flood_jit(aff, seeds, mask, ty=12)
