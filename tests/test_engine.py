"""End-to-end inference engine tests (BASELINE configs #1–#3 at test scale)."""
import os

import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.core.chunks import process_chunks
from iterseg_tpu.engine.predict import (
    UNetModel,
    predict_volume,
    predict_chunk_feature_map,
)
from iterseg_tpu.engine.segmentation import (
    segmenters,
    dog_blob_watershed,
    affinity_unet_watershed,
    segment_single_volume,
    dog_blob_watershed_for_chunks,
)
from iterseg_tpu.models.unet import UNetSpec, init_params
from iterseg_tpu.models.convert import save_checkpoint


def blobby_volume(shape=(16, 64, 64), n=12, seed=3):
    """Bright gaussian blobs on a dim background."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    coords = np.stack(
        [r.integers(1 if s < 8 else 3, s - (1 if s < 8 else 3), size=n)
         for s in shape],
        axis=1,
    )
    for c in coords:
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    vol = vol / vol.max() + 0.01 * r.random(shape).astype(np.float32)
    return vol.astype(np.float32), coords


@pytest.fixture(scope="module")
def tiny_unet(tmp_path_factory):
    params = init_params(UNetSpec(1, 5), seed=0)
    path = tmp_path_factory.mktemp("ckpt") / "tiny_unet.npz"
    return str(save_checkpoint(params, path))


class TestDoGSegmenter:
    def test_registry(self):
        assert set(segmenters) == {
            "affinity-unet-watershed", "DoG-blob-watershed"
        }

    def test_dog_3d_end_to_end(self):
        vol, coords = blobby_volume()
        labels = dog_blob_watershed(
            None, vol, save_dir=None, name="dog-test", debug=True
        )
        assert labels.shape == vol.shape
        assert labels.max() >= 6  # found most blobs
        # labels are 0 outside any bright region
        assert labels[vol < 0.02].max() == 0

    def test_dog_integer_wire_3d_bit_identical(self, monkeypatch):
        """Round-5 integer wire for the DoG 3D route: u16 ships in
        uint16 with the /max on device, labels BIT-EQUAL to the f32
        host-normalised route (the affinity twin is in
        TestAffinityUNetWatershed)."""
        from iterseg_tpu.engine import device_pipeline

        vol, _ = blobby_volume(shape=(8, 48, 48))
        vol_u16 = np.round(vol * 65535.0).astype(np.uint16)

        seen = []
        orig = device_pipeline.DoGPipeline.segment

        def spy(self, volume, **kw):
            seen.append((np.asarray(volume).dtype, kw.get("normalize")))
            return orig(self, volume, **kw)

        monkeypatch.setattr(device_pipeline.DoGPipeline, "segment", spy)
        lab_int = dog_blob_watershed(None, vol_u16, save_dir=None,
                                     name="dog-u16", debug=True)
        lab_f32 = dog_blob_watershed(None, vol_u16.astype(np.float32),
                                     save_dir=None, name="dog-f32",
                                     debug=True)
        np.testing.assert_array_equal(lab_int, lab_f32)
        assert seen[0] == (np.dtype(np.uint16), True), seen
        assert seen[1] == (np.dtype(np.float32), False), seen

    def test_dog_4d_stack_and_warm_restart(self, tmp_path):
        vol, _ = blobby_volume(shape=(8, 48, 48))
        stack = np.stack([vol, vol])
        out = dog_blob_watershed(
            None, stack, save_dir=str(tmp_path), name="dog4d"
        )
        a0 = np.asarray(out[0])
        a1 = np.asarray(out[1])
        assert a0.max() > 0
        np.testing.assert_array_equal(a0, a1)
        # warm restart: re-running skips all frames (labels unchanged)
        out2 = dog_blob_watershed(
            None, stack, save_dir=str(tmp_path), name="dog4d"
        )
        np.testing.assert_array_equal(np.asarray(out2[0]), a0)


class TestAffinityUNetWatershed:
    def test_end_to_end_3d(self, tiny_unet):
        vol, _ = blobby_volume(shape=(6, 64, 64))
        labels = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-test",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
        )
        assert labels.shape == vol.shape
        assert labels.dtype == np.int32

    def test_integer_wire_3d_bit_identical(self, tiny_unet, monkeypatch):
        """Round-5 integer wire format (VERDICT r4 #3a): a u16 volume
        through the public 3D route ships in uint16 (device /max) and
        produces labels BIT-EQUAL to the f32 host-normalised route."""
        from iterseg_tpu.engine import device_pipeline

        vol, _ = blobby_volume(shape=(6, 64, 64))
        vol_u16 = np.round(vol * 65535.0).astype(np.uint16)

        seen = []
        orig = device_pipeline.AffinityPipeline.segment

        def spy(self, volume, **kw):
            seen.append((np.asarray(volume).dtype, self.normalize))
            return orig(self, volume, **kw)

        monkeypatch.setattr(device_pipeline.AffinityPipeline, "segment",
                            spy)
        kw = dict(save_dir=None, unet_or_config_file=tiny_unet,
                  chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True)
        lab_int = affinity_unet_watershed(None, vol_u16, name="wire-u16",
                                          **kw)
        lab_f32 = affinity_unet_watershed(
            None, vol_u16.astype(np.float32), name="wire-f32", **kw)
        np.testing.assert_array_equal(lab_int, lab_f32)
        assert seen[0] == (np.dtype(np.uint16), True), seen
        assert seen[1] == (np.dtype(np.float32), False), seen

    def test_compute_dtype_bf16(self, tiny_unet):
        """Opt-in bf16 forward: plumbs through to the device pipeline."""
        vol, _ = blobby_volume(shape=(6, 64, 64))
        labels = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-bf16",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
            compute_dtype="bfloat16",
        )
        assert labels.shape == vol.shape
        assert labels.dtype == np.int32

    def test_device_flood_keyword_and_json(self, tiny_unet, tmp_path):
        """Opt-in on-device flood: keyword and JSON key plumb through to
        the pipeline (approximate flood — only shape/dtype and the mask
        support contract are asserted here; agreement is pinned in
        tests/test_device_pipeline.py)."""
        import json

        vol, _ = blobby_volume(shape=(6, 64, 64))
        ref = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-df-ref",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
        )
        labels = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-df",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
            device_flood=True,
        )
        assert labels.shape == vol.shape and labels.dtype == np.int32
        np.testing.assert_array_equal(labels > 0, ref > 0)
        cfg = tmp_path / "auw_df.json"
        cfg.write_text(json.dumps({"unet": tiny_unet, "device_flood": True}))
        labels_cfg = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-df-cfg",
            unet_or_config_file=str(cfg),
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
        )
        np.testing.assert_array_equal(labels_cfg, labels)

    def test_device_flood_4d_stack(self, tiny_unet):
        """The pipelined 4D path must honour device_flood (it builds its
        own pipeline in segmentation_loop)."""
        vol, _ = blobby_volume(shape=(6, 64, 64))
        stack = np.stack([vol, vol])
        ref = affinity_unet_watershed(
            None, stack, save_dir=None, name="auw-df4-ref",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
        )
        out = affinity_unet_watershed(
            None, stack, save_dir=None, name="auw-df4",
            unet_or_config_file=tiny_unet,
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
            device_flood=True,
        )
        for t in range(2):
            a, b = np.asarray(out[t]), np.asarray(ref[t])
            np.testing.assert_array_equal(a > 0, b > 0)
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(out[1]))

    def test_device_flood_string_survives_4d_path(self, tiny_unet):
        """Forced kernel strings ("xla"/"pallas") must reach the 4D
        path's pipeline untouched — a bool() coercion here once replaced
        a forced kernel with the backend default (review finding)."""
        from iterseg_tpu.engine.segmentation import (
            affinity_watershed_for_chunks, affinity_watershed_prep_config,
            segmentation_loop)

        vol, _ = blobby_volume(shape=(6, 64, 64))
        stack = np.stack([vol, vol])

        class _Layer:
            data = stack

        config = affinity_watershed_prep_config(
            _Layer, tiny_unet, None, device_flood="xla"
        )
        assert config["device_flood"] == "xla"
        out = np.zeros_like(stack, dtype=np.int32)
        list(segmentation_loop(None, stack, (6, 64, 64), (1, 8, 8), out,
                               affinity_watershed_for_chunks, config))
        (key,) = config["pipeline_cache"].keys()
        assert key[-1] == "xla", key
        assert config["pipeline_cache"][key].device_flood == "xla"
        assert np.asarray(out).any()

    def test_config_json(self, tiny_unet, tmp_path):
        import json

        cfg = tmp_path / "auw.json"
        cfg.write_text(json.dumps({"unet": tiny_unet, "affinities_extent": 1}))
        vol, _ = blobby_volume(shape=(6, 64, 64))
        labels = affinity_unet_watershed(
            None, vol, save_dir=None, name="auw-cfg",
            unet_or_config_file=str(cfg),
            chunk_size=(6, 64, 64), margin=(1, 8, 8), debug=True,
        )
        assert labels.shape == vol.shape


class TestPredictVolume:
    def test_batched_matches_generic_chunk_loop(self, tiny_unet):
        from iterseg_tpu.engine.predict import load_unet

        model = load_unet(tiny_unet)
        vol = np.random.default_rng(0).random((6, 96, 96)).astype(np.float32)
        fast = predict_volume(
            model, vol, chunk_size=(6, 64, 64), margin=(1, 16, 16)
        )
        slow = np.zeros_like(fast)
        process_chunks(
            vol, (6, 64, 64), slow, (1, 16, 16),
            predict_chunk_feature_map, config={"unet": model},
        )
        np.testing.assert_allclose(fast, slow, atol=1e-5)

    def test_chunk_clamping(self, tiny_unet):
        from iterseg_tpu.engine.predict import load_unet

        model = load_unet(tiny_unet)
        vol = np.zeros((6, 32, 32), np.float32)
        out = predict_volume(
            model, vol, chunk_size=(10, 256, 256), margin=(1, 8, 8)
        )
        assert out.shape == (5, 6, 32, 32)


class TestSegmentSingleVolume:
    def test_zero_slice_removal_and_norm(self):
        vol = np.zeros((5, 8, 8), np.float32)
        vol[1:4, :, :] = 2.0  # slices 0 and 4 are all-zero
        captured = {}

        def proc(input_volume, current_output, chunk_size, margin):
            captured["shape"] = input_volume.shape
            captured["max"] = input_volume.max()
            current_output[1:-1, 1:-1, 1:-1] = 1

        out = segment_single_volume(vol, (4, 8, 8), {}, (1, 2, 2), proc)
        assert captured["shape"] == (3, 8, 8)
        assert captured["max"] == 1.0
        # labels are scattered back to the original frame shape (deviation
        # from the reference, which crashes on the writeback in this case):
        # removed all-zero planes stay background
        assert out.shape == (5, 8, 8)
        assert np.all(out[0] == 0) and np.all(out[4] == 0)
        assert out[1:4, 1:-1, 1:-1].min() == 1

    def test_unet_mask_with_zero_planes(self, tiny_unet):
        """Zero-slice removal shrinks the frame under unet_mask: the
        preallocated (5, *layer_shape) scratch no longer fits the prepared
        volume (the same latent reference bug guarded in
        affinity_watershed_for_chunks) — regression for the resize guard
        in unet_mask_for_chunks."""
        from iterseg_tpu.engine.segmentation import unet_mask

        vol, _ = blobby_volume(shape=(6, 32, 32))
        vol[:, :, 24:] = 0.0  # all-zero x-planes -> prepare_volume drops them
        mask = unet_mask(
            None, vol, None, "um-zero", tiny_unet,
            chunk_size=(6, 32, 32), margin=(1, 4, 4), debug=True,
        )
        assert np.asarray(mask).shape == vol.shape
        # removed planes stay background in the restored frame
        assert np.all(np.asarray(mask)[:, :, 24:] == 0)


class TestThreadedWorker:
    def test_threaded_returns_live_handle(self):
        from iterseg_tpu.engine.segmentation import (
            SegmentationWorker,
            dog_blob_watershed_for_chunks,
            dog_blob_watershed_prep_config,
            segmentation_wrapper,
        )

        vol, _ = blobby_volume(shape=(8, 48, 48))
        golden = dog_blob_watershed(None, vol, None, "sync", debug=True)
        worker = segmentation_wrapper(
            dog_blob_watershed_for_chunks,
            dog_blob_watershed_prep_config,
            None, vol, None, "thr", None, None,
            (10, 256, 256), (1, 64, 64),
            debug=False, threaded=True,
        )
        assert isinstance(worker, SegmentationWorker)
        labels = worker.result(timeout=300)
        assert worker.done
        np.testing.assert_array_equal(labels, golden)
        # result() is idempotent: finish() (which would add a napari
        # layer when a viewer is present) runs once and is cached
        assert worker.result() is labels

    def test_threaded_reachable_from_public_segmenters(self, tiny_unet):
        """`threaded=True` is a keyword-only extension on the registry
        segmenters themselves (not just the wrapper): callers get the
        live worker and its labels match the synchronous path."""
        from iterseg_tpu.engine.segmentation import (
            SegmentationWorker,
            affinity_unet_watershed,
        )

        vol, _ = blobby_volume(shape=(6, 32, 32))
        kw = dict(chunk_size=(6, 32, 32), margin=(1, 4, 4))
        golden = affinity_unet_watershed(
            None, vol, None, "sync", tiny_unet, debug=True, **kw)
        worker = affinity_unet_watershed(
            None, vol, None, "thr", tiny_unet, threaded=True, **kw)
        assert isinstance(worker, SegmentationWorker)
        np.testing.assert_array_equal(worker.result(timeout=300), golden)

        worker = dog_blob_watershed(None, vol, None, "thr-dog",
                                    threaded=True, **kw)
        assert isinstance(worker, SegmentationWorker)
        labels = worker.result(timeout=300)
        assert labels.shape == vol.shape

    def test_threaded_propagates_errors(self):
        from iterseg_tpu.engine.segmentation import (
            SegmentationWorker,
            segmentation_wrapper,
        )

        def boom(*a, **k):
            raise RuntimeError("kaboom")

        vol, _ = blobby_volume(shape=(8, 48, 48))
        worker = segmentation_wrapper(
            boom, lambda *a: {}, None, vol, None, "err", None, None,
            (10, 256, 256), (1, 64, 64), debug=False, threaded=True,
        )
        assert isinstance(worker, SegmentationWorker)
        with pytest.raises(RuntimeError, match="kaboom"):
            worker.result(timeout=300)


class TestBucketFloodGuard:
    def test_large_keys_rejected(self):
        from iterseg_tpu import native

        keys = np.zeros(64, np.int32)
        keys[10] = native.BUCKET_FLOOD_MAX_KEY
        offsets = np.array([-1, 1], np.int64)
        out = np.zeros(64, np.int32)
        with pytest.raises(ValueError, match="priority_flood"):
            native.bucket_flood_image(
                keys, offsets, np.array([5], np.int64),
                np.ones(64, np.uint8), out,
            )

    def test_dog_pipeline_heap_fallback_matches_host(self, monkeypatch):
        # shrink the bound so a normal fixture takes the heap fallback
        from iterseg_tpu import native
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol, _ = blobby_volume(shape=(8, 48, 48))
        pipe = DoGPipeline()
        golden = pipe.segment(vol)
        monkeypatch.setattr(native, "BUCKET_FLOOD_MAX_KEY", 2)
        fallback = DoGPipeline().segment(vol)
        np.testing.assert_array_equal(golden, fallback)


class TestTrioConfigs:
    """JSON config paths of the (reference-disabled) trio — the reference's
    prep fns are unreachable or broken (segmentation.py:302-320, :408-410,
    :520-540); this framework honours the documented grammar."""

    def test_shipped_config_files_drive_preps(self):
        import iterseg_tpu.engine.segmentation as seg

        cfg_dir = os.path.join(os.path.dirname(__file__), "..", "examples",
                               "config_files")
        vol, _ = blobby_volume(shape=(8, 32, 32))
        layer = seg._as_layer(vol)

        dog = seg.dog_blob_watershed_prep_config(
            layer, os.path.join(cfg_dir, "dog-blob-watershed-config.json"),
            None)
        assert (dog["min_sigma"], dog["max_sigma"], dog["threshold"]) == \
            (1, 1.5, 0.02)
        blob = seg.blob_watershed_prep_config(
            layer, os.path.join(cfg_dir, "blob-watershed-config.json"), None)
        assert blob == {"min_sigma": 1, "max_sigma": 30, "num_sigma": 10,
                        "threshold": 0.1, "gaus_sigma": 2}
        otsu = seg.otsu_mask_prep_config(
            layer, os.path.join(cfg_dir, "otsu-mask-config.json"), None)
        assert otsu == {"gaus_sigma": 2}
        aff = seg.affinity_watershed_prep_config(
            layer, os.path.join(cfg_dir, "unet-mask-config.json"), None)
        assert aff["output_volume"].shape == (5, 8, 32, 32)

    def test_otsu_config_gaus_sigma_honoured(self, tmp_path):
        from iterseg_tpu.engine.segmentation import otsu_mask

        vol, _ = blobby_volume(shape=(8, 32, 32), n=4)
        kwargs = dict(chunk_size=(8, 32, 32), margin=(1, 4, 4), debug=True)
        default = np.asarray(otsu_mask(None, vol, None, "o", None, **kwargs))

        explicit = tmp_path / "otsu2.json"
        explicit.write_text('{"gaus_sigma": 2}')
        np.testing.assert_array_equal(
            np.asarray(otsu_mask(None, vol, None, "o", str(explicit),
                                 **kwargs)),
            default,
        )

        wide = tmp_path / "otsu8.json"
        wide.write_text('{"gaus_sigma": 8}')
        smoothed = np.asarray(
            otsu_mask(None, vol, None, "o", str(wide), **kwargs))
        assert not np.array_equal(smoothed, default)

    def test_blob_watershed_config_json(self, tmp_path):
        from iterseg_tpu.engine.segmentation import blob_watershed

        vol, _ = blobby_volume(shape=(8, 32, 32), n=6)
        kwargs = dict(chunk_size=(8, 32, 32), margin=(1, 4, 4), debug=True)
        default = np.asarray(
            blob_watershed(None, vol, None, "b", None, **kwargs))
        cfg = tmp_path / "blob.json"
        cfg.write_text('{"min_sigma": 1, "max_sigma": 30, "num_sigma": 10,'
                       ' "threshold": 0.1, "gaus_sigma": 2}')
        np.testing.assert_array_equal(
            np.asarray(blob_watershed(None, vol, None, "b", str(cfg),
                                      **kwargs)),
            default,
        )

    def test_config_falsy_values_honoured(self, tmp_path):
        """Explicit 0/0.0 config values must not fall back to defaults
        (`.get(k) or default` would silently drop them)."""
        import iterseg_tpu.engine.segmentation as seg

        cfg = tmp_path / "falsy.json"
        cfg.write_text('{"threshold": 0.0, "gaus_sigma": 0}')
        assert seg.dog_blob_watershed_prep_config(
            None, str(cfg), None)["threshold"] == 0.0
        blob = seg.blob_watershed_prep_config(None, str(cfg), None)
        assert blob["threshold"] == 0.0 and blob["gaus_sigma"] == 0
        assert seg.otsu_mask_prep_config(None, str(cfg), None) == \
            {"gaus_sigma": 0}

    def test_unet_mask_4d_is_a_mask(self, tiny_unet):
        """4D unet_mask must run unet_mask_for_chunks per frame — not be
        hijacked into the affinity fast path (which is keyed on the same
        config shape and would write watershed instance labels)."""
        from iterseg_tpu.engine.segmentation import unet_mask

        vol, _ = blobby_volume(shape=(8, 32, 32))
        stack = np.stack([vol, vol * 0.9 + 0.05])
        out = np.asarray(unet_mask(
            None, stack, None, "m4", tiny_unet, chunk_size=(8, 32, 32),
            margin=(1, 4, 4), debug=True))
        assert out.shape == stack.shape
        assert set(np.unique(out)) <= {0, 1}


class TestFloodVmemFallback:
    def test_forced_pallas_reroutes_to_xla_when_vmem_exceeded(
            self, tiny_unet, monkeypatch):
        """When fits_vmem rejects the padded volume, a forced
        device_flood="pallas" must take the XLA recurrence (with a
        warning) rather than attempt the Mosaic compile."""
        import warnings

        import iterseg_tpu.ops.pallas_flood as pf
        import iterseg_tpu.ops.device_flood as df
        from iterseg_tpu.engine.segmentation import affinity_unet_watershed

        calls = []
        real_xla = df.wavefront_flood_jit

        def spy_xla(*a, **k):
            calls.append("xla")
            return real_xla(*a, **k)

        def boom_pallas(*a, **k):
            raise AssertionError("pallas kernel must not run")

        monkeypatch.setattr(pf, "fits_vmem", lambda *a, **k: False)
        monkeypatch.setattr(pf, "pallas_flood_jit", boom_pallas)
        monkeypatch.setattr(df, "wavefront_flood_jit", spy_xla)

        vol, _ = blobby_volume(shape=(8, 32, 32))
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            labels = np.asarray(affinity_unet_watershed(
                None, vol, None, "vm", tiny_unet, chunk_size=(8, 32, 32),
                margin=(1, 4, 4), debug=True, device_flood="pallas"))
        assert calls == ["xla"]
        assert labels.shape == vol.shape
        assert any("VMEM budget" in str(w.message) for w in caught)


class TestPredictVolumeHardening:
    """Round-3 review fixes on the legacy (batch_size=) route."""

    @pytest.fixture(scope="class")
    def small_model(self):
        from iterseg_tpu.engine.predict import UNetModel
        from iterseg_tpu.models.unet import UNetSpec, init_params

        return UNetModel(init_params(UNetSpec(1, 5), seed=0))

    def _vol(self, shape=(4, 64, 64), seed=5):
        r = np.random.default_rng(seed)
        return r.random(shape, dtype=np.float32)

    def test_zarr_output_volume_receives_writes(self, small_model,
                                                tmp_path):
        """The blend loop writes through zarr-backed output volumes
        (chained `out[sl][cr] = ...` silently wrote into copies)."""
        from iterseg_tpu.engine.predict import predict_volume
        from iterseg_tpu.io.zarr_io import open_zarr

        vol = self._vol()
        ref = predict_volume(small_model, vol, chunk_size=(4, 32, 32),
                             margin=(1, 4, 4), batch_size=2)
        store = open_zarr(tmp_path / "feat.zarr", shape=(5,) + vol.shape,
                          chunks=(5, 4, 32, 32), dtype=np.float32)
        predict_volume(small_model, vol, chunk_size=(4, 32, 32),
                       margin=(1, 4, 4), output_volume=store,
                       batch_size=2)
        np.testing.assert_array_equal(np.asarray(store), ref)

    def test_small_chunk_axes_no_crash(self, small_model):
        """chunk axes below the ladder minima are bumped (shared
        _valid_grid) instead of producing negative pads."""
        from iterseg_tpu.engine.predict import predict_volume

        out = predict_volume(small_model, self._vol((6, 32, 32)),
                             chunk_size=(1, 32, 32), margin=(0, 4, 4),
                             batch_size=2)
        assert out.shape == (5, 6, 32, 32)
        assert np.isfinite(out).all()

    def test_4d_singleton_input(self, small_model):
        """Legacy 4D inputs (singleton leading axes) are squeezed; real
        batch axes are rejected loudly."""
        from iterseg_tpu.engine.predict import predict_volume

        vol = self._vol((4, 32, 32))
        ref = predict_volume(small_model, vol, chunk_size=(4, 32, 32),
                             margin=(1, 4, 4), batch_size=2)
        got = predict_volume(small_model, vol[None],
                             chunk_size=(4, 32, 32), margin=(1, 4, 4),
                             batch_size=2)
        np.testing.assert_array_equal(got, ref)
        with pytest.raises(ValueError, match="zyx volume"):
            predict_volume(small_model, np.zeros((2, 4, 32, 32),
                                                 np.float32),
                           batch_size=2)


class TestDeviceFloodCacheKey:
    """device_flood=True and its normalized kernel name must share one
    pipeline-cache entry (the constructor normalizes; the cache key must
    match, or equivalent settings duplicate pipeline state)."""

    def test_normalizers(self):
        from iterseg_tpu.engine.device_pipeline import (AffinityPipeline,
                                                        DoGPipeline)
        import jax

        want = "pallas" if jax.default_backend() == "tpu" else "xla"
        assert AffinityPipeline.normalize_device_flood(True) == want
        assert AffinityPipeline.normalize_device_flood(None) is False
        assert AffinityPipeline.normalize_device_flood(False) is False
        assert AffinityPipeline.normalize_device_flood("pallas") == "pallas"
        assert DoGPipeline.normalize_device_flood(True) == "xla"
        assert DoGPipeline.normalize_device_flood(None) is False
        # round 4: the Pallas image kernel exists — "pallas" is valid
        assert DoGPipeline.normalize_device_flood("pallas") == "pallas"
        with pytest.raises(AssertionError):
            DoGPipeline.normalize_device_flood("cuda")

    def test_dog_cache_shared_between_true_and_xla(self, monkeypatch):
        from iterseg_tpu.engine import device_pipeline as dp
        from iterseg_tpu.engine.segmentation import (
            dog_blob_watershed_for_chunks)

        calls = []
        monkeypatch.setattr(
            dp.DoGPipeline, "segment",
            lambda self, vol, out=None, profile=None, normalize=False:
                calls.append(1))
        vol = np.zeros((4, 8, 8), np.float32)
        out = np.zeros((4, 8, 8), np.int32)
        cache = {}
        for df in (True, "xla"):
            dog_blob_watershed_for_chunks(
                vol, out, (4, 8, 8), (1, 2, 2), 1, 1.5, 0.02,
                pipeline_cache=cache, device_flood=df)
        assert len(cache) == 1 and len(calls) == 2
