"""Hybrid-exact device flood (ops/flood_exact): certificate soundness +
bit-exactness of the full hybrid against the sequential heap oracle.

The certificate's contract is ABSOLUTE: on every voxel it does not mark
uncertain, the representative label must equal the heap's — across
fixture classes chosen to stress every tie mechanism (continuous white
noise: chaotic pop order; quantised affinities: massed exact-value
ties; duplicated-channel smooth fields: massed arc ties; distinct
smooth channels: the production regime, where the uncertain set is
0-1% and repair/certification succeeds without fallback).
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.ops.flood_exact import (
    certificate_flood,
    exact_affinity_flood,
)
from iterseg_tpu.ops.watershed_oracle import affinity_flood_py

from test_device_flood import make_case, smooth_case


def prod_case(shape=(16, 48, 48), n=20, seed=0):
    """Production-like fixture: three DISTINCT continuous affinity
    channels (a trained U-Net emits distinct z/y/x affinities; exact
    f32 arc collisions are rare there, unlike smooth_case's duplicated
    channels)."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
    vol /= vol.max()
    aff = np.stack([
        ndi.gaussian_filter(
            1.0 - vol + r.normal(0, 0.01, shape).astype(np.float32), 0.5
        )
        for _ in range(3)
    ]).astype(np.float32)
    mask = vol > 0.08
    for a in range(3):
        mask[(slice(None),) * a + (0,)] = False
        mask[(slice(None),) * a + (-1,)] = False
    mx = ndi.maximum_filter(vol, size=5)
    seeds = np.argwhere((vol == mx) & mask)
    return aff, seeds, mask


ALL_FIXTURES = [
    ("noise", lambda s: make_case(seed=s)),
    ("quant", lambda s: make_case(seed=s, quantised=True)),
    ("smooth", lambda s: smooth_case(seed=s)),
    ("prod", lambda s: prod_case(seed=s)),
]


class TestCertificateSoundness:
    @pytest.mark.parametrize("name,fix", ALL_FIXTURES)
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_certain_voxels_match_heap(self, name, fix, seed):
        """The core theorem: rep == heap label wherever unc is False."""
        aff, coords, mask = fix(seed)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        rep, unc, v_lb, v_ub, conv = certificate_flood(aff, coords, mask)
        assert conv
        certain = ~unc & mask
        np.testing.assert_array_equal(rep[certain], oracle[certain])
        # V bounds are a true interval
        assert (v_lb[mask] <= v_ub[mask]).all()
        # seeds are always certain with their own ids
        np.testing.assert_array_equal(
            rep[tuple(coords.T)], np.arange(1, len(coords) + 1)
        )
        assert not unc[tuple(coords.T)].any()

    def test_uncertainty_small_on_production_class(self):
        """The value proposition: on distinct-channel continuous
        affinities the uncertain set is tiny (measured 0-1.1% at commit
        time), so the repair download/flood is marginal."""
        fracs = []
        for s in range(3):
            aff, coords, mask = prod_case(seed=s)
            _, unc, _, _, conv = certificate_flood(aff, coords, mask)
            assert conv
            fracs.append(unc.sum() / mask.sum())
        assert np.mean(fracs) < 0.05, fracs

    def test_unreached_voxels_certain_zero(self):
        aff, coords, mask = make_case(seed=0)
        # wall off a slab so part of the mask is unreachable
        mask = mask.copy()
        mask[:, 10, :] = False
        keep = coords[:, 1] < 10
        coords = coords[keep]
        oracle = affinity_flood_py(aff, coords, mask.copy())
        rep, unc, v_lb, _, conv = certificate_flood(aff, coords, mask)
        assert conv
        unreached = mask & (oracle == 0)
        assert not unc[unreached].any()
        assert (rep[unreached] == 0).all()
        assert np.isinf(v_lb[unreached]).all()


class TestExactFlood:
    @pytest.mark.parametrize("name,fix", ALL_FIXTURES)
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bit_exact_vs_heap(self, name, fix, seed):
        """The headline contract: exact_affinity_flood ==
        affinity_flood_py, bit for bit, on every fixture class —
        including the ones that force the tie-sensitivity fallback."""
        aff, coords, mask = fix(seed)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        tele = {}
        got = exact_affinity_flood(aff, coords, mask, telemetry=tele)
        np.testing.assert_array_equal(got, oracle)
        assert tele["path"] in (
            "certified", "repaired", "fallback:unresolved",
            "fallback:tie-density",
        )

    def test_production_class_avoids_fallback(self):
        """On the production fixture class the hybrid must actually pay
        off: no full-heap fallback (certified or locally repaired)."""
        paths = []
        for s in range(3):
            aff, coords, mask = prod_case(seed=s)
            tele = {}
            oracle = affinity_flood_py(aff, coords, mask.copy())
            got = exact_affinity_flood(aff, coords, mask, telemetry=tele)
            np.testing.assert_array_equal(got, oracle)
            paths.append(tele["path"])
        assert all(p in ("certified", "repaired") for p in paths), paths

    def test_empty_seeds(self):
        aff, coords, mask = make_case(seed=1)
        got = exact_affinity_flood(aff, coords[:0], mask)
        assert (got == 0).all()

    def test_telemetry_fields(self):
        aff, coords, mask = prod_case(seed=1)
        tele = {}
        exact_affinity_flood(aff, coords, mask, telemetry=tele)
        assert set(tele) >= {"uncertain_frac", "path", "tie_frac"}
        assert 0.0 <= tele["uncertain_frac"] <= 1.0
        assert 0.0 <= tele["tie_frac"] <= 1.0

    def test_tie_probe_early_exit(self):
        """The quantised fixture's massed exact-value ties must trip the
        on-device early exit (uncertain_frac None: the certificate never
        ran) while staying bit-exact via the host flood; tie_probe=0
        disables the probe and recovers the full-certificate telemetry."""
        aff, coords, mask = make_case(seed=0, quantised=True)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        tele = {}
        got = exact_affinity_flood(aff, coords, mask, telemetry=tele)
        np.testing.assert_array_equal(got, oracle)
        assert tele["path"] == "fallback:tie-density"
        assert tele["uncertain_frac"] is None
        assert tele["tie_frac"] > 0.02
        tele0 = {}
        got0 = exact_affinity_flood(aff, coords, mask, telemetry=tele0,
                                    tie_probe=0.0)
        np.testing.assert_array_equal(got0, oracle)
        assert tele0["path"] != "fallback:tie-density"
        assert tele0["uncertain_frac"] is not None

    def test_tie_probe_no_trigger_on_production_class(self):
        """Continuous distinct-channel affinities have ~zero exact arc
        collisions: the probe must NOT reroute the certifiable regime."""
        for s in range(3):
            aff, coords, mask = prod_case(seed=s)
            tele = {}
            exact_affinity_flood(aff, coords, mask, telemetry=tele)
            assert tele["tie_frac"] <= 0.02, tele
            assert tele["path"] in ("certified", "repaired"), tele


class TestExactImageFlood:
    """Image-watershed twin (exact_image_flood vs the sequential heap
    oracle) — the DoG path's flood semantics."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bit_exact_vs_heap(self, seed):
        from test_device_flood import edt_case

        from iterseg_tpu.ops.flood_exact import exact_image_flood
        from iterseg_tpu.ops.watershed_oracle import image_flood_py

        image, markers, mask = edt_case(seed=seed)
        oracle = image_flood_py(image, markers, mask)
        tele = {}
        got = exact_image_flood(image, markers, mask, telemetry=tele)
        np.testing.assert_array_equal(got, oracle)
        # quantised EDT landscapes are tie-heavy: the tie probe (or,
        # with the probe off, the repair's tie-sensitivity detection)
        # routes to the host flood — exactness is the contract either way
        assert tele["path"].startswith("fallback:"), tele
        assert tele["tie_frac"] > 0.02
        # with the probe disabled the full certificate telemetry returns
        tele0 = {}
        got0 = exact_image_flood(image, markers, mask, telemetry=tele0,
                                 tie_probe=0.0)
        np.testing.assert_array_equal(got0, oracle)
        assert 0.0 < tele0["uncertain_frac"] < 0.5

    def test_certificate_soundness_image(self):
        from test_device_flood import edt_case

        from iterseg_tpu.ops.flood_exact import image_certificate_flood
        from iterseg_tpu.ops.watershed_oracle import image_flood_py

        for s in range(3):
            image, markers, mask = edt_case(seed=s)
            oracle = image_flood_py(image, markers, mask)
            rep, unc, v_lb, v_ub, conv = image_certificate_flood(
                image, markers, mask
            )
            assert conv
            certain = ~unc & mask
            np.testing.assert_array_equal(rep[certain], oracle[certain])
            assert (v_lb[mask] <= v_ub[mask]).all()


class TestDoGExactFlood:
    """device_flood="exact" through DoGPipeline — BIT-EQUAL to the
    default host (bucket-flood) path."""

    def _vol(self, seed, shape=(12, 48, 48), n=16):
        r = np.random.default_rng(seed)
        vol = np.zeros(shape, np.float32)
        pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1, 2, 2))
        return vol / vol.max()

    def test_segment_bit_exact(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        vol = self._vol(51)
        host = DoGPipeline()
        dev = DoGPipeline(device_flood="exact")
        assert dev.device_flood == "exact"
        prof = {}
        labels_host = host.segment(vol)
        labels_dev = dev.segment(vol, profile=prof)
        np.testing.assert_array_equal(labels_dev, labels_host)
        assert prof["flood_exact_path"] in (
            "certified", "repaired", "fallback:unresolved",
            "fallback:tie-density",
        )

    def test_segment_bit_exact_more_seeds(self):
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        for s in (52, 53):
            vol = self._vol(s)
            host = DoGPipeline()
            dev = DoGPipeline(device_flood="exact")
            np.testing.assert_array_equal(
                dev.segment(vol), host.segment(vol)
            )

    def test_registry_plumbing(self):
        from iterseg_tpu.engine.segmentation import dog_blob_watershed

        vol = self._vol(54)
        ref = dog_blob_watershed(None, vol, None, "a", debug=True)
        got = dog_blob_watershed(None, vol, None, "b", debug=True,
                                 device_flood="exact")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_stack_exact(self):
        """The pipelined 4D path honours device_flood='exact' per frame
        (bit-equal to the default stack path)."""
        from iterseg_tpu.engine.device_pipeline import DoGPipeline

        stack = np.stack([self._vol(s, shape=(10, 40, 40), n=10)
                          for s in (55, 56)])
        pshape = tuple(s + 2 for s in stack.shape[1:])
        ref = np.zeros((2,) + stack.shape[1:], np.int32)
        got = np.zeros_like(ref)
        host = DoGPipeline()
        dev = DoGPipeline(device_flood="exact")
        list(host.segment_stack(stack, ref, skip_labelled=False))
        list(dev.segment_stack(stack, got, skip_labelled=False))
        np.testing.assert_array_equal(got, ref)


class TestPipelineExactFlood:
    """device_flood="exact" through AffinityPipeline._finalize — the
    production integration must be BIT-EQUAL to the default host path
    (not just support/id-set equal, unlike the approximate modes)."""

    def _outs(self, seed=0, shape=(16, 40, 40), n=16):
        import jax.numpy as jnp

        r = np.random.default_rng(seed)
        vol = np.zeros(shape, np.float32)
        pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
        vol /= vol.max()
        aff = np.stack([
            ndi.gaussian_filter(
                1.0 - vol + r.normal(0, 0.01, shape).astype(np.float32),
                0.5,
            )
            for _ in range(3)
        ]).astype(np.float32)
        aff_pad = jnp.asarray(np.pad(aff, ((0, 0),) + ((1, 1),) * 3))
        mask = vol > 0.08
        peaks = np.argwhere(
            (vol == ndi.maximum_filter(vol, size=5)) & mask
        )
        order = np.zeros(256, np.int64)
        flat = np.ravel_multi_index(tuple(peaks.T), shape)
        order[:len(flat)] = flat
        outs = (aff_pad, jnp.asarray(np.packbits(mask.ravel())),
                jnp.asarray(order), jnp.int32(len(flat)),
                jnp.float32(0.08), jnp.asarray(vol))
        return shape, outs

    def test_finalize_bit_exact(self):
        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        shape, outs = self._outs(seed=5)
        host = AffinityPipeline(None, cand_capacity=256)
        dev = AffinityPipeline(None, cand_capacity=256,
                               device_flood="exact")
        assert dev.device_flood == "exact"
        prof = {}
        labels_host = host._finalize(shape, outs)
        labels_dev = dev._finalize(shape, outs, profile=prof)
        np.testing.assert_array_equal(labels_dev, labels_host)
        # telemetry: the per-run fidelity signal (continuous prod-like
        # affinities: the tie probe must not trip, the certificate runs)
        assert "flood_uncertain_frac" in prof
        assert "flood_tie_frac" in prof
        assert prof["flood_exact_path"] in (
            "certified", "repaired", "fallback:unresolved",
        )

    def test_finalize_tie_density_exit_bit_exact(self):
        """Quantised affinities through the PIPELINE's exact mode: the
        early-dispatched probe routes to the host flood
        ("fallback:tie-density"), the early-dispatched gather feeds it,
        and labels stay BIT-EQUAL to the default path."""
        import jax.numpy as jnp

        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        shape, outs = self._outs(seed=6)
        aff_pad, mask_packed, order, n_cand, thresh, cent = outs
        r = np.random.default_rng(6)
        aff_q = (r.integers(0, 3, size=aff_pad.shape) / 2.0
                 ).astype(np.float32)
        outs_q = (jnp.asarray(aff_q), mask_packed, order, n_cand,
                  thresh, cent)
        host = AffinityPipeline(None, cand_capacity=256)
        dev = AffinityPipeline(None, cand_capacity=256,
                               device_flood="exact")
        prof = {}
        labels_host = host._finalize(shape, outs_q)
        labels_dev = dev._finalize(shape, outs_q, profile=prof)
        np.testing.assert_array_equal(labels_dev, labels_host)
        assert prof["flood_exact_path"] == "fallback:tie-density", prof
        assert prof["flood_tie_frac"] > 0.02
        assert "flood_uncertain_frac" not in prof  # cert never ran

    def test_finalize_bit_exact_many_seeds(self):
        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        for s in (7, 8):
            shape, outs = self._outs(seed=s)
            host = AffinityPipeline(None, cand_capacity=256)
            dev = AffinityPipeline(None, cand_capacity=256,
                                   device_flood="exact")
            np.testing.assert_array_equal(
                dev._finalize(shape, outs), host._finalize(shape, outs)
            )

    def test_out_buffer(self):
        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        shape, outs = self._outs(seed=9)
        dev = AffinityPipeline(None, cand_capacity=256,
                               device_flood="exact")
        a = dev._finalize(shape, outs)
        out = np.zeros(int(np.prod([s + 2 for s in shape])), np.int32)
        b = dev._finalize(shape, outs, out=out)
        np.testing.assert_array_equal(a, b)

    def _plateau_outs(self, shape=(8, 24, 24), seed=11):
        """Chaotic-plateau fixture (the trained-checkpoint bench class):
        distinct random arcs everywhere except a small exact-0.9 gate
        box around each seed — arc-tie density stays under the probe
        threshold, but every voxel's minimax virtual time collapses to
        the shared 0.9 bottleneck, so phase C's uncertainty blows past
        the repair-doom band and the mode must take the host-flood
        fallback WITH the speculative overlap."""
        import jax.numpy as jnp

        r = np.random.default_rng(seed)
        pshape = tuple(s + 2 for s in shape)
        aff = (0.1 + 0.4 * r.random((3,) + shape)).astype(np.float32)
        seeds = np.array([[4, 6, 6], [4, 17, 17]])
        for z, y, x in seeds:
            aff[:, z - 1:z + 2, y - 1:y + 2, x - 1:x + 2] = 0.9
        mask = np.ones(shape, bool)
        mask[:, :2, :] = False
        aff_pad = np.zeros((3,) + pshape, np.float32)
        aff_pad[:, 1:-1, 1:-1, 1:-1] = aff
        order = np.zeros(256, np.int64)
        flat = np.ravel_multi_index(tuple(seeds.T), shape)
        order[:len(flat)] = flat
        outs = (jnp.asarray(aff_pad),
                jnp.asarray(np.packbits(mask.ravel())),
                jnp.asarray(order), jnp.int32(len(flat)),
                jnp.float32(0.0),
                jnp.asarray(np.zeros(shape, np.float32)))
        return shape, outs

    def test_finalize_speculative_fallback_bit_exact(self):
        """The unresolved/doomed certificate must resolve through the
        SPECULATIVE host flood started under the fence — labels
        bit-equal to the default path, telemetry records the overlap."""
        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        shape, outs = self._plateau_outs()
        host = AffinityPipeline(None, cand_capacity=256)
        dev = AffinityPipeline(None, cand_capacity=256,
                               device_flood="exact")
        prof = {}
        labels_host = host._finalize(shape, outs)
        labels_dev = dev._finalize(shape, outs, profile=prof)
        np.testing.assert_array_equal(labels_dev, labels_host)
        assert prof["flood_exact_path"] == "fallback:unresolved", prof
        assert prof.get("flood_speculative") is True, prof
        # the probe must NOT have tripped (the whole point of the
        # chaotic-plateau class): the certificate ran and measured
        assert prof["flood_tie_frac"] <= 0.02, prof
        assert "flood" in prof and "gather_affinities" in prof
        # and through the out= buffer path too
        out = np.zeros(int(np.prod([s + 2 for s in shape])), np.int32)
        labels_out = dev._finalize(shape, outs, out=out)
        np.testing.assert_array_equal(labels_out, labels_host)

    def test_approximate_mode_telemetry(self):
        """flood_telemetry=True on an APPROXIMATE device_flood mode
        reports the certificate's uncertain fraction — a rigorous bound
        on possible disagreement with the exact heap (VERDICT r3 #8)."""
        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        shape, outs = self._outs(seed=5)
        dev = AffinityPipeline(None, cand_capacity=256,
                               device_flood="xla", flood_telemetry=True)
        prof = {}
        labels_dev = dev._finalize(shape, outs, profile=prof)
        assert "flood_uncertain_frac" in prof
        assert 0.0 <= prof["flood_uncertain_frac"] <= 1.0
        assert prof["flood_certificate_converged"] is True
        # the bound must actually bound: approximate labels differ from
        # the exact host path on at most flood_disagreement_bound of
        # the mask voxels (uncertain set + stale-label mismatches on
        # certain voxels; the heap equals rep on certain voxels)
        host = AffinityPipeline(None, cand_capacity=256)
        labels_host = host._finalize(shape, outs)
        n_disagree = int((labels_dev != labels_host).sum())
        bound_voxels = (prof["flood_disagreement_bound"]
                        * prof["flood_mask_voxels"])
        assert n_disagree <= bound_voxels + 0.5, (n_disagree, prof)

    def test_registry_plumbing(self):
        """``affinity_unet_watershed(..., device_flood="exact")``
        reaches the pipeline and stays bit-equal to the default."""
        from iterseg_tpu.engine.segmentation import segmenters
        from iterseg_tpu.models.unet import UNetSpec, init_params
        from iterseg_tpu.models.convert import save_checkpoint

        r = np.random.default_rng(11)
        shape = (10, 64, 64)
        vol = np.zeros(shape, np.float32)
        pts = np.stack([r.integers(2, s - 2, size=20) for s in shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1, 2, 2))
        vol /= vol.max()
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            ck = save_checkpoint(
                init_params(UNetSpec(1, 5), seed=0),
                os.path.join(td, "u.npz"),
            )
            kw = dict(chunk_size=(10, 64, 64), margin=(1, 8, 8),
                      debug=True)
            ref = segmenters["affinity-unet-watershed"](
                None, vol, None, "a", ck, **kw)
            got = segmenters["affinity-unet-watershed"](
                None, vol, None, "b", ck, device_flood="exact", **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
