"""Evaluation metrics tests: VI, IoU matching, AP, accuracy-metric driver."""
import os
import numpy as np
import pandas as pd
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.eval.metrics import (
    variation_of_information,
    calculate,
    calc_ap,
    get_accuracy_metrics,
    generate_ap_scores,
    generate_IoU_dict,
    generate_IoU_data,
    single_sample_stats,
)
from iterseg_tpu.core.chunks import get_slices_from_chunks


def two_blob_labels(shift=0):
    lab = np.zeros((8, 24, 24), int)
    lab[2:6, 2:10, 2:10] = 1
    lab[2:6, 12 + shift:20 + shift, 12:20] = 2
    return lab


class TestVI:
    def test_identical_is_zero(self):
        lab = two_blob_labels()
        vi = variation_of_information(lab, lab)
        np.testing.assert_allclose(vi, [0.0, 0.0], atol=1e-12)

    def test_split_means_oversegmentation(self):
        gt = two_blob_labels()
        seg = gt.copy()
        # split object 1 into two labels -> over-segmentation
        seg[(gt == 1) & (np.arange(24)[None, None, :] < 6)] = 3
        h_gt_given_out, h_out_given_gt = variation_of_information(gt, seg)
        assert h_out_given_gt > h_gt_given_out
        assert h_gt_given_out < 1e-10

    def test_merge_means_undersegmentation(self):
        gt = two_blob_labels()
        seg = np.where(gt > 0, 1, 0)
        h_gt_given_out, h_out_given_gt = variation_of_information(gt, seg)
        assert h_gt_given_out > h_out_given_gt

    def test_symmetry(self):
        gt = two_blob_labels()
        seg = two_blob_labels(shift=2)
        v01 = variation_of_information(gt, seg)
        v10 = variation_of_information(seg, gt)
        np.testing.assert_allclose(v01, v10[::-1], atol=1e-10)


class TestIoUMatching:
    def test_perfect_match(self):
        lab = two_blob_labels()
        res = calculate(lab, lab, strict=True, iou_threshold=0.5)
        assert res.n_true_positives == 2
        assert res.n_false_positives == 0
        assert res.n_false_negatives == 0
        assert res.results.IoU == 1.0
        assert res.results.Jaccard == 1.0
        assert res.results.pixel_identity == 1.0
        assert res.results.localization_error == 0.0
        assert calc_ap(res) == 1.0

    def test_missing_object(self):
        gt = two_blob_labels()
        seg = np.where(gt == 1, 1, 0)
        res = calculate(gt, seg, iou_threshold=0.5)
        assert res.n_true_positives == 1
        assert res.n_false_negatives == 1
        assert res.n_false_positives == 0
        assert calc_ap(res) == 0.5

    def test_threshold_sensitivity(self):
        gt = two_blob_labels()
        seg = two_blob_labels(shift=3)  # object 2 shifted: IoU ~0.45
        lo = calculate(gt, seg, iou_threshold=0.3)
        hi = calculate(gt, seg, iou_threshold=0.9)
        assert lo.n_true_positives == 2
        assert hi.n_true_positives == 1  # shifted object fails at 0.9

    def test_relabeled_ids_match(self):
        gt = two_blob_labels()
        seg = np.where(gt == 1, 7, np.where(gt == 2, 3, 0))
        res = calculate(gt, seg, iou_threshold=0.5)
        assert res.n_true_positives == 2
        assert res.results.pixel_identity < 1.0  # ids differ voxelwise


class TestAccuracyMetrics:
    def test_end_to_end_csvs(self, tmp_path):
        r = np.random.default_rng(0)
        vol = np.zeros((8, 32, 32), np.float32)
        for c in np.stack([r.integers(1, s - 1, size=30) for s in vol.shape],
                          1):
            vol[tuple(c)] = 1.0
        sm = ndi.gaussian_filter(vol, (1, 1.5, 1.5))
        gt, n = ndi.label(sm > 0.25 * sm.max())
        seg = gt  # perfect model
        slices = get_slices_from_chunks(gt.shape, (8, 16, 16), (1, 4, 4))
        (scores, ap), stats = get_accuracy_metrics(
            slices, gt, seg, name="m0", prefix="test",
            out_path=str(tmp_path), exclude_chunks=2,
        )
        assert (tmp_path / "test_m0_scores.csv").exists()
        assert (tmp_path / "test_m0_stats.csv").exists()
        assert (tmp_path / "test_m0_AP_curve.csv").exists()
        assert np.allclose(ap["average_precision"].values, 1.0)
        assert np.allclose(scores["VI: GT | Output"].values, 0.0)
        assert np.all(scores["Count difference"].values == 0)

    def test_excludes_sparse_chunks(self):
        gt = np.zeros((8, 32, 32), int)
        gt[2:4, 2:6, 2:6] = 1  # one object only
        slices = get_slices_from_chunks(gt.shape, (8, 32, 32), (1, 4, 4))
        (scores, ap), stats = get_accuracy_metrics(
            slices, gt, gt, name="m", prefix="p", exclude_chunks=10,
        )
        assert len(scores) == 0  # all chunks excluded (<12 labels)

    def test_3d_vs_4d_broadcast(self, tmp_path):
        gt = two_blob_labels()
        gt4 = np.stack([gt, gt])
        slices = get_slices_from_chunks(gt4.shape, (8, 24, 24), (1, 4, 4))
        (scores, ap), stats = get_accuracy_metrics(
            slices, gt, gt4, name="m", prefix="p", exclude_chunks=1,
        )
        assert len(scores) == 2  # one chunk per frame


class TestPlots:
    def test_plot_files_created(self, tmp_path):
        from iterseg_tpu.eval.metrics import plot_accuracy_metrics

        gt = two_blob_labels()
        seg = two_blob_labels(shift=1)
        slices = get_slices_from_chunks((3,) + gt.shape, (8, 24, 24),
                                        (1, 4, 4))
        data, stats = get_accuracy_metrics(
            slices, np.stack([gt] * 3), np.stack([seg] * 3),
            name="m", prefix="p", exclude_chunks=1,
        )
        plot_accuracy_metrics(data, "p", str(tmp_path), "m", True, True,
                              True, show=False)
        assert (tmp_path / "p_m_VI_plot.pdf").exists()
        assert (tmp_path / "p_m_AP_plot.pdf").exists()
        assert (tmp_path / "p_m_OD_plot.pdf").exists()

    def test_loss_plots(self, tmp_path):
        from iterseg_tpu.eval.plots import save_loss_plot, \
            save_channel_loss_plot

        df = pd.DataFrame({
            "epoch": [0, 0, 1, 1],
            "batch_num": [0, 1, 0, 1],
            "loss": [1.0, 0.9, 0.5, 0.4],
            "data_id": list("abcd"),
            "z-1": [1, 1, 1, 1.0],
            "y-1": [1, 1, 1, 1.0],
            "x-1": [1, 1, 1, 1.0],
            "mask": [1, 1, 1, 1.0],
            "centreness-log": [1, 1, 1, 1.0],
        })
        p = tmp_path / "loss_t.csv"
        df.to_csv(p)
        vdf = pd.DataFrame({
            "epoch": [0, 0, 1],
            "validation_loss": [1.0, 0.8, 0.6],
            "data_id": list("abc"),
            "batch_id": [0, 2, 4],
        })
        vp = tmp_path / "validation-loss_t.csv"
        vdf.to_csv(vp)
        save_loss_plot(str(p), "BCELoss", v_path=str(vp), show=False)
        save_channel_loss_plot(str(p), show=False)
        assert (tmp_path / "loss_t_loss.png").exists()
        assert (tmp_path / "loss_t_channel-loss.png").exists()

    def test_experiment_vi_plots(self, tmp_path):
        """Direct drive of the two remaining public plot fns: the
        multi-experiment VI rainclouds (plots.py:237-284 in the
        reference) and the two-axis VI comparison panel."""
        import matplotlib.pyplot as plt

        from iterseg_tpu.eval.plots import (VI_plot_compare,
                                            experiment_VI_plots)

        rng = np.random.default_rng(0)
        dfs = [
            pd.DataFrame({
                "VI: GT | Output": rng.uniform(0, 1, 6),
                "VI: Output | GT": rng.uniform(0, 1, 6),
                "GT | Output": rng.uniform(0, 1, 6),
                "Output | GT": rng.uniform(0, 1, 6),
                "model_name": [f"m{i}"] * 6,
            })
            for i in range(2)
        ]
        experiment_VI_plots(
            dfs, ["exp-a", "exp-b"], "VI study", "vi-study",
            str(tmp_path), show=False,
        )
        assert (tmp_path / "vi-study_VI_rainclould_plots.png").exists()

        f, (ax0, ax1) = plt.subplots(1, 2)
        VI_plot_compare(pd.concat(dfs), ax0, ax1, "models",
                        ["m0", "m1"])
        assert ax0.get_ylabel() == "models"
        plt.close(f)

    def test_comparison_plots(self, tmp_path):
        from iterseg_tpu.eval.plots import comparison_plots

        gt = two_blob_labels()
        for i, shift in enumerate((0, 2)):
            seg = two_blob_labels(shift=shift)
            slices = get_slices_from_chunks((3,) + gt.shape, (8, 24, 24),
                                            (1, 4, 4))
            get_accuracy_metrics(
                slices, np.stack([gt] * 3), np.stack([seg] * 3),
                name=f"model-{i}", prefix="cmp", out_path=str(tmp_path),
                exclude_chunks=1,
            )
        out = comparison_plots(str(tmp_path), "compare-test", show=False)
        assert os.path.exists(out)



class TestAffinitySumGraph:
    def test_known_signals(self):
        from iterseg_tpu.eval.metrics import affinity_sum_graph

        # a linear ramp: 1st-order diff is constant 1 -> per-axis term 1
        # along the ramp axis, 0 along the flat axis; 2nd order all-zero
        img = np.tile(np.arange(8.0), (8, 1))
        affs, res = affinity_sum_graph(img, affs=(1, 2))
        assert affs == [1, 2]
        np.testing.assert_allclose(res[0], 1.0)
        np.testing.assert_allclose(res[1], 0.0)

    def test_default_orders_and_types(self):
        from iterseg_tpu.eval.metrics import affinity_sum_graph

        r = np.random.default_rng(0)
        # axes must exceed the largest order (40): np.diff past the axis
        # size yields empty arrays and 0/0 (same upstream)
        img = r.random((44, 44, 44)).astype(np.float32)
        affs, res = affinity_sum_graph(img)
        assert affs == [1, 2, 3, 5, 10, 20, 40]
        assert len(res) == 7 and all(np.isfinite(res))
        # matches a literal per-axis re-derivation
        expect = sum(
            abs(np.diff(img, n=3, axis=ax).sum()
                / np.diff(img, n=3, axis=ax).size)
            for ax in range(3)
        )
        np.testing.assert_allclose(res[2], expect, rtol=1e-12)


class TestMatchArtifactsExactness:
    """The per-chunk shared precomputation (_MatchArtifacts) must be
    bit-identical to per-call computation across the threshold sweep —
    the whole point is removing redundant passes, not changing outputs."""

    @pytest.fixture
    def noisy_pair(self):
        from scipy import ndimage as ndi

        r = np.random.default_rng(3)
        vol = np.zeros((16, 48, 48), np.float32)
        pts = np.stack([r.integers(2, s - 2, size=120)
                        for s in vol.shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1, 2, 2))
        gt, _ = ndi.label(vol > 0.6 * vol.max())
        seg, _ = ndi.label(vol > 0.5 * vol.max())
        return gt, seg

    def test_calculate_identical_with_shared_artifacts(self, noisy_pair):
        from iterseg_tpu.eval.metrics import (THRESHOLDS, _MatchArtifacts,
                                              calculate)

        gt, seg = noisy_pair
        art = _MatchArtifacts(gt, seg)
        for t in THRESHOLDS:
            fresh = calculate(gt, seg, iou_threshold=t)
            shared = calculate(gt, seg, iou_threshold=t, artifacts=art)
            for f in ("n_true_labels", "n_pred_labels",
                      "n_true_positives", "n_false_positives",
                      "n_false_negatives"):
                assert getattr(fresh, f) == getattr(shared, f), (t, f)
            for f in ("IoU", "Jaccard", "pixel_identity",
                      "localization_error"):
                assert getattr(fresh.results, f) == getattr(
                    shared.results, f), (t, f)

    def test_vi_identical_with_shared_contingency(self, noisy_pair):
        from iterseg_tpu.eval.metrics import (_MatchArtifacts,
                                              variation_of_information)

        gt, seg = noisy_pair
        art = _MatchArtifacts(gt, seg)
        np.testing.assert_array_equal(
            variation_of_information(gt, seg),
            variation_of_information(gt, seg, pairs=art.pairs))

    def test_vi_bit_equals_sparse_reference(self, noisy_pair):
        """The bincount contingency must reproduce the scipy.sparse CSR
        implementation bit-for-bit (the probability sums keep the same
        row-major element order as CSR axis sums)."""
        from scipy import sparse

        from iterseg_tpu.eval.metrics import variation_of_information

        def sparse_vi(image0, image1):
            a = np.asarray(image0).ravel()
            b = np.asarray(image1).ravel()
            a_vals, a_inv = np.unique(a, return_inverse=True)
            b_vals, b_inv = np.unique(b, return_inverse=True)
            cont = sparse.coo_matrix(
                (np.ones(a.size), (a_inv, b_inv)),
                shape=(a_vals.size, b_vals.size)).tocsr()
            n = cont.sum()
            pxy = cont / n
            px = np.asarray(pxy.sum(axis=1)).ravel()
            py = np.asarray(pxy.sum(axis=0)).ravel()
            coo = pxy.tocoo()
            vals = coo.data
            h0g1 = -np.sum(vals * (np.log2(vals) - np.log2(py[coo.col])))
            h1g0 = -np.sum(vals * (np.log2(vals) - np.log2(px[coo.row])))
            return np.array([h0g1, h1g0])

        gt, seg = noisy_pair
        np.testing.assert_array_equal(variation_of_information(gt, seg),
                                      sparse_vi(gt, seg))
        # non-contiguous label ids exercise the unique/LUT fast path
        gt2 = (gt.astype(np.int64) * 7 + (gt > 0) * 3)
        np.testing.assert_array_equal(
            variation_of_information(gt2, seg), sparse_vi(gt2, seg))

    def test_unique_inverse_fast_path_matches_numpy(self):
        from iterseg_tpu.eval.metrics import _n_unique, _unique_inverse

        r = np.random.default_rng(5)
        for arr in (r.integers(0, 40, size=500).astype(np.int32),
                    r.integers(0, 3, size=7).astype(np.uint16),
                    np.zeros(9, np.int32),
                    r.integers(-5, 40, size=500),      # negative: fallback
                    r.random(100)):                    # float: fallback
            vals, inv = _unique_inverse(arr.ravel())
            ref_vals, ref_inv = np.unique(arr.ravel(),
                                          return_inverse=True)
            np.testing.assert_array_equal(vals, ref_vals)
            np.testing.assert_array_equal(inv, ref_inv)
            assert _n_unique(arr) == ref_vals.size

    def test_nd_count_matches_unique(self, noisy_pair):
        from iterseg_tpu.eval.metrics import _MatchArtifacts

        gt, seg = noisy_pair
        art = _MatchArtifacts(gt, seg)
        assert art.b_vals.size == np.unique(seg).size
        assert art.a_vals.size == np.unique(gt).size

    def test_centroid_table_bit_equals_scipy(self):
        from iterseg_tpu.eval.metrics import _centroid_table

        r = np.random.default_rng(1)
        vol = r.integers(0, 30, size=(7, 33, 21)).astype(np.int32)
        vals = np.unique(vol)
        table = _centroid_table(vol, vals)
        ids = [int(v) for v in vals if v != 0]
        ref = ndi.center_of_mass(np.ones_like(vol), vol, ids)
        for lb, rc in zip(ids, ref):
            assert table[lb] == tuple(rc)

    def test_localization_error_bit_equals_scipy_path(self, noisy_pair):
        """loc_err through the bincount centroid table equals a literal
        matched-only ndi.center_of_mass recomputation."""
        from iterseg_tpu.eval.metrics import calculate

        gt, seg = noisy_pair
        res = calculate(gt, seg, iou_threshold=0.3)
        if res.n_true_positives == 0:
            pytest.skip("fixture produced no matches")
        # recompute literally: redo the matching to recover the pairs
        from iterseg_tpu.eval.metrics import _MatchArtifacts
        from scipy.optimize import linear_sum_assignment

        art = _MatchArtifacts(gt, seg)
        above = art.iou >= 0.3
        rows, cols, iou = art.rows[above], art.cols[above], art.iou[above]
        ur, uc = np.unique(rows), np.unique(cols)
        rmap = {v: i for i, v in enumerate(ur)}
        cmap = {v: i for i, v in enumerate(uc)}
        mat = np.zeros((len(ur), len(uc)))
        for rr, cc, v in zip(rows, cols, iou):
            mat[rmap[rr], cmap[cc]] = v
        ri, ci = linear_sum_assignment(-mat)
        pairs = [(ur[a], uc[b]) for a, b in zip(ri, ci)
                 if mat[a, b] >= 0.3]
        gl = [int(art.a_vals[a]) for a, _ in pairs]
        sl = [int(art.b_vals[b]) for _, b in pairs]
        gc = ndi.center_of_mass(np.ones_like(gt), gt, gl)
        sc = ndi.center_of_mass(np.ones_like(seg), seg, sl)
        lit = float(np.mean(np.linalg.norm(
            np.array(gc) - np.array(sc), axis=1)))
        assert res.results.localization_error == lit

    def test_t_interval_bit_equals_scipy(self):
        """The cached-quantile t-CI must reproduce scipy.stats.t.interval
        bit-for-bit, including the scale<=0/nan domain rule and df=0."""
        from scipy import stats

        from iterseg_tpu.eval.metrics import _t_interval

        r = np.random.default_rng(3)
        cases = [(df, loc, scale)
                 for df in (1, 2, 7, 12, 100)
                 for loc, scale in zip(r.normal(size=4),
                                       np.abs(r.normal(size=4)) + 1e-6)]
        cases += [(5, 0.3, 0.0), (5, 0.3, np.nan), (0, 1.0, 1.0),
                  (5, np.nan, 1.0)]
        for df, loc, scale in cases:
            ref = stats.t.interval(0.95, df, loc, scale)
            got = _t_interval(0.95, df, loc, scale)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_single_sample_stats_bit_equals_literal_scipy(self):
        """single_sample_stats equals the reference's literal
        sem + t.interval computation, incl. a constant column (sem=0)
        and a nan-bearing column."""
        import pandas as pd
        from scipy import stats

        from iterseg_tpu.eval.metrics import single_sample_stats

        r = np.random.default_rng(4)
        df = pd.DataFrame({
            "a": r.normal(size=9),
            "b": np.full(9, 2.5),               # sem == 0 -> nan CI
            "c": np.concatenate([r.normal(size=8), [np.nan]]),
        })
        out = single_sample_stats(df, ["a", "b", "c"], "m")
        for c in ["a", "b", "c"]:
            vals = df[c].values
            mean = np.mean(vals)
            sem = stats.sem(vals)
            ci = stats.t.interval(0.95, vals.size - 1, mean, sem)
            np.testing.assert_array_equal(
                out[f"{c}_mean"].values, [mean])
            np.testing.assert_array_equal(
                out[f"{c}_sem"].values, [sem])
            np.testing.assert_array_equal(
                out[f"{c}_95pcntCI_2-5pcnt"].values, [ci[0]])
            np.testing.assert_array_equal(
                out[f"{c}_95pcntCI_97-5pcnt"].values, [ci[1]])


class TestDtypeRobustness:
    """napari/zarr label layers commonly arrive as uint64 — the bincount
    fast path must accept every unsigned/signed integer dtype np.unique
    handled (regression: np.bincount rejects uint64 under the 'safe'
    cast rule)."""

    @pytest.mark.parametrize("dtype", [np.uint64, np.uint32, np.int64,
                                       np.uint16, np.int16])
    def test_all_paths_match_int64(self, dtype):
        from iterseg_tpu.eval.metrics import (_MatchArtifacts, _n_unique,
                                              _unique_inverse, calculate,
                                              variation_of_information)

        gt = two_blob_labels().astype(dtype)
        seg = two_blob_labels(shift=2).astype(dtype)
        ref_gt = gt.astype(np.int64)
        ref_seg = seg.astype(np.int64)

        assert _n_unique(gt) == _n_unique(ref_gt)
        v, inv = _unique_inverse(gt.ravel())
        rv, rinv = _unique_inverse(ref_gt.ravel())
        np.testing.assert_array_equal(v.astype(np.int64), rv)
        np.testing.assert_array_equal(inv, rinv)

        np.testing.assert_array_equal(
            variation_of_information(gt, seg),
            variation_of_information(ref_gt, ref_seg))

        got = calculate(gt, seg, iou_threshold=0.5,
                        artifacts=_MatchArtifacts(gt, seg))
        want = calculate(ref_gt, ref_seg, iou_threshold=0.5)
        assert got == want
