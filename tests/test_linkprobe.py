"""Bandwidth-adaptive defaults (engine/linkprobe): the measured decision
table turns into behaviour — microbatch cap and device_flood=True
resolution flip with link speed; no real link (CPU mesh) keeps the
status-quo slow-link defaults."""
import numpy as np
import pytest

from iterseg_tpu.engine import linkprobe
from iterseg_tpu.engine.predict import _pick_batch_size


@pytest.fixture(autouse=True)
def _fresh_probe_cache():
    linkprobe.reset_cache()
    yield
    linkprobe.reset_cache()


def _mock_link(monkeypatch, mbps):
    monkeypatch.setattr(linkprobe, "measure_link_mbps",
                        lambda n_runs=3: mbps)


class TestProbe:
    def test_no_link_off_tpu(self):
        """The CPU test mesh has no host link: the probe must say so
        (None), keeping every consumer on the slow-link default."""
        import jax

        if jax.default_backend() == "tpu":
            pytest.skip("real TPU present")
        assert linkprobe.measure_link_mbps() is None

    def test_cached(self, monkeypatch):
        calls = []
        real = linkprobe.measure_link_mbps

        # cache is at module level: second call must not re-probe
        linkprobe._cache.append(123.0)
        assert real() == 123.0
        assert real() == 123.0

    def test_measured_table_documented(self):
        assert linkprobe.MEASURED["device_flood_crossover_mbps"] == 38.0
        assert linkprobe.MEASURED["microbatch_slow_link"] == 8
        assert linkprobe.MEASURED["microbatch_fast_link"] == 16


class TestMicrobatch:
    CHUNK = (10, 256, 256)

    def test_slow_link_keeps_b8(self, monkeypatch):
        _mock_link(monkeypatch, 50.0)  # today's tunnel
        assert _pick_batch_size(32, self.CHUNK, 5) == 8

    def test_no_link_keeps_b8(self, monkeypatch):
        _mock_link(monkeypatch, None)
        assert _pick_batch_size(32, self.CHUNK, 5) == 8

    def test_fast_link_picks_b16(self, monkeypatch):
        _mock_link(monkeypatch, 1000.0)  # PCIe class
        assert _pick_batch_size(32, self.CHUNK, 5) == 16

    def test_threshold_boundary(self, monkeypatch):
        thr = linkprobe.MEASURED["microbatch_threshold_mbps"]
        _mock_link(monkeypatch, thr)
        assert _pick_batch_size(32, self.CHUNK, 5) == 16
        linkprobe.reset_cache()
        _mock_link(monkeypatch, thr - 1)
        assert _pick_batch_size(32, self.CHUNK, 5) == 8

    def test_mid_band_link_keeps_b8(self, monkeypatch):
        """The 61–186 MB/s mid-band (VERDICT r4 #7): the makespan model
        has its single crossover at the derived 186 MB/s — B=16's 45 ms
        compute saving never covers its extra 8.375 MB fill upload
        below it, so a 120 MB/s host must still pick B=8."""
        _mock_link(monkeypatch, 120.0)
        assert _pick_batch_size(32, self.CHUNK, 5) == 8

    def test_threshold_is_the_derived_crossover(self):
        """Pin the derivation itself: threshold == fill bytes / compute
        saving == 8.375 MB / (0.55 s − 0.505 s), the on-chip measured
        constants (linkprobe module docstring)."""
        derived = 8.375 / (0.55 - 0.505)
        assert abs(
            linkprobe.MEASURED["microbatch_threshold_mbps"] - derived
        ) < 1.0

    def test_small_chunk_counts_unaffected(self, monkeypatch):
        _mock_link(monkeypatch, 1000.0)
        assert _pick_batch_size(4, self.CHUNK, 5) == 4


class TestDeviceFloodTrue:
    def _tpu(self, monkeypatch):
        from iterseg_tpu.engine import device_pipeline

        monkeypatch.setattr(device_pipeline.jax, "default_backend",
                            lambda: "tpu")

    @pytest.mark.parametrize("cls_name", ["AffinityPipeline",
                                          "DoGPipeline"])
    def test_true_fast_link_is_pallas(self, monkeypatch, cls_name):
        from iterseg_tpu.engine import device_pipeline

        self._tpu(monkeypatch)
        _mock_link(monkeypatch, 100.0)  # >= 38
        cls = getattr(device_pipeline, cls_name)
        assert cls.normalize_device_flood(True) == "pallas"

    @pytest.mark.parametrize("cls_name", ["AffinityPipeline",
                                          "DoGPipeline"])
    def test_true_slow_link_is_host(self, monkeypatch, cls_name):
        from iterseg_tpu.engine import device_pipeline

        self._tpu(monkeypatch)
        _mock_link(monkeypatch, 20.0)  # < 38
        cls = getattr(device_pipeline, cls_name)
        assert cls.normalize_device_flood(True) is False

    @pytest.mark.parametrize("cls_name", ["AffinityPipeline",
                                          "DoGPipeline"])
    def test_explicit_values_always_force(self, monkeypatch, cls_name):
        from iterseg_tpu.engine import device_pipeline

        self._tpu(monkeypatch)
        _mock_link(monkeypatch, 20.0)
        cls = getattr(device_pipeline, cls_name)
        assert cls.normalize_device_flood("pallas") == "pallas"
        assert cls.normalize_device_flood("xla") == "xla"

    def test_off_tpu_true_stays_xla(self):
        import jax

        from iterseg_tpu.engine.device_pipeline import AffinityPipeline

        if jax.default_backend() == "tpu":
            pytest.skip("real TPU present")
        assert AffinityPipeline.normalize_device_flood(True) == "xla"
