"""ID-matched dataset discovery helpers (parity: helpers.py:95-180)."""
import os
from contextlib import contextmanager

import numpy as np
import pytest
from PIL import Image

from iterseg_tpu import helpers


@pytest.fixture
def dataset_dir(tmp_path):
    """Two runs of the reference's file layout, with distinguishable
    contents per suffix so ordering bugs are detectable."""
    ids = ["240101_120000_0", "240101_120000_1"]
    for k, run_id in enumerate(ids):
        for j, suffix in enumerate(
            ["_image.tif", "_labels.tif", "_output.tif", "_GT.tif",
             "_segmentation.tif", "_DoG-segmentation.tif"]
        ):
            arr = np.full((4, 5), 10 * k + j, dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{run_id}{suffix}")
    return tmp_path, ids


def test_get_data_by_id_suffix_order(dataset_dir):
    d, ids = dataset_dir
    image, labels = helpers.get_data_by_id(
        str(d), ["_image.tif", "_labels.tif"]
    )
    # stacks come back in SUFFIX order, frames in run-ID order
    assert np.asarray(image).shape == (2, 4, 5)
    assert np.asarray(image)[0, 0, 0] == 0 and np.asarray(image)[1, 0, 0] == 10
    assert np.asarray(labels)[0, 0, 0] == 1 and np.asarray(labels)[1, 0, 0] == 11


def test_get_dataset_reference_swap_quirk(dataset_dir):
    """The reference's get_dataset (helpers.py:95-127) returns the
    _labels.tif stack FIRST (its labs/images bindings are crossed); the
    port replicates that observable order exactly."""
    d, ids = dataset_dir
    first, second, output = helpers.get_dataset(str(d))
    assert np.asarray(first)[0, 0, 0] == 1      # _labels.tif
    assert np.asarray(second)[0, 0, 0] == 0     # _image.tif
    assert np.asarray(output)[0, 0, 0] == 2     # _output.tif
    out = helpers.get_dataset(str(d), GT=True, return_ID=True)
    assert len(out) == 5
    assert out[4] == ids
    assert np.asarray(out[3])[0, 0, 0] == 3     # _GT.tif


def test_get_dataset_segs(dataset_dir):
    d, ids = dataset_dir
    gt, seg, dog, im = helpers.get_dataset_segs(str(d), validation=False)
    assert np.asarray(gt)[0, 0, 0] == 3
    assert np.asarray(seg)[0, 0, 0] == 4
    assert np.asarray(dog)[0, 0, 0] == 5
    assert np.asarray(im)[0, 0, 0] == 0


def test_get_files_and_ids(dataset_dir):
    ddir, _ = dataset_dir
    xs, ys = helpers.get_files(str(ddir),
                               x_regex=r"\d{6}_\d{6}_\d{1,3}_image.tif",
                               y_regex=r"\d{6}_\d{6}_\d{1,3}_labels.tif")
    assert len(xs) == len(ys) > 0
    helpers.check_ids_match(sorted(xs), sorted(ys))
    ids = helpers.get_ids(sorted(xs))
    assert all(len(i.split("_")) == 3 for i in ids)
    with pytest.raises(ValueError, match="Irregular ID"):
        helpers.get_ids(["not-an-id.tif"])


def test_write_log_and_log_dir(tmp_path):
    helpers.write_log("line one", str(tmp_path))
    helpers.write_log("line two", str(tmp_path))
    assert (tmp_path / "log.txt").read_text() == "line one\nline two\n"
    assert helpers.log_dir_or_None(True, "d") == "d"
    assert helpers.log_dir_or_None(False, "d") is None


def test_get_regex_images_orders_by_id(dataset_dir):
    ddir, _ = dataset_dir
    xs = sorted(helpers.get_paths(
        str(ddir), regex=r"\d{6}_\d{6}_\d{1,3}_image.tif"))
    ids = helpers.get_ids(xs)
    stack = helpers.get_regex_images(
        str(ddir), r"\d{6}_\d{6}_\d{1,3}_image.tif", ids[::-1])
    assert len(stack) == len(ids)
    # requested-order, not directory-order
    first = np.asarray(stack[0])
    np.testing.assert_array_equal(first, np.asarray(Image.open(xs[-1])))
    with pytest.raises(AssertionError, match="No file match"):
        helpers.get_regex_images(str(ddir),
                                 r"\d{6}_\d{6}_\d{1,3}_image.tif",
                                 ["999999_999999_9"])


_CACHE_CONFIG_KEYS = (
    "jax_compilation_cache_dir",
    "jax_persistent_cache_min_compile_time_secs",
    "jax_persistent_cache_min_entry_size_bytes",
)


@contextmanager
def _restore_cache_config():
    """Restore EVERY config key enable_compilation_cache touches —
    leaking the 0.0/0 thresholds would make the rest of the session
    persist even trivial compiles into the shared cache dir."""
    import jax

    old = {k: getattr(jax.config, k) for k in _CACHE_CONFIG_KEYS}
    try:
        yield
    finally:
        for k, v in old.items():
            jax.config.update(k, v)


class TestEnableCompilationCache:
    """utils.enable_compilation_cache resolution order + opt-out."""

    def test_explicit_dir_wins_and_sets_config(self, tmp_path):
        import jax

        from iterseg_tpu.utils import enable_compilation_cache

        with _restore_cache_config():
            got = enable_compilation_cache(str(tmp_path / "cc"))
            assert got == str(tmp_path / "cc")
            assert os.path.isdir(got)
            assert jax.config.jax_compilation_cache_dir == got

    def test_env_var_and_opt_out(self, tmp_path, monkeypatch):
        import jax

        from iterseg_tpu.utils import enable_compilation_cache

        with _restore_cache_config():
            monkeypatch.setenv("ITERSEG_TPU_COMPILE_CACHE",
                               str(tmp_path / "env_cc"))
            assert enable_compilation_cache() == str(tmp_path / "env_cc")
            # empty string = explicit opt-out, config untouched
            monkeypatch.setenv("ITERSEG_TPU_COMPILE_CACHE", "")
            before = jax.config.jax_compilation_cache_dir
            assert enable_compilation_cache() is None
            assert jax.config.jax_compilation_cache_dir == before
