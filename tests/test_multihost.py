"""Pod-scale multi-host frame parallelism, exercised with REAL processes.

Two separate Python processes join a ``jax.distributed`` CPU (Gloo)
runtime, segment disjoint round-robin frame shards of one shared zarr, and
all-gather metric rows over the collective — then everything is compared
against a single-process run (labels bit-equal, metrics CSVs equal).
Reference analog: the serial frame loop ``segmentation.py:833-882`` and
metrics loop ``metrics.py:45-142``.
"""
import os
import socket
import subprocess
import sys
import threading

import numpy as np
import pandas as pd
import pytest
from scipy import ndimage as ndi

from iterseg_tpu.core.chunks import get_slices_from_chunks
from iterseg_tpu.eval.metrics import get_accuracy_metrics
from iterseg_tpu.io.zarr_io import open_zarr, zarr_save
from iterseg_tpu.parallel import multihost as mh

CHUNK = (8, 32, 32)
MARGIN = (1, 4, 4)

_DRIVER = """
import os, sys
pid, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
if "jax" in sys.modules:  # sitecustomize pre-imported jax: reset to CPU
    import jax
    from jax._src import xla_bridge as _xb
    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
import numpy as np
from iterseg_tpu.parallel import multihost as mh

mh.init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
import jax
assert jax.process_count() == 2, jax.process_count()

done = mh.multihost_segment_zarr(
    os.path.join(root, "in.zarr"), os.path.join(root, "out_mh.zarr"),
    segmenter="DoG-blob-watershed", chunk_size=(8, 32, 32), margin=(1, 4, 4),
)
assert all(t % 2 == pid for t in done), (pid, done)

from iterseg_tpu.core.chunks import get_slices_from_chunks
from iterseg_tpu.io.zarr_io import open_zarr

gt = np.asarray(open_zarr(os.path.join(root, "gt.zarr")))
seg = np.asarray(open_zarr(os.path.join(root, "out_mh.zarr")))
slices = get_slices_from_chunks(seg.shape, (8, 32, 32), (1, 4, 4))
mh.multihost_accuracy_metrics(
    slices, gt, seg, "mh", "metrics", exclude_chunks=2,
    out_path=os.path.join(root, "mh_metrics"),
)
print("HOST", pid, "DONE", done, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    """4-frame noisy blob stack + its zarr + a blobby 'ground truth'."""
    root = tmp_path_factory.mktemp("mh")
    r = np.random.default_rng(7)
    frames = []
    for t in range(4):
        vol = np.zeros((8, 32, 32), np.float32)
        pts = np.stack([r.integers(2, s - 2, size=12) for s in vol.shape], 1)
        vol[tuple(pts.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1, 1.5, 1.5))
        vol /= vol.max()
        frames.append(vol)
    data = np.stack(frames)
    zarr_save(str(root / "in.zarr"), data)
    # ground truth for metrics: threshold-labelled blobs
    gt = np.stack([ndi.label(f > 0.25 * f.max())[0] for f in data])
    zarr_save(str(root / "gt.zarr"), gt.astype(np.uint32))
    # golden: a single "pod" of one host, same entry point
    mh.multihost_segment_zarr(
        str(root / "in.zarr"), str(root / "out_single.zarr"),
        segmenter="DoG-blob-watershed", chunk_size=CHUNK, margin=MARGIN,
        host_id=0, n_hosts=1,
    )
    return root, data


def test_host_frames_round_robin():
    assert mh.host_frames(5, host_id=0, n_hosts=2) == [0, 2, 4]
    assert mh.host_frames(5, host_id=1, n_hosts=2) == [1, 3]
    assert mh.host_frames(3, host_id=0, n_hosts=1) == [0, 1, 2]


def test_prep_affinity_segmenter(tmp_path):
    """The affinity branch of the pod prep resolves a checkpoint and
    allocates the per-frame scratch exactly like the single-host prep."""
    from iterseg_tpu.engine.segmentation import (
        _as_layer, affinity_watershed_for_chunks)
    from iterseg_tpu.models.convert import save_checkpoint
    from iterseg_tpu.models.unet import UNetSpec, init_params

    ck = str(tmp_path / "u.npz")
    save_checkpoint(init_params(UNetSpec(1, 5), seed=0), ck)
    layer = _as_layer(np.zeros((2, 8, 32, 32), np.float32))
    fn, config = mh._prep("affinity-unet-watershed", layer, ck)
    assert fn is affinity_watershed_for_chunks
    assert config["unet"].out_channels == 5
    assert config["output_volume"].shape == (5, 8, 32, 32)
    with pytest.raises(ValueError):
        mh._prep("not-a-segmenter", layer, None)


def test_two_process_pod_matches_single_host(stack):
    root, data = stack
    golden = np.asarray(open_zarr(str(root / "out_single.zarr")))
    assert golden.max() > 0  # it segmented something

    gt = np.asarray(open_zarr(str(root / "gt.zarr")))
    slices = get_slices_from_chunks(golden.shape, CHUNK, MARGIN)
    get_accuracy_metrics(
        slices, gt, golden, "mh", "metrics", exclude_chunks=2,
        out_path=str(root / "single_metrics"),
    )

    # the real thing: two separate processes, Gloo collectives
    from conftest import cpu_subprocess_env

    port = _free_port()
    env = cpu_subprocess_env(n_devices=1)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DRIVER, str(pid), str(port), str(root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-3000:]}"
        assert f"HOST {pid} DONE" in out

    pod = np.asarray(open_zarr(str(root / "out_mh.zarr")))
    np.testing.assert_array_equal(pod, golden)

    # metrics CSVs from the pod run equal the single-host ones
    for fname in ("metrics_mh_scores.csv", "metrics_mh_stats.csv",
                  "metrics_mh_AP_curve.csv"):
        single = pd.read_csv(root / "single_metrics" / fname)
        podcsv = pd.read_csv(root / "mh_metrics" / fname)
        pd.testing.assert_frame_equal(podcsv, single)


def test_metrics_file_gather_matches_single_host(stack, tmp_path):
    """The no-distributed-runtime fallback: rows exchanged via part files
    (two hosts simulated with threads in this one process)."""
    root, data = stack
    golden = np.asarray(open_zarr(str(root / "out_single.zarr")))
    gt = np.asarray(open_zarr(str(root / "gt.zarr")))
    slices = get_slices_from_chunks(golden.shape, CHUNK, MARGIN)
    (g_scores, g_ap), g_stats = get_accuracy_metrics(
        slices, gt, golden, "mh", "metrics", exclude_chunks=2,
        out_path=None,
    )

    results = {}

    def run(host):
        results[host] = mh.multihost_accuracy_metrics(
            slices, gt, golden, "mh", "metrics", exclude_chunks=2,
            out_path=str(tmp_path), host_id=host, n_hosts=2,
        )

    threads = [threading.Thread(target=run, args=(h,)) for h in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1}
    for host in (0, 1):
        (scores, ap), stats = results[host]
        pd.testing.assert_frame_equal(scores, g_scores)
        pd.testing.assert_frame_equal(ap, g_ap)
        pd.testing.assert_frame_equal(stats, g_stats)


def test_file_gather_requires_out_path():
    with pytest.raises(ValueError, match="out_path"):
        mh._allgather_rows(
            np.zeros((1, 3)), None, host_id=0, n_hosts=2, tag="t"
        )


def test_file_gather_ignores_stale_foreign_nonce(tmp_path):
    """Leftover part files from a crashed run (different nonce) are
    invisible to a new run — no manual cleanup needed."""
    # litter from a hypothetical crashed run with another nonce
    np.save(tmp_path / ".t_deadrun_x0_part0.npy", np.full((2, 3), -1.0))
    (tmp_path / ".t_deadrun_x0_done0").touch()
    mh.set_run_nonce("live123")
    try:
        mats = {0: np.arange(6.0).reshape(2, 3),
                1: np.arange(6.0, 12.0).reshape(2, 3)}
        results = {}

        def run(host):
            results[host] = mh._allgather_rows(
                mats[host], str(tmp_path), host_id=host, n_hosts=2, tag="t"
            )

        threads = [threading.Thread(target=run, args=(h,)) for h in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        expected = np.concatenate([mats[0], mats[1]], axis=0)
        for host in (0, 1):
            np.testing.assert_array_equal(results[host], expected)
        # the stale foreign part file was never consumed nor deleted
        assert (tmp_path / ".t_deadrun_x0_part0.npy").exists()
        # this run's own files were cleaned up
        assert not list(tmp_path.glob(".t_live123*part*.npy"))
    finally:
        mh.set_run_nonce(None)


def test_same_nonce_duplicate_fails_loud(tmp_path):
    mh.set_run_nonce("dup")
    try:
        np.save(tmp_path / ".t2_dup_x0_part0.npy", np.zeros((1, 3)))
        with pytest.raises(RuntimeError, match="nonce"):
            mh._allgather_rows(
                np.zeros((1, 3)), str(tmp_path), host_id=0, n_hosts=2,
                tag="t2",
            )
    finally:
        mh.set_run_nonce(None)


_AUW_DRIVER = """
import os, sys
pid, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
if "jax" in sys.modules:  # sitecustomize pre-imported jax: reset to CPU
    import jax
    from jax._src import xla_bridge as _xb
    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
import numpy as np
from iterseg_tpu.parallel import multihost as mh

mh.init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
import jax
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2, jax.local_devices()

done = mh.multihost_segment_zarr(
    os.path.join(root, "in.zarr"), os.path.join(root, "out_auw_mh.zarr"),
    segmenter="affinity-unet-watershed",
    network_or_config_file=os.path.join(root, "u.npz"),
    chunk_size=(8, 32, 32), margin=(1, 4, 4),
    devices=jax.local_devices(),
)
assert all(t % 2 == pid for t in done), (pid, done)
print("HOST", pid, "DONE", done, flush=True)
"""


def test_two_process_pod_with_two_chips_each_matches_single_host(stack,
                                                                 tmp_path):
    """Pod x chips: 2 real processes (gloo runtime), each driving a
    2-device CPU mesh via segment_stack(devices=...) for the affinity
    segmenter — labels bit-match the single-host single-device run."""
    from iterseg_tpu.models.convert import save_checkpoint
    from iterseg_tpu.models.unet import UNetSpec, init_params

    root, data = stack
    save_checkpoint(init_params(UNetSpec(1, 5), seed=0), root / "u.npz")
    # single-host single-device golden through the same public entry
    # point, in its OWN subprocess with the same backend config as the
    # pod processes (2 CPU devices): different XLA backend configs can
    # compile float programs with e.g. different FMA contraction, so
    # bit-identity is only claimed within one backend config
    golden_driver = _AUW_DRIVER.replace(
        "mh.init_multihost(f\"localhost:{port}\", num_processes=2, process_id=pid)",
        "").replace(
        "assert jax.process_count() == 2, jax.process_count()", "").replace(
        "out_auw_mh.zarr", "out_auw_single.zarr").replace(
        "devices=jax.local_devices(),",
        "host_id=0, n_hosts=1,").replace(
        "assert all(t % 2 == pid for t in done), (pid, done)", "")
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env(n_devices=2)
    gp = subprocess.run(
        [sys.executable, "-c", golden_driver, "0", "0", str(root)],
        env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=560,
    )
    assert gp.returncode == 0, gp.stdout.decode()[-2000:]
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _AUW_DRIVER, str(pid), str(port),
             str(root)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=560)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    golden = np.asarray(open_zarr(str(root / "out_auw_single.zarr")))
    pod = np.asarray(open_zarr(str(root / "out_auw_mh.zarr")))
    assert golden.max() > 0
    np.testing.assert_array_equal(pod, golden)


def test_metrics_lazy_zarr_inputs_match_numpy(stack):
    """Zarr-backed gt/seg handles flow through the lazy path (each host
    reads only its chunk shard, never the whole stack) and produce the
    exact frames the numpy path does."""
    root, data = stack
    golden_z = open_zarr(str(root / "out_single.zarr"))
    gt_z = open_zarr(str(root / "gt.zarr"))
    golden = np.asarray(golden_z)
    gt = np.asarray(gt_z)
    slices = get_slices_from_chunks(golden.shape, CHUNK, MARGIN)

    (n_scores, n_ap), n_stats = mh.multihost_accuracy_metrics(
        slices, gt, golden, "mh", "lazy", exclude_chunks=2, out_path=None,
        host_id=0, n_hosts=1,
    )
    (z_scores, z_ap), z_stats = mh.multihost_accuracy_metrics(
        slices, gt_z, golden_z, "mh", "lazy", exclude_chunks=2,
        out_path=None, host_id=0, n_hosts=1,
    )
    pd.testing.assert_frame_equal(z_scores, n_scores)
    pd.testing.assert_frame_equal(z_ap, n_ap)
    pd.testing.assert_frame_equal(z_stats, n_stats)
