"""Pod-scale multi-host frame parallelism over DCN (BASELINE config #5).

The reference processes a 4D timeseries with a serial per-frame loop on one
machine (``segmentation.py:833-882``) and scores it with a serial chunk
loop (``metrics.py:45-142``). This module is the pod-scale decomposition
the TPU-native design calls for (SURVEY §2.4):

- **frames are statically sharded round-robin over hosts** — each host
  segments frames ``t % n_hosts == host_id`` with its local chips (the
  single-host ICI parallelism of ``AffinityPipeline.segment_stack`` /
  ``parallel.mesh`` composes underneath) and writes them into ONE shared
  output zarr. The output is chunked one-frame-per-chunk, so concurrent
  hosts never touch the same zarr chunk and tensorstore's concurrent chunk
  writes need no locking;
- **metric rows are all-gathered**: each host scores its shard of the
  evaluation chunk grid, the per-chunk rows are exchanged with
  ``jax.experimental.multihost_utils.process_allgather`` (DCN collectives
  when a ``jax.distributed`` runtime exists) or through the shared store
  (part files) when there is none, and every host finalises the identical
  frame-ordered table — so the CSVs/statistics match the single-host
  output exactly.

Honesty note: this machine has one host and one TPU chip. The module is
exercised for real by ``tests/test_multihost.py``, which runs TWO separate
processes with a ``jax.distributed`` CPU (Gloo) runtime and asserts labels
and metrics are identical to the single-process result; actual DCN pods
are dryrun-only here.
"""
from __future__ import annotations

import os
import time

import numpy as np

__all__ = [
    "init_multihost",
    "set_run_nonce",
    "host_frames",
    "multihost_segment_zarr",
    "multihost_accuracy_metrics",
]

# integer-valued metric columns (restored to int64 after the float
# all-gather so the finalised table matches the single-host dtypes)
_INT_COLUMNS = ("Number objects (GT)", "Number objects (model)",
                "Count difference", "n_predicted", "n_true", "n_diff")
_INT_SUFFIXES = ("_true_positives", "_false_positives", "_false_negatives")


def _dist_client():
    """The live jax.distributed client, or None outside a pod runtime."""
    from jax._src import distributed as _dist

    return getattr(_dist.global_state, "client", None)


# run nonce scoping the file-based metric exchanges: a crashed run's
# leftover part files can never be consumed by a later run with a
# different nonce, so recovery needs no manual cleanup
_RUN_NONCE = [None]


def set_run_nonce(nonce):
    """Set the exchange-file nonce for this run (same value on all hosts —
    e.g. the scheduler's job id or the coordinator's start time)."""
    _RUN_NONCE[0] = None if nonce is None else str(nonce)


def _run_nonce():
    if _RUN_NONCE[0] is not None:
        return _RUN_NONCE[0]
    return os.environ.get("ITERSEG_RUN_NONCE", "")


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None, run_nonce=None):
    """Join (or start) a ``jax.distributed`` runtime.

    On a real pod the arguments come from the cluster environment and this
    is ``jax.distributed.initialize()``; in tests each process passes them
    explicitly (CPU backend, Gloo collectives). No-op if already
    initialised or if ``num_processes == 1``.

    ``run_nonce``: a string identical on every host of THIS run (job id,
    coordinator start time, ...) that scopes the file-based metric
    exchange (see ``_allgather_rows``) so stale files from a crashed
    earlier run are ignored automatically. Falls back to the
    ``ITERSEG_RUN_NONCE`` env var.
    """
    import jax

    if run_nonce is not None:
        set_run_nonce(run_nonce)
    if num_processes == 1:
        return
    if _dist_client() is not None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _resolve_host(host_id, n_hosts):
    """host/pod coordinates: explicit args > jax.distributed > env > solo."""
    if host_id is not None and n_hosts is not None:
        return int(host_id), int(n_hosts)
    import jax

    if _dist_client() is not None:
        return jax.process_index(), jax.process_count()
    if "ITERSEG_HOST_ID" in os.environ:
        return (int(os.environ["ITERSEG_HOST_ID"]),
                int(os.environ.get("ITERSEG_N_HOSTS", "1")))
    return 0, 1


def host_frames(n_frames, host_id=None, n_hosts=None):
    """The frames this host owns: round-robin ``t % n_hosts == host_id``
    (deterministic, balanced, and stable under warm restart — a rerun of
    the same pod re-derives the same ownership)."""
    host_id, n_hosts = _resolve_host(host_id, n_hosts)
    return [t for t in range(int(n_frames)) if t % n_hosts == host_id]


def _barrier(name):
    """Cross-host barrier when a distributed runtime exists (no-op solo)."""
    import jax

    if _dist_client() is None:
        return
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def _wait_for_zarr(path, timeout_s=120.0):
    t0 = time.monotonic()
    while not os.path.exists(os.path.join(str(path), ".zarray")):
        if time.monotonic() - t0 > timeout_s:
            raise TimeoutError(f"no zarr appeared at {path}")
        time.sleep(0.05)


def _prep(segmenter, data_layer, network_or_config_file):
    """(processing_function, config) for a registry segmenter, headless."""
    from ..engine import segmentation as seg

    if segmenter == "affinity-unet-watershed":
        config = seg.affinity_watershed_prep_config(
            data_layer, network_or_config_file, None
        )
        return seg.affinity_watershed_for_chunks, config
    if segmenter == "DoG-blob-watershed":
        config = seg.dog_blob_watershed_prep_config(
            data_layer, network_or_config_file, None
        )
        return seg.dog_blob_watershed_for_chunks, config
    raise ValueError(f"unknown segmenter {segmenter!r}")


class _FrameSubset:
    """4D-stack view of selected frame indices of a (possibly 3D) array."""

    def __init__(self, data, idxs):
        self._data = data
        self._idxs = list(idxs)
        zyx = tuple(data.shape[-3:])
        self.shape = (len(self._idxs),) + zyx
        self.ndim = 4

    def __getitem__(self, t):
        if getattr(self._data, "ndim", 4) == 3:
            return np.asarray(self._data[...])
        return np.asarray(self._data[self._idxs[t]])


class _FrameSubsetOut:
    """Write adapter: local frame t → global frame idxs[t] of the store."""

    def __init__(self, out, idxs):
        self._out = out
        self._idxs = list(idxs)
        self.shape = (len(self._idxs),) + tuple(out.shape[-3:])

    @staticmethod
    def _frame(t):
        # accept the driver's `labels[t, ...]` form as well as plain ints
        if isinstance(t, tuple):
            t = t[0]
        return t

    def __getitem__(self, t):
        return self._out[self._idxs[self._frame(t)]]

    def __setitem__(self, t, value):
        self._out[self._idxs[self._frame(t)]] = (
            np.asarray(value).astype(np.uint32)
        )


def multihost_segment_zarr(
    input_zarr,
    output_zarr,
    segmenter="affinity-unet-watershed",
    network_or_config_file=None,
    chunk_size=(10, 256, 256),
    margin=(1, 64, 64),
    host_id=None,
    n_hosts=None,
    devices=None,
):
    """Segment a (t, z, y, x) zarr timeseries across a pod of hosts.

    Every host runs this same call (SPMD over frames). Host 0 creates the
    shared output zarr chunked one-frame-per-chunk; each host then segments
    its round-robin share of frames (warm-restart: frames already labelled
    are skipped, as in ``segmentation_loop``) and writes disjoint chunks.
    Returns the list of frames this host processed.

    Pod x chips composition: each host drives its segmenter pipeline's
    ``segment_stack`` (``AffinityPipeline`` for the affinity segmenter,
    ``DoGPipeline`` for DoG) over its frame shard, which round-robins
    those frames across ``devices`` (pass ``jax.local_devices()`` on a
    pod host; default = pipelined single-device). Labels are
    bit-identical to the single-host, single-device path (the pipelines
    share their compiled programs with the generic paths; tested in
    ``tests/test_multihost.py``).
    """
    from ..engine.segmentation import segmentation_loop, _as_layer
    from ..io.zarr_io import open_zarr

    host_id, n_hosts = _resolve_host(host_id, n_hosts)
    data = open_zarr(input_zarr)
    if data.ndim == 3:
        shape = (1,) + tuple(data.shape)
    else:
        shape = tuple(data.shape)
    n_frames, zyx = shape[0], shape[1:]

    if host_id == 0:
        out = open_zarr(output_zarr, shape=shape, chunks=(1,) + tuple(zyx),
                        dtype=np.uint32)
    else:
        _wait_for_zarr(output_zarr)
        out = open_zarr(output_zarr)
    _barrier("iterseg:output_created")

    layer = _as_layer(data)
    fn, config = _prep(segmenter, layer, network_or_config_file)

    mine = host_frames(n_frames, host_id, n_hosts)
    done = []
    if mine:
        # delegate to THE per-frame driver: same pipelined 4D fast paths,
        # gating (incl. use_device_pipeline opt-out), warm restart and
        # fallbacks as single-host segmentation_loop — the frame-subset
        # adapters map local t back to this host's global frames
        if devices is not None:
            config["devices"] = devices
        sub_in = _FrameSubset(data, mine)
        sub_out = _FrameSubsetOut(out, mine)
        for t_local in segmentation_loop(
            None, sub_in, chunk_size, margin, sub_out, fn, config,
        ):
            done.append(mine[t_local])
    _barrier("iterseg:segment_done")
    return done


# ---------------------------------------------------------------------------
# Metrics: shard the evaluation chunk grid, all-gather the rows
# ---------------------------------------------------------------------------


def _rows_to_matrix(indexed_rows, columns, n_total):
    """(chunk_id, {col: value}) rows -> NaN-padded (n_total, 1+C) float64."""
    mat = np.full((n_total, 1 + len(columns)), np.nan, dtype=np.float64)
    for r, (idx, row) in enumerate(indexed_rows):
        mat[r, 0] = idx
        for c, col in enumerate(columns):
            mat[r, 1 + c] = row[col]
    return mat


# per-process sequence number for file-based exchanges: successive
# exchanges with the same tag in one run get distinct filenames, so a
# later exchange can never consume an earlier one's files
_EXCHANGE_SEQ = {}


def _allgather_rows(mat, save_dir, host_id, n_hosts, tag):
    """All-gather NaN-padded row matrices across hosts.

    Uses DCN collectives (``process_allgather``) when a jax.distributed
    runtime exists; otherwise exchanges part files through the shared
    store (each host can see every other host's save_dir on a pod
    filesystem — the same assumption the shared output zarr makes).

    File protocol safety: every exchange is scoped by the run nonce
    (``init_multihost(run_nonce=...)``) plus a per-process sequence
    number (repeat exchanges in one run can't mix, and a crashed earlier
    run's leftovers are invisible to a new run with a fresh nonce). A
    host still REFUSES to start if its own part file already exists
    (same-nonce duplicate = a real bug, fails loud instead of corrupting
    the gather), and parts are deleted only after every host has
    signalled completion.
    """
    import jax

    if _dist_client() is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # ship the float64 BIT PATTERN as uint32 pairs: without x64 mode
        # jax would silently round the rows to float32 in transit
        bits = np.ascontiguousarray(mat).view(np.uint32)
        gathered = np.asarray(multihost_utils.process_allgather(bits))
        return gathered.reshape(-1, bits.shape[1]).copy().view(
            np.float64
        ).reshape(-1, mat.shape[1])
    if n_hosts == 1:
        return mat
    if save_dir is None:
        # the file gather assumes one shared directory every host sees;
        # silently using each process's CWD would deadlock (or worse,
        # mix runs) the moment working directories differ
        raise ValueError(
            "multihost metrics without a jax.distributed runtime "
            "exchange part files through the output directory: pass "
            "out_path= (a directory on the pod's shared filesystem)"
        )
    # keyed by (tag, host): SPMD hosts perform the same exchange sequence,
    # so equal per-host counters name the same exchange — and keying by
    # host also keeps thread-simulated hosts in one process aligned
    seq = _EXCHANGE_SEQ.get((tag, host_id), 0)
    _EXCHANGE_SEQ[(tag, host_id)] = seq + 1
    nonce = _run_nonce()
    xtag = f"{tag}_{nonce}_x{seq}" if nonce else f"{tag}_x{seq}"
    os.makedirs(save_dir, exist_ok=True)
    part = os.path.join(save_dir, f".{xtag}_part{host_id}.npy")
    if os.path.exists(part):
        raise RuntimeError(
            f"exchange file {part} already exists for THIS run's nonce — "
            "two runs are sharing a nonce (or one host ran the exchange "
            "twice); give each pod run a distinct "
            "init_multihost(run_nonce=...) and rerun"
        )
    tmp = part + ".tmp.npy"  # np.save appends .npy to bare names
    np.save(tmp, mat)
    os.replace(tmp, part)
    parts = {}
    t0 = time.monotonic()
    for h in range(n_hosts):
        p = os.path.join(save_dir, f".{xtag}_part{h}.npy")
        while not os.path.exists(p):
            if time.monotonic() - t0 > 300:
                raise TimeoutError(f"missing metrics part {p}")
            time.sleep(0.05)
        while True:  # the writer may still be mid-rename on slow stores
            try:
                parts[h] = np.load(p)
                break
            except (ValueError, EOFError, FileNotFoundError):
                time.sleep(0.05)
    # parts may be deleted only after EVERY host has loaded them; hosts
    # signal that with a done marker and wait for all markers first
    done = os.path.join(save_dir, f".{xtag}_done{host_id}")
    with open(done, "w"):
        pass
    t0 = time.monotonic()
    for h in range(n_hosts):
        d = os.path.join(save_dir, f".{xtag}_done{h}")
        while not os.path.exists(d):
            if time.monotonic() - t0 > 300:
                raise TimeoutError(f"missing done marker {d}")
            time.sleep(0.05)
    try:
        os.remove(part)
    except OSError:
        pass
    # last host to clean also sweeps the markers (best effort)
    try:
        if not any(os.path.exists(os.path.join(
                save_dir, f".{xtag}_part{h}.npy")) for h in range(n_hosts)):
            for h in range(n_hosts):
                try:
                    os.remove(os.path.join(save_dir, f".{xtag}_done{h}"))
                except OSError:
                    pass
    except OSError:
        pass
    return np.concatenate([parts[h] for h in range(n_hosts)], axis=0)


def multihost_accuracy_metrics(
    slices,
    gt_data,
    model_result,
    name: str,
    prefix: str,
    VI: bool = True,
    AP: bool = True,
    ND: bool = True,
    out_path=None,
    exclude_chunks: int = 10,
    host_id=None,
    n_hosts=None,
):
    """``get_accuracy_metrics`` sharded over hosts.

    Each host scores chunks ``i % n_hosts == host_id`` of the SAME chunk
    list (all hosts derive it identically), the per-chunk rows are
    all-gathered, re-ordered by chunk index, and finalised with the exact
    single-host tail (stats, AP curve, CSVs) — every host returns the same
    frames and host 0's CSVs are byte-identical to a single-host run.
    """
    from ..eval.metrics import (_collect_chunk_scores, _finalize_scores,
                                _layer_data, generate_IoU_dict)

    host_id, n_hosts = _resolve_host(host_id, n_hosts)
    slices = list(slices)
    # 3D<->4D promotion once, up front: per-chunk _collect_chunk_scores
    # calls would otherwise re-stack the full volume for every chunk.
    # broadcast_to gives the frame-replicated view without copying.
    # lazy=True keeps matched-ndim zarr-backed stacks disk-backed — each
    # host then reads only its 1/n_hosts share of chunks, never the whole
    # stack (the pod exists because the stack exceeds one host's RAM).
    gt_data = _layer_data(gt_data, lazy=True)
    model_result = _layer_data(model_result, lazy=True)
    if gt_data.ndim == 3 and model_result.ndim == 4:
        gt_data = np.broadcast_to(
            np.asarray(gt_data), (model_result.shape[0],) + gt_data.shape
        )
    elif model_result.ndim == 3 and gt_data.ndim == 4:
        model_result = np.broadcast_to(
            np.asarray(model_result),
            (gt_data.shape[0],) + model_result.shape
        )
    elif gt_data.ndim == 3 and model_result.ndim == 3:
        # matched-3D: promote ONCE here — the per-chunk
        # _collect_chunk_scores calls below would otherwise re-read both
        # full volumes from disk for every chunk
        gt_data = np.asarray(gt_data)[None]
        model_result = np.asarray(model_result)[None]
    template = {
        "VI: GT | Output": [],
        "VI: Output | GT": [],
        "Number objects (GT)": [],
        "Number objects (model)": [],
        "Count difference": [],
        "Count difference (%)": [],
    }
    template.update(generate_IoU_dict())
    columns = list(template)

    indexed_rows = []
    for i in range(host_id, len(slices), n_hosts):
        rows = _collect_chunk_scores(
            [slices[i]], gt_data, model_result, VI=VI, AP=AP, ND=ND,
            exclude_chunks=exclude_chunks,
        )
        counts = {len(v) for v in rows.values() if len(v)}
        if not counts:
            continue  # chunk excluded (too few GT objects)
        indexed_rows.append(
            (i, {col: rows[col][0] for col in columns if rows[col]})
        )

    # the live column set must be derived from the flags (identical on
    # every host) — and the matrix padded to the globally-known chunk
    # count — so the all-gathered shapes agree across hosts
    live_cols = []
    if VI:
        live_cols += ["VI: GT | Output", "VI: Output | GT"]
    if AP:
        live_cols += list(generate_IoU_dict())
    if ND:
        live_cols += ["Number objects (GT)", "Number objects (model)",
                      "Count difference", "Count difference (%)"]
    mat = _rows_to_matrix(indexed_rows, live_cols, len(slices))
    gathered = _allgather_rows(
        mat, out_path, host_id, n_hosts, tag=f"{prefix}_{name}"
    )
    gathered = gathered[np.isfinite(gathered[:, 0])]
    gathered = gathered[np.argsort(gathered[:, 0], kind="stable")]

    scores = {col: [] for col in columns}
    for row in gathered:
        for c, col in enumerate(live_cols):
            v = row[1 + c]
            if col in _INT_COLUMNS or col.endswith(_INT_SUFFIXES):
                v = int(v)
            scores[col].append(v)
    # CSVs only from host 0 (shared filesystem; avoid n_hosts writers)
    return _finalize_scores(
        scores, name, prefix, out_path if host_id == 0 else None, AP=AP
    )
