"""Overlapping chunk grid over large volumes.

This is the spatial decomposition at the heart of the framework: big zyx
volumes are processed as a grid of overlapping chunks whose margins are
discarded on writeback, so the full volume is covered exactly once.

Semantics match the reference grid generator (iterseg ``predict.py:38-61``
``make_chunks`` and ``predict.py:64-96`` ``process_chunks``), including the
edge-shift quirks: the last chunk of each axis is shifted to ``arr - chk``
and its crop start is recomputed so the concatenated crops tile the axis
exactly.

Everything here is pure host-side index arithmetic (static shapes) — the
device-side consumers (the batched TPU predictor in ``engine/predict.py``)
consume the grid as static metadata so the compiled program sees a fixed
chunk batch.
"""
from __future__ import annotations

import itertools
from typing import Callable, Sequence

import numpy as np

__all__ = [
    "make_chunks",
    "chunk_slices",
    "process_chunks",
    "get_slices_from_chunks",
]


def make_chunks(arr_shape, chunk_shape, margin):
    """Compute chunk start coordinates and writeback crops.

    Parameters
    ----------
    arr_shape : sequence of int
        Shape of the (spatial) array to be chunked.
    chunk_shape : sequence of int
        Shape of each chunk, per axis. Must be <= arr_shape per axis.
    margin : int or sequence of int
        Overlap margin per axis (same for both sides).

    Returns
    -------
    chunk_starts : list of tuple of int
        Start coordinate of every chunk (outer product over axes).
    chunk_crops : list of tuple of (lo, hi) pairs
        Per-axis crop applied to each chunk on writeback, such that the
        crops exactly tile ``arr_shape``.

    Notes
    -----
    Behaviour (incl. edge handling) is a golden-parity re-derivation of the
    reference implementation (iterseg ``predict.py:38-61``): interior chunks
    contribute ``[mrg, chk - mrg)``, the first chunk contributes from 0, and
    the final chunk is shifted so it ends at the array edge with its crop
    start adjusted to avoid double-writing.
    """
    ndim = len(arr_shape)
    if isinstance(margin, (int, np.integer)):
        margin = [int(margin)] * ndim
    starts = []
    crops = []
    for dim in range(ndim):
        arr = int(arr_shape[dim])
        chk = int(chunk_shape[dim])
        mrg = int(margin[dim])
        start = np.arange(0, arr - 2 * mrg, chk - 2 * mrg)
        start[-1] = arr - chk
        if len(start) > 1 and start[-1] == start[-2]:
            # drop the duplicate when the final stride lands exactly
            start = start[:-1]
        starts.append(start)
        crop = np.array([(mrg, chk - mrg)] * len(start))
        crop[0, 0] = 0
        crop[-1, 0] = chk - (arr - np.sum(crop[:-1, 1] - crop[:-1, 0]))
        crop[-1, 1] = chk
        crops.append(crop)
    chunk_starts = list(itertools.product(*starts))
    chunk_crops = list(itertools.product(*crops))
    return chunk_starts, chunk_crops


def chunk_slices(start, chunk_shape):
    """Spatial slice tuple selecting one chunk from a volume."""
    return tuple(
        slice(int(s0), int(s0) + int(step))
        for s0, step in zip(start, chunk_shape)
    )


def process_chunks(
    input_volume,
    chunk_size,
    output_volume,
    margin,
    process_data_function: Callable,
    config=None,
):
    """Run ``process_data_function`` over the chunk grid, blending margins.

    Host-side driver with the same contract as the reference
    (iterseg ``predict.py:64-96``): the processing function receives the
    whole input volume plus a slice (with a leading ``slice(None)`` channel
    axis) and returns a (possibly higher-rank) prediction; the margin crop
    of the prediction is written into ``output_volume``.

    The TPU fast path (``engine.predict.predict_volume``) batches all chunks
    through one jitted program instead of looping here; this generic version
    remains for arbitrary per-chunk callables.
    """
    if config is None:
        config = {}
    ndim = len(chunk_size)
    chunk_starts, chunk_crops = make_chunks(
        input_volume.shape[-ndim:], chunk_size, margin=margin
    )
    for start, crop in zip(chunk_starts, chunk_crops):
        sl = (slice(None),) + chunk_slices(start, chunk_size)
        predicted_array = process_data_function(input_volume, sl, **config)
        p_dim = predicted_array.ndim
        o_dim = output_volume.ndim
        cr = (slice(None),) * (p_dim - o_dim) + tuple(
            slice(int(i), int(j)) for i, j in crop
        )
        pred_c = (0,) + cr
        # output_volume[sl] is a view for ndarray-like stores; zarr-like
        # stores need read-modify-write
        region = output_volume[sl]
        region[cr] = predicted_array[pred_c]
        if not isinstance(region, np.ndarray) or region.base is None:
            output_volume[sl] = region
    return output_volume


def get_slices_from_chunks(arr_shape, chunk_size, margin):
    """Per-(frame, chunk) slice/crop pairs for chunkwise evaluation.

    Mirrors iterseg ``_dock_widgets.py:871-888``: for 4D data a leading
    ``slice(t, t+1)`` selects the frame; usage is ``labels[sl][cr]`` after a
    squeeze.
    """
    if len(arr_shape) <= 3:
        ts = range(1)
        fshape = arr_shape
    else:
        ts = range(arr_shape[0])
        fshape = arr_shape[1:]
    chunk_starts, chunk_crops = make_chunks(fshape, chunk_size, margin)
    slices = []
    for t in ts:
        for start, crop in zip(chunk_starts, chunk_crops):
            sl = (slice(t, t + 1),) + tuple(
                slice(int(s0), int(s0) + int(step))
                for s0, step in zip(start, chunk_size)
            )
            cr = tuple(slice(int(i), int(j)) for i, j in crop)
            slices.append((sl, cr))
    return slices
