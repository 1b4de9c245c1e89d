"""Volume normalisation and cleanup utilities.

Host-side (numpy) helpers matching the reference's per-volume preparation
(iterseg ``segmentation.py:885-916`` and ``train_io.py:505-515``).
"""
from __future__ import annotations

import numpy as np

__all__ = ["normalise_data", "remove_sum_zero_slices", "prepare_volume"]


def normalise_data(image):
    """Scale image values so the max is 1 (iterseg ``train_io.py:505``)."""
    return image / image.max()


def remove_sum_zero_slices(input_volume):
    """Drop all-zero hyperplanes along every axis.

    Matches iterseg ``segmentation.py:903-916``: for each axis, keep only
    the indices whose hyperplane sum is nonzero.  Vectorised instead of the
    reference's per-index Python loop.
    """
    for ax_i in range(input_volume.ndim):
        other = tuple(i for i in range(input_volume.ndim) if i != ax_i)
        sums = input_volume.sum(axis=other)
        nonzero = np.flatnonzero(sums)
        s = [slice(None)] * input_volume.ndim
        s[ax_i] = nonzero
        input_volume = input_volume[tuple(s)]
    return input_volume


def prepare_volume(input_volume):
    """Reference pre-segmentation normalisation (``segmentation.py:885-889``).

    If the volume contains zeros, all-zero slices are removed (these arise
    from ragged-frame zero padding); then values are scaled to [0, 1].
    """
    input_volume = np.asarray(input_volume).astype(np.float32)
    if input_volume.min() == 0:
        input_volume = remove_sum_zero_slices(input_volume)
    input_volume = input_volume / np.max(input_volume)
    return input_volume
