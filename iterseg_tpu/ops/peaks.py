"""Local-maximum peak detection with ``skimage.feature.peak_local_max`` parity.

Used for watershed seeding (iterseg ``watershed.py:232-236``:
``peak_local_max(smoothed, threshold_abs=.04)`` with default
``min_distance=1`` / ``exclude_border=True``).

Split TPU-first: the O(N) candidate mask (max-filter + compare + threshold)
runs on device; the O(#peaks) ordering and minimum-spacing rejection runs on
host in exact numpy (peak lists are tiny next to the volume).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import maximum_filter

__all__ = ["peak_candidate_mask", "peak_local_max"]


@functools.partial(jax.jit, static_argnames=("min_distance",))
def peak_candidate_mask(image, threshold_abs, min_distance: int = 1):
    """Device-side candidate mask: plateau-inclusive local maxima > threshold.

    Mirrors skimage ``_get_peak_mask``: ``image == maximum_filter(image,
    footprint=ones((2*min_distance+1,)*ndim), mode='nearest')`` AND
    ``image > threshold_abs``.
    """
    x = jnp.asarray(image)
    size = 2 * min_distance + 1
    image_max = maximum_filter(x, size=size, mode="nearest")
    return (x == image_max) & (x > threshold_abs)


def _ensure_spacing(coords: np.ndarray, spacing: float) -> np.ndarray:
    """Greedy Chebyshev-spacing rejection, identical to skimage
    ``ensure_spacing`` with ``p_norm=inf``: iterate candidates in order,
    accept a candidate and reject every other candidate within distance
    <= spacing (inclusive).

    Grid-bucketed: each candidate only checks the 3^ndim neighbouring
    buckets of side ``spacing`` — O(n) instead of the naive O(n²), which
    matters at the ~10⁵ candidates real feature maps produce.
    """
    n = len(coords)
    if n == 0:
        return coords
    if np.issubdtype(coords.dtype, np.integer):
        try:
            from .. import native

            keep = native.ensure_spacing_cheb(coords, int(spacing))
            return coords[keep]
        except native.NativeUnavailable:
            pass
    spacing_i = max(int(np.ceil(spacing)), 1)
    keep = []
    buckets = {}
    cells = (coords // spacing_i).astype(np.int64)
    from itertools import product

    ndim = coords.shape[1]
    neighborhood = list(product((-1, 0, 1), repeat=ndim))
    for i in range(n):
        c = coords[i]
        cell = tuple(cells[i])
        conflict = False
        for off in neighborhood:
            for j in buckets.get(
                tuple(cell[d] + off[d] for d in range(ndim)), ()
            ):
                if np.max(np.abs(coords[j] - c)) <= spacing:
                    conflict = True
                    break
            if conflict:
                break
        if conflict:
            # an earlier-accepted point within spacing already rejected i
            continue
        keep.append(i)
        buckets.setdefault(cell, []).append(i)
    return coords[keep]


def peak_local_max(
    image,
    threshold_abs=None,
    min_distance: int = 1,
    exclude_border=True,
):
    """Peak coordinates, ordered and spaced exactly like skimage.

    Returns an (n_peaks, ndim) int array. Candidates are local maxima of a
    ``(2*min_distance+1)``-cube footprint above ``threshold_abs``; border
    candidates within ``min_distance`` are excluded when ``exclude_border``;
    candidates are sorted by intensity descending (stable, so raster order
    breaks ties) and thinned so no two accepted peaks are within Chebyshev
    distance ``min_distance`` of each other.
    """
    img_np = np.asarray(image)
    if threshold_abs is None:
        threshold_abs = img_np.min()
    mask = np.array(
        peak_candidate_mask(img_np, float(threshold_abs), min_distance)
    )
    if isinstance(exclude_border, bool):
        border = (min_distance if exclude_border else 0,) * img_np.ndim
    elif isinstance(exclude_border, int):
        border = (exclude_border,) * img_np.ndim
    else:
        border = tuple(exclude_border)
    for ax, b in enumerate(border):
        if b == 0:
            continue
        sl = [slice(None)] * img_np.ndim
        sl[ax] = slice(None, b)
        mask[tuple(sl)] = False
        sl[ax] = slice(-b, None)
        mask[tuple(sl)] = False
    coords = np.nonzero(mask)
    intensities = img_np[coords]
    idx_maxsort = np.argsort(-intensities, kind="stable")
    coords = np.transpose(coords)[idx_maxsort]
    if len(coords) == 0:
        return np.empty((0, img_np.ndim), dtype=np.intp)
    coords = _ensure_spacing(coords, spacing=min_distance)
    return coords
