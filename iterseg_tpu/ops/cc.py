"""Connected components and object-size filtering.

Parity targets:
- ``scipy.ndimage.label`` with the default cross-shaped structure
  (6-connectivity in 3D), labels assigned in raster-scan order of first
  occurrence — used at iterseg ``watershed.py:240`` and
  ``segmentation.py:645``.
- ``skimage.morphology.remove_small_objects`` and the goldilocks-band XOR
  trick of ``_remove_unwanted_objects`` (iterseg ``watershed.py:239-251``).

Host path uses scipy. Device path (``label_jax``) is a pointer-jumping
min-label propagation: each voxel starts as its raveled index, repeatedly
takes the min over face neighbours, and path-compresses via gathers — the
whole thing is data-parallel and converges in O(log + diameter/hops) rounds,
then components are renumbered to scipy's raster order.

Why production pipelines label on HOST even when the mask lives on
device: every CC consumer (seed-marker labeling, the size-band filter)
feeds a host stage next — the exact heap flood or centroid selection —
so the mask crosses the link exactly once either way (bit-packed, 2.1 MB
for 256 cubed), and the host C++ union-find runs under the overlapped
device compute. ``label_jax``/``label_device`` are the on-device
building block for hardware where the link is not the bottleneck (PCIe
hosts; see benchmarks/RESULTS.md watershed crossover analysis) and are
kept scipy-exact by the tests either way.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

__all__ = [
    "label_np",
    "label_jax",
    "label_device",
    "component_sizes",
    "remove_small_objects",
    "size_band_filter",
]


def label_np(mask):
    """6-connectivity component labels, scipy raster numbering.

    3D masks use the native C++ BFS labeller (~4x scipy); other ranks and
    no-native environments fall back to scipy.
    """
    mask = np.asarray(mask)
    if mask.ndim == 3:
        try:
            from .. import native

            return native.label_cc6(mask)
        except native.NativeUnavailable:
            pass
    labels, n = ndi.label(mask)
    return labels, n


def component_roots(m):
    """Traceable min-index connected components (6-connectivity).

    Returns int32 root-index labels: each masked voxel carries the smallest
    raveled index of its component; background carries ``m.size``.
    Pointer-jumping min propagation — pure gathers/shifts, TPU-friendly.
    """
    shape = m.shape
    n = m.size
    idx = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n)
    lab = jnp.where(m, idx, big)

    def neighbor_min(lab):
        out = lab
        for axis in range(lab.ndim):
            fwd = jnp.concatenate(
                [
                    jax.lax.slice_in_dim(lab, 1, lab.shape[axis], axis=axis),
                    jax.lax.expand_dims(
                        jnp.full(
                            tuple(
                                s for i, s in enumerate(shape) if i != axis
                            ),
                            big,
                            jnp.int32,
                        ),
                        (axis,),
                    ),
                ],
                axis=axis,
            )
            bwd = jnp.concatenate(
                [
                    jax.lax.expand_dims(
                        jnp.full(
                            tuple(
                                s for i, s in enumerate(shape) if i != axis
                            ),
                            big,
                            jnp.int32,
                        ),
                        (axis,),
                    ),
                    jax.lax.slice_in_dim(lab, 0, lab.shape[axis] - 1, axis=axis),
                ],
                axis=axis,
            )
            out = jnp.minimum(out, jnp.minimum(fwd, bwd))
        return jnp.where(m, out, big)

    def jump(lab):
        flat = lab.ravel()
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        return flat_ext[flat].reshape(shape)

    def cond(state):
        lab, prev, _ = state
        return jnp.any(lab != prev)

    def body(state):
        lab, _, it = state
        prev = lab
        lab = neighbor_min(lab)
        lab = jnp.where(m, jnp.minimum(lab, jump(lab)), big)
        lab = jnp.where(m, jnp.minimum(lab, jump(lab)), big)
        return lab, prev, it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.full_like(lab, -1), jnp.int32(0))
    )
    return lab


@functools.partial(jax.jit, static_argnames=("max_labels",))
def label_jax(mask, max_labels: int = 16384):
    """Device connected components with scipy-compatible numbering.

    Returns ``(labels, num)`` where labels are int32 with background 0 and
    component ids assigned in raster order of each component's first voxel.
    ``max_labels`` bounds the number of components (static for XLA).

    ``num`` is always the TRUE component count. If ``num > max_labels``
    the ``labels`` volume is invalid (the static-size renumbering
    truncated) — callers must retry with a larger bound; ``label_device``
    does that automatically.
    """
    m = jnp.asarray(mask) != 0
    shape = m.shape
    n = m.size
    idx = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n)
    lab = component_roots(m)

    # renumber to raster order of first occurrence == sorted root index
    roots = jnp.where(lab.ravel() == idx.ravel(), lab.ravel(), big)
    # true count, deliberately NOT derived from the truncated unique()
    num = jnp.sum(roots < big).astype(jnp.int32)
    uniq = jnp.unique(roots, size=max_labels + 1, fill_value=big)
    rank = jnp.searchsorted(uniq, lab.ravel()) + 1
    labels = jnp.where(m.ravel(), rank.astype(jnp.int32), 0).reshape(shape)
    return labels, num


def label_device(mask, max_labels: int = 16384):
    """``label_jax`` with overflow protection: if the component count
    exceeds ``max_labels`` (whose truncation silently mis-numbers), retry
    once with a bound sized to the true count."""
    labels, num = label_jax(mask, max_labels=max_labels)
    n = int(num)
    if n > max_labels:
        bound = 1 << int(np.ceil(np.log2(n)))
        labels, num = label_jax(mask, max_labels=bound)
    return labels, num


def component_sizes(labels, num=None):
    """Voxel count per label id (index 0 = background)."""
    labels = np.asarray(labels)
    return np.bincount(labels.ravel())


def remove_small_objects(labels, min_size):
    """skimage parity: zero out components with size < min_size."""
    labels = np.asarray(labels)
    sizes = np.bincount(labels.ravel())
    keep = sizes >= min_size
    keep[0] = False
    return np.where(keep[labels], labels, 0)


def size_band_filter(mask, centroids, min_area=0, max_area=1000000):
    """``_remove_unwanted_objects`` parity (iterseg ``watershed.py:239-251``).

    Labels the mask (6-connectivity), keeps objects with
    ``min_area <= size < max_area``, and drops centroids that fall outside
    the surviving objects.  The reference computes the band via two
    ``remove_small_objects`` calls XOR'ed together; the result is identical.
    """
    labels, _ = label_np(mask)
    sizes = np.bincount(labels.ravel())
    keep = (sizes >= min_area) & (sizes < max_area)
    keep[0] = False
    labels_goldilocks = np.where(keep[labels], labels, 0)
    centroid_labels = labels_goldilocks[tuple(np.transpose(centroids))]
    new_centroids = centroids[centroid_labels > 0]
    new_mask = labels_goldilocks.astype(bool)
    return new_mask, new_centroids
