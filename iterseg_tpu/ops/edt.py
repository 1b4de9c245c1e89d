"""Exact Euclidean distance transform.

``scipy.ndimage.distance_transform_edt`` parity (used at iterseg
``segmentation.py:640`` for the DoG segmenter and in synthetic fixtures).

Device path: the exact separable decomposition of the squared EDT — a
min-plus "convolution" with the kernel ``s**2`` applied per axis:
``out[..., i] = min_j (in[..., j] + (i - j)**2)``, evaluated as one
broadcast-compare reduction per axis. All-parallel O(n) work per output
element maps far better onto the VPU than the equivalent O(n)-step
sequential shift-scan (measured ~10x on 256^3: the scan's per-step
pad/slice/min materialised the full volume hundreds of times).

Host path (``edt_np``) defers to scipy for bit-exact float64 behaviour.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

__all__ = ["edt", "edt_sq", "edt_np"]

_BIG = 1e12


def _minplus_sq_axis(d: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One axis pass: out[i] = min_j ( d[j] + (i - j)**2 )  (exact).

    The (n, n) squared-offset table broadcasts against the lines and XLA
    fuses the add into the min-reduction, so no (..., n, n) intermediate
    is materialised. Exact in f32 for every axis length <= 4096 (squared
    offsets and distances stay integers below 2**24).
    """
    n = d.shape[axis]
    d = jnp.moveaxis(d, axis, -1)
    idx = jnp.arange(n, dtype=d.dtype)
    sq = (idx[:, None] - idx[None, :]) ** 2  # (i, j) -> (i - j)**2
    out = jnp.min(d[..., None, :] + sq, axis=-1)
    return jnp.moveaxis(out, -1, axis)


@jax.jit
def edt_sq(mask):
    """SQUARED Euclidean distance to the nearest zero/False voxel (float32).

    Squared distances are exact integers (sums of three squares), and the
    min-plus recursion only adds/compares integers, so every value is exact
    in f32 up to 2**24 — i.e. for any distance under 4096 voxels.  Taking
    ``sqrt`` of this in float64 on the host reproduces scipy's float64 EDT
    bit-for-bit; that is how the DoG device pipeline stays exactly equal to
    the host path (the on-device f32 sqrt differs from f64 by <=1 ulp).
    """
    m = jnp.asarray(mask)
    d = jnp.where(m != 0, jnp.float32(_BIG), jnp.float32(0.0))
    for axis in range(m.ndim):
        d = _minplus_sq_axis(d, axis)
    return d


@jax.jit
def edt(mask):
    """Euclidean distance to the nearest zero/False voxel (float32).

    ``mask`` nonzero voxels get their distance to the nearest zero voxel,
    matching ``scipy.ndimage.distance_transform_edt(mask)``.
    """
    return jnp.sqrt(edt_sq(mask))


def edt_np(mask):
    """scipy host oracle (float64)."""
    return ndi.distance_transform_edt(np.asarray(mask))
