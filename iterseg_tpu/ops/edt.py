"""Exact Euclidean distance transform.

``scipy.ndimage.distance_transform_edt`` parity (used at iterseg
``segmentation.py:640`` for the DoG segmenter and in synthetic fixtures).

Device path: the exact separable decomposition of the squared EDT — a
min-plus "convolution" with the kernel ``s**2`` applied per axis.  Each axis
pass is an O(n) scan of elementwise mins over incrementally shifted copies,
which XLA turns into pure VPU traffic; no host round-trip, no data-dependent
shapes.

Host path (``edt_np``) defers to scipy for bit-exact float64 behaviour.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

__all__ = ["edt", "edt_sq", "edt_np"]

_BIG = 1e12


def _minplus_sq_axis(d: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One axis pass: out[i] = min_s ( d[i - s] + s**2 )  (exact)."""
    n = d.shape[axis]
    d = jnp.moveaxis(d, axis, -1)

    def body(s, carry):
        acc, left, right = carry
        # shift left/right by one more voxel, padding with BIG
        left = jnp.concatenate(
            [left[..., 1:], jnp.full(left.shape[:-1] + (1,), _BIG, d.dtype)], -1
        )
        right = jnp.concatenate(
            [jnp.full(right.shape[:-1] + (1,), _BIG, d.dtype), right[..., :-1]], -1
        )
        s2 = (s.astype(d.dtype)) ** 2
        acc = jnp.minimum(acc, jnp.minimum(left, right) + s2)
        return acc, left, right

    acc, _, _ = jax.lax.fori_loop(1, n, body, (d, d, d))
    return jnp.moveaxis(acc, -1, axis)


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
