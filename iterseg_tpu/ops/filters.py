"""Separable filtering kernels (Gaussian, DoG, max-filter) in JAX.

These re-derive the exact semantics of the scipy/skimage filters used by the
reference so outputs are numerically identical (up to float associativity):

- ``gaussian``  ≡ ``skimage.filters.gaussian(img, sigma)``
  (which is ``scipy.ndimage.gaussian_filter`` with ``mode='nearest'``,
  ``truncate=4.0``) — used at iterseg ``watershed.py:226-236``,
  ``segmentation.py:678-680``, ``labels.py:293-321``.
- ``dog_image``  ≡ iterseg ``segmentation.py:678-680``.
- ``maximum_filter3`` ≡ ``scipy.ndimage.maximum_filter(size=3)`` as used by
  ``skimage.feature.peak_local_max`` (``watershed.py:232-236``).

All are separable 1D stencils: on TPU these lower to cheap VPU ops fused by
XLA; volumes stay resident in HBM/VMEM with no host round-trips.
"""
from __future__ import annotations

import functools
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_kernel1d",
    "gaussian_kernel1d_order2",
    "gaussian",
    "gaussian_laplace",
    "dog_image",
    "maximum_filter",
    "smooth_planes",
]


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Order-0 Gaussian taps identical to ``scipy.ndimage._gaussian_kernel1d``.

    Radius is ``int(truncate * sigma + 0.5)``; taps are the sampled Gaussian
    normalised to sum 1 (computed in float64, as scipy does).
    """
    sigma = float(sigma)
    radius = int(truncate * sigma + 0.5)
    if sigma <= 0 or radius == 0:
        return np.ones(1, dtype=np.float64)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return phi / phi.sum()


def _correlate1d_nearest(x: jnp.ndarray, taps: np.ndarray, axis: int,
                         mode: str = "nearest") -> jnp.ndarray:
    """1D correlation along ``axis``; ``mode`` is scipy's boundary name
    ('nearest' → edge replication, 'reflect' → half-sample symmetric)."""
    if taps.size == 1:
        return x * float(taps[0])
    radius = (taps.size - 1) // 2
    # pad along the filtered axis only
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    # scipy 'reflect' (d c b a | a b c d) == numpy 'symmetric'
    jnp_mode = {"nearest": "edge", "reflect": "symmetric"}[mode]
    xp = jnp.pad(x, pad, mode=jnp_mode)
    # moveaxis so the filtered axis is last, do a strided window sum
    xp = jnp.moveaxis(xp, axis, -1)
    out = jnp.zeros(xp.shape[:-1] + (x.shape[axis],), dtype=x.dtype)
    n = x.shape[axis]
    # scipy correlate1d with a symmetric kernel == convolution; accumulate
    # taps in scipy's order (centre-out symmetric pairs summed the same way
    # scipy does: sequential over taps) for closest float parity.
    for i, w in enumerate(taps):
        out = out + xp[..., i : i + n] * jnp.asarray(w, dtype=x.dtype)
    return jnp.moveaxis(out, -1, axis)


def gaussian_kernel1d_order2(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Second-derivative Gaussian taps, identical to scipy's
    ``_gaussian_kernel1d(sigma, order=2, radius)``: the normalised Gaussian
    multiplied by the Hermite polynomial ``x²/σ⁴ − 1/σ²`` (float64, symmetric,
    so scipy's kernel reversal is a no-op)."""
    sigma = float(sigma)
    radius = int(truncate * sigma + 0.5)
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / sigma2 * x ** 2)
    phi = phi / phi.sum()
    return phi * (x ** 2 / (sigma2 * sigma2) - 1.0 / sigma2)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def _gaussian_laplace_impl(x, sigma: tuple, truncate: float):
    out = None
    for d2_axis in range(x.ndim):
        term = x
        for axis, s in enumerate(sigma):
            taps = (
                gaussian_kernel1d_order2(s, truncate)
                if axis == d2_axis
                else gaussian_kernel1d(s, truncate)
            )
            if taps.size > 1:
                term = _correlate1d_nearest(term, taps, axis, mode="reflect")
        out = term if out is None else out + term
    return out


def gaussian_laplace(image, sigma, truncate: float = 4.0):
    """Laplacian of Gaussian, ``scipy.ndimage.gaussian_laplace`` semantics
    (mode='reflect'): per output axis, an order-2 derivative kernel on that
    axis and order-0 Gaussians on the rest, summed over axes. Used by
    ``ops.blob.blob_log`` (the LoG scale space behind the reference's
    disabled ``blob_watershed``, iterseg ``segmentation.py:412-514``)."""
    x = jnp.asarray(image)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    sig = _as_axis_sigmas(sigma, x.ndim)
    return _gaussian_laplace_impl(x, sig, float(truncate))


def _as_axis_sigmas(sigma, ndim) -> tuple:
    if np.isscalar(sigma):
        return (float(sigma),) * ndim
    sigma = tuple(float(s) for s in sigma)
    assert len(sigma) == ndim
    return sigma


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def _gaussian_impl(x, sigma: tuple, truncate: float):
    for axis, s in enumerate(sigma):
        taps = gaussian_kernel1d(s, truncate)
        if taps.size > 1:
            x = _correlate1d_nearest(x, taps, axis)
    return x


def gaussian(image, sigma, truncate: float = 4.0):
    """Gaussian filter with skimage semantics (float output, mode='nearest').

    ``sigma`` may be scalar or per-axis (e.g. ``(0, 1, 1)`` as in the
    centroid-channel smoothing at iterseg ``watershed.py:234``; sigma 0
    leaves that axis untouched).
    """
    x = jnp.asarray(image)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    sig = _as_axis_sigmas(sigma, x.ndim)
    return _gaussian_impl(x, sig, float(truncate))


def dog_image(input_vol, sigma_min, sigma_max):
    """Difference of Gaussians (iterseg ``segmentation.py:678-680``)."""
    return gaussian(input_vol, sigma_min) - gaussian(input_vol, sigma_max)


@functools.partial(jax.jit, static_argnames=("size", "mode"))
def maximum_filter(image, size: int = 3, mode: str = "nearest"):
    """Separable max filter; parity with ``scipy.ndimage.maximum_filter``.

    ``mode='nearest'`` replicates edges (what ``peak_local_max`` uses).
    Implemented with ``lax.reduce_window`` so XLA maps it onto the VPU.
    """
    x = jnp.asarray(image)
    radius = size // 2
    if mode == "nearest":
        pads = [(0, 0)] * 0
        xp = jnp.pad(x, [(radius, radius)] * x.ndim, mode="edge")
    elif mode == "constant":
        xp = jnp.pad(
            x, [(radius, radius)] * x.ndim, mode="constant", constant_values=-jnp.inf
        )
    else:
        raise ValueError(mode)
    return jax.lax.reduce_window(
        xp,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (size,) * x.ndim,
        (1,) * x.ndim,
        "VALID",
    )


def smooth_planes(image, z_axis: int = 0, sigma: float = 1.0):
    """Per-z-plane 2D Gaussian smoothing (iterseg ``labels.py:312-321``)."""
    x = jnp.asarray(image)
    sig = [float(sigma)] * x.ndim
    sig[z_axis] = 0.0
    return gaussian(x, tuple(sig))
