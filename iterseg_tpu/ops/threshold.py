"""Histogram thresholding (Otsu) with skimage parity.

Re-derivation of ``skimage.filters.threshold_otsu`` (used via
``_get_mask`` at iterseg ``watershed.py:226-229``): a 256-bin histogram over
``[min, max]``, maximising the inter-class variance, returning the centre of
the selected bin.

Exactness: for float32 images (every image in this pipeline),
``np.histogram`` runs its whole fast path in FLOAT32 — the bin edges take
``np.result_type(min, max, image) == float32`` and the data is cast to the
edge dtype before binning (numpy ``_histograms_impl``: "This cast ensures no
type promotions occur below"). The device path emulates that computation
op-for-op in f32, including numpy's boundary corrections (candidate index
from ``((x - lo) / d) * nbins``, then decrement/increment against the
``np.linspace`` edges), and returns the same f32 bin centre — so voxels
landing exactly on interior bin edges bin identically to the host
(adversarially tested in ``tests/test_otsu_edges.py``).

Remaining documented gap: the inter-class-variance scan runs in f32 on
device but f64 on host (skimage casts counts to float). The argmax can only
differ when the top two variances agree to ~2^-22 relative — an exact
near-tie between two different thresholds; counts themselves are exact
int32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["threshold_otsu", "threshold_otsu_np"]


def _otsu_from_counts(counts, bin_centers):
    """Inter-class-variance argmax (skimage formula; f32 on device)."""
    counts = counts.astype(jnp.float32)
    weight1 = jnp.cumsum(counts)
    weight2 = jnp.cumsum(counts[::-1])[::-1]
    mean1 = jnp.cumsum(counts * bin_centers) / weight1
    mean2 = (jnp.cumsum((counts * bin_centers)[::-1]) / weight2[::-1])[::-1]
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = jnp.argmax(variance12)
    return bin_centers[idx]


def _histogram_f32(x, nbins: int):
    """``np.histogram(x, nbins)`` for a raveled f32 array, f32-exact.

    Emulates numpy's equal-bin fast path at its native f32 precision:
    edges via the ``np.linspace`` recipe (``arange * (d / nbins) + lo``,
    last edge set to ``hi``), candidate indices via numpy's exact op order
    ``((x - lo) / d) * nbins`` truncated toward zero, then the
    decrement/increment correction against the edges that numpy applies
    because "the index computation is not guaranteed to give exactly
    consistent results within ~1 ULP of the bin edges".
    Returns exact int32 counts and the f32 edges.
    """
    lo = jnp.min(x)
    hi = jnp.max(x)
    # np._get_outer_edges: a constant image histograms over [v-.5, v+.5]
    same = lo == hi
    lo = jnp.where(same, lo - jnp.float32(0.5), lo)
    hi = jnp.where(same, hi + jnp.float32(0.5), hi)
    d = hi - lo
    step = d / nbins
    # fl32(i * step), contraction-immune. XLA's backends may fuse
    # `i * step + lo` into an FMA (measured on the CPU backend under jit;
    # lax.optimization_barrier does NOT stop it — the fusion happens in
    # LLVM codegen), which would shift edges by 1 ulp off numpy's
    # separately-rounded mul-then-add. So the product is computed by
    # splitting step's 24-bit mantissa into two 12-bit halves: every
    # multiply below is then EXACT (power-of-two scalings or integer
    # products under 2^24), the single inexact op is one f32 add — and an
    # FMA of an exact multiply equals mul-then-add bit-for-bit, so no
    # compiler contraction can change the result.
    m, e = jnp.frexp(step)  # step = m * 2^e, m in [0.5, 1)
    m_int = m * jnp.float32(1 << 24)  # 24-bit integer, exact
    m_hi = jnp.floor(m_int / 4096.0)  # top 12 bits
    m_lo = m_int - m_hi * 4096.0  # low 12 bits, exact

    def edge_at(i_arr):
        # the linspace edge as pure per-element arithmetic of the index:
        # a gather ``edges[idx]`` over the voxel array lowers to a ~150 ms
        # table-lookup fusion on TPU (measured, 256^3), while this is a
        # bit-identical (same ops on the same values) elementwise recipe
        i_f = i_arr.astype(jnp.float32)
        s = (i_f * m_hi) * 4096.0 + (i_f * m_lo)  # fl32(i * m_int)
        val = jnp.ldexp(s, e - 24) + lo
        return jnp.where(i_arr == nbins, hi, val)  # np endpoint override

    edges = edge_at(jnp.arange(nbins + 1, dtype=jnp.int32))
    f_idx = ((x - lo) / d) * nbins
    idx = f_idx.astype(jnp.int32)
    idx = jnp.where(idx == nbins, nbins - 1, idx)
    dec = x < edge_at(idx)
    idx = idx - dec.astype(jnp.int32)
    inc = (x >= edge_at(idx + 1)) & (idx != nbins - 1)
    idx = idx + inc.astype(jnp.int32)
    # compare-and-reduce histogram: exact integer counts, an order of
    # magnitude faster than scatter-add here — fused into a larger program,
    # XLA turns the 256-bin scatter into a per-bin loop over all N voxels
    # (~150 ms on 256^3); the broadcast-compare reduce stays ~14 ms
    ids = jnp.arange(nbins, dtype=jnp.int32)
    counts = jnp.sum((idx[:, None] == ids[None, :]).astype(jnp.int32),
                     axis=0)
    return counts, edges


@functools.partial(jax.jit, static_argnames=("nbins",))
def threshold_otsu(image, nbins: int = 256):
    """Otsu threshold of a float image (device-side).

    Matches ``skimage.filters.threshold_otsu`` on f32 images bit-exactly in
    the histogram and threshold value (both are f32 on host too — see the
    module docstring); the variance argmax is the one f32-vs-f64 residual.
    """
    x = jnp.asarray(image).ravel().astype(jnp.float32)
    counts, edges = _histogram_f32(x, nbins)
    bin_centers = (edges[:-1] + edges[1:]) / 2.0
    return _otsu_from_counts(counts, bin_centers)


def threshold_otsu_np(image, nbins: int = 256):
    """Numpy oracle with the exact skimage float path (for tests/host)."""
    image = np.asarray(image)
    counts, bin_edges = np.histogram(image.ravel(), nbins, range=(image.min(), image.max()))
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    counts = counts.astype(float)
    weight1 = np.cumsum(counts)
    weight2 = np.cumsum(counts[::-1])[::-1]
    mean1 = np.cumsum(counts * bin_centers) / weight1
    with np.errstate(invalid="ignore", divide="ignore"):
        mean2 = (np.cumsum((counts * bin_centers)[::-1]) / weight2[::-1])[::-1]
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    # skimage takes np.argmax: NaNs (possible only for a constant image,
    # where every variance entry is NaN) resolve to index 0
    idx = np.argmax(variance12)
    return bin_centers[idx]
