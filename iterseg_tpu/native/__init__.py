"""Native (C++) runtime kernels, built lazily and loaded via ctypes.

The priority-flood watershed is the one inherently sequential hot loop of
the inference pipeline (a heap-ordered flood; see
``ops/watershed_oracle.py`` for the semantics and the iterseg
``watershed.py:95-159`` provenance).  It runs on host, overlapped with TPU
compute, as an -O3 C++ kernel.

The shared library is compiled on first use with the system ``g++`` and
cached next to the sources; set ``ITERSEG_TPU_NO_NATIVE=1`` to force the
pure-Python oracle fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "priority_flood.cpp")
_LIB = os.path.join(_HERE, "libiterseg_native.so")
_LOCK = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build():
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fno-exceptions",
        "-fno-rtti",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Build (if needed) and load the native library."""
    global _lib
    if os.environ.get("ITERSEG_TPU_NO_NATIVE"):
        raise NativeUnavailable("native kernels disabled by env var")
    with _LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            try:
                _build()
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailable(f"could not build native kernels: {e}")
        lib = ctypes.CDLL(_LIB)
        lib.label_cc6.restype = ctypes.c_int32
        lib.label_cc6.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.band_filter_cc6.restype = None
        lib.band_filter_cc6.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.band_filter_runs.restype = None
        lib.band_filter_runs.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.bucket_flood_image.restype = None
        lib.bucket_flood_image.argtypes = [
            ctypes.POINTER(ctypes.c_int32),   # keys (d^2)
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.c_int32,                   # n_nbr
            ctypes.POINTER(ctypes.c_int64),   # markers
            ctypes.c_int64,                   # n_markers
            ctypes.POINTER(ctypes.c_uint8),   # mask
            ctypes.POINTER(ctypes.c_int32),   # output
            ctypes.c_int64,                   # n
        ]
        lib.ensure_spacing_cheb.restype = None
        lib.ensure_spacing_cheb.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.edt3d.restype = None
        lib.edt3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.priority_flood.restype = None
        lib.priority_flood.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # values
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.POINTER(ctypes.c_int64),   # val_chan
            ctypes.POINTER(ctypes.c_int64),   # val_off
            ctypes.c_int32,                   # n_nbr
            ctypes.POINTER(ctypes.c_int64),   # markers
            ctypes.c_int64,                   # n_markers
            ctypes.POINTER(ctypes.c_float),   # seed_values
            ctypes.POINTER(ctypes.c_uint8),   # mask
            ctypes.POINTER(ctypes.c_int32),   # output
            ctypes.c_int64,                   # n
        ]
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def priority_flood(values, offsets, val_chan, val_off, markers, seed_values,
                   mask, output):
    """Run the native flood in place on ``output`` (raveled int32)."""
    lib = get_lib()
    values = np.ascontiguousarray(values, dtype=np.float32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    val_chan = np.ascontiguousarray(val_chan, dtype=np.int64)
    val_off = np.ascontiguousarray(val_off, dtype=np.int64)
    markers = np.ascontiguousarray(markers, dtype=np.int64)
    seed_values = np.ascontiguousarray(seed_values, dtype=np.float32)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    assert output.dtype == np.int32 and output.flags.c_contiguous
    n = mask.size
    lib.priority_flood(
        _ptr(values, ctypes.c_float),
        _ptr(offsets, ctypes.c_int64),
        _ptr(val_chan, ctypes.c_int64),
        _ptr(val_off, ctypes.c_int64),
        ctypes.c_int32(len(offsets)),
        _ptr(markers, ctypes.c_int64),
        ctypes.c_int64(len(markers)),
        _ptr(seed_values, ctypes.c_float),
        _ptr(mask, ctypes.c_uint8),
        _ptr(output, ctypes.c_int32),
        ctypes.c_int64(n),
    )
    return output


# Heap-order equivalence bound for ``bucket_flood_image``: the heap orders
# by f32 ``-sqrt(k)``, the bucket queue strictly by integer ``k`` — they
# agree iff distinct keys map to distinct f32 priorities.  For integers
# a < b, sqrt(b) - sqrt(a) >= 1 / (2*sqrt(b)), while one f32 value spans at
# most ulp(sqrt(b)) <= sqrt(b) * 2^-23; the gap exceeds the span whenever
# b < 2^22, so keys below 2^22 are provably collision-free (a 3D EDT hits
# this only past ~1180 voxels of axis-aligned distance).
BUCKET_FLOOD_MAX_KEY = 1 << 22


def bucket_flood_image(keys, offsets, markers, mask, output):
    """Image-mode priority flood with DISCRETE integer priorities.

    Exact heap-order twin of ``priority_flood`` in image mode when every
    priority is ``-sqrt(keys[i])`` for integer ``keys`` (the EDT
    watershed): buckets by key instead of a heap — ~10x faster on dense
    masks. ``markers`` must be ascending (flatnonzero order); ``output``
    pre-seeded at markers. In place on raveled int32 ``output``.

    Raises ``ValueError`` when any key reaches ``BUCKET_FLOOD_MAX_KEY``
    (2^22): beyond it, adjacent integer keys can round to the same f32
    ``-sqrt`` priority, where the heap falls back to (age, index) ties but
    the bucket queue still orders strictly by key — callers must use
    ``priority_flood`` there.
    """
    lib = get_lib()
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    if keys.size and int(keys.max()) >= BUCKET_FLOOD_MAX_KEY:
        raise ValueError(
            f"bucket_flood_image key {int(keys.max())} >= 2^22: f32 -sqrt "
            "priorities may collide (heap would tie-break by age); use "
            "priority_flood for this volume"
        )
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    markers = np.ascontiguousarray(markers, dtype=np.int64)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    assert output.dtype == np.int32 and output.flags.c_contiguous
    lib.bucket_flood_image(
        _ptr(keys, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int64),
        ctypes.c_int32(len(offsets)),
        _ptr(markers, ctypes.c_int64),
        ctypes.c_int64(len(markers)),
        _ptr(mask, ctypes.c_uint8),
        _ptr(output, ctypes.c_int32),
        ctypes.c_int64(mask.size),
    )
    return output


def label_cc6(mask):
    """6-connectivity CC labels, scipy raster numbering (3D only)."""
    lib = get_lib()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    assert mask.ndim == 3
    labels = np.zeros(mask.shape, dtype=np.int32)
    num = lib.label_cc6(
        _ptr(mask, ctypes.c_uint8),
        _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(mask.shape[0]),
        ctypes.c_int64(mask.shape[1]),
        ctypes.c_int64(mask.shape[2]),
    )
    return labels, int(num)


def ensure_spacing_cheb(coords, spacing):
    """Greedy Chebyshev spacing keep-flags for priority-ordered coords."""
    lib = get_lib()
    coords = np.ascontiguousarray(coords, dtype=np.int64)
    n, ndim = coords.shape
    keep = np.zeros(n, dtype=np.uint8)
    lib.ensure_spacing_cheb(
        _ptr(coords, ctypes.c_int64),
        ctypes.c_int64(n),
        ctypes.c_int64(ndim),
        ctypes.c_int64(int(spacing)),
        _ptr(keep, ctypes.c_uint8),
    )
    return keep.astype(bool)


def band_filter_cc6(mask, min_area, max_area):
    """In-place fused CC size-band filter on a 3D uint8/bool mask.

    Returns the filtered boolean mask (components with size outside
    [min_area, max_area) removed). Implemented with the run-based
    union-find kernel (``band_filter_runs``); the per-voxel BFS version
    (``band_filter_bfs``) is kept as its slow oracle.

    Aliasing contract: when ``mask`` is already a C-contiguous uint8
    array it is filtered IN PLACE and the returned bool array is a view
    sharing its memory — the caller's input mask is the filtered result
    afterwards. Any other dtype/layout is copied first (the input is then
    untouched and the return value owns fresh memory). Pass a copy if the
    original uint8 mask must survive.
    """
    lib = get_lib()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    assert m.ndim == 3
    lib.band_filter_runs(
        _ptr(m, ctypes.c_uint8),
        ctypes.c_int64(m.shape[0]),
        ctypes.c_int64(m.shape[1]),
        ctypes.c_int64(m.shape[2]),
        ctypes.c_int64(int(min_area)),
        ctypes.c_int64(int(max_area)),
    )
    # uint8 0/1 reinterpreted as bool: no 17 MB copy
    return m.view(bool)


def band_filter_bfs(mask, min_area, max_area):
    """Per-voxel BFS size-band filter — the slow oracle for
    ``band_filter_cc6`` (identical output, ~5x slower on 256^3)."""
    lib = get_lib()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    assert m.ndim == 3
    labels = np.zeros(m.shape, dtype=np.int32)
    lib.band_filter_cc6(
        _ptr(m, ctypes.c_uint8),
        _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(m.shape[0]),
        ctypes.c_int64(m.shape[1]),
        ctypes.c_int64(m.shape[2]),
        ctypes.c_int64(int(min_area)),
        ctypes.c_int64(int(max_area)),
    )
    return m.view(bool)


def edt3d(mask):
    """Exact EDT (f64) of a 3D mask: distance to the nearest zero voxel.
    Bit-identical to scipy.ndimage.distance_transform_edt."""
    lib = get_lib()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    assert m.ndim == 3
    out = np.empty(m.shape, dtype=np.float64)
    lib.edt3d(
        _ptr(m, ctypes.c_uint8),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(m.shape[0]),
        ctypes.c_int64(m.shape[1]),
        ctypes.c_int64(m.shape[2]),
    )
    return out
