"""Device-resident affinity segmentation pipeline (transfer-minimal).

The generic path (``predict_volume`` + ``segment_output_image``) downloads
the full 5-channel feature volume and re-uploads pieces for postprocessing.
On hosts with thin links to the accelerator that traffic dominates end to
end, so this pipeline keeps everything resident on device and transfers
only what the host flood actually needs:

  up:    the raw volume (once)
  down:  threshold mask (bit-packed uint8), the live prefix of the
         pre-sorted peak-candidate indices (int32), Otsu scalar — and the
         affinity values gathered at pre-size-filter masked voxels only
         (a superset of the voxels the flood reads), downloaded async
         UNDER the host's spacing + size-filter work.

Bit-exactness with the generic path is by construction, not by luck: the
fast and generic paths share the SAME compiled programs for every
rounding-sensitive stage —

  F  chunk-grid batched U-Net forward + margin-crop reassembly, with
     per-microbatch z-slab uploads pipelined under the forward
     (``get_feature_program``; ``predict_volume`` runs the identical
     executables and merely downloads the result),
  P  feature-map preparation: affinity normalise/pad, centroid smoothing,
     Otsu (``ops.watershed._prep_feature_maps`` — the very function
     ``segment_output_image`` jits).

The remaining device stage (threshold compare, candidate mask, mask
bit-packing, argsort) is exact arithmetic on those shared outputs
(comparisons/max/sort introduce no rounding), so identical inputs give
identical labels whichever path runs. Covered by exact-equality tests in
``tests/test_device_pipeline.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.chunks import make_chunks, chunk_slices
from ..ops.filters import gaussian, maximum_filter
from ..ops.cc import size_band_filter
from ..ops.watershed_oracle import neighbor_offsets
from .. import native

__all__ = ["AffinityPipeline", "DoGPipeline", "get_feature_program"]

_CAND_CAP = 1 << 18  # max pre-sorted peak candidates shipped to host

# DoG programs close only over scalar config, so their compiled artifacts
# are shared process-wide (each dog_blob_watershed call creates a fresh
# pipeline; without this, every call would recompile ~20 s)
_DOG_PROGRAM_CACHE = {}

# gather/slice programs are pure functions of the capacity, shared
# process-wide for the same reason (a fresh pipeline per segmenter call
# would otherwise recompile them, ~5 s each on the real chip)
_GATHER_CACHE = {}


def _pow2_cap(n, floor):
    """``n`` rounded up to a power of two, at least ``2**floor`` — the
    static-buffer cap for small uploads (seed rows, candidate slices)
    where the compiled-shape set must stay bounded. Floors: 6 for seed
    coordinate rows (tiny), 8 for candidate rankings (typically ~1e4)."""
    return 1 << max(int(np.ceil(np.log2(max(int(n), 1)))), floor)


def _transfer_capacity(n, limit, minimum=1024):
    """Static buffer size for shipping ``n`` live entries through a cached
    fixed-shape executable: ``n`` rounded up to a quarter-octave step
    (1, 1.25, 1.5 or 1.75 × a power of two) instead of a full power of
    two. The dead tail shipped over the thin host link is then ≤25% of
    the live bytes — a pow2 round-up wastes up to 100%, ~3 MB of the
    masked-affinity download at the 256³ bench geometry — while the set
    of compiled gather shapes stays bounded (4 per octave)."""
    n = int(max(n, 1))
    if n <= minimum:
        return int(min(minimum, limit))
    base = 1 << (n.bit_length() - 1)
    step = base >> 2
    cap = -(-n // step) * step
    return int(min(cap, limit))


def _pick_capacity(kind, n, limit, minimum=1024):
    """``_transfer_capacity`` with compile-churn protection for 4D stacks:
    when a gather executable of this ``kind`` is already compiled at a
    capacity that fits ``n`` without exceeding the old pow2 round-up
    (the waste bound the pipelines always tolerated), reuse it — each
    fresh capacity costs a ~5 s compile on the real chip, so per-frame
    mask-size drift across quarter-octave steps must not recompile."""
    cap = _transfer_capacity(n, limit, minimum)
    n = int(max(n, 1))
    hi = max(min(1 << (n - 1).bit_length(), limit), cap)  # old pow2 bound
    cached = [
        key[1] for key in _GATHER_CACHE
        if len(key) == 2 and key[0] == kind and n <= key[1] <= hi
    ]
    return min(cached) if cached else cap


def _cached_gather(kind, capacity):
    key = (kind, capacity)
    if key not in _GATHER_CACHE:
        if kind == "rows":  # (C, n) values at idx -> (C, capacity)
            @jax.jit
            def fn(arr, idx):
                flat = arr.reshape(arr.shape[0], -1)
                return flat[:, idx]
        else:  # flat gather
            @jax.jit
            def fn(arr, idx):
                return arr.ravel()[idx]
        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_slice(k):
    key = ("slice", k)
    if key not in _GATHER_CACHE:
        _GATHER_CACHE[key] = jax.jit(lambda o: o[:k])
    return _GATHER_CACHE[key]


def _cached_flood_prep(pshape, cap):
    """Device program for the ``device_flood`` mode's inputs: unpack
    host-packed mask bits (a ~2 MB upload instead of a 17 MB u8 mask on
    256³) and scatter the seed labels. ``cap`` rows of ``coords``/``labs``
    with zero-label padding (a 0 scattered at the border corner is inert:
    the border ring is outside the mask)."""
    key = ("flood_prep", pshape, cap)
    if key not in _GATHER_CACHE:
        psize = int(np.prod(pshape))

        @jax.jit
        def fn(bits, coords, labs):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((bits[:, None] >> shifts) & 1).reshape(-1)[:psize]
            mask = flat.astype(bool).reshape(pshape)
            seeds = jnp.zeros(pshape, jnp.int32).at[
                coords[:, 0], coords[:, 1], coords[:, 2]
            ].max(labs)
            return mask, seeds

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_crop_cast(pshape, wide):
    """Crop the padding ring + cast labels to the wire dtype on device
    (u16 when the seed count allows — halves the label download)."""
    key = ("crop_cast", pshape, bool(wide))
    if key not in _GATHER_CACHE:
        dtype = jnp.int32 if wide else jnp.uint16

        @jax.jit
        def fn(lab):
            return lab[1:-1, 1:-1, 1:-1].astype(dtype)

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_dog_flood(pshape, cap, wide, kernel="xla"):
    """Device program for the DoG pipeline's ``device_flood`` mode: the
    mask (bit-packed) and squared EDT are ALREADY device-resident outputs
    of the main DoG program, so only the ``cap`` zero-padded seed
    coordinate/label rows upload (the inert-zero scatter of
    ``_cached_flood_prep``); the approximate image watershed — the XLA
    recurrence (``ops/device_flood.wavefront_image_flood_jit``) or the
    Pallas Gauss-Seidel kernel (``ops/pallas_flood.pallas_image_flood_jit``)
    per ``kernel`` — runs on ``-sqrt(EDT²)`` (the node-keyed flood of the
    reference's ``watershed(-edt, markers, mask)``) and only the
    wire-dtype labels come back. Callers must gate ``kernel="pallas"``
    on ``pallas_flood.fits_vmem(pshape)``."""
    key = ("dog_flood", pshape, cap, bool(wide), kernel)
    if key not in _GATHER_CACHE:
        from ..ops.device_flood import wavefront_image_flood_jit
        from ..ops.pallas_flood import pallas_image_flood_jit

        psize = int(np.prod(pshape))
        dtype = jnp.int32 if wide else jnp.uint16
        interpret = jax.default_backend() != "tpu"

        @jax.jit
        def fn(bits, dist_sq, coords, labs):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((bits[:, None] >> shifts) & 1).reshape(-1)[:psize]
            mask = flat.astype(bool).reshape(pshape)
            seeds = jnp.zeros(pshape, jnp.int32).at[
                coords[:, 0], coords[:, 1], coords[:, 2]
            ].max(labs)
            values = -jnp.sqrt(dist_sq.astype(jnp.float32))
            if kernel == "pallas":
                # inner_cap=1 is the fidelity-first setting, as for the
                # affinity kernel (benchmarks/watershed_crossover.py)
                lab, _it, conv = pallas_image_flood_jit(
                    values, seeds, mask, max_sweeps=128, inner_cap=1,
                    interpret=interpret,
                )
            else:
                lab, _it, conv = wavefront_image_flood_jit(
                    values, seeds, mask, mode="claim", max_iters=512
                )
            return lab.astype(dtype), conv

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_flood_telemetry(pshape, cap):
    """Device program for the approximate modes' per-run fidelity bound:
    run the certificate and compare the flood's labels against the
    certified representative on the CERTAIN voxels — only three counts
    download.  Rigorous bound (triangle inequality through ``rep``):
    the heap equals ``rep`` on certain voxels, so
    ``flood != heap  ⊆  uncertain ∪ (flood != rep on certain)``."""
    key = ("flood_telemetry", pshape, cap)
    if key not in _GATHER_CACHE:
        from ..ops.flood_exact import certificate_flood_jit

        psize = int(np.prod(pshape))

        @jax.jit
        def fn(bits, coords, labs, aff_pad, lab_flood):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((bits[:, None] >> shifts) & 1).reshape(-1)[:psize]
            mask = flat.astype(bool).reshape(pshape)
            seeds = jnp.zeros(pshape, jnp.int32).at[
                coords[:, 0], coords[:, 1], coords[:, 2]
            ].max(labs)
            rep, unc, _lb, _ub, conv = certificate_flood_jit(
                aff_pad, seeds, mask
            )
            certain = mask & ~unc
            mism = certain & (lab_flood.astype(jnp.int32) != rep)
            return (jnp.sum(unc).astype(jnp.int32),
                    jnp.sum(mism).astype(jnp.int32),
                    jnp.sum(mask).astype(jnp.int32), conv)

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_tie_probe(pshape):
    """Async tie-density probe for ``device_flood="exact"`` (round 5):
    consumes the DEVICE-RESIDENT ``mask_packed`` + ``aff_pad`` from the
    main program's outputs (zero upload), returns one f32 scalar — the
    fraction of in-mask voxels with exactly tied claim competitions on
    the PRE-size-filter mask (a superset of the flood's mask; the
    density signal is seed- and filter-independent to first order, and
    the in-program probe on the filtered mask still guards the final
    decision).  Dispatched at the top of ``_finalize`` so it rides
    under the host spacing/filter work; the caller reads it just before
    committing to the certificate."""
    key = ("tie_probe", pshape)
    if key not in _GATHER_CACHE:
        from ..ops.flood_exact import _affinity_ties, _edge_weights

        zyx = tuple(s - 2 for s in pshape)
        psize = int(np.prod(zyx))

        @jax.jit
        def fn(mask_packed, aff_pad):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((mask_packed[:, None] >> shifts) & 1).reshape(-1)
            mask = flat[:psize].astype(bool).reshape(zyx)
            mask_pad = jnp.pad(mask, 1)
            weights = _edge_weights(aff_pad, 3)
            ties = _affinity_ties(weights, mask_pad)
            n = jnp.sum(mask_pad)
            return (jnp.sum(ties).astype(jnp.float32)
                    / jnp.maximum(n, 1).astype(jnp.float32))

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


class _Speculative:
    """Run ``fn(profile_dict)`` on a worker thread; ``join`` returns
    ``(result, profile_dict)`` or re-raises the thread's exception.

    Used by ``device_flood="exact"`` to overlap the exact host flood
    under the certificate fence: while the main thread blocks on the
    device program's scalars (a GIL-released wait through the link), the
    worker consumes the already-in-flight gather download and runs the
    C++ flood — so a fallback costs ~max(certificate, host flood)
    instead of their sum.  The worker touches only its own buffers plus
    the pipeline's scatter buffer (which the main thread never reads in
    exact mode), and the caller always joins before returning, so no
    state outlives the call."""

    def __init__(self, fn):
        import threading

        self._prof = {}
        self._result = None
        self._exc = None

        def run():
            try:
                self._result = fn(self._prof)
            except BaseException as e:  # re-raised on join
                self._exc = e

        self._thread = threading.Thread(
            target=run, name="iterseg-speculative-flood", daemon=True
        )

    def start(self):
        self._thread.start()

    def join(self):
        self._thread.join()
        if self._exc is not None:
            raise self._exc
        return self._result, self._prof


def _cached_exact_flood(pshape, cap, wide):
    """Device program for ``device_flood="exact"``: unpack the filtered
    mask bits + scatter seeds (as ``_cached_flood_prep``), then run the
    fully device-resident verified exact flood
    (``ops/flood_exact.verified_exact_flood_jit``: certificate +
    PROVEN restricted repair, behind the tie-density early exit that
    bounds the mode's worst case to ~the probe cost).  Only wire-dtype
    labels and four scalars come back; ``resolved`` False sends the
    caller to the exact host flood."""
    key = ("exact_flood", pshape, cap, bool(wide))
    if key not in _GATHER_CACHE:
        from ..ops.flood_exact import (TIE_PROBE_DEFAULT,
                                       verified_exact_flood_jit)

        psize = int(np.prod(pshape))
        dtype = jnp.int32 if wide else jnp.uint16

        @jax.jit
        def fn(bits, coords, labs, aff_pad):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((bits[:, None] >> shifts) & 1).reshape(-1)[:psize]
            mask = flat.astype(bool).reshape(pshape)
            seeds = jnp.zeros(pshape, jnp.int32).at[
                coords[:, 0], coords[:, 1], coords[:, 2]
            ].max(labs)
            labels, resolved, unc_count, n_mask, tie_frac = (
                verified_exact_flood_jit(aff_pad, seeds, mask,
                                         tie_probe=TIE_PROBE_DEFAULT)
            )
            return (labels.astype(dtype), resolved, unc_count, n_mask,
                    tie_frac)

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _cached_dog_exact_flood(pshape, cap, wide):
    """DoG twin of ``_cached_exact_flood``: the verified exact IMAGE
    flood on the device-resident EDT landscape.  Floods on ``-d²`` —
    NOT ``-sqrt(d²)`` — because a strictly monotone transform preserves
    every comparison AND every exact tie, while ``-d²`` is an exact f32
    integer on any platform (TPU sqrt rounding can deviate by an ulp,
    which would silently desynchronise the certificate from the host
    heap).  Equality with the production ``-sqrt`` flood holds below
    the proven ``native.BUCKET_FLOOD_MAX_KEY`` collision bound; the
    caller checks the returned ``max_key`` and falls back past it."""
    key = ("dog_exact_flood", pshape, cap, bool(wide))
    if key not in _GATHER_CACHE:
        from ..ops.flood_exact import (TIE_PROBE_DEFAULT,
                                       verified_exact_image_flood_jit)

        psize = int(np.prod(pshape))
        dtype = jnp.int32 if wide else jnp.uint16

        @jax.jit
        def fn(bits, dist_sq, coords, labs):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits MSB
            flat = ((bits[:, None] >> shifts) & 1).reshape(-1)[:psize]
            mask = flat.astype(bool).reshape(pshape)
            seeds = jnp.zeros(pshape, jnp.int32).at[
                coords[:, 0], coords[:, 1], coords[:, 2]
            ].max(labs)
            values = -dist_sq.astype(jnp.float32)
            labels, resolved, unc_count, n_mask, tie_frac = (
                verified_exact_image_flood_jit(
                    values, seeds, mask, tie_probe=TIE_PROBE_DEFAULT)
            )
            max_key = jnp.max(jnp.where(mask, dist_sq, 0)).astype(
                jnp.int32)
            return (labels.astype(dtype), resolved, unc_count, n_mask,
                    tie_frac, max_key)

        _GATHER_CACHE[key] = fn
    return _GATHER_CACHE[key]


def _prepare_frame(raw):
    """Shared per-frame input contract of the 4D stack paths: returns
    ``(vol, kept, device_normalize)``.

    Integer frames (itemsize <= 4 only — jax canonicalises (u)int64 to
    32 bits with WRAPAROUND on upload) keep their source dtype over the
    link (u16 halves the bytes of f32) and are normalised on device —
    bit-identical to ``prepare_volume``'s host ``/ max`` (int -> f32 is
    exact, max is exact selection, same f32 division). Float frames take
    the host ``prepare_volume`` path."""
    from ..core.volume import prepare_volume, remove_sum_zero_slices

    orig_shape = raw.shape
    if np.issubdtype(raw.dtype, np.integer) and raw.dtype.itemsize <= 4:
        vol, kept = raw, None
        if vol.min() == 0:
            vol, kept = remove_sum_zero_slices(vol, return_kept=True)
            if vol.shape == orig_shape:
                kept = None
        return np.ascontiguousarray(vol), kept, True
    vol, kept = prepare_volume(raw.astype(np.float32), return_kept=True)
    return np.ascontiguousarray(vol), kept, False


def _drive_stack(stack, output_labels, skip_labelled, devices,
                 dispatch_one, finalize_one):
    """Shared pipelined 4D drive: dispatch device programs ahead of the
    in-order host finalisation (one frame of lookahead single-device;
    ``len(devices)`` frames when round-robining chips), with warm-restart
    skipping. ``dispatch_one(t, device)`` returns an opaque job;
    ``finalize_one(job)`` returns the frame's labels."""
    todo = []
    for t in range(stack.shape[0]):
        if skip_labelled and np.any(np.asarray(output_labels[t])):
            continue
        todo.append(t)

    lookahead = 1 if devices is None else len(devices)
    pending = []
    next_dispatch = 0
    for i in range(len(todo)):
        while next_dispatch < len(todo) and next_dispatch <= i + lookahead:
            t = todo[next_dispatch]
            device = (None if devices is None
                      else devices[next_dispatch % len(devices)])
            pending.append((t, dispatch_one(t, device)))
            next_dispatch += 1
        jt, job = pending.pop(0)
        output_labels[jt] = finalize_one(job)
        yield jt


def _valid_grid(zyx, chunk_size, margin):
    """Pad/clamp logic shared with predict_volume: z even, y/x %16 chunks."""
    mults = (2, 16, 16)
    pads = []
    for s, c, m in zip(zyx, chunk_size, mults):
        usable = min(c, s)
        # pad only when the VOLUME axis is below the minimum; a chunk
        # axis below it is bumped up to the minimum instead (a negative
        # pad / zero-size chunk would crash np.pad / make_chunks)
        pads.append((0, 0) if usable >= m else (0, max(m - s, 0)))
    padded = tuple(s + p[1] for s, p in zip(zyx, pads))
    chunk = tuple(
        (max(min(int(c), int(s)), m) // m) * m
        for c, s, m in zip(chunk_size, padded, mults)
    )
    marg = tuple(
        min(int(mg), (min(int(s), int(c)) - 1) // 2)
        for mg, s, c in zip(margin, padded, chunk)
    )
    return pads, padded, chunk, marg


def _build_feature_program(model, zyx, chunk_size, margin, microbatch,
                           normalize=False):
    """``vol (zyx, numpy) -> device feature volume (C, zyx)``: overlapping
    chunk grid (reference ``make_chunks``/``process_chunks`` semantics,
    predict.py:38-96), upload/compute-pipelined U-Net forward on the MXU,
    and device-side margin-crop reassembly.

    This is THE chunked forward: ``predict_volume`` and the device
    pipelines run this same composition of executables, which is what makes
    their label outputs bit-identical (different XLA programs differ by
    ~1e-7 in the feature maps, flipping watershed ties).

    Pipelined uploads: the volume is shipped as per-microbatch z-slabs in
    the SOURCE dtype (uint16 halves the bytes of f32), each dispatched
    async so slab b+1's host→device copy overlaps microbatch b's forward —
    on a thin host link (~35 MB/s here) the upload is as expensive as the
    whole forward, so hiding it nearly halves the device phase. The f32
    conversion and (optional) /max normalisation happen on device inside
    the forward executable; the /max denominator is computed on host,
    which is bit-identical for any input (max is exact selection, and u16
    → f32 conversion is exact).
    """
    pads, padded, chunk, marg = _valid_grid(zyx, chunk_size, margin)
    starts, crops = make_chunks(padded, chunk, marg)
    n = len(starts)
    B = int(min(microbatch, n))
    nb = -(-n // B)
    params = model.params
    spec = model.spec
    compute_dtype = model.compute_dtype

    # per-axis piece lists for device-side assembly
    z_starts = sorted({s[0] for s in starts})
    y_starts = sorted({s[1] for s in starts})
    x_starts = sorted({s[2] for s in starts})
    crop_of = {tuple(s): c for s, c in zip(starts, crops)}

    from ..models import unet as unet_mod

    if compute_dtype != jnp.float32:
        fwd_params = {
            k: (v.astype(compute_dtype) if v.dtype == jnp.float32 else v)
            for k, v in params.items()
        }
    else:
        fwd_params = params

    # group chunks into z-ordered microbatches; each batch reads one
    # contiguous z-slab [z0, z1) of the padded volume
    order = sorted(range(n), key=lambda i: tuple(starts[i]))
    batches = [order[b * B:(b + 1) * B] for b in range(nb)]
    slab_of = []
    rel_starts = []
    for idxs in batches:
        z0 = min(starts[i][0] for i in idxs)
        z1 = max(starts[i][0] for i in idxs) + chunk[0]
        slab_of.append((int(z0), int(z1)))
        rel_starts.append(tuple(
            (int(starts[i][0] - z0),) + tuple(int(s) for s in starts[i][1:])
            for i in idxs
        ))
    # position of global chunk i in (batch, slot)
    pos_of = {}
    for b, idxs in enumerate(batches):
        for slot, i in enumerate(idxs):
            pos_of[tuple(starts[i])] = (b, slot)

    # one forward executable per distinct (slab shape, relative starts)
    # signature — uniform grids share one; the edge-shifted tail batch
    # compiles its own
    fwd_cache = {}

    def fwd_for(slab_shape, rels):
        key = (slab_shape, rels)
        if key in fwd_cache:
            return fwd_cache[key]

        @jax.jit
        def fwd(slab, denom):
            v = slab.astype(jnp.float32)
            if normalize:
                v = v / denom
            xs = jnp.stack(
                [v[chunk_slices(s, chunk)] for s in rels]
            )[:, None]  # (b, 1, cz, cy, cx)
            if len(rels) < B:
                xs = jnp.concatenate(
                    [xs, jnp.zeros((B - len(rels),) + xs.shape[1:],
                                   xs.dtype)]
                )
            yb = unet_mod.forward(
                fwd_params, spec, xs.astype(compute_dtype), train=False
            )
            return yb.astype(jnp.float32)

        fwd_cache[key] = fwd
        return fwd

    def assemble_fn(*ys):
        # assemble margin-cropped pieces (crops tile `padded` exactly)
        def piece(s):
            b, slot = pos_of[s]
            cr = crop_of[s]
            return ys[b][slot][
                (slice(None),) + tuple(slice(int(a), int(b_)) for a, b_ in cr)
            ]

        zrows = []
        for zs in z_starts:
            yrows = []
            for ysr in y_starts:
                xpieces = [piece((zs, ysr, xsr)) for xsr in x_starts]
                yrows.append(
                    xpieces[0] if len(xpieces) == 1
                    else jnp.concatenate(xpieces, axis=3)
                )
            zrows.append(
                yrows[0] if len(yrows) == 1
                else jnp.concatenate(yrows, axis=2)
            )
        out = (zrows[0] if len(zrows) == 1
               else jnp.concatenate(zrows, axis=1))
        return out[:, : zyx[0], : zyx[1], : zyx[2]]

    assemble = jax.jit(assemble_fn)

    def program(vol, device=None, _slabs=None):
        vol = np.asarray(vol)
        if any(p[1] for p in pads):
            vol = np.pad(vol, pads, mode="edge")
        if normalize:
            denom = jnp.float32(np.max(vol.astype(np.float32)))
        else:
            denom = jnp.float32(1.0)
        ys = []
        for b, (z0, z1) in enumerate(slab_of):
            if _slabs is not None:  # profiling hook: pre-uploaded slabs
                sd = _slabs[b]
            else:
                slab = np.ascontiguousarray(vol[z0:z1])
                sd = jax.device_put(slab, device)  # async H2D
            ys.append(fwd_for(sd.shape, rel_starts[b])(sd, denom))
        return assemble(*ys)

    def upload_slabs(vol, device=None):
        """Pre-upload all z-slabs (benchmark attribution hook): lets a
        caller time the compute with H2D taken out of the loop."""
        vol = np.asarray(vol)
        if any(p[1] for p in pads):
            vol = np.pad(vol, pads, mode="edge")
        return [
            jax.device_put(np.ascontiguousarray(vol[z0:z1]), device)
            for z0, z1 in slab_of
        ]

    program.upload_slabs = upload_slabs
    program.slab_of = slab_of
    return program


def get_feature_program(model, zyx, chunk_size=(10, 256, 256),
                        margin=(1, 64, 64), microbatch=None,
                        normalize=False):
    """The (cached) chunked-forward program for this model/geometry.

    Cached on the model object, so ``predict_volume`` and every pipeline
    built on the same model share one program (same executables) per
    geometry. ``microbatch=None`` resolves via the shared activation-budget
    heuristic so both paths agree on the microbatch (batch size is part of
    the XLA programs, hence of the numerics).
    """
    zyx = tuple(int(s) for s in zyx)
    chunk_size = tuple(int(c) for c in chunk_size)
    margin = tuple(int(m) for m in margin)
    if microbatch is None:
        from .predict import _pick_batch_size

        _, padded, chunk, marg = _valid_grid(zyx, chunk_size, margin)
        starts, _ = make_chunks(padded, chunk, marg)
        microbatch = _pick_batch_size(len(starts), chunk,
                                      model.out_channels)
    key = (zyx, chunk_size, margin, int(microbatch), bool(normalize),
           jnp.dtype(model.compute_dtype).name)
    cache = getattr(model, "_feature_programs", None)
    # the built programs close over model.params: if the params object OR
    # any of its leaf arrays was swapped (fresh weights assigned after
    # training, or a leaf replaced in-place in the same dict), the cache
    # would silently serve the OLD checkpoint — fingerprint leaf identities
    params_fp = (id(model.params),) + tuple(
        id(leaf) for leaf in jax.tree_util.tree_leaves(model.params)
    )
    if cache is None or getattr(
            model, "_feature_programs_params", None) != params_fp:
        cache = {}
        model._feature_programs = cache
        model._feature_programs_params = params_fp
    if key not in cache:
        cache[key] = _build_feature_program(
            model, zyx, chunk_size, margin, microbatch, normalize
        )
    return cache[key]


def _pack_mask_bits(mask):
    """Pack a boolean array MSB-first (np.unpackbits layout) into uint8."""
    mbits = mask.ravel()
    pad_bits = (-mbits.size) % 8
    if pad_bits:
        mbits = jnp.concatenate([mbits, jnp.zeros(pad_bits, bool)])
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(
        mbits.reshape(-1, 8).astype(jnp.uint8) * weights, axis=1,
        dtype=jnp.uint8,
    )


class AffinityPipeline:
    """U-Net → watershed segmentation of one zyx volume, device-resident."""

    @staticmethod
    def normalize_device_flood(value):
        """Canonical form of a ``device_flood`` setting (False/"xla"/
        "pallas"/"exact"). Cache keys must use this, or ``True`` and its
        resolved kernel name would materialise duplicate pipelines.

        ``True`` is bandwidth-adaptive on a real TPU: the Pallas flood
        beats the host heap end-to-end only above the measured ~38 MB/s
        link crossover (``engine.linkprobe``), so slower links resolve
        ``True`` back to the exact host flood.  Off-TPU (the CPU test
        mesh has no real link) ``True`` stays the XLA recurrence, and
        explicit ``"pallas"``/``"xla"``/``"exact"`` always force."""
        if value is True:
            if jax.default_backend() == "tpu":
                from .linkprobe import MEASURED, measure_link_mbps

                mbps = measure_link_mbps()
                value = (
                    "pallas"
                    if mbps is not None
                    and mbps >= MEASURED["device_flood_crossover_mbps"]
                    else False
                )
            else:
                value = "xla"
        value = value or False
        assert value in (False, "xla", "pallas", "exact"), value
        return value

    def __init__(self, model, chunk_size=(10, 256, 256),
                 margin=(1, 64, 64), absolute_thresh=None,
                 microbatch=None, cand_capacity: int = _CAND_CAP,
                 normalize: bool = False, device_flood: bool = False,
                 flood_telemetry: bool = False):
        self.model = model
        self.chunk_size = tuple(chunk_size)
        self.margin = tuple(margin)
        self.absolute_thresh = absolute_thresh
        self.microbatch = microbatch  # None = shared heuristic (must match
        # predict_volume's, or the scan batch — hence the numerics — differs)
        self.cand_capacity = cand_capacity
        self.normalize = normalize  # divide by max on device (device twin
        # of segment_single_volume's host normalisation; bit-identical f32)
        # opt-in on-device flood instead of the exact host heap. True
        # picks the APPROXIMATE Pallas Gauss-Seidel kernel
        # (ops/pallas_flood, ~97-99.7% label agreement, ~3.5x the XLA
        # Jacobi recurrence) on a real TPU and the XLA recurrence
        # (ops/device_flood) elsewhere (Pallas off-TPU means the
        # interpreter — a debugging tool, not a production path);
        # "pallas"/"xla" force a kernel. "exact" runs the hybrid
        # certificate + host-repair flood (ops/flood_exact): labels
        # BIT-EQUAL to the host heap, certificate on device, only the
        # uncertain few percent re-floods on host. Mask/threshold/seed
        # selection stay exact in every mode
        # (benchmarks/watershed_crossover.py has the measured curves).
        self.device_flood = self.normalize_device_flood(device_flood)
        # opt-in per-run fidelity telemetry for the APPROXIMATE flood
        # modes: runs the exactness certificate (ops/flood_exact)
        # alongside the flood and reports flood_uncertain_frac in the
        # profile dict — a RIGOROUS upper bound on the fraction of
        # voxels whose label can differ from the exact heap (the device
        # flood and the heap are both consistent schedules; they can
        # only disagree inside the certificate's uncertain set). Costs
        # roughly one extra device pass-set per volume; "exact" mode
        # reports it inherently.
        self.flood_telemetry = bool(flood_telemetry)
        # exact mode's speculative host flood (overlap under the
        # certificate fence — see ``_flood_exact``); public so the
        # paired A/B probe (benchmarks/spec_overlap_probe.py) and any
        # single-core-host caller can opt out. Labels are identical
        # either way (both halves are exact).
        self.speculative_flood = True
        self._programs = {}
        # (pshape, buffer): the most-recent shape's scatter buffer only —
        # ragged 4D stacks would otherwise pin ~200 MB per distinct shape
        self._aff_host = (None, None)

    # ------------------------------------------------------------------
    # device programs: F (shared chunked forward), P (shared feature prep,
    # ops.watershed._prep_feature_maps), C (mask packing + peak candidates)
    # ------------------------------------------------------------------

    def _cand_program(self, zyx):
        """mask packing + sorted peak candidates from P's outputs.

        Everything here is exact arithmetic (compare / max-filter / stable
        argsort — no rounding), so it need not share an executable with the
        generic path to be bit-consistent with it.
        """
        if zyx in self._programs:
            return self._programs[zyx]
        K = self.cand_capacity

        def program(cent_smooth, masking_img, thresh):
            mask = masking_img > thresh
            # (size-band filtering happens on host: scipy's union-find CC
            # beats the device pointer-jumping loop end-to-end here)
            mask_packed = _pack_mask_bits(mask)
            # peak candidates (min_distance=1, exclude 1-voxel border)
            cand = (cent_smooth == maximum_filter(cent_smooth, 3,
                                                  mode="nearest"))
            cand = cand & (cent_smooth > 0.04)
            interior = jnp.pad(
                jnp.ones([s - 2 for s in zyx], bool), 1,
                constant_values=False,
            )
            cand = cand & interior
            scores = jnp.where(cand, -cent_smooth, jnp.inf).ravel()
            order = jnp.argsort(scores)[:K].astype(jnp.int32)
            n_cand = jnp.sum(cand).astype(jnp.int32)
            return mask_packed, order, n_cand

        self._programs[zyx] = jax.jit(program)
        return self._programs[zyx]

    def _device_outputs(self, x, device=None, normalize=None):
        """Run F → P → C on a host volume; returns the finalize tuple.
        All dispatches are async (no host sync); slab uploads pipeline
        under the forward (see ``_build_feature_program``).

        ``normalize`` overrides the pipeline's flag for this call (used by
        ``segment_stack`` to keep integer frames in their source dtype and
        /max them on device instead of on host — bit-identical)."""
        from ..ops.watershed import _prep_feature_maps

        zyx = tuple(int(s) for s in x.shape)
        program = get_feature_program(
            self.model, zyx, self.chunk_size, self.margin,
            microbatch=self.microbatch,
            normalize=self.normalize if normalize is None else normalize,
        )
        out = program(x, device=device)
        aff_pad, cent_smooth, otsu = _prep_feature_maps(
            out[:3], out[4], out[3]
        )
        if self.absolute_thresh is None:
            thresh = otsu
        else:
            t = self.absolute_thresh
            if isinstance(t, np.floating) and t.dtype == np.float64:
                # NumPy float64 SCALARS are not NEP-50 "weak": the host
                # compares f32_array > t in FLOAT64. Matching that on
                # device needs the largest f32 whose f32-compare agrees
                # with the f64-compare for every f32 voxel value
                t64 = float(t)
                t32 = np.float32(t64)
                if np.float64(t32) > t64:
                    t32 = np.nextafter(t32, np.float32(-np.inf))
                thresh = jnp.float32(t32)
            else:
                # python floats (and f32 scalars) are weak under NEP 50:
                # the host compares in f32, so a straight cast matches
                thresh = jnp.float32(float(t))
        mask_packed, order, n_cand = self._cand_program(zyx)(
            cent_smooth, out[3], thresh
        )
        # start the D2H transfers the host half always needs the moment the
        # device produces them (the copy engine runs beside compute, so in
        # the pipelined 4D path frame t's downloads overlap frame t+1's
        # program)
        for a in (mask_packed, n_cand):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return aff_pad, mask_packed, order, n_cand, thresh, cent_smooth

    def _gather_fn(self, capacity):
        return _cached_gather("rows", capacity)

    def _slice_fn(self, k):
        return _cached_slice(k)

    def _dispatch_gather(self, aff_pad, mask_pad):
        """Dispatch the masked affinity gather (async D2H) for the host
        flood; returns (pre_idx, m, capacity, idx_up, vals_dev)."""
        pre_idx = np.flatnonzero(mask_pad.ravel()).astype(np.int32)
        m = len(pre_idx)
        capacity = _pick_capacity("rows", m, mask_pad.size)
        idx_up = np.zeros(capacity, np.int32)
        idx_up[:m] = pre_idx
        vals_dev = self._gather_fn(capacity)(aff_pad, jnp.asarray(idx_up))
        try:
            vals_dev.copy_to_host_async()
        except AttributeError:
            pass
        return pre_idx, m, capacity, idx_up, vals_dev

    def _flood_on_device(self, aff_pad, mask_pad, centroids, out=None,
                         profile=None):
        """The ``device_flood`` mode's flood half: upload the filtered
        mask (packed bits) + seeds, run the approximate wavefront flood
        over the device-resident padded affinities — the Pallas
        Gauss-Seidel kernel (``ops/pallas_flood``) or the XLA Jacobi
        recurrence (``ops/device_flood``) per ``self.device_flood`` —
        then download cropped wire-dtype labels. Returns int32 labels of
        the cropped shape, or ``None`` when the flood did not converge
        (caller falls back to the exact host heap flood)."""
        import time as _time

        from ..ops.device_flood import wavefront_flood_jit
        from ..ops.pallas_flood import pallas_flood_jit

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t0 = _time.perf_counter()
        pshape = mask_pad.shape
        n = len(centroids)
        cap = _pow2_cap(n, 6)
        coords = np.zeros((cap, 3), np.int32)
        labs = np.zeros(cap, np.int32)
        coords[:n] = centroids
        labs[:n] = np.arange(1, n + 1, dtype=np.int32)
        bits = np.packbits(mask_pad.view(np.bool_).ravel())
        mask_dev, seeds_dev = _cached_flood_prep(pshape, cap)(
            jnp.asarray(bits), jnp.asarray(coords), jnp.asarray(labs)
        )
        t0 = tick("upload_mask_seeds", t0)
        from ..ops.pallas_flood import fits_vmem

        # the Pallas kernel never tiles x: wide-X volumes overflow its
        # VMEM scratch and would fail the Mosaic compile, so they take
        # the XLA recurrence instead of aborting the segmentation
        kernel = self.device_flood
        if kernel == "pallas" and not fits_vmem(pshape):
            # labels differ between the two kernels at schedule-dependent
            # tie races, so a forced-"pallas" caller must hear about the
            # reroute instead of mis-attributing diffs/perf to the kernel
            import warnings

            warnings.warn(
                f"device_flood='pallas': padded volume {pshape} exceeds "
                "the Pallas kernel's VMEM budget (fits_vmem); using the "
                "XLA recurrence instead", RuntimeWarning, stacklevel=3,
            )
            kernel = "xla"
        if kernel == "pallas":
            # inner_cap=1 is the fidelity-first setting: oracle agreement
            # matches the XLA recurrence while sweeps stay ~3.5x faster
            # (benchmarks/watershed_crossover.py)
            lab_dev, _it, conv = pallas_flood_jit(
                aff_pad, seeds_dev, mask_dev, max_sweeps=128, inner_cap=1,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            lab_dev, _it, conv = wavefront_flood_jit(
                aff_pad, seeds_dev, mask_dev, mode="claim", max_iters=512
            )
        lab_wire = _cached_crop_cast(pshape, wide=n >= 2 ** 16)(lab_dev)
        try:
            lab_wire.copy_to_host_async()
        except AttributeError:
            pass
        if self.flood_telemetry and profile is not None:
            # rigorous per-run fidelity bound: the heap equals the
            # certificate's rep on certain voxels, so this flood can
            # differ from the heap only inside the uncertain set or
            # where it differs from rep on certain voxels (the claim
            # recurrences can carry stale labels at unchanged keys, so
            # the second term is not always zero) — three counts ship
            unc_n, mism_n, mask_n, cconv = _cached_flood_telemetry(
                pshape, cap
            )(jnp.asarray(bits), jnp.asarray(coords), jnp.asarray(labs),
              aff_pad, lab_dev)
            unc_n, mism_n, mask_n = (int(unc_n), int(mism_n),
                                     int(mask_n))
            profile["flood_uncertain_frac"] = (
                unc_n / mask_n if mask_n else 0.0
            )
            profile["flood_mismatch_certain_frac"] = (
                mism_n / mask_n if mask_n else 0.0
            )
            profile["flood_disagreement_bound"] = (
                (unc_n + mism_n) / mask_n if mask_n else 0.0
            )
            profile["flood_mask_voxels"] = mask_n
            profile["flood_certificate_converged"] = bool(cconv)
            t0 = tick("flood_telemetry", t0)
        if not bool(conv):  # blocks on the flood; label D2H runs behind
            return None
        t0 = tick("device_flood", t0)
        labels = np.asarray(lab_wire).astype(np.int32)
        tick("download_labels", t0)
        if out is not None:
            output = out
            output[:] = 0
            view = output.reshape(pshape)[1:-1, 1:-1, 1:-1]
            view[:] = labels
            return view
        return labels

    def _flood_exact(self, aff_pad, mask_pad, centroids, out=None,
                     profile=None, pre_tie_frac=None, gather=None):
        """``device_flood="exact"``: the fully device-resident verified
        exact flood (``ops/flood_exact``) — labels BIT-EQUAL to the
        exact host heap, PROVEN per run (certificate + restricted-repair
        verification; docs/exact_flood.md).  One device program; only
        wire-dtype labels + three scalars come back.  Returns cropped
        int32 labels, or ``None`` when the pre-dispatch tie probe (or a
        caller without ``gather``) routes to the exact host flood —
        exactness never regresses; the path is recorded in ``profile``.

        ``pre_tie_frac``: the early-dispatched probe's tie density
        (``_cached_tie_probe``) — above the threshold the certificate is
        doomed to the unresolved fallback, so the mode returns ``None``
        immediately, bounding its worst-case overhead to ~the probe cost
        (which itself hid under the host filter work).

        ``gather``: the early-dispatched ``(pre_idx, m, vals_dev)``
        affinity gather.  When given, the exact host flood runs
        SPECULATIVELY on a worker thread underneath the certificate
        fence (``_Speculative``): the device program's ~seconds of
        compute and the host heap's ~seconds of CPU overlap, so the
        unresolved/doomed fallback costs ~max of the two instead of
        their sum, and a resolved certificate merely wastes host cycles
        that were otherwise idle.  Both results are proven bit-equal, so
        the choice never changes labels."""
        import time as _time

        from ..ops.flood_exact import TIE_PROBE_DEFAULT

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        if pre_tie_frac is not None and pre_tie_frac > TIE_PROBE_DEFAULT:
            if profile is not None:
                profile["flood_tie_frac"] = pre_tie_frac
                # the async probe measures the PRE-size-filter mask (a
                # superset); the in-program value below is post-filter —
                # the scope key keeps the two comparable in telemetry
                profile["flood_tie_frac_scope"] = "prefilter"
                profile["flood_exact_path"] = "fallback:tie-density"
            return None

        t0 = _time.perf_counter()
        pshape = mask_pad.shape
        n = len(centroids)
        cap = _pow2_cap(n, 6)
        coords = np.zeros((cap, 3), np.int32)
        labs = np.zeros(cap, np.int32)
        coords[:n] = centroids
        labs[:n] = np.arange(1, n + 1, dtype=np.int32)
        bits = np.packbits(mask_pad.view(np.bool_).ravel())
        wide = n >= 2 ** 16
        lab_dev, resolved, unc_count, n_mask, tie_frac = (
            _cached_exact_flood(pshape, cap, wide)(
                jnp.asarray(bits), jnp.asarray(coords),
                jnp.asarray(labs), aff_pad)
        )
        try:
            lab_dev.copy_to_host_async()
        except AttributeError:
            pass
        spec = None
        if gather is not None:
            pre_idx, m, vals_dev = gather
            spec = _Speculative(
                lambda prof: self._host_flood(
                    pre_idx, m, vals_dev, mask_pad, centroids,
                    out=None, profile=prof,
                )
            )
            spec.start()

        def take_speculative():
            labels, sprof = spec.join()
            if profile is not None:
                profile["flood_speculative"] = True
                for k, v in sprof.items():
                    profile[k] = profile.get(k, 0.0) + v
            if out is not None:
                output = out
                output[:] = 0
                view = output.reshape(pshape)[1:-1, 1:-1, 1:-1]
                view[:] = labels
                return view
            return labels

        unc_count, n_mask = int(unc_count), int(n_mask)  # fences
        if profile is not None:
            profile["flood_tie_frac"] = float(tie_frac)
            profile["flood_tie_frac_scope"] = "filtered"
            if unc_count >= 0:
                profile["flood_uncertain_frac"] = (
                    unc_count / n_mask if n_mask else 0.0
                )
        if unc_count < 0:
            # tie-density early exit: the certificate never ran — the
            # device program cost ~one probe pass-set (bounds the exact
            # mode's worst case; ops/flood_exact.TIE_PROBE_DEFAULT)
            if profile is not None:
                profile["flood_exact_path"] = "fallback:tie-density"
            return take_speculative() if spec is not None else None
        if not bool(resolved):
            if profile is not None:
                profile["flood_exact_path"] = "fallback:unresolved"
            return take_speculative() if spec is not None else None
        if profile is not None:
            profile["flood_exact_path"] = (
                "certified" if unc_count == 0 else "repaired"
            )
        t0 = tick("device_flood", t0)
        labels = np.asarray(lab_dev).astype(np.int32)
        tick("download_labels", t0)
        if spec is not None:
            # certified/repaired: the speculative flood's labels are
            # proven equal — join for hygiene, keep the device result
            t0 = _time.perf_counter()
            _unused, sprof = spec.join()
            if profile is not None:
                profile["flood_spec_waited"] = (
                    _time.perf_counter() - t0
                )
        if out is not None:
            output = out
            output[:] = 0
            view = output.reshape(pshape)[1:-1, 1:-1, 1:-1]
            view[:] = labels[1:-1, 1:-1, 1:-1]
            return view
        return labels[1:-1, 1:-1, 1:-1].copy()

    # ------------------------------------------------------------------

    def segment_stack(self, stack, output_labels, skip_labelled=True,
                      profile=None, devices=None):
        """Pipelined 4D (t, z, y, x) segmentation.

        Frame t+1's device program is dispatched (JAX async) before frame
        t's host postprocessing/flood runs, so device compute and the
        sequential host flood overlap — the TPU never waits for the heap.
        Writes into ``output_labels[t]`` and yields t (warm-restart
        semantics like ``segmentation_loop`` when ``skip_labelled``).

        ``devices``: optional list of jax devices for **frame parallelism**
        — frames are round-robined across chips by input placement (a
        committed input runs the compiled program on its own device), with
        the dispatch lookahead widened to keep every chip busy; results are
        identical to single-device execution. This is the pod-scale frame
        decomposition the reference's serial loop implies (SURVEY §2.4).

        Frames that trigger zero-slice removal (shape change) stay in the
        pipeline but compile a per-shape feature program on first sight
        (~seconds each) — ragged stacks pay that once per distinct shape.
        """
        from ..core.volume import restore_labels

        def dispatch_one(t, device):
            raw = np.asarray(stack[t])
            vol, kept, dev_norm = _prepare_frame(raw)
            outs = self._device_outputs(  # async
                vol, device=device, normalize=True if dev_norm else None,
            )
            return (vol.shape, outs, kept, raw.shape)

        def finalize_one(job):
            zyx, outs, kept, orig_shape = job
            labels = self._finalize(zyx, outs, profile=profile)
            return restore_labels(labels, kept, orig_shape)

        yield from _drive_stack(stack, output_labels, skip_labelled,
                                devices, dispatch_one, finalize_one)

    def segment(self, volume, out=None, profile=None):
        """Instance labels for one prepared (normalised) zyx volume.

        Returns int32 labels of ``volume.shape`` (padding cropped), as
        ``segment_output_image`` does on the generic path.
        """
        import time as _time

        # integer volumes upload as-is (half/quarter the bytes) and convert
        # + normalise on device; float volumes upload as f32. 64-bit ints
        # are excluded: jax canonicalises them to 32 bits with wraparound
        volume = np.asarray(volume)
        if (np.issubdtype(volume.dtype, np.integer)
                and volume.dtype.itemsize <= 4):
            volume = np.ascontiguousarray(volume)
        else:
            volume = np.ascontiguousarray(volume, dtype=np.float32)
        zyx = volume.shape

        t0 = _time.perf_counter()
        outs = self._device_outputs(volume)
        # fence by CONSUMING bytes (the 4-byte n_cand scalar): through a
        # tunnel, block_until_ready acks before execution finishes and
        # would report dispatch rate, not compute (CLAUDE.md) — all
        # outputs come from the one executable, so reading any of them
        # waits for the whole program
        np.asarray(outs[3])
        if profile is not None:
            profile["device_program"] = profile.get(
                "device_program", 0.0
            ) + (_time.perf_counter() - t0)
        return self._finalize(zyx, outs, out=out, profile=profile)

    def _finalize(self, zyx, outs, out=None, profile=None):
        """Host half: unpack mask, spacing, size filter, masked affinity
        gather, exact flood.

        Transfer/compute overlap: affinities are gathered at the
        PRE-size-filter mask (a superset of the filtered mask — the flood
        only ever reads values at in-mask voxels, so the extra entries are
        never consumed) and that download runs async underneath the host
        spacing + size-filter work instead of after it.
        """
        import time as _time

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        aff_pad, mask_packed, order, n_cand, thresh, cent_smooth = outs
        t0 = _time.perf_counter()
        nvox = int(np.prod(zyx))
        n_cand = int(n_cand)
        overflow = n_cand > self.cand_capacity
        order_small = None
        if not overflow:
            # ship only the live prefix of the candidate ranking (the
            # capacity buffer is 1 MB; n_cand is typically ~1e4)
            cap = _pow2_cap(n_cand, 8)
            cap = min(cap, self.cand_capacity)
            order_small = self._slice_fn(cap)(order)
            try:
                order_small.copy_to_host_async()
            except AttributeError:
                pass
        # stay uint8 until after the native filter (bool<->uint8 round
        # trips each copy 17 MB on 256^3)
        mask_u8 = np.unpackbits(np.asarray(mask_packed))[:nvox].reshape(zyx)
        mask_pad = np.pad(mask_u8, 1)
        t0 = tick("download_mask_cands", t0)

        probe_dev = None
        if self.device_flood == "exact":
            # async tie-density probe on the device-resident outputs
            # (zero upload): its scalar decides certificate-vs-fallback
            # after the host filter work it hides under
            probe_dev = _cached_tie_probe(mask_pad.shape)(
                mask_packed, aff_pad
            )
        if not self.device_flood or self.device_flood == "exact":
            # dispatch the affinity gather at the pre-filter mask and let
            # the D2H copy run while the host does spacing + size
            # filtering (in exact mode the gather doubles as the
            # fallback's input, so its download hides under the host
            # work exactly as on the default path — the certified case
            # pays one unused download, overlapped with the certificate)
            pre_idx, m, capacity, idx_up, vals_dev = self._dispatch_gather(
                aff_pad, mask_pad
            )
            t0 = tick("gather_dispatch", t0)

        if overflow:
            # overflow fallback: exact host peak path
            from ..ops.peaks import peak_local_max

            cand_coords = peak_local_max(np.asarray(cent_smooth),
                                         threshold_abs=0.04)
        else:
            idx_sorted = np.asarray(order_small)[:n_cand]
            cand_coords = np.stack(
                np.unravel_index(idx_sorted, zyx), axis=1
            )

        from ..ops.peaks import _ensure_spacing

        cand_coords = _ensure_spacing(cand_coords, spacing=1)
        centroids = cand_coords + 1  # account for padding
        t0 = tick("host_spacing", t0)
        try:
            mask_pad = native.band_filter_cc6(mask_pad, 10, 10000000)
            # keeping a centroid iff it lies in a surviving object ==
            # the reference's centroid_labels > 0 check
            if len(centroids):
                centroids = centroids[mask_pad[tuple(centroids.T)]]
        except native.NativeUnavailable:
            mask_pad, centroids = size_band_filter(
                mask_pad.view(np.bool_), centroids,
                min_area=10, max_area=10000000,
            )
        t0 = tick("host_mask_filter", t0)

        if self.device_flood:
            if len(centroids):
                if self.device_flood == "exact":
                    labels = self._flood_exact(
                        aff_pad, mask_pad, centroids, out=out,
                        profile=profile,
                        pre_tie_frac=(float(probe_dev)
                                      if probe_dev is not None else None),
                        gather=((pre_idx, m, vals_dev)
                                if self.speculative_flood else None),
                    )
                else:
                    labels = self._flood_on_device(
                        aff_pad, mask_pad, centroids, out=out,
                        profile=profile
                    )
                if labels is not None:
                    return labels
                # fallback: the wavefront flood did not converge within
                # max_iters, or the exact mode's pre-dispatch tie probe
                # routed straight to the host flood — in exact mode the
                # gather is already downloading from the early dispatch
                # (the post-dispatch exact fallbacks return speculative
                # labels above and never reach here)
            if self.device_flood != "exact":
                pre_idx, m, capacity, idx_up, vals_dev = (
                    self._dispatch_gather(aff_pad, mask_pad)
                )
                t0 = tick("gather_dispatch", t0)

        return self._host_flood(pre_idx, m, vals_dev, mask_pad,
                                centroids, out=out, profile=profile)

    def _host_flood(self, pre_idx, m, vals_dev, mask_pad, centroids,
                    out=None, profile=None):
        """The exact host-heap half: download the masked affinity
        gather, scatter into the reused host buffer, seed the markers
        and run the C++ priority flood (pure-python oracle fallback).
        Returns cropped int32 labels.  Also runs as the SPECULATIVE body
        ``_flood_exact`` overlaps under the certificate fence (then with
        ``out=None``: the caller copies into ``out`` after the join)."""
        import time as _time

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t0 = _time.perf_counter()
        vals = np.asarray(vals_dev)[:, :m]
        t0 = tick("gather_affinities", t0)

        pshape = mask_pad.shape
        # reused scatter buffer: every index the flood reads (in-mask voxels
        # of THIS call) is freshly written below, so stale values from a
        # previous frame are never consumed — skipping the 200 MB memset
        if self._aff_host[0] != pshape:
            self._aff_host = (
                pshape, np.empty((3, mask_pad.size), np.float32)
            )
        aff_host = self._aff_host[1]
        aff_host[:, pre_idx] = vals
        offsets, axes = neighbor_offsets(pshape)
        n_half = len(offsets) // 2
        val_off = offsets.copy()
        val_off[:n_half] = 0
        if out is None:
            output = np.zeros(mask_pad.size, np.int32)
        else:
            output = out
            output[:] = 0
        if len(centroids):
            markers = np.ravel_multi_index(tuple(centroids.T), pshape)
            output[markers] = np.arange(len(markers), dtype=np.int32) + 1
            try:
                native.priority_flood(
                    aff_host, offsets, axes, val_off,
                    markers.astype(np.int64),
                    np.zeros(len(markers), np.float32),
                    mask_pad.ravel(), output,
                )
            except native.NativeUnavailable:
                # no compiler on this host: exact pure-python oracle, the
                # same fallback ops/watershed.affinity_watershed takes
                from ..ops import watershed_oracle as oracle

                output[:] = 0
                oracle.affinity_flood_py(
                    aff_host.reshape((3,) + pshape), centroids,
                    mask_pad.view(np.bool_), output=output,
                )
        t0 = tick("flood", t0)
        labels = output.reshape(pshape)[1:-1, 1:-1, 1:-1]
        return labels


class DoGPipeline:
    """Device-resident DoG blob segmentation (transfer-minimal twin of
    ``dog_blob_watershed_for_chunks``).

    One jitted program computes, on the padded volume: the DoG threshold
    mask (bit-packed for download), the blob_dog scale-space peak
    candidates (pre-sorted, capacity-capped), and the exact min-plus
    SQUARED EDT — which stays device-resident and is shipped to the host
    flood through a masked gather only (flood priorities are only read at
    masked voxels). Squared distances are exact integers, so the host-side
    float64 sqrt reproduces scipy's EDT bit-for-bit: labels are exactly
    equal to the host path (tested).
    """

    @staticmethod
    def normalize_device_flood(value):
        """Canonical form of a ``device_flood`` setting (False/"xla"/
        "pallas"). Cache keys must use this, or ``True`` and its resolved
        kernel name would materialise duplicate device programs.

        ``True`` is bandwidth-adaptive on a real TPU, exactly as for
        ``AffinityPipeline``: above the measured link crossover it
        resolves to the Pallas image kernel, below it to the exact host
        flood (the label download costs more than the host flood it
        replaces — benchmarks/RESULTS.md)."""
        if value is True:
            if jax.default_backend() == "tpu":
                from .linkprobe import MEASURED, measure_link_mbps

                mbps = measure_link_mbps()
                value = (
                    "pallas"
                    if mbps is not None
                    and mbps >= MEASURED["device_flood_crossover_mbps"]
                    else False
                )
            else:
                value = "xla"
        value = value or False
        assert value in (False, "xla", "pallas", "exact"), value
        return value

    def __init__(self, min_sigma=1, max_sigma=1.5, threshold=0.02,
                 sigma_ratio=1.6, cand_capacity: int = _CAND_CAP,
                 device_flood=False):
        self.min_sigma = float(min_sigma)
        self.max_sigma = float(max_sigma)
        self.threshold = float(threshold)
        self.sigma_ratio = float(sigma_ratio)
        self.cand_capacity = cand_capacity
        # opt-in approximate on-device EDT watershed — the Pallas
        # Gauss-Seidel image kernel (ops/pallas_flood) on a real TPU, the
        # XLA recurrence (ops/device_flood) elsewhere; "pallas"/"xla"
        # force a kernel (volumes over the Pallas VMEM budget reroute to
        # XLA with a warning, see _finalize). The default stays the exact
        # host flood: bit-matching labels are the parity contract, and
        # the wire cost inverts only on >=PCIe links (see
        # benchmarks/RESULTS.md, watershed engineering curve).
        self.device_flood = self.normalize_device_flood(device_flood)
        k = int(np.log(self.max_sigma / self.min_sigma)
                / np.log(self.sigma_ratio) + 1)
        self.sigma_list = np.array(
            [self.min_sigma * self.sigma_ratio**i for i in range(k + 1)]
        )
        self._programs = {}

    def _build_program(self, zyx, normalize=False):
        """zyx: the unpadded frame shape; all outputs live on zyx+2.

        ``normalize``: divide by the volume max on device — the device
        twin of ``prepare_volume``'s host ``/ max`` (integer -> f32 is
        exact, max is exact selection, the division is the same f32 op:
        bit-identical), letting integer frames ship in their source dtype
        (u16 halves the bytes of f32)."""
        thr = self.threshold
        smin, smax = self.min_sigma, self.max_sigma
        sigma_list = self.sigma_list
        sf = 1.0 / (self.sigma_ratio - 1.0)
        K = self.cand_capacity

        def program(vol):
            vol = vol.astype(jnp.float32)
            if normalize:
                vol = vol / jnp.max(vol)
            vol_pad = jnp.pad(vol, 1)
            # threshold mask from the classic DoG image
            # (segmentation.py:635-637)
            dog = gaussian(vol_pad, smin) - gaussian(vol_pad, smax)
            mask_packed = _pack_mask_bits(dog > thr)
            # blob_dog scale space (ops/blob.py semantics)
            gs = [gaussian(vol_pad, float(s)) for s in sigma_list]
            cube = jnp.stack(
                [(gs[i] - gs[i + 1]) * sf for i in range(len(gs) - 1)],
                axis=-1,
            )
            cand = cube == maximum_filter(cube, 3, mode="nearest")
            cand = cand & (cube > thr)
            scores = jnp.where(cand, -cube, jnp.inf).ravel()
            order = jnp.argsort(scores)[:K].astype(jnp.int32)
            n_cand = jnp.sum(cand).astype(jnp.int32)
            # exact SQUARED EDT of the padded volume's nonzero support
            # (segmentation.py:640); integers, so exact in f32 — the host
            # takes the f64 sqrt, matching scipy's f64 EDT bitwise
            from ..ops.edt import edt_sq

            dist_sq = edt_sq(vol_pad != 0)
            # cube ships as an output ONLY for the candidate-overflow
            # fallback (n_cand > capacity): it stays device-resident and
            # is downloaded just on that rare path
            return mask_packed, order, n_cand, dist_sq, cube

        return jax.jit(program)

    def _gather_fn(self, capacity):
        return _cached_gather("flat", capacity)

    def _device_outputs(self, volume, device=None, normalize=False):
        """Dispatch the DoG program (async, no host sync). ``device``
        places the input (and hence the computation) on a specific chip
        for frame parallelism; ``normalize`` runs ``/ max`` on device
        (callers then skip host normalisation and may pass integer
        volumes in their source dtype)."""
        volume = np.asarray(volume)
        if not (normalize and np.issubdtype(volume.dtype, np.integer)
                and volume.dtype.itemsize <= 4):
            volume = np.ascontiguousarray(volume, dtype=np.float32)
        else:
            volume = np.ascontiguousarray(volume)
        zyx = volume.shape
        key = (zyx, self.min_sigma, self.max_sigma, self.threshold,
               self.sigma_ratio, self.cand_capacity, bool(normalize))
        if key not in _DOG_PROGRAM_CACHE:
            _DOG_PROGRAM_CACHE[key] = self._build_program(
                zyx, normalize=normalize
            )
        x = (jnp.asarray(volume) if device is None
             else jax.device_put(volume, device))
        outs = _DOG_PROGRAM_CACHE[key](x)
        for a in (outs[0], outs[2]):  # mask_packed, n_cand
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return outs

    def segment(self, volume, out=None, profile=None, normalize=False):
        """Labels of shape volume.shape + 2 (the padded frame, matching the
        reference's ``current_output`` contract for the DoG path).

        ``normalize``: run the ``/ max`` on device — integer volumes then
        ship in their source dtype (u16 halves the f32 wire bytes;
        bit-identical, see ``_build_program``)."""
        import time as _time

        volume = np.asarray(volume)
        if not (normalize and np.issubdtype(volume.dtype, np.integer)
                and volume.dtype.itemsize <= 4):
            volume = np.ascontiguousarray(volume, dtype=np.float32)
        zyx = volume.shape
        t0 = _time.perf_counter()
        outs = self._device_outputs(volume, normalize=normalize)
        # fence by consuming the 4-byte n_cand scalar (block_until_ready
        # acks before execution finishes through a tunnel — CLAUDE.md)
        np.asarray(outs[2])
        if profile is not None:
            profile["device_program"] = profile.get(
                "device_program", 0.0
            ) + (_time.perf_counter() - t0)
        return self._finalize(zyx, outs, out=out, profile=profile)

    def segment_stack(self, stack, output_labels, skip_labelled=True,
                      profile=None, devices=None):
        """Pipelined 4D (t, z, y, x) DoG segmentation — the DoG twin of
        ``AffinityPipeline.segment_stack``: frame t+1's device program
        (scale space, mask, candidates, EDT) is dispatched before frame
        t's host half (blob pruning + flood) runs, and ``devices`` round-
        robins frames across chips by input placement. Writes CROPPED
        labels into ``output_labels[t]`` (the ``segment_single_volume``
        contract) and yields t; warm-restart skips labelled frames."""
        from ..core.volume import restore_labels

        def dispatch_one(t, device):
            raw = np.asarray(stack[t])
            vol, kept, dev_norm = _prepare_frame(raw)
            outs = self._device_outputs(  # async
                vol, device=device, normalize=dev_norm,
            )
            return (vol.shape, outs, kept, raw.shape)

        def finalize_one(job):
            zyx, outs, kept, orig_shape = job
            padded = self._finalize(zyx, outs, profile=profile)
            return restore_labels(
                padded[1:-1, 1:-1, 1:-1], kept, orig_shape
            )

        yield from _drive_stack(stack, output_labels, skip_labelled,
                                devices, dispatch_one, finalize_one)

    def _flood_exact(self, mask_packed, dist_sq, cs, ls, scap, n_ids,
                     pshape, profile=None):
        """``device_flood="exact"`` for the DoG path: the verified exact
        IMAGE flood on the device-resident ``-d²`` landscape
        (``_cached_dog_exact_flood`` explains the ``-d²`` choice and the
        sqrt-collision bound).  Returns int32 labels of ``pshape``
        BIT-EQUAL to the default host flood, or ``None`` to fall back
        (unresolved ambiguity / past the collision bound)."""
        import time as _time

        from .. import native

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t0 = _time.perf_counter()
        lab_dev, resolved, unc_count, n_mask, tie_frac, max_key = (
            _cached_dog_exact_flood(pshape, scap, wide=n_ids >= 2 ** 16)(
                mask_packed, dist_sq, jnp.asarray(cs), jnp.asarray(ls)
            )
        )
        try:
            lab_dev.copy_to_host_async()
        except AttributeError:
            pass
        unc_count, n_mask = int(unc_count), int(n_mask)  # fences
        if profile is not None:
            profile["flood_tie_frac"] = float(tie_frac)
            profile["flood_tie_frac_scope"] = "filtered"
            if unc_count >= 0:
                profile["flood_uncertain_frac"] = (
                    unc_count / n_mask if n_mask else 0.0
                )
        if unc_count < 0:
            # tie-density early exit (see the affinity twin)
            if profile is not None:
                profile["flood_exact_path"] = "fallback:tie-density"
            return None
        if int(max_key) >= native.BUCKET_FLOOD_MAX_KEY:
            # past this bound distinct d² can collide in the f32 -sqrt
            # priorities the production flood uses, so the -d² flood is
            # no longer provably order-equal — take the host path
            # (which handles the collision regime with the exact heap)
            if profile is not None:
                profile["flood_exact_path"] = "fallback:sqrt-collision"
            return None
        if not bool(resolved):
            if profile is not None:
                profile["flood_exact_path"] = "fallback:unresolved"
            return None
        if profile is not None:
            profile["flood_exact_path"] = (
                "certified" if unc_count == 0 else "repaired"
            )
        t0 = tick("device_flood", t0)
        labels = np.asarray(lab_dev).astype(np.int32)
        tick("download_labels", t0)
        return labels

    def _finalize(self, zyx, outs, out=None, profile=None):
        """Host half: blob pruning + seeded flood on the EDT landscape."""
        import time as _time

        from ..ops.blob import _prune_blobs
        from ..ops.peaks import _ensure_spacing

        def tick(name, t0):
            if profile is not None:
                profile[name] = profile.get(name, 0.0) + (
                    _time.perf_counter() - t0
                )
            return _time.perf_counter()

        mask_packed, order, n_cand, dist_sq, cube = outs
        t0 = _time.perf_counter()
        pshape = tuple(s + 2 for s in zyx)
        nvox = int(np.prod(pshape))
        if self.device_flood:
            # the flood mask stays device-resident (the device flood
            # reads the packed bits directly); unpack on host only on
            # the non-convergence fallback below
            mask = None
        else:
            mask = np.unpackbits(np.asarray(mask_packed))[:nvox].view(
                np.bool_
            ).reshape(pshape)
        n_cand = int(n_cand)
        k = len(self.sigma_list) - 1
        cube_shape = pshape + (k,)
        if n_cand > self.cand_capacity:
            # overflow fallback (exactness over speed, mirroring the
            # affinity pipeline's host peak path): the ranking past the
            # capacity was dropped on device, so recompute the full
            # candidate order on host from the downloaded cube — same
            # stable argsort of the same f32 scores
            from scipy.ndimage import maximum_filter as ndi_max

            cube_np = np.asarray(cube)
            cand = (cube_np == ndi_max(cube_np, size=3, mode="nearest"))
            cand &= cube_np > self.threshold
            scores = np.where(cand, -cube_np, np.inf).ravel()
            idx_sorted = np.argsort(scores, kind="stable")[:n_cand]
        else:
            # pow2-capped cached slice: an eager `order[:n_cand]` would
            # compile a new slice executable for every distinct candidate
            # count (one per frame on real 4D stacks)
            live = min(n_cand, self.cand_capacity)
            cap = _pow2_cap(live, 8)
            cap = min(cap, self.cand_capacity)
            idx_sorted = np.asarray(_cached_slice(cap)(order))[:live]
        coords4 = np.stack(np.unravel_index(idx_sorted, cube_shape), axis=1)
        t0 = tick("download", t0)

        def dispatch_gather(mask):
            """Masked EDT gather (the host flood only reads distances at
            masked voxels); its D2H copy runs underneath the host blob
            pruning when dispatched eagerly."""
            mask_w = np.pad(mask, 1, constant_values=False)
            masked_idx = np.flatnonzero(mask_w.ravel()).astype(np.int32)
            m = len(masked_idx)
            capacity = _pick_capacity("flat", m, mask_w.size)
            # map flood-frame indices back to device (pshape) indices
            wshape = mask_w.shape
            c = np.stack(np.unravel_index(masked_idx, wshape), axis=1) - 1
            dev_idx = np.ravel_multi_index(
                tuple(c.T), pshape
            ).astype(np.int32)
            idx_up = np.zeros(capacity, np.int32)
            idx_up[:m] = dev_idx
            vals_dev = self._gather_fn(capacity)(
                dist_sq, jnp.asarray(idx_up)
            )
            try:
                vals_dev.copy_to_host_async()
            except AttributeError:
                pass
            return mask_w, masked_idx, m, vals_dev

        if mask is not None:
            mask_w, masked_idx, m, vals_dev = dispatch_gather(mask)
            t0 = tick("gather_dispatch", t0)

        coords4 = _ensure_spacing(coords4, spacing=1)
        lm = coords4.astype(np.float64)
        sigmas = self.sigma_list[coords4[:, -1]][:, None]
        blobs = np.hstack([lm[:, :-1], sigmas])
        blobs = _prune_blobs(blobs, 0.5, sigma_dim=1)
        centroids = np.zeros(pshape, dtype=bool)
        if len(blobs):
            idx = tuple(blobs.T.astype(int))[:-1]
            centroids[idx] = True
        from ..ops.cc import label_np

        markers, _ = label_np(centroids)
        t0 = tick("host_blobs", t0)

        if self.device_flood:
            # on-device EDT watershed: seeds upload (tiny), wire-dtype
            # labels download; exact host fallback on non-convergence
            # (or tie-sensitivity in "exact" mode). Opt-in — see
            # __init__.
            n_ids = int(markers.max())
            coords = np.argwhere(markers > 0).astype(np.int32)
            labs = markers[tuple(coords.T)].astype(np.int32)
            kk = len(coords)
            scap = _pow2_cap(kk, 6)
            cs = np.zeros((scap, 3), np.int32)
            ls = np.zeros(scap, np.int32)
            cs[:kk] = coords
            ls[:kk] = labs
            labels = None
            if self.device_flood == "exact":
                labels = self._flood_exact(
                    mask_packed, dist_sq, cs, ls, scap, n_ids, pshape,
                    profile=profile,
                )
                conv = labels is not None
            else:
                from ..ops.pallas_flood import fits_vmem

                # the Pallas kernel never tiles x: wide-X volumes
                # overflow its VMEM scratch and would fail the Mosaic
                # compile, so they take the XLA recurrence instead of
                # aborting (labels differ between the kernels at
                # schedule-dependent tie races, so a forced-"pallas"
                # caller must hear about it)
                kernel = self.device_flood
                if kernel == "pallas" and not fits_vmem(pshape):
                    import warnings

                    warnings.warn(
                        f"device_flood='pallas': padded volume {pshape} "
                        "exceeds the Pallas kernel's VMEM budget "
                        "(fits_vmem); using the XLA recurrence instead",
                        RuntimeWarning, stacklevel=3,
                    )
                    kernel = "xla"
                lab_dev, conv = _cached_dog_flood(
                    pshape, scap, wide=n_ids >= 2 ** 16, kernel=kernel
                )(mask_packed, dist_sq, jnp.asarray(cs), jnp.asarray(ls))
                try:
                    lab_dev.copy_to_host_async()
                except AttributeError:
                    pass
                if bool(conv):  # blocks on the flood; D2H runs behind
                    labels = np.asarray(lab_dev).astype(np.int32)
            if labels is not None:
                t0 = tick("device_flood", t0)
                if out is not None:
                    out[...] = labels
                return labels
            t0 = tick("device_flood", t0)
            # fall back to the exact host flood: unpack the mask and run
            # the gather synchronously (the rare path pays the latency)
            mask = np.unpackbits(np.asarray(mask_packed))[:nvox].view(
                np.bool_
            ).reshape(pshape)
            mask_w, masked_idx, m, vals_dev = dispatch_gather(mask)

        # padded markers: only the host-flood paths read these (the
        # converged device flood above returns without them)
        markers_w = np.pad(markers, 1, constant_values=0)
        vals_sq = np.asarray(vals_dev)[:m]
        t0 = tick("gather_distance", t0)

        # flood priorities are -sqrt of the exact integer SQUARED
        # distances: below 2^22, distinct d^2 always map to distinct f32
        # priorities (adjacent sqrt gaps exceed the f32 ulp — see
        # ``native.BUCKET_FLOOD_MAX_KEY``), so bucketing by d^2 reproduces
        # the heap's (value, age, index) order exactly — the bucket flood
        # is ~10x the heap on dense EDT masks (oracle-equality tested in
        # tests/test_watershed.py). Past the bound (axis-aligned distances
        # over ~1180 voxels) sqrt priorities can collide, where the heap
        # tie-breaks by age — fall back to the exact heap there.
        wshape = mask_w.shape
        output = np.where(mask_w, markers_w, 0).astype(np.int32).ravel()
        marker_locations = np.flatnonzero(output).astype(np.int64)
        offsets, _ = neighbor_offsets(wshape)
        max_key = int(vals_sq.max()) if m else 0
        try:
            if max_key < native.BUCKET_FLOOD_MAX_KEY:
                keys = np.zeros(mask_w.size, np.int32)
                keys[masked_idx] = vals_sq.astype(np.int32)
                native.bucket_flood_image(
                    keys, offsets, marker_locations, mask_w.ravel(), output,
                )
            else:
                # the f32 cast of the f64 sqrt matches the host path
                # (image_watershed casts the -EDT image to f32)
                prio = np.zeros(mask_w.size, np.float32)
                prio[masked_idx] = (
                    -np.sqrt(vals_sq.astype(np.float64))
                ).astype(np.float32)
                val_chan = np.zeros(len(offsets), dtype=np.int64)
                native.priority_flood(
                    prio[None], offsets, val_chan, offsets,
                    marker_locations, prio[marker_locations],
                    mask_w.ravel(), output,
                )
        except native.NativeUnavailable:
            # no compiler on this host: exact pure-python heap oracle
            # (the same fallback ops/watershed.image_watershed takes)
            from ..ops import watershed_oracle as oracle

            prio = np.zeros(mask_w.size, np.float32)
            prio[masked_idx] = (
                -np.sqrt(vals_sq.astype(np.float64))
            ).astype(np.float32)
            inner = (slice(1, -1),) * 3
            labels_p = oracle.image_flood_py(
                prio.reshape(wshape)[inner], markers, mask,
            )
            output = np.pad(labels_p, 1).astype(np.int32).ravel()
        t0 = tick("flood", t0)
        labels = output.reshape(wshape)[1:-1, 1:-1, 1:-1]
        if out is not None:
            out[...] = labels
        return labels
