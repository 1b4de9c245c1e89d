"""On-device wavefront affinity flood — the XLA (Jacobi) reference
implementation; ``ops/pallas_flood.py`` is the production Pallas kernel
running the same claim recurrence ~3.5x faster via VMEM-resident
tile iterations and Gauss-Seidel sweeps (this module stays as the
schedule-independent-ish baseline and the easier-to-read spec).

The production affinity watershed is an exact sequential priority flood
(reference ``watershed.py:95-159``: a min-heap of ``(value, age, index)``
with claim-at-push), which the framework runs as native C++ on host,
overlapped with device compute (see PARITY.md "watershed" — on this
machine's ~35-50 MB/s host link, shipping the label volume back costs
more than the whole host half).  This module is the *engineering curve*
behind that design decision: a data-parallel on-device flood whose run
time and oracle agreement, combined with the measured link bandwidth,
locate the cross-over point where on-device wins (pod-class hosts with
GB/s PCIe — see ``benchmarks/watershed_crossover.py``).

Algorithm: iterative label propagation over the 6-connected affinity
graph.  Per iteration each masked voxel looks at its 6 face neighbours
(shifted arrays — XLA fuses the whole update into ~one HBM pass) and
adopts a (distance, label) pair according to one of two update rules:

- ``mode="minimax"``: ``d(u) = min over v of max(d(v), w(u,v))`` — the
  classic parallel watershed recurrence (claim-at-pop semantics).  The
  map is monotone in ``(d, preference)`` so convergence is guaranteed;
  it reproduces the heap flood wherever minimax paths are unique, but
  systematically differs from the reference's claim-at-push rule.
- ``mode="claim"``: approximates the reference's claim-at-push rule.
  In the sequential flood every voxel is claimed exactly once, by the
  *first neighbour to pop*; a voxel's pop moment is bounded below by
  its claimant's pop and by its own pushed key, so pop order is
  approximated by the chain-max virtual time
  ``V(u) = max(V(claimant), w(claimant, u))``.  Each voxel therefore
  adopts the label of the neighbour with the smallest ``(V, raveled
  index)`` — crucially the *edge weight does not enter the claimant
  choice* (that is the observable difference from claim-at-pop /
  minimax) — and updates its own ``V`` through the chosen edge.  The
  heap's global *age* tie-break is unknowable in parallel and stands in
  as the raveled index.  To guarantee convergence each voxel remembers
  the claimant key ``(V_v, idx_v)`` it was last claimed with and only
  re-claims when a *strictly smaller* key appears (label-correcting):
  the per-voxel key is lexicographically non-increasing over a finite
  value set, so the synchronous update terminates, and being
  synchronous it is deterministic.  ``max_iters`` still caps the loop
  with a convergence flag returned.

Edge weights: the affinity crossed between ``p`` and ``p + ê_a`` is
``aff[a, p + ê_a]`` for *both* crossing directions (derived from the
oracle's ``aff_off`` table: 0 for negative directions, ``+stride`` for
positive), i.e. weights are symmetric and stored at the higher index.

Exactness status: the heap's pop order is not monotone in the key (raw
edge affinities are pushed, so a late small-key push can pop before an
early large-key one) — an exact parallel simulation would have to
reproduce heap *time*, which is inherently sequential.  Both modes here
are approximations; ``tests/test_device_flood.py`` pins their measured
agreement and the properties that do hold exactly (seeded components,
mask closure, label validity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "wavefront_affinity_flood",
    "wavefront_flood_jit",
    "wavefront_image_flood",
    "wavefront_image_flood_jit",
]

_BIG = jnp.float32(np.inf)


def _shift(x, axis, delta, fill):
    """x shifted by ``delta`` (+1: neighbour at index-1 ...) with fill."""
    n = x.shape[axis]
    if delta == 1:
        sl = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis), fill)
        return jnp.concatenate([pad, sl], axis=axis)
    sl = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis), fill)
    return jnp.concatenate([sl, pad], axis=axis)


def _flood_core(weights, seeds, mask, mode, max_iters, check_every,
                seed_values=0.0, hop_ties=False):
    """Shared recurrence over a per-direction edge-weight list.

    ``weights``: 2*ndim arrays in footprint raster order (z-, y-, x-,
    x+, y+, z+); ``weights[k][u]`` is the weight entering voxel ``u``
    when claimed from direction ``k`` — affinity floods pass the crossed
    affinity, image floods pass the (direction-independent) image value
    at ``u`` itself, which is exactly skimage's node-keyed heap rule.

    ``seed_values``: the seeds' own heap priority (their virtual pop
    time). The affinity heap pushes markers at 0 (its keys are >= 0);
    the image heap pushes markers with their own image value — with
    values <= 0 (the -EDT landscape) a 0 init would saturate every
    chain-max and collapse all tie-breaking to raw index order.

    ``hop_ties`` (claim mode): refine the claimant tie-break with a hop
    count that resets whenever the virtual time strictly rises — on an
    equal-value plateau the heap's FIFO age order is BFS from the
    plateau's entry fronts, which the hop count tracks and a raw index
    tie-break does not. Kept OFF for the affinity flood, whose claim
    rule must stay identical to the Pallas kernel's.
    """
    mask = mask.astype(bool)
    shape = mask.shape
    ndim = len(shape)

    idx = jnp.arange(mask.size, dtype=jnp.int32).reshape(shape)
    seeded = seeds > 0
    d0 = jnp.where(seeded, jnp.asarray(seed_values, jnp.float32), _BIG)
    d0 = jnp.where(mask, d0, _BIG)
    lab0 = jnp.where(mask, seeds, 0).astype(jnp.int32)

    def neighbours(d, lab):
        """Yield (d_v, lab_v, w_uv, idx_v) for the 6 face neighbours, in
        the footprint raster order (z-, y-, x-, x+, y+, z+)."""
        out = []
        # negative directions: v = u - ê_a
        for a in range(ndim):
            out.append((
                _shift(d, a, 1, _BIG),
                _shift(lab, a, 1, 0),
                weights[a],
                _shift(idx, a, 1, jnp.int32(0)),
            ))
        # positive directions: v = u + ê_a
        for k, a in enumerate(reversed(range(ndim))):
            out.append((
                _shift(d, a, -1, _BIG),
                _shift(lab, a, -1, 0),
                weights[ndim + k],
                _shift(idx, a, -1, jnp.int32(0)),
            ))
        return out

    frozen = seeded | ~mask

    if mode == "minimax":
        def step(state):
            d, lab, it, _ = state
            best_d, best_lab = d, lab
            for d_v, lab_v, w, _i in neighbours(d, lab):
                cand = jnp.maximum(d_v, w)
                take = cand < best_d
                best_d = jnp.where(take, cand, best_d)
                best_lab = jnp.where(take, lab_v, best_lab)
            d_new = jnp.where(frozen, d0, best_d)
            lab_new = jnp.where(frozen, lab0, best_lab)
            changed = jnp.any((lab_new != lab) | (d_new != d))
            return d_new, lab_new, it + 1, changed

        state0 = (d0, lab0, jnp.int32(0), jnp.bool_(True))
    elif not hop_ties:  # claim-at-push recurrence (see module doc)
        # extra state: the claimant key (ck_d, ck_i) each voxel was last
        # claimed with; a voxel only re-claims on a strictly smaller key,
        # which makes the synchronous update monotone hence convergent
        ck_d0 = jnp.where(frozen & seeded, -_BIG, _BIG)
        ck_i0 = jnp.zeros(shape, jnp.int32)

        def step(state):
            d, lab, ck_d, ck_i, it, _ = state
            best_key_d = jnp.full(shape, _BIG)
            best_key_i = jnp.zeros(shape, jnp.int32)
            best_d, best_lab = d, lab
            best_w = jnp.zeros(shape, jnp.float32)
            for d_v, lab_v, w, idx_v in neighbours(d, lab):
                ok = lab_v > 0
                better = ok & (
                    (d_v < best_key_d)
                    | ((d_v == best_key_d) & (idx_v < best_key_i))
                )
                best_key_d = jnp.where(better, d_v, best_key_d)
                best_key_i = jnp.where(better, idx_v, best_key_i)
                best_w = jnp.where(better, w, best_w)
                best_lab = jnp.where(better, lab_v, best_lab)
            # re-claim only on a strictly smaller claimant key
            claim = (
                (best_key_d < ck_d)
                | ((best_key_d == ck_d) & (best_key_i < ck_i))
            ) & ~frozen
            d_new = jnp.where(
                claim, jnp.maximum(best_key_d, best_w), d
            )
            lab_new = jnp.where(claim, best_lab, lab)
            ck_d_new = jnp.where(claim, best_key_d, ck_d)
            ck_i_new = jnp.where(claim, best_key_i, ck_i)
            changed = jnp.any(claim)
            return d_new, lab_new, ck_d_new, ck_i_new, it + 1, changed

        state0 = (d0, lab0, ck_d0, ck_i0, jnp.int32(0), jnp.bool_(True))
    else:  # claim recurrence with the plateau hop-count tie-break
        # per-voxel state adds h (hops since the virtual time last rose);
        # the claimant key is (V, h, idx) lexicographic. Convergence: a
        # voxel re-claims only on a strictly smaller key over a finite
        # value set, as before.
        ck_d0 = jnp.where(frozen & seeded, -_BIG, _BIG)
        ck_h0 = jnp.zeros(shape, jnp.int32)
        ck_i0 = jnp.zeros(shape, jnp.int32)
        h0 = jnp.zeros(shape, jnp.int32)

        def step(state):
            d, lab, hp, ck_d, ck_h, ck_i, it, _ = state
            best_key_d = jnp.full(shape, _BIG)
            best_key_h = jnp.zeros(shape, jnp.int32)
            best_key_i = jnp.zeros(shape, jnp.int32)
            best_lab = lab
            best_w = jnp.zeros(shape, jnp.float32)
            for (d_v, lab_v, w, idx_v), h_v in zip(
                neighbours(d, lab), hops(hp)
            ):
                ok = lab_v > 0
                better = ok & (
                    (d_v < best_key_d)
                    | ((d_v == best_key_d) & (
                        (h_v < best_key_h)
                        | ((h_v == best_key_h) & (idx_v < best_key_i))
                    ))
                )
                best_key_d = jnp.where(better, d_v, best_key_d)
                best_key_h = jnp.where(better, h_v, best_key_h)
                best_key_i = jnp.where(better, idx_v, best_key_i)
                best_w = jnp.where(better, w, best_w)
                best_lab = jnp.where(better, lab_v, best_lab)
            claim = (
                (best_key_d < ck_d)
                | ((best_key_d == ck_d) & (
                    (best_key_h < ck_h)
                    | ((best_key_h == ck_h) & (best_key_i < ck_i))
                ))
            ) & ~frozen
            d_claim = jnp.maximum(best_key_d, best_w)
            # hop count: +1 within a value plateau, reset on a rise
            h_claim = jnp.where(
                d_claim > best_key_d, jnp.int32(0), best_key_h + 1
            )
            d_new = jnp.where(claim, d_claim, d)
            h_new = jnp.where(claim, h_claim, hp)
            lab_new = jnp.where(claim, best_lab, lab)
            ck_d_new = jnp.where(claim, best_key_d, ck_d)
            ck_h_new = jnp.where(claim, best_key_h, ck_h)
            ck_i_new = jnp.where(claim, best_key_i, ck_i)
            changed = jnp.any(claim)
            return (d_new, lab_new, h_new, ck_d_new, ck_h_new, ck_i_new,
                    it + 1, changed)

        def hops(hp):
            out = [_shift(hp, a, 1, jnp.int32(0)) for a in range(ndim)]
            out += [_shift(hp, a, -1, jnp.int32(0))
                    for a in reversed(range(ndim))]
            return out

        state0 = (d0, lab0, h0, ck_d0, ck_h0, ck_i0, jnp.int32(0),
                  jnp.bool_(True))

    def cond(state):
        return state[-1] & (state[-2] < max_iters)

    def body(state):
        # run ``check_every`` updates per convergence check to amortise
        # the reduction, without overshooting max_iters semantics much
        for _ in range(check_every):
            state = step(state)
        return state

    state = jax.lax.while_loop(cond, body, state0)
    lab, it = state[1], state[-2]
    # one extra step decides convergence exactly
    still = step(state)[-1]
    return lab, it, jnp.logical_not(still)


@functools.partial(
    jax.jit, static_argnames=("mode", "max_iters", "check_every")
)
def wavefront_flood_jit(affinities, seeds, mask, mode="claim",
                        max_iters=512, check_every=8):
    """Jitted affinity-graph core. ``seeds``: int32 label image
    (0 = unseeded). Returns ``(labels, n_iters, converged)``.

    Edge weights follow the oracle's ``aff_off`` table: crossing between
    ``p`` and ``p + ê_a`` reads ``aff[a, p + ê_a]`` in both directions.
    """
    ndim = mask.ndim
    aff = affinities.astype(jnp.float32)
    # weights entering u, per footprint direction (z-, y-, x-, x+, y+, z+):
    # from v = u - ê_a the crossed edge is stored at u (aff[a]); from
    # v = u + ê_a it is stored at v (shift aff[a] down by one along a)
    weights = [aff[a] for a in range(ndim)]
    weights += [_shift(aff[a], a, -1, _BIG) for a in reversed(range(ndim))]
    return _flood_core(weights, seeds, mask, mode, max_iters, check_every)


@functools.partial(
    jax.jit, static_argnames=("mode", "max_iters", "check_every")
)
def wavefront_image_flood_jit(values, seeds, mask, mode="claim",
                              max_iters=512, check_every=8):
    """Jitted image-watershed core: the node-keyed flood of
    ``skimage.segmentation.watershed(values, markers, mask)`` (the
    reference DoG path, segmentation.py:640/646, floods ``values =
    -EDT``). The sequential heap pushes each voxel with its OWN image
    value, so the claim recurrence's edge weight entering ``u`` is
    ``values[u]`` from every direction — direction-independent, which is
    the only difference from the affinity flood. Same approximation
    status as ``wavefront_flood_jit`` (heap age is unknowable in
    parallel); seeded support, mask closure and the label id set are
    exact (tests/test_device_flood.py)."""
    values = values.astype(jnp.float32)
    weights = [values] * (2 * mask.ndim)
    return _flood_core(weights, seeds, mask, mode, max_iters, check_every,
                       seed_values=values, hop_ties=True)


def wavefront_image_flood(values, marker_coords_or_seeds, mask,
                          mode="claim", max_iters=512, check_every=8):
    """NumPy-facing image flood. ``marker_coords_or_seeds``: either an
    (n, ndim) coordinate array (labels 1..n in row order) or a full
    int32 seed image. Returns ``(labels int32, n_iters, converged)``."""
    mask = np.asarray(mask).astype(bool)
    m = np.asarray(marker_coords_or_seeds)
    if m.shape == mask.shape:
        seeds = m.astype(np.int32)
    else:
        seeds = np.zeros(mask.shape, np.int32)
        seeds[tuple(m.T)] = np.arange(1, len(m) + 1, dtype=np.int32)
    lab, it, conv = wavefront_image_flood_jit(
        jnp.asarray(np.asarray(values, dtype=np.float32)),
        jnp.asarray(seeds), jnp.asarray(mask),
        mode=mode, max_iters=max_iters, check_every=check_every,
    )
    return np.asarray(lab), int(it), bool(conv)


def wavefront_affinity_flood(affinities, marker_coords, mask,
                             mode="claim", max_iters=512, check_every=8):
    """NumPy-facing wrapper with the oracle's calling convention
    (``affinity_flood_py``): seeds take labels 1..n in row order, the
    mask border ring must be False (caller pads).

    Returns ``(labels int32, n_iters int, converged bool)``.
    """
    mask = np.asarray(mask).astype(bool)
    shape = mask.shape
    seeds = np.zeros(shape, np.int32)
    mc = np.asarray(marker_coords)
    seeds[tuple(mc.T)] = np.arange(1, len(mc) + 1, dtype=np.int32)
    lab, it, conv = wavefront_flood_jit(
        jnp.asarray(affinities), jnp.asarray(seeds), jnp.asarray(mask),
        mode=mode, max_iters=max_iters, check_every=check_every,
    )
    return np.asarray(lab), int(it), bool(conv)
