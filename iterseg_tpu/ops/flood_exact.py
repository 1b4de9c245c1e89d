"""Hybrid-exact device watershed: certificate + verified repair.

The sequential heap flood (reference ``watershed.py:95-159``; oracle
``ops/watershed_oracle.affinity_flood_py``) claims each voxel from the
*first neighbour to pop*, and pops happen in increasing **virtual time**
``V(u) = max(V(claimer), val(u))`` (``val`` = the raw arc value pushed
with) — so a voxel's label is schedule-independent unless exact f32 ties
make the first-popping neighbour ambiguous.  This module makes that
precise and exploitable:

*Certificate* (device, XLA — sound):

1. ``V_lb``: the minimax distance ``min over paths of max arc`` — a lower
   bound on any schedule's virtual time (phase A; the classic monotone
   recurrence).
2. ``V_ub``: a decreasing fixed point of
   ``V_ub(u) = max over possible claimers v of max(V_ub(v), w(v->u))``
   where ``possible(v, u) = V_lb(v) <= min over nbrs w of V_ub(w)`` — an
   upper bound on any schedule's virtual time (phase B).  Soundness: in
   any schedule the claimer c satisfies ``V(c) = min over nbrs of V``,
   hence ``V_lb(c) <= min V_ub`` — the true claimer is always inside the
   filter, so the max over the filter bounds every schedule.
3. Label propagation (phase C): ``rep`` = a deterministic representative
   label; ``unc(u)`` = OR over possible claimers' ``unc``, OR "possible
   claimers disagree in label".  By induction over any schedule's claim
   order, the schedule's claimer is a possible claimer, so **voxels with
   ``unc == False`` receive the same label under every consistent
   schedule — including the reference heap**.  (Proof sketch: Lemma —
   if ``V(a) < V(b)`` then ``a`` pops first, because ``b``'s chain holds
   a pending entry of value ``V(b)`` that cannot pop while ``a``'s chain
   keeps a pending entry of value ``<= V(a)``.  Hence the claimer
   minimises actual ``V`` over the neighbours, which the interval filter
   contains.)

*Verified repair* (device, XLA): the uncertain region ``R = unc`` is
resolved by running the certificate a SECOND time on the restricted
problem — ``R`` plus its certain labelled boundary ``B``, with the
gates seeded at their ``[v_lb, v_ub]`` release-time intervals.  The
true heap's restricted execution is one consistent schedule of that
restricted process (claims into ``R`` only come from ``B ∪ R`` by the
possible-claimer property), so any ``R`` voxel the restricted
certificate marks CERTAIN is forced — the acceptance is **proven, not
heuristic**, and everything stays in one device program.  Residual
uncertainty means the outcome genuinely depends on the heap's global
FIFO age order (the known age-unknowability of parallel heap
simulation) and the caller falls back to the **full exact host
flood** — bit-exactness holds in every path.  (An earlier dual-schedule
C++ repair valve was replaced after ``benchmarks/exact_flood_fuzz.py``
found a false-accept; docs/exact_flood.md records the episode.)

``exact_affinity_flood`` / ``exact_image_flood`` (the skimage-watershed
heap of the DoG path — same machinery, node-keyed weights and seeds at
their own image value) return labels plus a telemetry dict (uncertain
fraction, tie fraction, path taken) — the per-run fidelity signal the
approximate ``device_flood`` modes lack.  Measured uncertainty: 0–1.1%
on distinct-channel continuous affinities (certified/repaired, no
fallback), ~9% on the trained bench checkpoint (chaotic-plateau
virtual-time ties — arc ties measure 7e-6 there), 6–19% on quantised
EDT landscapes (fallback).

Two measured early exits bound the mode's cost on fallback-bound inputs
(round 5; routing heuristics only — every route is exact):
``TIE_PROBE_DEFAULT`` skips the whole certificate when exact arc/value
tie density predicts the tie-driven fallback classes, and
``REPAIR_DOOM_FRAC`` skips the restricted repair when phase C's
uncertain fraction is past the measured acceptance band (the
chaotic-plateau classes no pre-certificate count can see).
docs/exact_flood.md §4b; calibration in
benchmarks/tie_probe_calibration.py + cert_phase_profile.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .device_flood import _BIG, _shift

__all__ = [
    "certificate_flood_jit",
    "certificate_flood",
    "image_certificate_flood_jit",
    "image_certificate_flood",
    "verified_exact_flood_jit",
    "verified_exact_image_flood_jit",
    "exact_affinity_flood",
    "exact_image_flood",
    "TIE_PROBE_DEFAULT",
    "REPAIR_DOOM_FRAC",
]

# Tie-density early exit (the exact mode's worst-case bound): when the
# fraction of in-mask voxels with EXACTLY tied claim competitions
# exceeds this, the certificate is doomed to the unresolved fallback
# (measured: uncertain fraction reaches ~9% on the trained checkpoint's
# saturated sigmoids and 6-19% on quantised EDT landscapes — both
# orders of magnitude past any repaired case), so the device program
# skips phases A-C + repair entirely (`lax.cond`) and the caller goes
# straight to the exact host flood.  The probe is one elementwise
# pass-set; calibration in benchmarks/tie_probe_calibration.py.
# Performance heuristic only — every routing outcome is still exact.
TIE_PROBE_DEFAULT = 0.02

# Repair-doom early exit (the second guard): the restricted repair has
# only ever proven out on small uncertain sets (measured: accepts at
# <= 1.1% uncertain, rejects at >= 6% — trained-checkpoint 8.7%,
# quantised EDT 6-19%, chaotic noise 75-97%), because a large uncertain
# set is exactly the regime where ambiguity survives restriction.  When
# phase C's uncertain fraction exceeds this, the repair is SKIPPED on
# device (`lax.cond`) and the run resolves to the host-flood fallback at
# ~the certificate's cost instead of ~2x it.  The trained-checkpoint
# class is chaotic-plateau (minimax bottlenecks shared across basins:
# measured arc-tie density 7e-6 against 8.7% uncertainty on the bench
# fixture), so no pre-certificate count can predict it — this post-C
# guard is the cheapest sound cut.  Heuristic only: both routes exact.
REPAIR_DOOM_FRAC = 0.03


def _neighbour_views(arrs, fills):
    """For each array, the 6 face-neighbour views in footprint raster
    order (z-, y-, x-, x+, y+, z+); returns a list of 6 tuples."""
    ndim = arrs[0].ndim
    out = []
    for a in range(ndim):
        out.append(tuple(_shift(x, a, 1, f) for x, f in zip(arrs, fills)))
    for a in reversed(range(ndim)):
        out.append(tuple(_shift(x, a, -1, f) for x, f in zip(arrs, fills)))
    return out


def _edge_weights(affinities, ndim):
    """weights[k][u] = arc value entering u from direction k (the
    oracle's aff_off table: stored at the higher index)."""
    aff = affinities.astype(jnp.float32)
    weights = [aff[a] for a in range(ndim)]
    weights += [_shift(aff[a], a, -1, _BIG) for a in reversed(range(ndim))]
    return weights


def _certificate_core(weights, seeds, mask, seed_values, max_iters,
                      check_every, seed_values_ub=None):
    """Shared certificate over a per-direction weight list (the same
    convention as ``device_flood._flood_core``): affinity floods pass
    crossed-arc weights and seed value 0 (the heap pushes markers at 0);
    image floods pass ``values[u]`` from every direction and seed the
    markers at their own image value — both are the respective heap's
    virtual-pop-time recurrences.

    ``seed_values_ub``: optional upper endpoint when seed release times
    are only known as intervals (the verified-repair restriction seeds
    its gates at the outer certificate's ``[v_lb, v_ub]``); the theorem
    then quantifies over all schedules AND all release times within the
    intervals — a superset of the true heap's restricted execution."""
    mask = mask.astype(bool)
    shape = mask.shape
    seeded = (seeds > 0) & mask
    frozen = seeded | ~mask
    lab_seed = jnp.where(seeded, seeds, 0).astype(jnp.int32)
    idx = jnp.arange(mask.size, dtype=jnp.int32).reshape(shape)

    def run(step, state0):
        def cond(state):
            return state[-1] & (state[-2] < max_iters)

        def body(state):
            for _ in range(check_every):
                state = step(state)
            return state

        state = jax.lax.while_loop(cond, body, state0)
        still = step(state)[-1]
        return state, jnp.logical_not(still)

    # ---- phase A: V_lb = minimax distance (monotone decreasing) ----
    v0 = jnp.where(seeded, jnp.asarray(seed_values, jnp.float32), _BIG)
    v0_ub = (v0 if seed_values_ub is None else
             jnp.where(seeded, jnp.asarray(seed_values_ub, jnp.float32),
                       _BIG))

    def step_a(state):
        v, it, _ = state
        best = v
        for k, (v_n,) in enumerate(_neighbour_views([v], [_BIG])):
            best = jnp.minimum(best, jnp.maximum(v_n, weights[k]))
        v_new = jnp.where(frozen, v0, jnp.where(mask, best, _BIG))
        changed = jnp.any(v_new != v)
        return v_new, it + 1, changed

    (v_lb, it_a, _), conv_a = run(step_a, (v0, jnp.int32(0),
                                           jnp.bool_(True)))

    # ---- phase B: joint [V_lb, V_ub] interval iteration ----
    # The actual claim recurrence is V(u) = max(V(c), w_c) with
    # c = the argmin-V neighbour, so with possible(v) = "V_lb(v) <=
    # min over nbrs of V_ub" (contains the true claimer in every
    # schedule):
    #   V_lb(u) = max(min_v V_lb(v),  min over possible v of w_v)
    #   V_ub(u) = max(min_v V_ub(v),  max over possible v of w_v)
    # lb rises / ub falls monotonically (possible sets shrink), both
    # stay sound by induction on the lb <= V* <= ub invariant.  Phase
    # A's minimax distance is the valid (and cheap) lb start.
    def step_b(state):
        lb, ub, it, _ = state
        nbrs = _neighbour_views([lb, ub], [_BIG, _BIG])
        m_high = jnp.full(shape, _BIG)
        for (_lb_n, ub_n) in nbrs:
            m_high = jnp.minimum(m_high, ub_n)
        m_low = jnp.full(shape, _BIG)  # min lb over POSSIBLE claimers
        w_min = jnp.full(shape, _BIG)
        w_max = jnp.full(shape, -_BIG)
        any_poss = jnp.zeros(shape, bool)
        for k, (lb_n, ub_n) in enumerate(nbrs):
            poss = (lb_n <= m_high) & (lb_n < _BIG)
            m_low = jnp.where(poss, jnp.minimum(m_low, lb_n), m_low)
            w_min = jnp.where(poss, jnp.minimum(w_min, weights[k]), w_min)
            w_max = jnp.where(poss, jnp.maximum(w_max, weights[k]), w_max)
            any_poss = any_poss | poss
        lb_cand = jnp.where(any_poss, jnp.maximum(m_low, w_min), lb)
        ub_cand = jnp.where(any_poss, jnp.maximum(m_high, w_max), _BIG)
        lb_new = jnp.where(frozen, v0,
                           jnp.where(mask, jnp.maximum(lb, lb_cand), _BIG))
        ub_new = jnp.where(frozen, v0_ub,
                           jnp.where(mask, jnp.minimum(ub, ub_cand), _BIG))
        changed = jnp.any((lb_new != lb) | (ub_new != ub))
        return lb_new, ub_new, it + 1, changed

    (v_lb, v_ub, it_b, _), conv_b = run(
        step_b, (v_lb, v0_ub, jnp.int32(0), jnp.bool_(True))
    )

    # final possible-claimer filter threshold (fixed from here on)
    m_high = jnp.full(shape, _BIG)
    for (u_n,) in _neighbour_views([v_ub], [_BIG]):
        m_high = jnp.minimum(m_high, u_n)

    # ---- phase C: rep labels + uncertainty (monotone in unc) ----
    def step_c(state):
        rep, unc, it, _ = state
        nbrs = _neighbour_views(
            [rep, unc, v_lb, idx], [jnp.int32(0), False, _BIG,
                                    jnp.int32(0)]
        )
        best_key_v = jnp.full(shape, _BIG)
        best_key_i = jnp.zeros(shape, jnp.int32)
        best_rep = jnp.zeros(shape, jnp.int32)
        seen_lab = jnp.zeros(shape, jnp.int32)
        disagree = jnp.zeros(shape, bool)
        poss_unc = jnp.zeros(shape, bool)
        for (rep_n, unc_n, lb_n, idx_n) in nbrs:
            poss = (lb_n <= m_high) & (lb_n < _BIG)
            labd = poss & (rep_n > 0)
            # deterministic representative: the (V_lb, index)-min
            # labelled possible claimer
            better = labd & (
                (lb_n < best_key_v)
                | ((lb_n == best_key_v) & (idx_n < best_key_i))
            )
            best_key_v = jnp.where(better, lb_n, best_key_v)
            best_key_i = jnp.where(better, idx_n, best_key_i)
            best_rep = jnp.where(better, rep_n, best_rep)
            disagree = disagree | (
                labd & (seen_lab > 0) & (rep_n != seen_lab)
            )
            seen_lab = jnp.where(labd & (seen_lab == 0), rep_n, seen_lab)
            poss_unc = poss_unc | (poss & unc_n)
        unc_new = unc | disagree | poss_unc
        unc_new = jnp.where(frozen, False, unc_new & mask)
        # freeze rep once uncertain (its value is repair territory; the
        # freeze kills label oscillation around possible-claimer cycles)
        rep_new = jnp.where(
            frozen, lab_seed,
            jnp.where(mask & ~unc, best_rep, rep),
        )
        rep_new = jnp.where(mask, rep_new, 0)
        changed = jnp.any((rep_new != rep) | (unc_new != unc))
        return rep_new, unc_new, it + 1, changed

    (rep, unc, it_c, _), conv_c = run(
        step_c, (lab_seed, jnp.zeros(shape, bool), jnp.int32(0),
                 jnp.bool_(True))
    )
    return rep, unc, v_lb, v_ub, conv_a & conv_b & conv_c


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every")
)
def certificate_flood_jit(affinities, seeds, mask, max_iters=1024,
                          check_every=8):
    """Jitted affinity certificate: returns ``(rep, unc, v_lb, v_ub,
    converged)``.

    ``rep`` int32 labels (exact on ``~unc`` voxels, see module doc),
    ``unc`` bool, ``v_lb``/``v_ub`` f32 virtual-time bounds.  All
    arithmetic is exact f32 selection (min/max/compare) — no rounding.
    """
    weights = _edge_weights(affinities, mask.ndim)
    return _certificate_core(weights, seeds, mask, 0.0, max_iters,
                             check_every)


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every")
)
def image_certificate_flood_jit(values, seeds, mask, max_iters=1024,
                                check_every=8):
    """Image-watershed certificate (the heap of
    ``watershed_oracle.image_flood_py`` / skimage ``watershed``): entry
    weights are the node's own image value from every direction, seeds
    pop at their own value.  Same soundness contract as the affinity
    certificate."""
    values = values.astype(jnp.float32)
    weights = [values] * (2 * mask.ndim)
    return _certificate_core(weights, seeds, mask, values, max_iters,
                             check_every)


def certificate_flood(affinities, marker_coords, mask, max_iters=1024):
    """NumPy-facing certificate (oracle calling convention: seeds take
    labels 1..n in row order).  Returns ``(rep, unc, v_lb, v_ub,
    converged)`` as numpy arrays."""
    mask = np.asarray(mask).astype(bool)
    seeds = np.zeros(mask.shape, np.int32)
    mc = np.asarray(marker_coords)
    if len(mc):
        seeds[tuple(mc.T)] = np.arange(1, len(mc) + 1, dtype=np.int32)
    rep, unc, v_lb, v_ub, conv = certificate_flood_jit(
        jnp.asarray(np.asarray(affinities, np.float32)),
        jnp.asarray(seeds), jnp.asarray(mask), max_iters=max_iters,
    )
    return (np.asarray(rep), np.asarray(unc), np.asarray(v_lb),
            np.asarray(v_ub), bool(conv))


def image_certificate_flood(values, markers_or_coords, mask,
                            max_iters=1024):
    """NumPy-facing image certificate (``wavefront_image_flood``'s
    marker convention: coordinate rows label 1..n, or a full int seed
    image)."""
    mask = np.asarray(mask).astype(bool)
    m = np.asarray(markers_or_coords)
    if m.shape == mask.shape:
        seeds = m.astype(np.int32)
    else:
        seeds = np.zeros(mask.shape, np.int32)
        if len(m):
            seeds[tuple(m.T)] = np.arange(1, len(m) + 1, dtype=np.int32)
    rep, unc, v_lb, v_ub, conv = image_certificate_flood_jit(
        jnp.asarray(np.asarray(values, np.float32)),
        jnp.asarray(seeds), jnp.asarray(mask), max_iters=max_iters,
    )
    return (np.asarray(rep), np.asarray(unc), np.asarray(v_lb),
            np.asarray(v_ub), bool(conv))


def _affinity_ties(weights, mask):
    """Voxels whose claim competition is EXACTLY tied on arc values: >=2
    in-mask incoming arcs with bit-equal f32 weights.  The heap breaks
    such ties by its global FIFO age — the one quantity no device
    schedule can reproduce — so their density predicts the certificate's
    uncertain set (docs/exact_flood.md §3)."""
    valid = [m for (m,) in _neighbour_views([mask], [False])]
    tie = jnp.zeros(mask.shape, bool)
    for i in range(len(weights)):
        for j in range(i + 1, len(weights)):
            tie = tie | (valid[i] & valid[j]
                         & (weights[i] == weights[j]))
    return tie & mask


def _image_ties(values, mask):
    """Image-flood twin: every incoming arc shares the node's own value,
    so arc ties are trivial — claimer competitions tie when NEIGHBOUR
    virtual times do, whose ground source is bit-equal neighbour image
    values (quantised EDT landscapes are the measured offender)."""
    nbrs = _neighbour_views([values, mask], [_BIG, False])
    tie = jnp.zeros(mask.shape, bool)
    for i in range(len(nbrs)):
        v_i, m_i = nbrs[i]
        for j in range(i + 1, len(nbrs)):
            v_j, m_j = nbrs[j]
            tie = tie | (m_i & m_j & (v_i == v_j))
    return tie & mask


def _verified_core(weights, seeds, mask, seed_values, max_iters,
                   check_every, ties=None, tie_probe=0.0,
                   repair_doom=REPAIR_DOOM_FRAC):
    """Certificate + on-device VERIFIED repair (shared by both modes).

    Runs the certificate, then re-runs it on the RESTRICTED problem —
    the uncertain set ``R`` plus its certain labelled boundary ``B``,
    with the gates seeded at their ``[v_lb, v_ub]`` release intervals.
    If every ``R`` voxel comes out CERTAIN in the restricted
    certificate, its label is forced under every consistent schedule and
    every release time within the intervals — a superset of the true
    heap's restricted execution — so the combined labels are PROVABLY
    the heap's.  (This replaces an earlier dual-schedule heuristic
    valve, which a fuzz counterexample showed could false-accept: two
    sampled tie orders agreed while the heap's global FIFO age order
    differed.)

    Returns ``(labels, resolved, unc_count, n_mask, tie_frac)``;
    ``resolved`` False means ambiguity survives even locally — the
    caller must fall back to the full exact host flood.  ``R`` empty
    degenerates to the pure certified path (``resolved`` iff converged).

    ``ties``/``tie_probe``: the early exit (module doc at
    ``TIE_PROBE_DEFAULT``).  When the tied fraction exceeds
    ``tie_probe`` the certificate + repair are SKIPPED on device
    (``lax.cond``) and the call returns ``resolved=False,
    unc_count=-1`` at ~the probe's cost; ``tie_probe=0`` disables.

    ``repair_doom``: the post-phase-C guard (module doc at
    ``REPAIR_DOOM_FRAC``); ``repair_doom=0`` disables it so the repair
    runs regardless of uncertainty — the fuzz/suite use this to keep
    the repair itself exercised on tie-heavy inputs (the class whose
    false-accept forced the proven acceptance; with the guard on, such
    draws would route to the fallback before the repair ever ran).
    """
    mask_b = mask.astype(bool)
    n_mask = jnp.sum(mask_b).astype(jnp.int32)

    def run_certificate(_):
        rep, unc, v_lb, v_ub, conv = _certificate_core(
            weights, seeds, mask_b, seed_values, max_iters, check_every
        )
        unc_count = jnp.sum(unc).astype(jnp.int32)

        def run_repair(_):
            R = unc
            grow = R
            for (r_n,) in _neighbour_views([R], [False]):
                grow = grow | r_n
            B = grow & ~R & (rep > 0)
            mask_r = R | B
            seeds_r = jnp.where(B, rep, 0)
            rep_r, unc_r, _lb_r, _ub_r, conv_r = _certificate_core(
                weights, seeds_r, mask_r, v_lb, max_iters, check_every,
                seed_values_ub=v_ub,
            )
            resolved = conv & conv_r & jnp.logical_not(
                jnp.any(unc_r & R))
            labels = jnp.where(mask_b, jnp.where(R, rep_r, rep), 0)
            return labels.astype(jnp.int32), resolved

        def skip_repair(_):
            # repair-doom guard (REPAIR_DOOM_FRAC): a large uncertain
            # set has never proven out — resolve to the fallback at
            # ~the certificate's cost instead of ~2x it
            return jnp.zeros(mask_b.shape, jnp.int32), jnp.bool_(False)

        if repair_doom <= 0.0:
            labels, resolved = run_repair(None)
            return labels, resolved, unc_count
        doom = (unc_count.astype(jnp.float32)
                > jnp.float32(repair_doom)
                * n_mask.astype(jnp.float32))
        labels, resolved = jax.lax.cond(doom, skip_repair, run_repair,
                                        None)
        return labels, resolved, unc_count

    if ties is None or tie_probe <= 0.0:
        labels, resolved, unc_count = run_certificate(None)
        return labels, resolved, unc_count, n_mask, jnp.float32(0.0)

    tie_frac = (jnp.sum(ties).astype(jnp.float32)
                / jnp.maximum(n_mask, 1).astype(jnp.float32))

    def skip(_):
        return (jnp.zeros(mask_b.shape, jnp.int32), jnp.bool_(False),
                jnp.int32(-1))

    labels, resolved, unc_count = jax.lax.cond(
        tie_frac <= jnp.float32(tie_probe), run_certificate, skip, None
    )
    return labels, resolved, unc_count, n_mask, tie_frac


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "check_every", "tie_probe",
                     "repair_doom"),
)
def verified_exact_flood_jit(affinities, seeds, mask, max_iters=1024,
                             check_every=8, tie_probe=0.0,
                             repair_doom=REPAIR_DOOM_FRAC):
    """Fully device-resident exact affinity flood: certificate +
    verified restricted repair.  Returns ``(labels, resolved,
    unc_count, n_mask, tie_frac)`` — labels are the heap's bit-for-bit
    when ``resolved``; otherwise the caller must run the exact host
    flood.  ``tie_probe > 0`` arms the on-device early exit
    (``unc_count == -1`` marks a probe skip); ``repair_doom=0``
    disables the post-phase-C repair guard (see ``_verified_core``)."""
    mask_b = mask.astype(bool)
    weights = _edge_weights(affinities, mask.ndim)
    ties = (_affinity_ties(weights, mask_b) if tie_probe > 0.0
            else None)
    return _verified_core(weights, seeds, mask_b, 0.0, max_iters,
                          check_every, ties=ties, tie_probe=tie_probe,
                          repair_doom=repair_doom)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "check_every", "tie_probe",
                     "repair_doom"),
)
def verified_exact_image_flood_jit(values, seeds, mask, max_iters=1024,
                                   check_every=8, tie_probe=0.0,
                                   repair_doom=REPAIR_DOOM_FRAC):
    """Image-watershed twin of ``verified_exact_flood_jit``."""
    mask_b = mask.astype(bool)
    values = values.astype(jnp.float32)
    weights = [values] * (2 * mask.ndim)
    ties = (_image_ties(values, mask_b) if tie_probe > 0.0 else None)
    return _verified_core(weights, seeds, mask_b, values, max_iters,
                          check_every, ties=ties, tie_probe=tie_probe,
                          repair_doom=repair_doom)


def _full_host_flood(affinities, marker_coords, mask):
    from .watershed import affinity_watershed

    return affinity_watershed(affinities, marker_coords, mask)


def _fill_telemetry(tele, resolved, unc_count, n_mask, tie_frac):
    """Shared path/telemetry decode: returns True when the caller must
    run the exact host flood."""
    unc_count, n_mask = int(unc_count), int(n_mask)
    tele["tie_frac"] = float(tie_frac)
    if unc_count < 0:  # on-device early exit: certificate never ran
        tele["uncertain_frac"] = None
        tele["path"] = "fallback:tie-density"
        return True
    tele["uncertain_frac"] = unc_count / n_mask if n_mask else 0.0
    if not bool(resolved):
        tele["path"] = "fallback:unresolved"
        return True
    tele["path"] = "certified" if unc_count == 0 else "repaired"
    return False


def exact_affinity_flood(affinities, marker_coords, mask,
                         telemetry=None, tie_probe=TIE_PROBE_DEFAULT,
                         repair_doom=REPAIR_DOOM_FRAC):
    """Labels bit-equal to the exact heap flood
    (``watershed_oracle.affinity_flood_py`` semantics), via the
    device-resident certificate + verified restricted repair; falls back
    to the full host flood whenever the repair cannot be PROVEN
    schedule-independent (see module doc / docs/exact_flood.md).

    ``telemetry``: optional dict, filled with ``uncertain_frac``,
    ``tie_frac`` and ``path`` ("certified" | "repaired" |
    "fallback:*").  ``tie_probe``: tied-voxel fraction above which the
    device program skips the certificate and goes straight to the host
    flood (0 disables; see ``TIE_PROBE_DEFAULT``).
    """
    mask = np.asarray(mask).astype(bool)
    mc = np.asarray(marker_coords)
    tele = telemetry if telemetry is not None else {}
    seeds = np.zeros(mask.shape, np.int32)
    if len(mc):
        seeds[tuple(mc.T)] = np.arange(1, len(mc) + 1, dtype=np.int32)
    labels, resolved, unc_count, n_mask, tie_frac = (
        verified_exact_flood_jit(
            jnp.asarray(np.asarray(affinities, np.float32)),
            jnp.asarray(seeds), jnp.asarray(mask),
            tie_probe=float(tie_probe),
            repair_doom=float(repair_doom),
        )
    )
    if _fill_telemetry(tele, resolved, unc_count, n_mask, tie_frac):
        return _full_host_flood(affinities, mc, mask)
    return np.asarray(labels)


def exact_image_flood(values, markers_or_coords, mask, telemetry=None,
                      tie_probe=TIE_PROBE_DEFAULT,
                      repair_doom=REPAIR_DOOM_FRAC):
    """Image-watershed twin of :func:`exact_affinity_flood`: labels
    bit-equal to ``watershed_oracle.image_flood_py`` / the exact host
    image flood."""
    from .watershed import image_watershed

    mask = np.asarray(mask).astype(bool)
    values_np = np.asarray(values, np.float32)
    m = np.asarray(markers_or_coords)
    if m.shape == mask.shape:
        markers = m.astype(np.int32)
    else:
        markers = np.zeros(mask.shape, np.int32)
        if len(m):
            markers[tuple(m.T)] = np.arange(1, len(m) + 1,
                                            dtype=np.int32)
    tele = telemetry if telemetry is not None else {}
    labels, resolved, unc_count, n_mask, tie_frac = (
        verified_exact_image_flood_jit(
            jnp.asarray(values_np), jnp.asarray(markers),
            jnp.asarray(mask), tie_probe=float(tie_probe),
            repair_doom=float(repair_doom),
        )
    )
    if _fill_telemetry(tele, resolved, unc_count, n_mask, tie_frac):
        return image_watershed(values_np, markers, mask)
    return np.asarray(labels)
