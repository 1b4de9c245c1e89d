"""Pallas TPU kernel for the on-device wavefront affinity flood.

This is the TPU-grade sibling of ``ops/device_flood.py``'s XLA
``mode="claim"`` recurrence (see that module's docstring for the
algorithm and its relation to the reference's sequential heap flood,
``/root/reference/src/iterseg/watershed.py:95-159``).  The XLA version is
*globally synchronous*: every iteration is a full-volume HBM pass and the
wavefront advances one voxel per pass, so a 256-voxel-wide basin costs
hundreds of passes.  This kernel replaces the schedule, not the rule:

- The volume is tiled ``(TZ, TY, Xp)``; each grid step DMAs one tile plus
  a 1-voxel z/y halo from HBM into VMEM, iterates the *same* claim update
  to a local fixed point entirely in VMEM (the inner loop touches HBM
  zero times), and DMAs the interior back.
- TPU Pallas grids execute **sequentially** on the core, and the state
  arrays are input/output-aliased, so each tile reads its predecessors'
  freshly written labels: a forward sweep is Gauss–Seidel, propagating a
  wavefront across many tiles in ONE pass over HBM.  Sweeps alternate
  forward/backward (two compiled kernels) until no tile changes.

Semantics: the per-voxel update rule, the claim key ``(V, index)``
monotonicity, and hence termination are identical to the XLA claim mode;
only the update *schedule* differs (chaotic relaxation instead of Jacobi).
The claim rule's fixed point is schedule-dependent at heap-tie-like
races, so labels can differ from the XLA variant on a small fraction of
voxels — both are approximations of the sequential heap oracle, and the
tests pin oracle agreement for this kernel separately.  The index
tie-break uses the kernel's padded guard geometry (any consistent total
order stands in for the heap's unknowable global age).

Exactness invariants shared with the XLA version (tested): seeds keep
their ids, labels appear exactly on the mask voxels reachable from a
seed, every label comes from the seed set.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_wavefront_flood",
    "pallas_flood_jit",
    "pallas_image_flood",
    "pallas_image_flood_jit",
    "fits_vmem",
]

_INF = jnp.float32(np.inf)

# default tile + scratch-buffer count, shared by the kernel and the
# fits_vmem guard so a retuning cannot silently desynchronise them
TZ, TY = 8, 32
_N_SCRATCH = 8  # 5 state buffers + the 3-channel affinity buffer


def _ceil_to(x, m):
    return -(-x // m) * m


def fits_vmem(shape, tz=TZ, ty=TY, budget=14 * 2 ** 20):
    """Whether the kernel's VMEM footprint fits for a volume of ``shape``.

    The x (lane) dimension is never tiled — every one of the 8 f32/i32
    scratch buffers spans the full padded row, so declared scratch is
    ``8 * (tz+2) * (ty+16) * xp * 4`` bytes. Mosaic's actual scoped-vmem
    request (DMA staging + stack copies) measures ~1.75x that on a v5e:
    xp=768 declares 11.8 MB but requests 20.48 MB against the 16 MB
    scoped limit (observed compile OOM), while the validated 256^3
    production geometry (xp=384) requests ~10.3 MB and runs. Breaching
    the limit fails the Mosaic compile outright, so production callers
    must check this and fall back (``device_pipeline._flood_on_device``
    drops to the XLA recurrence). With the defaults this admits
    xp <= 512 (X <= 512 after padding)."""
    xp = max(_ceil_to(shape[-1], 128), 128)
    declared = _N_SCRATCH * (tz + 2) * (ty + 16) * xp * 4
    return declared * 7 // 4 <= budget


def _flood_kernel(
    # inputs (state ins unused: we read state through the aliased outs so
    # later tiles of the sweep see earlier tiles' writes — Gauss-Seidel)
    d_in, lab_in, ckd_in, cki_in, code_in, aff_in,
    # outputs
    d_out, lab_out, ckd_out, cki_out, changed_out,
    # scratch
    s_d, s_lab, s_ckd, s_cki, s_code, s_aff, sems,
    *, n_tiles, n_ty, tz, ty, xp, yg, reverse, inner_cap,
):
    i = pl.program_id(0)
    tile = (n_tiles - 1 - i) if reverse else i
    tzi = tile // n_ty
    tyi = tile % n_ty
    z0 = tzi * tz  # halo'd z read starts here; interior rows are +1
    # y geometry: the volume sits at guard offset 8 (not 1) because
    # Mosaic DMA slices in the sublane dim must be 8-aligned in offset
    # AND size — each tile reads the aligned 8k-row superset
    # [tyi*ty, tyi*ty + ty+16) that contains its 1-voxel halo, and
    # writes back the aligned interior [tyi*ty + 8, +ty)
    y0 = tyi * ty
    tz2, ty2r = tz + 2, ty + 16

    # NOTE: every DMA operand below carries an explicit .at[...] indexer,
    # including full-buffer scratch destinations — the axon TPU plugin's
    # DMA lowering faults (worker crash) on bare refs (bisected on
    # 2026-08-18; plain upstream TPUs accept both spellings)
    copies = [
        pltpu.make_async_copy(
            r.at[pl.ds(z0, tz2), pl.ds(y0, ty2r), :],
            s.at[pl.ds(0, tz2), pl.ds(0, ty2r), :], sems.at[j]
        )
        for j, (r, s) in enumerate([
            (d_out, s_d), (lab_out, s_lab), (ckd_out, s_ckd),
            (cki_out, s_cki), (code_in, s_code),
        ])
    ]
    copies.append(pltpu.make_async_copy(
        aff_in.at[:, pl.ds(z0, tz2), pl.ds(y0, ty2r), :],
        s_aff.at[:, pl.ds(0, tz2), pl.ds(0, ty2r), :], sems.at[5]
    ))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    interior = (pl.ds(1, tz), pl.ds(8, ty), slice(None))
    free = s_code[interior] == 1  # in mask, not a seed
    # global raveled index (guard geometry) of each interior voxel
    gz = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 0) + (z0 + 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 1) + (y0 + 8)
    gx = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 2)
    idx_u = (gz * yg + gy) * xp + gx
    sz = yg * xp

    # x-shifts: Mosaic's concatenate lowering hits an unimplemented
    # offset-layout path when the lane dim spans >1 tile (xp > 128), so
    # shift with pltpu.roll (wrap) and repair the wrapped border lane
    def shift_x(v, delta, fill):
        rolled = pltpu.roll(v, delta % xp, 2)  # roll() rejects negatives
        border = gx == (0 if delta == 1 else xp - 1)
        return jnp.where(border, jnp.asarray(fill, v.dtype), rolled)

    def neighbours():
        d_i = s_d[interior]
        lab_i = s_lab[interior]
        a2_i = s_aff[2, pl.ds(1, tz), pl.ds(8, ty), :]
        return (
            # z-: w = aff[0] at u
            (s_d[pl.ds(0, tz), pl.ds(8, ty), :],
             s_lab[pl.ds(0, tz), pl.ds(8, ty), :],
             s_aff[0, pl.ds(1, tz), pl.ds(8, ty), :], idx_u - sz),
            # z+: w = aff[0] at u+ez
            (s_d[pl.ds(2, tz), pl.ds(8, ty), :],
             s_lab[pl.ds(2, tz), pl.ds(8, ty), :],
             s_aff[0, pl.ds(2, tz), pl.ds(8, ty), :], idx_u + sz),
            # y-: w = aff[1] at u
            (s_d[pl.ds(1, tz), pl.ds(7, ty), :],
             s_lab[pl.ds(1, tz), pl.ds(7, ty), :],
             s_aff[1, pl.ds(1, tz), pl.ds(8, ty), :], idx_u - xp),
            # y+: w = aff[1] at u+ey
            (s_d[pl.ds(1, tz), pl.ds(9, ty), :],
             s_lab[pl.ds(1, tz), pl.ds(9, ty), :],
             s_aff[1, pl.ds(1, tz), pl.ds(9, ty), :], idx_u + xp),
            # x-: neighbour is u-ex (shift right, fill closed); w = aff[2] at u
            (shift_x(d_i, 1, np.inf),
             shift_x(lab_i, 1, 0),
             a2_i, idx_u - 1),
            # x+: neighbour u+ex; w = aff[2] at u+ex
            (shift_x(d_i, -1, np.inf),
             shift_x(lab_i, -1, 0),
             shift_x(a2_i, -1, np.inf),
             idx_u + 1),
        )

    def body(carry):
        it, _, acc = carry
        best_kd = jnp.full((tz, ty, xp), np.inf, jnp.float32)
        best_ki = jnp.zeros((tz, ty, xp), jnp.int32)
        best_lab = jnp.zeros((tz, ty, xp), jnp.int32)
        best_w = jnp.zeros((tz, ty, xp), jnp.float32)
        for d_v, lab_v, w, idx_v in neighbours():
            ok = lab_v > 0
            better = ok & (
                (d_v < best_kd) | ((d_v == best_kd) & (idx_v < best_ki))
            )
            best_kd = jnp.where(better, d_v, best_kd)
            best_ki = jnp.where(better, idx_v, best_ki)
            best_w = jnp.where(better, w, best_w)
            best_lab = jnp.where(better, lab_v, best_lab)
        ckd_i = s_ckd[interior]
        cki_i = s_cki[interior]
        claim = (
            (best_kd < ckd_i) | ((best_kd == ckd_i) & (best_ki < cki_i))
        ) & free
        s_d[interior] = jnp.where(
            claim, jnp.maximum(best_kd, best_w), s_d[interior]
        )
        s_lab[interior] = jnp.where(claim, best_lab, s_lab[interior])
        s_ckd[interior] = jnp.where(claim, best_kd, ckd_i)
        s_cki[interior] = jnp.where(claim, best_ki, cki_i)
        ch = jnp.any(claim)
        return it + 1, ch, acc | ch

    def cond(carry):
        it, ch, _ = carry
        return ch & (it < inner_cap)

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), jnp.bool_(False))
    )

    # write the interior back (must complete before the next grid step
    # reads it as halo)
    backs = [
        pltpu.make_async_copy(
            s.at[pl.ds(1, tz), pl.ds(8, ty), :],
            r.at[pl.ds(z0 + 1, tz), pl.ds(y0 + 8, ty), :],
            sems.at[j],
        )
        for j, (s, r) in enumerate([
            (s_d, d_out), (s_lab, lab_out), (s_ckd, ckd_out),
            (s_cki, cki_out),
        ])
    ]
    for c in backs:
        c.start()
    for c in backs:
        c.wait()
    changed_out[tile, 0] = acc.astype(jnp.int32)


def _sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, reverse, inner_cap,
                interpret):
    """One compiled Gauss-Seidel sweep (all tiles, one direction)."""
    tz2, ty2r = tz + 2, ty + 16  # 8-aligned y read superset (see kernel)
    kern = functools.partial(
        _flood_kernel, n_tiles=n_tiles, n_ty=n_ty, tz=tz, ty=ty, xp=xp,
        yg=yg, reverse=reverse, inner_cap=inner_cap,
    )
    f32 = jnp.float32
    i32 = jnp.int32
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_tiles, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct((n_tiles, 1), i32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tz2, ty2r, xp), f32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), f32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((3, tz2, ty2r, xp), f32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "inner_cap", "tz", "ty", "interpret"),
)
def pallas_flood_jit(affinities, seeds, mask, max_sweeps=64, inner_cap=64,
                     tz=TZ, ty=TY, interpret=False):
    """Jitted core: same contract as ``device_flood.wavefront_flood_jit``.

    Returns ``(labels int32 (mask.shape), n_sweeps, converged)`` where a
    sweep is one forward plus one backward Gauss-Seidel pass.
    """
    if inner_cap < 1:
        # inner_cap=0 would make every tile's claim loop a no-op: all
        # sweeps report "no change" and the flood returns converged=True
        # with seeds-only labels — reject instead of silently lying
        raise ValueError(f"inner_cap must be >= 1, got {inner_cap}")
    if ty % 8 != 0 or tz < 1:
        raise ValueError(
            f"ty must be a multiple of 8 (Mosaic sublane DMA alignment) "
            f"and tz >= 1; got tz={tz}, ty={ty}"
        )
    Z, Y, X = mask.shape
    xp = max(_ceil_to(X, 128), 128)
    zp = max(_ceil_to(Z, tz), tz)
    yp = max(_ceil_to(Y, ty), ty)
    # y guard 8 rows before the volume + 8 after (Mosaic sublane DMA
    # slices must be 8-aligned in offset and size; each tile reads the
    # aligned [tyi*ty, +ty+16) superset of its halo)
    yg = yp + 16
    shape = (zp + 2, yg, xp)
    n_tz, n_ty = zp // tz, yp // ty
    n_tiles = n_tz * n_ty

    mask_b = mask.astype(bool)
    seeds_i = jnp.where(mask_b, seeds, 0).astype(jnp.int32)
    seeded = seeds_i > 0

    def embed(x, fill):
        out = jnp.full(shape, fill, x.dtype)
        return jax.lax.dynamic_update_slice(out, x, (1, 8, 0))

    d0 = embed(jnp.where(seeded, jnp.float32(0.0), _INF), _INF)
    lab0 = embed(seeds_i, jnp.int32(0))
    ckd0 = embed(jnp.where(seeded, -_INF, _INF), _INF)
    cki0 = jnp.zeros(shape, jnp.int32)
    code0 = embed(
        jnp.where(seeded, jnp.int32(2),
                  jnp.where(mask_b, jnp.int32(1), jnp.int32(0))),
        jnp.int32(0),
    )
    aff0 = jnp.full((3,) + shape, _INF, jnp.float32)
    aff0 = jax.lax.dynamic_update_slice(
        aff0, affinities.astype(jnp.float32), (0, 1, 8, 0)
    )

    fwd = _sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, False,
                      inner_cap, interpret)
    bwd = _sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, True,
                      inner_cap, interpret)

    def body(state):
        d, lab, ckd, cki, it, _ = state
        d, lab, ckd, cki, ch_f = fwd(d, lab, ckd, cki, code0, aff0)
        d, lab, ckd, cki, ch_b = bwd(d, lab, ckd, cki, code0, aff0)
        changed = jnp.any(ch_f > 0) | jnp.any(ch_b > 0)
        return d, lab, ckd, cki, it + 1, changed

    def cond(state):
        return state[-1] & (state[-2] < max_sweeps)

    state = jax.lax.while_loop(
        cond, body,
        (d0, lab0, ckd0, cki0, jnp.int32(0), jnp.bool_(True)),
    )
    _, lab, _, _, it, still = state
    labels = jax.lax.dynamic_slice(lab, (1, 8, 0), (Z, Y, xp))[:, :, :X]
    return labels, it, jnp.logical_not(still)


def _image_flood_kernel(
    # inputs (state ins unused: we read state through the aliased outs so
    # later tiles of the sweep see earlier tiles' writes — Gauss-Seidel)
    d_in, lab_in, h_in, ckd_in, ckh_in, cki_in, code_in, val_in,
    # outputs
    d_out, lab_out, h_out, ckd_out, ckh_out, cki_out, changed_out,
    # scratch
    s_d, s_lab, s_h, s_ckd, s_ckh, s_cki, s_code, s_val, sems,
    *, n_tiles, n_ty, tz, ty, xp, yg, reverse, inner_cap,
):
    """Image-watershed sibling of ``_flood_kernel``: the Gauss-Seidel
    schedule of ``device_flood.wavefront_image_flood_jit``'s hop-tie
    claim recurrence (skimage's node-keyed heap rule — the weight
    entering ``u`` is ``values[u]`` from every direction, markers push at
    their OWN image value, and equal-value plateaus tie-break by a hop
    count tracking the heap's FIFO-age BFS order, then by index).

    Same tile/halo/DMA geometry as the affinity kernel (and the same axon
    platform workarounds: explicit ``.at[...]`` DMA operands, 8-aligned
    sublane slices, ``pltpu.roll`` x-shifts); 8 scratch buffers — 6 state
    (d, lab, h, ck_d, ck_h, ck_i) + 2 constants (code, values) — so
    ``fits_vmem``'s budget applies unchanged.
    """
    i = pl.program_id(0)
    tile = (n_tiles - 1 - i) if reverse else i
    tzi = tile // n_ty
    tyi = tile % n_ty
    z0 = tzi * tz
    y0 = tyi * ty
    tz2, ty2r = tz + 2, ty + 16

    copies = [
        pltpu.make_async_copy(
            r.at[pl.ds(z0, tz2), pl.ds(y0, ty2r), :],
            s.at[pl.ds(0, tz2), pl.ds(0, ty2r), :], sems.at[j]
        )
        for j, (r, s) in enumerate([
            (d_out, s_d), (lab_out, s_lab), (h_out, s_h),
            (ckd_out, s_ckd), (ckh_out, s_ckh), (cki_out, s_cki),
            (code_in, s_code), (val_in, s_val),
        ])
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    interior = (pl.ds(1, tz), pl.ds(8, ty), slice(None))
    free = s_code[interior] == 1  # in mask, not a seed
    gz = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 0) + (z0 + 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 1) + (y0 + 8)
    gx = jax.lax.broadcasted_iota(jnp.int32, (tz, ty, xp), 2)
    idx_u = (gz * yg + gy) * xp + gx
    sz = yg * xp

    def shift_x(v, delta, fill):
        rolled = pltpu.roll(v, delta % xp, 2)  # roll() rejects negatives
        border = gx == (0 if delta == 1 else xp - 1)
        return jnp.where(border, jnp.asarray(fill, v.dtype), rolled)

    def neighbours():
        """(d_v, lab_v, h_v, idx_v) per face neighbour — no per-direction
        weight: the image flood's entering weight is values[u] itself."""
        d_i = s_d[interior]
        lab_i = s_lab[interior]
        h_i = s_h[interior]
        return (
            (s_d[pl.ds(0, tz), pl.ds(8, ty), :],
             s_lab[pl.ds(0, tz), pl.ds(8, ty), :],
             s_h[pl.ds(0, tz), pl.ds(8, ty), :], idx_u - sz),
            (s_d[pl.ds(2, tz), pl.ds(8, ty), :],
             s_lab[pl.ds(2, tz), pl.ds(8, ty), :],
             s_h[pl.ds(2, tz), pl.ds(8, ty), :], idx_u + sz),
            (s_d[pl.ds(1, tz), pl.ds(7, ty), :],
             s_lab[pl.ds(1, tz), pl.ds(7, ty), :],
             s_h[pl.ds(1, tz), pl.ds(7, ty), :], idx_u - xp),
            (s_d[pl.ds(1, tz), pl.ds(9, ty), :],
             s_lab[pl.ds(1, tz), pl.ds(9, ty), :],
             s_h[pl.ds(1, tz), pl.ds(9, ty), :], idx_u + xp),
            (shift_x(d_i, 1, np.inf),
             shift_x(lab_i, 1, 0),
             shift_x(h_i, 1, 0), idx_u - 1),
            (shift_x(d_i, -1, np.inf),
             shift_x(lab_i, -1, 0),
             shift_x(h_i, -1, 0), idx_u + 1),
        )

    def body(carry):
        it, _, acc = carry
        best_kd = jnp.full((tz, ty, xp), np.inf, jnp.float32)
        best_kh = jnp.zeros((tz, ty, xp), jnp.int32)
        best_ki = jnp.zeros((tz, ty, xp), jnp.int32)
        best_lab = jnp.zeros((tz, ty, xp), jnp.int32)
        for d_v, lab_v, h_v, idx_v in neighbours():
            ok = lab_v > 0
            better = ok & (
                (d_v < best_kd) | ((d_v == best_kd) & (
                    (h_v < best_kh)
                    | ((h_v == best_kh) & (idx_v < best_ki))
                ))
            )
            best_kd = jnp.where(better, d_v, best_kd)
            best_kh = jnp.where(better, h_v, best_kh)
            best_ki = jnp.where(better, idx_v, best_ki)
            best_lab = jnp.where(better, lab_v, best_lab)
        ckd_i = s_ckd[interior]
        ckh_i = s_ckh[interior]
        cki_i = s_cki[interior]
        claim = (
            (best_kd < ckd_i) | ((best_kd == ckd_i) & (
                (best_kh < ckh_i)
                | ((best_kh == ckh_i) & (best_ki < cki_i))
            ))
        ) & free
        val_i = s_val[interior]
        d_claim = jnp.maximum(best_kd, val_i)
        # hop count: +1 within a value plateau, reset on a strict rise
        h_claim = jnp.where(d_claim > best_kd, jnp.int32(0), best_kh + 1)
        s_d[interior] = jnp.where(claim, d_claim, s_d[interior])
        s_h[interior] = jnp.where(claim, h_claim, s_h[interior])
        s_lab[interior] = jnp.where(claim, best_lab, s_lab[interior])
        s_ckd[interior] = jnp.where(claim, best_kd, ckd_i)
        s_ckh[interior] = jnp.where(claim, best_kh, ckh_i)
        s_cki[interior] = jnp.where(claim, best_ki, cki_i)
        ch = jnp.any(claim)
        return it + 1, ch, acc | ch

    def cond(carry):
        it, ch, _ = carry
        return ch & (it < inner_cap)

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), jnp.bool_(False))
    )

    backs = [
        pltpu.make_async_copy(
            s.at[pl.ds(1, tz), pl.ds(8, ty), :],
            r.at[pl.ds(z0 + 1, tz), pl.ds(y0 + 8, ty), :],
            sems.at[j],
        )
        for j, (s, r) in enumerate([
            (s_d, d_out), (s_lab, lab_out), (s_h, h_out),
            (s_ckd, ckd_out), (s_ckh, ckh_out), (s_cki, cki_out),
        ])
    ]
    for c in backs:
        c.start()
    for c in backs:
        c.wait()
    changed_out[tile, 0] = acc.astype(jnp.int32)


def _image_sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, reverse,
                      inner_cap, interpret):
    """One compiled image-flood Gauss-Seidel sweep (all tiles, one
    direction)."""
    tz2, ty2r = tz + 2, ty + 16
    kern = functools.partial(
        _image_flood_kernel, n_tiles=n_tiles, n_ty=n_ty, tz=tz, ty=ty,
        xp=xp, yg=yg, reverse=reverse, inner_cap=inner_cap,
    )
    f32 = jnp.float32
    i32 = jnp.int32
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_tiles, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct(shape, i32),
            jax.ShapeDtypeStruct((n_tiles, 1), i32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tz2, ty2r, xp), f32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), f32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), i32),
            pltpu.VMEM((tz2, ty2r, xp), f32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "inner_cap", "tz", "ty", "interpret"),
)
def pallas_image_flood_jit(values, seeds, mask, max_sweeps=64,
                           inner_cap=64, tz=TZ, ty=TY, interpret=False):
    """Jitted image-flood core: a schedule/tie-order-dependent
    approximation of the same fixed-point class as
    ``device_flood.wavefront_image_flood_jit`` (the node-keyed flood of
    ``skimage.segmentation.watershed(values, markers, mask)`` — the
    reference DoG path floods ``values = -EDT``,
    ``/root/reference/src/iterseg/segmentation.py:640,646``).  Same
    calling convention, but NOT label-identical to either the XLA
    recurrence or the sequential heap: the final index tie-break uses
    this kernel's padded-guard ravel order while the XLA oracle uses the
    unpadded volume ravel, so labels can differ at exact (value, hop)
    ties.  Tests pin the achieved oracle/XLA agreement for this kernel
    separately (``tests/test_pallas_flood.py::TestPallasImageFlood``).

    Returns ``(labels int32 (mask.shape), n_sweeps, converged)``; a sweep
    is one forward plus one backward Gauss-Seidel pass.  Invariants and
    the ``fits_vmem`` bound are as for ``pallas_flood_jit`` (8 scratch
    buffers either way).
    """
    if inner_cap < 1:
        raise ValueError(f"inner_cap must be >= 1, got {inner_cap}")
    if ty % 8 != 0 or tz < 1:
        raise ValueError(
            f"ty must be a multiple of 8 (Mosaic sublane DMA alignment) "
            f"and tz >= 1; got tz={tz}, ty={ty}"
        )
    Z, Y, X = mask.shape
    xp = max(_ceil_to(X, 128), 128)
    zp = max(_ceil_to(Z, tz), tz)
    yp = max(_ceil_to(Y, ty), ty)
    yg = yp + 16
    shape = (zp + 2, yg, xp)
    n_tz, n_ty = zp // tz, yp // ty
    n_tiles = n_tz * n_ty

    mask_b = mask.astype(bool)
    seeds_i = jnp.where(mask_b, seeds, 0).astype(jnp.int32)
    seeded = seeds_i > 0
    vals_f = values.astype(jnp.float32)

    def embed(x, fill):
        out = jnp.full(shape, fill, x.dtype)
        return jax.lax.dynamic_update_slice(out, x, (1, 8, 0))

    # markers push at their OWN image value (skimage's heap init); with
    # the -EDT landscape a 0 init would saturate every chain-max (see
    # device_flood._flood_core's seed_values note)
    d0 = embed(jnp.where(seeded, vals_f, _INF), _INF)
    lab0 = embed(seeds_i, jnp.int32(0))
    h0 = jnp.zeros(shape, jnp.int32)
    ckd0 = embed(jnp.where(seeded, -_INF, _INF), _INF)
    ckh0 = jnp.zeros(shape, jnp.int32)
    cki0 = jnp.zeros(shape, jnp.int32)
    code0 = embed(
        jnp.where(seeded, jnp.int32(2),
                  jnp.where(mask_b, jnp.int32(1), jnp.int32(0))),
        jnp.int32(0),
    )
    val0 = embed(vals_f, _INF)

    fwd = _image_sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, False,
                            inner_cap, interpret)
    bwd = _image_sweep_call(shape, n_tiles, n_ty, tz, ty, xp, yg, True,
                            inner_cap, interpret)

    def body(state):
        d, lab, hp, ckd, ckh, cki, it, _ = state
        d, lab, hp, ckd, ckh, cki, ch_f = fwd(
            d, lab, hp, ckd, ckh, cki, code0, val0)
        d, lab, hp, ckd, ckh, cki, ch_b = bwd(
            d, lab, hp, ckd, ckh, cki, code0, val0)
        changed = jnp.any(ch_f > 0) | jnp.any(ch_b > 0)
        return d, lab, hp, ckd, ckh, cki, it + 1, changed

    def cond(state):
        return state[-1] & (state[-2] < max_sweeps)

    state = jax.lax.while_loop(
        cond, body,
        (d0, lab0, h0, ckd0, ckh0, cki0, jnp.int32(0), jnp.bool_(True)),
    )
    lab, it, still = state[1], state[-2], state[-1]
    labels = jax.lax.dynamic_slice(lab, (1, 8, 0), (Z, Y, xp))[:, :, :X]
    return labels, it, jnp.logical_not(still)


def pallas_image_flood(values, marker_coords_or_seeds, mask, max_sweeps=64,
                       inner_cap=64, interpret=None):
    """NumPy-facing image flood with
    ``device_flood.wavefront_image_flood``'s calling convention:
    ``marker_coords_or_seeds`` is an (n, ndim) coordinate array (labels
    1..n in row order) or a full int32 seed image.  Returns
    ``(labels int32, n_sweeps int, converged bool)``.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mask = np.asarray(mask).astype(bool)
    m = np.asarray(marker_coords_or_seeds)
    if m.shape == mask.shape:
        seeds = m.astype(np.int32)
    else:
        seeds = np.zeros(mask.shape, np.int32)
        if len(m):
            seeds[tuple(m.T)] = np.arange(1, len(m) + 1, dtype=np.int32)
    lab, it, conv = pallas_image_flood_jit(
        jnp.asarray(np.asarray(values, dtype=np.float32)),
        jnp.asarray(seeds), jnp.asarray(mask),
        max_sweeps=max_sweeps, inner_cap=inner_cap, interpret=interpret,
    )
    return np.asarray(lab), int(it), bool(conv)


def pallas_wavefront_flood(affinities, marker_coords, mask, max_sweeps=64,
                           inner_cap=64, interpret=None):
    """NumPy-facing wrapper with the oracle's calling convention (same as
    ``device_flood.wavefront_affinity_flood``): seeds take labels 1..n in
    row order.  Returns ``(labels int32, n_sweeps int, converged bool)``.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU (the
    Mosaic compiler only targets real TPUs; tests run on the CPU mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mask = np.asarray(mask).astype(bool)
    seeds = np.zeros(mask.shape, np.int32)
    mc = np.asarray(marker_coords)
    if len(mc):
        seeds[tuple(mc.T)] = np.arange(1, len(mc) + 1, dtype=np.int32)
    lab, it, conv = pallas_flood_jit(
        jnp.asarray(np.asarray(affinities)), jnp.asarray(seeds),
        jnp.asarray(mask), max_sweeps=max_sweeps, inner_cap=inner_cap,
        interpret=interpret,
    )
    return np.asarray(lab), int(it), bool(conv)
