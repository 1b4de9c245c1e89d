"""Seeded in-suite subset of ``benchmarks/exact_flood_fuzz.py``
(VERDICT r4 #5).

The out-of-suite fuzz caught the false-accept that forced the proven
restricted repair (docs/exact_flood.md §3); this deterministic subset
keeps that regression class covered on every CI run.  Every draw
asserts BIT-equality of the hybrid-exact floods against the sequential
heap oracles; tie-heavy families additionally run with the tie-density
probe DISABLED so the certificate + verified repair themselves execute
on massed exact ties (the early exit would otherwise route those draws
straight to the host flood and the cert would go untested there).

Budget: one fixture shape bucket == one certificate compile, shared
with ``test_flood_exact``'s make_case fixtures (same (12, 20, 20)
shape); the draws themselves are milliseconds.
"""
import numpy as np
import pytest

from iterseg_tpu.ops.flood_exact import (
    exact_affinity_flood,
    exact_image_flood,
)
from iterseg_tpu.ops.watershed_oracle import (
    affinity_flood_py,
    image_flood_py,
)


def _load_fuzz_module():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "exact_flood_fuzz.py",
    )
    spec = importlib.util.spec_from_file_location("exact_flood_fuzz",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_case(rng):
    return _load_fuzz_module().random_case(rng, shapes=[(12, 20, 20)])


def test_fuzz_subset_affinity_bit_exact():
    """12 seeded random draws across all five fixture families: the
    hybrid must bit-match the heap oracle on every one, whatever path
    (certified / repaired / fallback) it takes."""
    rng = np.random.default_rng(2024)
    paths = []
    for i in range(12):
        family, aff, coords, mask = _random_case(rng)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        tele = {}
        got = exact_affinity_flood(aff, coords, mask, telemetry=tele)
        np.testing.assert_array_equal(
            got, oracle, err_msg=f"draw {i} family={family}"
        )
        paths.append(tele["path"])
    # the subset must actually exercise more than one routing outcome
    assert len(set(paths)) >= 2, paths


def test_fuzz_subset_certificate_on_tie_heavy_families():
    """The regression class the fuzz originally caught: certificate +
    verified repair on massed exact ties, with BOTH routing guards
    disabled (``tie_probe=0`` skips the probe, ``repair_doom=0`` forces
    the repair to actually run past phase C's huge uncertain sets — with
    the guards on, these draws would route to the host flood before the
    repair ever executed and a false-accepting repair would be
    invisible).  A false accept shows up here as a bit mismatch."""
    rng = np.random.default_rng(77)
    ran_cert = 0
    for _ in range(8):
        family, aff, coords, mask = _random_case(rng)
        if family not in ("quant", "smooth-dup", "saturated"):
            continue
        oracle = affinity_flood_py(aff, coords, mask.copy())
        tele = {}
        got = exact_affinity_flood(aff, coords, mask, telemetry=tele,
                                   tie_probe=0.0, repair_doom=0.0)
        np.testing.assert_array_equal(got, oracle)
        assert tele["path"] != "fallback:tie-density"
        ran_cert += 1
    assert ran_cert >= 2  # seeded: the families above must appear


def test_fuzz_subset_image_bit_exact():
    """Image-flood twin on derived EDT-ish landscapes (the DoG path's
    semantics), probe on and off."""
    from scipy import ndimage as ndi

    rng = np.random.default_rng(5)
    for i in range(4):
        _family, _aff, coords, mask = _random_case(rng)
        dist = ndi.distance_transform_edt(mask)
        image = (-dist).astype(np.float32)
        markers = np.zeros(mask.shape, np.int32)
        if len(coords):
            markers[tuple(coords.T)] = np.arange(
                1, len(coords) + 1, dtype=np.int32)
        oracle = image_flood_py(image, markers, mask)
        got = exact_image_flood(image, markers, mask)
        np.testing.assert_array_equal(got, oracle, err_msg=f"draw {i}")
    # one guards-off draw exercises the image certificate AND repair on
    # ties (see the affinity twin above for why both guards must be off)
    got0 = exact_image_flood(image, markers, mask, tie_probe=0.0,
                             repair_doom=0.0)
    np.testing.assert_array_equal(got0, oracle)
