"""On-chip phase attribution for the exact-flood certificate (round 5,
VERDICT r4 #1).

Times, on the real TPU at the bench geometry (258³ padded), the three
nested device programs of ``device_flood="exact"``'s machinery on a
certifiable (continuous distinct-channel) fixture:

- ``minimax``      — phase A alone (``ops/device_flood`` mode="minimax",
                     the same recurrence the certificate starts from),
- ``certificate``  — phases A+B+C (``certificate_flood_jit``),
- ``verified``     — certificate + restricted repair
                     (``verified_exact_flood_jit``, probe disabled),
- ``tie_probe``    — the round-5 early-exit probe alone.

Differences attribute the cost: B+C = certificate − minimax, repair =
verified − certificate.  These are the measured inputs to the
Pallas-Gauss-Seidel cost model (PARITY.md "Known future work"): the
existing Pallas claim kernel runs 3.5× the XLA Jacobi recurrence, so
the projected Pallas certificate cost is ~verified/3.5 — compare that
against the HOST flood it would have to beat on the same fixture.

Run (single process on the TPU — CLAUDE.md):

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/cert_phase_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from scipy import ndimage as ndi


def make_fixture(shape=(258, 258, 258), n=600, seed=0):
    """Continuous distinct-channel affinities at the padded bench
    geometry — the certifiable regime (tie density ~0)."""
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(3, s - 3, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
    vol /= vol.max()
    aff = np.stack([
        ndi.gaussian_filter(
            1.0 - vol + r.normal(0, 0.01, shape).astype(np.float32), 0.5)
        for _ in range(3)
    ]).astype(np.float32)
    mask = vol > 0.3
    for a in range(3):
        mask[(slice(None),) * a + (0,)] = False
        mask[(slice(None),) * a + (-1,)] = False
    mx = ndi.maximum_filter(vol, size=7)
    seeds = np.zeros(shape, np.int32)
    pk = np.argwhere((vol == mx) & mask)
    seeds[tuple(pk.T)] = np.arange(1, len(pk) + 1, dtype=np.int32)
    return aff, seeds, mask


def main():
    from iterseg_tpu import utils

    utils.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from iterseg_tpu.ops.device_flood import wavefront_flood_jit
    from iterseg_tpu.ops.flood_exact import (
        certificate_flood_jit,
        verified_exact_flood_jit,
    )
    from iterseg_tpu.ops.watershed import affinity_watershed

    aff, seeds, mask = make_fixture()
    mask_frac = float(mask.mean())
    aff_d = jnp.asarray(aff)
    seeds_d = jnp.asarray(seeds)
    mask_d = jnp.asarray(mask)

    def fence(*outs):
        # consume a tiny slice of every output: through the tunnel,
        # block_until_ready acks before execution finishes (CLAUDE.md)
        for o in outs:
            np.asarray(jnp.ravel(o)[:1])

    def timed(name, fn, n_runs=5):  # >=5-run medians (CLAUDE.md)
        fence(*as_tuple(fn()))  # warm/compile
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fence(*as_tuple(fn()))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name:<14} median {med:.3f}s  runs "
              f"{[round(t, 3) for t in ts]}", flush=True)
        return med

    def as_tuple(x):
        return x if isinstance(x, tuple) else (x,)

    results = {"mask_fraction": round(mask_frac, 4),
               "n_seeds": int(seeds.max())}
    results["minimax_sec"] = timed(
        "minimax",
        lambda: wavefront_flood_jit(aff_d, seeds_d, mask_d,
                                    mode="minimax"),
    )
    results["certificate_sec"] = timed(
        "certificate",
        lambda: certificate_flood_jit(aff_d, seeds_d, mask_d),
    )
    results["verified_sec"] = timed(
        "verified",
        lambda: verified_exact_flood_jit(aff_d, seeds_d, mask_d),
    )
    # probe-only cost: a quantised copy is tie-heavy, so the armed
    # probe takes the skip branch — the run measures probe + cond skip
    aff_q = jnp.asarray(np.round(aff * 2.0) / 2.0)
    results["probe_sec"] = timed(
        "tie_probe",
        lambda: verified_exact_flood_jit(aff_q, seeds_d, mask_d,
                                         tie_probe=0.02),
    )
    # the host flood the exact mode must beat on this fixture
    coords = np.argwhere(seeds > 0)
    order = np.argsort(seeds[tuple(coords.T)])
    coords = coords[order]
    t0 = time.perf_counter()
    affinity_watershed(aff, coords, mask.copy())
    results["host_flood_sec"] = round(time.perf_counter() - t0, 3)
    print(f"host_flood     {results['host_flood_sec']:.3f}s", flush=True)

    results["bc_sec"] = round(
        results["certificate_sec"] - results["minimax_sec"], 3)
    results["repair_sec"] = round(
        results["verified_sec"] - results["certificate_sec"], 3)
    results["pallas_projection_sec"] = round(
        results["verified_sec"] / 3.5, 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cert_phase_profile.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
