"""Randomised bit-exactness fuzz for the hybrid-exact floods.

Hammers ``exact_affinity_flood`` / ``exact_image_flood`` against the
sequential heap oracles across randomly drawn fixture families —
continuous white noise, coarsely quantised affinities (massed exact
ties), duplicated-channel smooth fields, distinct-channel smooth
fields, saturated (sigmoid-like) fields, random masks with unreachable
components, 1-seed and 0-seed cases — asserting
``np.array_equal(exact, oracle)`` on every draw and tallying the
certificate paths taken.

This is the out-of-suite confidence run for docs/exact_flood.md §5
(the in-suite tests pin 4 classes × 3 seeds); run it after any change
to ops/flood_exact, the certificate, or the native repair flood:

    PYTHONPATH='' JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python benchmarks/exact_flood_fuzz.py --n 100
"""
import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from scipy import ndimage as ndi


def random_case(rng, shapes=None):
    """One random affinity fixture from a random family.

    ``shapes``: optional shape-bucket list (the in-suite seeded subset,
    ``tests/test_flood_fuzz.py``, pins one bucket so the certificate
    compiles once and is shared with the rest of the suite)."""
    family = rng.choice(
        ["noise", "quant", "smooth-dup", "smooth-distinct", "saturated"]
    )
    # fixed shape buckets: each certificate shape compiles once (~30 s
    # on this 1-core host) and every later case of that shape is fast
    if shapes is None:
        shapes = [(8, 16, 16), (10, 20, 24), (12, 24, 20)]
    shape = shapes[int(rng.integers(0, len(shapes)))]
    vol = np.zeros(shape, np.float32)
    n = int(rng.integers(1, 14))
    pts = np.stack([rng.integers(2, s - 2, size=n) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.2, 2.5, 2.5))
    vol = vol / max(vol.max(), 1e-6)
    if family == "noise":
        aff = rng.random((3,) + shape).astype(np.float32)
    elif family == "quant":
        levels = int(rng.integers(2, 5))
        aff = (rng.integers(0, levels, size=(3,) + shape)
               / max(levels - 1, 1)).astype(np.float32)
    elif family == "smooth-dup":
        aff = np.stack([1.0 - vol] * 3).astype(np.float32)
    elif family == "smooth-distinct":
        aff = np.stack([
            ndi.gaussian_filter(
                1.0 - vol + rng.normal(0, 0.01, shape).astype(np.float32),
                0.5)
            for _ in range(3)
        ]).astype(np.float32)
    else:  # saturated: sigmoid-like, many exact 0/1 values
        logits = (1.0 - 2 * vol) * 40 + rng.normal(0, 4, shape)
        a = 1.0 / (1.0 + np.exp(-logits.astype(np.float32)))
        aff = np.stack([a] * 3).astype(np.float32)

    if rng.random() < 0.3:
        # random blobby mask with possible unreachable components
        mask = ndi.gaussian_filter(
            rng.random(shape).astype(np.float32), 2) > 0.5
    else:
        mask = vol > float(rng.uniform(0.02, 0.3))
    for a_ in range(3):
        mask[(slice(None),) * a_ + (0,)] = False
        mask[(slice(None),) * a_ + (-1,)] = False
    in_mask = np.argwhere(mask)
    k = int(rng.integers(0, min(10, max(len(in_mask), 1)) + 1))
    if len(in_mask) and k:
        sel = rng.choice(len(in_mask), size=k, replace=False)
        coords = in_mask[sel]
        coords = np.unique(coords, axis=0)
    else:
        coords = np.zeros((0, 3), np.int64)
    return family, aff, coords, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from iterseg_tpu.ops.flood_exact import (
        exact_affinity_flood,
        exact_image_flood,
    )
    from iterseg_tpu.ops.watershed_oracle import (
        affinity_flood_py,
        image_flood_py,
    )

    rng = np.random.default_rng(args.seed)
    paths = collections.Counter()
    fams = collections.Counter()
    t0 = time.time()
    for i in range(args.n):
        family, aff, coords, mask = random_case(rng)
        oracle = affinity_flood_py(aff, coords, mask.copy())
        # production routing (guards on) AND guards-off: the second run
        # forces certificate + repair to actually execute on tie-heavy
        # draws — the regression class whose false-accept this fuzz
        # caught would otherwise be routed to the host flood before the
        # repair ever ran (round-5 early exits)
        for mode, kw in (("", {}),
                         ("!", {"tie_probe": 0.0, "repair_doom": 0.0})):
            tele = {}
            got = exact_affinity_flood(aff, coords, mask,
                                       telemetry=tele, **kw)
            if not np.array_equal(got, oracle):
                print(f"MISMATCH affinity case {i} family={family} "
                      f"guards={'off' if mode else 'on'}")
                sys.exit(1)
            paths[f"aff{mode}:" + tele["path"]] += 1
        fams[family] += 1
        # image flood on a derived EDT-ish landscape every few cases
        if i % 3 == 0:
            dist = ndi.distance_transform_edt(mask)
            image = (-dist).astype(np.float32)
            markers = np.zeros(mask.shape, np.int32)
            if len(coords):
                markers[tuple(coords.T)] = np.arange(
                    1, len(coords) + 1, dtype=np.int32)
            oracle_i = image_flood_py(image, markers, mask)
            for mode, kw in (("", {}),
                             ("!", {"tie_probe": 0.0,
                                    "repair_doom": 0.0})):
                tele_i = {}
                got_i = exact_image_flood(image, markers, mask,
                                          telemetry=tele_i, **kw)
                if not np.array_equal(got_i, oracle_i):
                    print(f"MISMATCH image case {i} family={family} "
                          f"guards={'off' if mode else 'on'}")
                    sys.exit(1)
                paths[f"img{mode}:" + tele_i["path"]] += 1
        if (i + 1) % 20 == 0:
            print(f"{i+1}/{args.n} ok ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"ALL {args.n} affinity (+{paths and sum(v for k, v in paths.items() if k.startswith('img:'))} image) cases BIT-EXACT "
          f"in {time.time()-t0:.0f}s")
    print("families:", dict(fams))
    print("paths:", dict(paths))


if __name__ == "__main__":
    main()
