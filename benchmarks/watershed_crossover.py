"""Engineering curve for the on-device watershed decision (VERDICT #10).

The production affinity watershed runs as native C++ on the host,
overlapped with device compute; PARITY.md's argument is that on this
machine's ~35-50 MB/s host link, shipping the label volume back costs
more than the whole host half.  That argument hinges on the link
bandwidth — on pod-class hosts (GB/s PCIe) it could invert.  This
script turns the design decision into a measured curve:

    host path   latency(B) = host_bytes / B + t_cpp_flood
    device path latency(B) = t_dev_flood + dev_bytes / B

where ``host_bytes`` is what production actually downloads for the host
flood (the (3, m) f32 in-mask affinity gather — NOT the dense volume)
and ``dev_bytes`` is the label volume coming back (u16 when the label
count allows, else i32).  The crossover bandwidth

    B* = (host_bytes - dev_bytes) / (t_dev_flood - t_cpp_flood)

is where the two latencies meet (when the signs agree; otherwise one
path dominates everywhere).  Both floods and the realistic fixture are
measured on the real chip / this host; only B is swept.

Notes on method (CLAUDE.md): ``block_until_ready`` through the tunnel
acks before execution finishes, so every device timing below is fenced
by consuming bytes on host; the flood-only time is fenced by consuming
a TINY (8-voxel) slice of the labels — the whole output buffer must be
computed before any byte can be fetched, and the 33.5 MB full download
is measured separately (the tunnel's bandwidth swings several-fold
between runs, so subtracting two large-download medians taken minutes
apart attributes weather to the kernel).  The wavefront flood is an approximation (oracle
agreement is printed alongside — see ops/device_flood.py); the curve
is therefore an *upper bound* on attractiveness of the device path,
since closing the last percent of agreement can only add work.

Run (real TPU, foreground, one process):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/watershed_crossover.py
"""
import argparse
import json
import time

import numpy as np
from scipy import ndimage as ndi


def build_fixture(shape=(256, 256, 256), n_blobs=2000, seed=0):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([r.integers(3, s - 3, size=n_blobs) for s in shape], 1)
    vol[tuple(pts.T)] = 1.0
    vol = ndi.gaussian_filter(vol, (1.5, 3, 3))
    vol /= vol.max()
    aff = np.stack([1.0 - vol] * 3).astype(np.float32)
    mask = vol > 0.08
    for a in range(3):
        mask[(slice(None),) * a + (0,)] = False
        mask[(slice(None),) * a + (-1,)] = False
    mx = ndi.maximum_filter(vol, size=5)
    seeds_zyx = np.argwhere((vol == mx) & mask)
    return aff, seeds_zyx, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--blobs", type=int, default=2000)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iterseg_tpu.ops.device_flood import wavefront_flood_jit
    from iterseg_tpu.ops.pallas_flood import pallas_flood_jit
    from iterseg_tpu.ops.watershed import affinity_watershed

    shape = (args.size,) * 3
    voxels = int(np.prod(shape))
    print(f"# fixture {shape}, building ...", flush=True)
    aff, coords, mask = build_fixture(shape, args.blobs)
    m_vox = int(mask.sum())
    n_seeds = len(coords)
    print(f"# in-mask voxels {m_vox} ({m_vox/voxels:.1%}), seeds {n_seeds}",
          flush=True)

    # ---- host path: native C++ heap flood (the production kernel) ----
    t_cpp = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        host_labels = affinity_watershed(aff, coords, mask.copy())
        t_cpp.append(time.perf_counter() - t0)
    t_cpp_flood = float(np.median(t_cpp))
    print(f"# host C++ flood {t_cpp_flood:.3f}s (runs {np.round(t_cpp,3)})",
          flush=True)
    # what production downloads for it: (3, m) f32 affinity gather
    host_bytes = 3 * 4 * m_vox

    # ---- device path: wavefront flood on the chip ----
    seeds_img = np.zeros(shape, np.int32)
    seeds_img[tuple(coords.T)] = np.arange(1, n_seeds + 1, dtype=np.int32)
    dev = jax.devices()[0]
    aff_d = jax.device_put(jnp.asarray(aff), dev)
    seeds_d = jax.device_put(jnp.asarray(seeds_img), dev)
    mask_d = jax.device_put(jnp.asarray(mask), dev)
    # production would ship labels as u16 when the count allows
    label_dtype = jnp.uint16 if n_seeds < 2 ** 16 else jnp.int32
    to_wire = jax.jit(lambda x: x.astype(label_dtype))
    fresh = jax.jit(lambda x: x + 0)  # new buffer, same dtype (weak 0)
    # warmup / compile
    lab_d, it, conv = wavefront_flood_jit(aff_d, seeds_d, mask_d,
                                          mode="claim", max_iters=512)
    lab16_d = to_wire(lab_d)
    lab_host = np.asarray(lab_d).astype(np.int32)  # fence
    n_iters, converged = int(it), bool(conv)
    print(f"# device flood compiled; iters={n_iters} converged={converged}",
          flush=True)

    # download-only reference: a FRESH device buffer each run (np.asarray
    # of an already-fetched jax.Array serves its cached host copy)
    np.asarray(fresh(lab16_d))  # compile the copy
    t_dl = []
    for _ in range(args.runs):
        buf = fresh(lab16_d)
        t0 = time.perf_counter()
        np.asarray(buf)
        t_dl.append(time.perf_counter() - t0)
    t_download = float(np.median(t_dl))

    t_full = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out, _, _ = wavefront_flood_jit(aff_d, seeds_d, mask_d,
                                        mode="claim", max_iters=512)
        np.asarray(out[:2, :2, :2])  # tiny fence: full buffer computed
        t_full.append(time.perf_counter() - t0)
    t_dev_flood = float(np.median(t_full))

    # ---- device path #2: the Pallas Gauss-Seidel kernel ----
    # (same claim rule, tile-local VMEM iterations + sequential-grid
    # Gauss-Seidel sweeps — ops/pallas_flood; inner_cap=1 is the
    # fidelity-first production setting)
    lab_p, sweeps, conv_p = pallas_flood_jit(
        aff_d, seeds_d, mask_d, max_sweeps=128, inner_cap=1)
    lab_p_host = np.asarray(lab_p).astype(np.int32)
    t_full_p = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out, _, _ = pallas_flood_jit(aff_d, seeds_d, mask_d,
                                     max_sweeps=128, inner_cap=1)
        np.asarray(out[:2, :2, :2])
        t_full_p.append(time.perf_counter() - t0)
    t_pallas_flood = float(np.median(t_full_p))
    print(f"# pallas flood {t_pallas_flood:.3f}s ({int(sweeps)} sweeps, "
          f"converged={bool(conv_p)})", flush=True)
    wire_bytes = label_dtype(0).dtype.itemsize * voxels
    link_bw = wire_bytes / t_download  # measured tunnel bandwidth
    print(f"# xla flood {t_dev_flood:.3f}s (tiny-fenced), label dl-only "
          f"{t_download:.3f}s; link {link_bw/1e6:.1f} MB/s", flush=True)

    # agreement vs the exact host flood on this fixture
    sel = mask & (host_labels > 0)
    agreement = float((lab_host[sel] == host_labels[sel]).mean())
    agreement_pallas = float(
        (lab_p_host[sel] == host_labels[sel]).mean())

    dev_bytes = (2 if n_seeds < 2 ** 16 else 4) * voxels

    # ---- the curve (device side = the faster kernel, i.e. Pallas) ----
    t_best_dev = min(t_dev_flood, t_pallas_flood)
    num = host_bytes - dev_bytes
    den = t_best_dev - t_cpp_flood
    crossover = num / den if den != 0 else float("inf")
    # device wins at bandwidth B iff
    #   t_dev + dev_bytes/B < host_bytes/B + t_cpp
    sweep = {}
    for bw_mb in (35, 100, 500, 2000, 8000, 16000):
        B = bw_mb * 1e6
        sweep[f"{bw_mb}MBps"] = {
            "host_s": round(host_bytes / B + t_cpp_flood, 3),
            "device_s": round(t_best_dev + dev_bytes / B, 3),
        }

    print(json.dumps({
        "metric": f"watershed crossover on {args.size}^3",
        "t_cpp_flood_s": round(t_cpp_flood, 3),
        "t_dev_flood_s": round(t_dev_flood, 3),
        "t_pallas_flood_s": round(t_pallas_flood, 3),
        "pallas_sweeps": int(sweeps),
        "pallas_converged": bool(conv_p),
        "agreement_pallas": round(agreement_pallas, 4),
        "dev_iters": n_iters,
        "dev_converged": converged,
        "agreement": round(agreement, 4),
        "host_download_bytes": host_bytes,
        "device_download_bytes": dev_bytes,
        "measured_link_MBps": round(link_bw / 1e6, 1),
        "crossover_MBps": (round(crossover / 1e6, 1)
                           if np.isfinite(crossover) else None),
        "latency_sweep": sweep,
    }), flush=True)


if __name__ == "__main__":
    main()
