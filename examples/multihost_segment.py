"""Pod-scale frame-parallel segmentation + sharded assessment.

Every host of a DCN-connected pod runs THIS SAME SCRIPT (SPMD over
frames). On a real pod the jax.distributed runtime is initialised from
the cluster environment; to try it on one machine, launch two processes:

    python examples/multihost_segment.py --port 29600 --pid 0 --n 2 &
    python examples/multihost_segment.py --port 29600 --pid 1 --n 2

Each host segments frames ``t % n_hosts == host_id`` of the shared input
zarr into disjoint one-frame chunks of the shared output zarr, then the
evaluation chunk grid is sharded and the metric rows all-gathered so host
0's CSVs equal a single-host run (see tests/test_multihost.py for the
bit-equality assertions).
"""
import argparse
import os

import numpy as np

from iterseg_tpu.core.chunks import get_slices_from_chunks
from iterseg_tpu.io.zarr_io import open_zarr, zarr_save
from iterseg_tpu.parallel import multihost as mh

CHUNK, MARGIN = (10, 128, 128), (1, 16, 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/mh_demo/in.zarr")
    ap.add_argument("--output", default="/tmp/mh_demo/out.zarr")
    ap.add_argument("--gt", default=None, help="optional GT zarr to score")
    ap.add_argument("--segmenter", default="DoG-blob-watershed")
    ap.add_argument("--config", default=None,
                    help="segmenter config JSON / checkpoint path")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()

    if args.port is not None:
        mh.init_multihost(f"localhost:{args.port}", num_processes=args.n,
                          process_id=args.pid)

    if not os.path.exists(os.path.join(args.input, ".zarray")):
        # demo data: 4 frames of noisy blobs (host 0 writes; others wait)
        host_id, _ = mh._resolve_host(args.pid, args.n)
        if host_id == 0:
            from scipy import ndimage as ndi

            r = np.random.default_rng(0)
            frames = []
            for _ in range(4):
                v = np.zeros((10, 128, 128), np.float32)
                pts = np.stack([r.integers(2, s - 2, 40) for s in v.shape], 1)
                v[tuple(pts.T)] = 1.0
                v = ndi.gaussian_filter(v, (1, 2, 2))
                frames.append(v / v.max())
            zarr_save(args.input, np.stack(frames))
        else:
            mh._wait_for_zarr(args.input)

    done = mh.multihost_segment_zarr(
        args.input, args.output, segmenter=args.segmenter,
        network_or_config_file=args.config,
        chunk_size=CHUNK, margin=MARGIN,
    )
    print(f"host segmented frames: {done}")

    if args.gt is not None:
        gt = np.asarray(open_zarr(args.gt))
        seg = np.asarray(open_zarr(args.output))
        slices = get_slices_from_chunks(seg.shape, CHUNK, MARGIN)
        (scores, ap_curve), stats = mh.multihost_accuracy_metrics(
            slices, gt, seg, "pod", "metrics",
            out_path=os.path.dirname(args.output),
        )
        print(stats.T)


if __name__ == "__main__":
    main()
