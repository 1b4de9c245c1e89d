"""Attribute the device phase of the 256^3 affinity pipeline: H2D vs MXU.

Answers VERDICT r2 #2: is the chip computing or waiting on the ~35 MB/s
host link?  All timings fence by CONSUMING BYTES on host (the tunnel's
``block_until_ready`` acks before execution finishes — CLAUDE.md), via the
4-byte ``n_cand`` scalar that data-depends on the whole F+P+C program:

- ``compute_only``: all u16 z-slabs pre-uploaded, so the timed region is
  pure device compute (+ scalar readback),
- ``with_upload``: the production path (slab H2D pipelined under the
  forward),
- ``upload_only``: raw ``device_put`` of the same bytes.

MFU uses XLA's own ``cost_analysis()`` flops for the compiled forward
executables times their call counts, against the TPU v5e MXU peak
(197 TFLOP/s bf16 — the f32 path also runs bf16-operand single-pass
matmuls under JAX's default precision, so the same peak basis applies).

Writes benchmarks/attribution.json and prints a summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (CHUNK, MARGIN, _enable_compile_cache, get_params,
                   make_volume)

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import V5E_PEAK_BF16  # single source for the MFU peak basis

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "attribution.json")


def fence(x):
    return np.asarray(x)


def median(ts):
    return float(np.median(ts))


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def main():
    from iterseg_tpu.engine.device_pipeline import (AffinityPipeline,
                                                    get_feature_program)
    from iterseg_tpu.engine.predict import UNetModel
    from iterseg_tpu.ops.watershed import _prep_feature_maps

    log("building volume...")
    vol = make_volume()
    params = get_params()
    log("volume + params ready")
    vol_u16 = np.round(vol * 65535.0).astype(np.uint16)
    zyx = vol.shape
    results = {"volume": list(zyx), "chunk": list(CHUNK),
               "margin": list(MARGIN)}

    # raw upload bandwidth (dtype-independent): the full 33.5 MB u16 volume
    log("measuring upload bandwidth...")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s = jax.device_put(vol_u16)
        fence(s[:1, :1, :4])
        ts.append(time.perf_counter() - t0)
        del s
    results["upload_full_sec"] = median(ts)
    results["upload_MB"] = vol_u16.nbytes / 1e6
    results["upload_MBps"] = vol_u16.nbytes / 1e6 / median(ts)

    # per-dtype attribution via THE shared harness (bench.attribute_device
    # — slab pre-upload, n_cand scalar fence, cost_analysis MFU); this
    # file only adds the per-run lists, the raw-upload number above and
    # the trace attempt below
    from bench import attribute_device

    for dtype_name in ("float32", "bfloat16"):
        log(f"[{dtype_name}] attributing (warm compile + 7-run medians)...")
        att = attribute_device(params, vol_u16,
                               compute_dtype=jnp.dtype(dtype_name),
                               n_runs=7, return_runs=True)
        results[f"{dtype_name}_compute_only_sec"] = att["device_compute_sec"]
        results[f"{dtype_name}_compute_only_runs"] = att["runs"][
            "compute_only"]
        results[f"{dtype_name}_with_upload_sec"] = att[
            "device_with_upload_sec"]
        results[f"{dtype_name}_with_upload_runs"] = att["runs"][
            "with_upload"]
        results[f"{dtype_name}_flops"] = att["flops"]
        results[f"{dtype_name}_mfu_vs_bf16_peak"] = att["mfu_vs_bf16_peak"]

    # profiler trace attempt (device-side ground truth, if the tunnel
    # backend supports it)
    trace_dir = "/tmp/iterseg_trace"
    try:
        model = UNetModel(params)
        pipe = AffinityPipeline(model, chunk_size=CHUNK, margin=MARGIN,
                                normalize=True)
        program = get_feature_program(model, zyx, CHUNK, MARGIN,
                                      normalize=True)
        cand = pipe._cand_program(zyx)
        jax.profiler.start_trace(trace_dir)
        out = program(vol_u16)
        aff, cent, otsu = _prep_feature_maps(out[:3], out[4], out[3])
        _, _, n_cand = cand(cent, out[3], otsu)
        int(n_cand)
        jax.profiler.stop_trace()
        results["trace_dir"] = trace_dir
    except Exception as e:
        results["trace_error"] = str(e)[:300]

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
