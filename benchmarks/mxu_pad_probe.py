"""MXU output-channel padding probe (VERDICT r3 weak #2 / next #4).

Question: the early U-Net convs emit 32 output channels — a quarter of
the 128-wide MXU. Does zero-padding the conv's OUTPUT channels to 64/128
(bit-exact for the retained channels: the contraction dim is unchanged,
extra filters are zero) and slicing back run FASTER than the narrow
conv, i.e. is the measured ~2.5%-of-peak early-conv efficiency a layout
artefact rather than an architecture ceiling?

Measures, on the real chip, per layer geometry of the 256³ bench run
(microbatch B=8, chunk (10,256,256), encoder level-0 convs where the
channel deficit is worst):

  conv1x: 1 -> 32   (c0.conv0)   out padded to {32, 64, 128}
  conv32: 32 -> 32  (c0.conv1)   out padded to {32, 64, 128}

Each timed as median of ``n`` runs, fenced by consuming a 4-byte slice
of the result (block_until_ready lies through the tunnel — CLAUDE.md).
Writes benchmarks/mxu_pad_probe.json and prints a verdict line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mxu_pad_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from iterseg_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

B = 8
SPATIAL = (10, 256, 256)
N_RUNS = 7


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.ravel()[:1])  # fence: consume bytes
    ts = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), [round(t, 4) for t in ts]


def conv_variant(cin, cout, cpad):
    """conv3d NCDHW with ``cout`` live filters zero-padded to ``cpad``,
    sliced back to ``cout`` — numerically the live channels are the
    narrow conv's, bit for bit."""
    r = np.random.default_rng(0)
    w = np.zeros((cpad, cin, 3, 3, 3), np.float32)
    w[:cout] = r.standard_normal((cout, cin, 3, 3, 3)).astype(
        np.float32) * 0.05

    @jax.jit
    def fn(x, w):
        y = lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return y[:, :cout]

    x = jnp.asarray(
        r.standard_normal((B, cin) + SPATIAL).astype(np.float32)
    )
    return fn, x, jnp.asarray(w)


def main():
    assert jax.default_backend() == "tpu", "probe needs the real chip"
    results = {}
    for name, cin, cout in (("conv1x", 1, 32), ("conv32", 32, 32)):
        row = {}
        for cpad in (cout, 64, 128):
            fn, x, w = conv_variant(cin, cout, cpad)
            med, runs = timed(fn, x, w)
            row[f"pad{cpad}"] = {"median_sec": round(med, 4),
                                 "runs": runs}
            sys.stderr.write(
                f"{name} out{cout}->pad{cpad}: {med:.4f}s {runs}\n"
            )
        base = row[f"pad{cout}"]["median_sec"]
        for cpad in (64, 128):
            row[f"speedup_pad{cpad}"] = round(
                base / row[f"pad{cpad}"]["median_sec"], 3
            )
        results[name] = row
    win = any(
        results[n][f"speedup_pad{p}"] > 1.05
        for n in results for p in (64, 128)
    )
    results["verdict"] = (
        "POSITIVE: padding narrow conv outputs to MXU width is faster — "
        "wire it behind the shared program" if win else
        "NEGATIVE: padded-output convs are not faster (>5% bar) — the "
        "narrow-channel MXU underutilisation is not recoverable by "
        "output padding; the ~10% MFU ceiling stands as architectural"
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mxu_pad_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(results["verdict"])


if __name__ == "__main__":
    main()
