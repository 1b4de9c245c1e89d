"""Training benchmark (BASELINE config #4): steps/sec for the jitted
fused forward+backward+double-Adam train step on (10, 256, 256) crops,
batch size 1 (reference training geometry: train.py:272-273,
training_experiments.py:90-92).

Run: python benchmarks/train_bench.py          (real TPU via the session env)

Transfer budget (CLAUDE.md rule — the host link is ~35 MB/s here):
each step uploads x (1,1,10,256,256) f32 = 2.6 MB and y (1,5,10,256,256)
f32 = 13.1 MB -> ~15.7 MB/step ≈ 0.45 s of link time, which dominates the
device compute. The loop therefore measures two numbers:

  steps/sec (resident): inputs already on device — the pure device-step
      rate (what a pod-local data pipeline would sustain);
  steps/sec (streamed): fresh host arrays each step with double-buffered
      async uploads (the train_unet loop's pattern) — link-bound here;
  steps/sec (streamed-compact): the train_unet compact upload — the
      {0,1}-by-construction label channels (affinities + mask under the
      default grammar) ship BIT-PACKED (np.packbits) and are unpacked
      back to f32 on device (bit-identical losses; tests/test_train.py),
      cutting those channels' wire bytes 32x.

Prints one JSON line per configuration.
"""
import json
import os
import sys
import time

# the session pre-imports jax, so env vars are too late — set the
# persistent compile cache through jax.config (effective either way)
def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_compile_cache()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CROP = (10, 256, 256)
C = 5
STEPS = 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from iterseg_tpu.models.unet import UNetSpec, init_params
    from iterseg_tpu.train.train import _make_steps, _split_params
    from iterseg_tpu.train.losses import make_loss_function

    spec = UNetSpec(1, C)
    params = init_params(spec, seed=0)
    trainable, bn_state = _split_params(params)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(trainable)
    loss_fn = make_loss_function("BCELoss")
    train_step, _ = _make_steps(spec, optimizer, loss_fn, loss_fn, C,
                                double_step=True,
                                validate_in_train_mode=True)

    r = np.random.default_rng(0)
    x_np = r.random((1, 1) + CROP, np.float32)
    # production channel mix ('z-1','y-1','x-1','mask','centreness-log'):
    # four binary channels plus one continuous
    y_np = (r.random((1, C) + CROP) > 0.5).astype(np.float32)
    y_np[:, C - 1] = r.random((1,) + CROP, np.float32)

    # measure the torch-CPU reference BEFORE training: the jitted step
    # donates the parameter buffers, deleting `params`
    base = _reference_cpu_step(params, x_np, y_np)

    # compile + warmup
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    t0 = time.perf_counter()
    trainable, bn_state, opt_state, loss, chan = train_step(
        trainable, bn_state, opt_state, x, y, 0
    )
    float(np.asarray(loss))  # block_until_ready lies through the tunnel
    sys.stderr.write(f"compile+first step: {time.perf_counter() - t0:.1f}s\n")

    # device-resident rate (inputs stay on device)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        trainable, bn_state, opt_state, loss, chan = train_step(
            trainable, bn_state, opt_state, x, y, 0
        )
    # consuming the loss bytes on host is the only reliable completion
    # fence on this machine (the tunnel acks block_until_ready early)
    float(np.asarray(loss))
    dt_resident = (time.perf_counter() - t0) / STEPS

    # streamed rate: fresh host arrays, double-buffered async upload
    # (upload of batch i+1 overlaps the dispatched step i)
    batches = [
        (np.ascontiguousarray(x_np + np.float32(i)),
         np.ascontiguousarray(y_np))
        for i in range(STEPS)
    ]
    xb = jnp.asarray(batches[0][0])
    yb = jnp.asarray(batches[0][1])
    t0 = time.perf_counter()
    for i in range(STEPS):
        trainable, bn_state, opt_state, loss, chan = train_step(
            trainable, bn_state, opt_state, xb, yb, 0
        )
        if i + 1 < STEPS:
            xb = jnp.asarray(batches[i + 1][0])
            yb = jnp.asarray(batches[i + 1][1])
    float(np.asarray(loss))
    dt_streamed = (time.perf_counter() - t0) / STEPS

    # streamed-compact rate: the train_unet._prep wire format — binary
    # channels bit-packed, continuous as f32, unpacked + scattered
    # together on device
    bin_idx = list(range(C - 1))
    cont_idx = [C - 1]
    nvox = len(bin_idx) * int(np.prod(CROP))

    @jax.jit
    def assemble(pk, f):
        b = jnp.unpackbits(pk, count=nvox).reshape(
            (1, len(bin_idx)) + CROP)
        yd = jnp.zeros((1, C) + CROP, jnp.float32)
        yd = yd.at[:, bin_idx].set(b.astype(jnp.float32))
        return yd.at[:, cont_idx].set(f)

    cbatches = [
        (np.ascontiguousarray(x_np + np.float32(i)),
         np.packbits(y_np[:, bin_idx].astype(np.uint8)),
         np.ascontiguousarray(y_np[:, cont_idx]))
        for i in range(STEPS)
    ]
    xb = jnp.asarray(cbatches[0][0])
    yb = assemble(jnp.asarray(cbatches[0][1]), jnp.asarray(cbatches[0][2]))
    t0 = time.perf_counter()
    for i in range(STEPS):
        trainable, bn_state, opt_state, loss, chan = train_step(
            trainable, bn_state, opt_state, xb, yb, 0
        )
        if i + 1 < STEPS:
            xb = jnp.asarray(cbatches[i + 1][0])
            yb = assemble(jnp.asarray(cbatches[i + 1][1]),
                          jnp.asarray(cbatches[i + 1][2]))
    float(np.asarray(loss))
    dt_compact = (time.perf_counter() - t0) / STEPS

    mb_per_step = (x_np.nbytes + y_np.nbytes) / 2**20
    mb_compact = (x_np.nbytes + cbatches[0][1].nbytes
                  + cbatches[0][2].nbytes) / 2**20
    out = {
        "metric": "train step (10,256,256) crop, batch 1, double-Adam",
        "value": round(1.0 / dt_resident, 3),
        "unit": "steps/sec (device-resident)",
        "steps_per_sec_streamed": round(1.0 / dt_streamed, 3),
        "steps_per_sec_streamed_compact": round(1.0 / dt_compact, 3),
        "upload_mb_per_step": round(mb_per_step, 1),
        "upload_mb_per_step_compact": round(mb_compact, 1),
        "sec_resident": round(dt_resident, 3),
        "sec_streamed": round(dt_streamed, 3),
        "sec_streamed_compact": round(dt_compact, 3),
        "torch_cpu_sec_per_step": round(base, 3),
        "vs_baseline_streamed": round(base / dt_streamed, 2),
    }
    # MFU of the fused step from XLA's own cost analysis (vs v5e bf16
    # MXU peak — the f32 path runs bf16-operand single-pass matmuls
    # under JAX's default precision, same basis as bench.py)
    from bench import V5E_PEAK_BF16

    try:
        ca = train_step.lower(
            trainable, bn_state, opt_state, x, y, 0
        ).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops:
            out["train_flops"] = flops
            out["train_mfu_vs_bf16_peak"] = round(
                flops / (dt_resident * V5E_PEAK_BF16), 4
            )
    except Exception as e:
        out["cost_analysis_error"] = str(e)[:120]
    print(json.dumps(out))


def _reference_cpu_step(params, x_np, y_np):
    """Reference-semantics torch CPU train step time (fwd+bwd+2x Adam,
    train.py:287-364), measured once and cached."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "baseline_train_cpu.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["sec_per_step"]
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from torch_unet_ref import TorchUNetRef
    from iterseg_tpu.models.convert import params_to_torch_state_dict

    model = TorchUNetRef(1, C)
    model.load_state_dict(params_to_torch_state_dict(params))
    model.train()
    torch.set_num_threads(os.cpu_count() or 1)
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    bce = torch.nn.BCELoss()
    x = torch.from_numpy(x_np)
    y = torch.from_numpy(y_np)

    def step():
        opt.zero_grad()
        loss = bce(model(x), y)
        loss.backward()
        opt.step()
        opt.step()  # reference double-step quirk (train.py:310+353)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(2):
        step()
    sec = (time.perf_counter() - t0) / 2
    with open(cache, "w") as f:
        json.dump({"sec_per_step": sec, "cpu_count": os.cpu_count()}, f)
    return sec


if __name__ == "__main__":
    main()
