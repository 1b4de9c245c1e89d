"""U-Net training engine (optax Adam on TPU).

Parity with iterseg ``train.py:25-432``: batch-size-1 epoch loop with
per-channel loss logging, validation at the start of training and after
every epoch, per-epoch checkpoints, timestamped final checkpoint, and
loss/validation CSVs.

Reference quirks handled explicitly:
- **Double optimiser step** (train.py:310+353): the reference applies the
  optimiser twice per batch with the same gradients (the second step reuses
  the un-zeroed grads, advancing Adam moments again). Replicated by default
  (``double_step=True``) for behavioural parity; pass False for a standard
  single step.
- **Validation in train mode**: the reference never calls ``model.eval()``,
  so validation uses batch statistics *and updates the running stats*.
  Replicated (``validate_in_train_mode=True`` default).
- Validation predictions are saved as multi-page float32 ``.tif`` files
  (the reference's contract, train.py:425-432), written with PIL.

The jitted train step fuses forward+backward+both Adam applications into a
single XLA program; parameters stay on device across the epoch loop and the
host only sees scalar losses.
"""
from __future__ import annotations

import os
from datetime import datetime
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..helpers import LINE, write_log
from ..models.convert import save_checkpoint, load_checkpoint
from ..models.unet import UNetSpec, forward
from .labels import is_binary_channel as _is_binary_channel
from .losses import make_loss_function, channel_losses
from .train_io import load_tensor_from_zarr

__all__ = ["train_unet"]


def _split_params(params):
    """(trainable, bn_state): running stats are state, not weights."""
    bn = {k: v for k, v in params.items()
          if k.endswith(("running_mean", "running_var"))}
    trainable = {k: v for k, v in params.items() if k not in bn}
    return trainable, bn


def _make_steps(spec, optimizer, loss_fn, chan_log_fn, n_channels,
                double_step, validate_in_train_mode):
    # params/opt-state buffers are donated: the updated pytrees reuse the
    # old device memory, halving the train step's HBM footprint (on CPU
    # backends donation is a silent no-op)
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(trainable, bn_state, opt_state, x, y, epoch):
        def loss_wrapped(tr):
            params = {**tr, **bn_state}
            out, updates = forward(params, spec, x, train=True)
            loss = loss_fn(out, y, epoch)
            return loss, (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(trainable)
        u1, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, u1)
        if double_step:
            # second step with the same grads (reference parity)
            u2, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, u2)
        new_bn = {**bn_state, **updates}
        chan = jnp.stack(channel_losses(out, y, chan_log_fn, n_channels,
                                        epoch))
        return trainable, new_bn, opt_state, loss, chan

    @jax.jit
    def val_step(trainable, bn_state, x, y, epoch):
        params = {**trainable, **bn_state}
        if validate_in_train_mode:
            out, updates = forward(params, spec, x, train=True)
            new_bn = {**bn_state, **updates}
        else:
            out = forward(params, spec, x, train=False)
            new_bn = bn_state
        loss = loss_fn(out, y, epoch)
        return loss, out, new_bn

    return train_step, val_step


def train_unet(
    # training data
    x,
    vx,
    y,
    vy,
    ids=None,
    vids=None,
    # output information
    out_dir=None,
    name="my-unet",
    channels=None,
    # training variables
    validate=True,
    log=True,
    epochs=3,
    lr=0.01,
    loss_function="BCELoss",
    chan_weights=None,
    weights=None,
    update_every=20,
    losses=None,
    chan_losses=None,
    # network architecture
    fork_channels=None,
    chan_final_activations=None,
    # quirk switches (see module docstring)
    double_step=True,
    validate_in_train_mode=True,
    seed=0,
    # TPU-native scaling (keyword-only extensions)
    mesh=None,
    n_devices=None,
    **kwargs,
):
    """Train the anisotropic U-Net. Signature parity with iterseg
    ``train.py:25-120``; returns ``(model, unet_path)``.

    ``x/vx``: lists of (z, y, x) image chunks (arrays or zarr-backed);
    ``y/vy``: matching (C, z, y, x) target chunks.

    ``mesh`` / ``n_devices``: TPU-native extensions that shard training
    over a device mesh (``parallel.mesh.make_sharded_train_step``): the
    chunk list is batched across the mesh's ``data`` axis (one chunk per
    data-row per step, x spatially sharded over ``space``, gradients
    all-reduced over ICI by the partitioner). Documented deviation from
    the reference's batch-size-1 loop (train.py:272-273): each optimiser
    step averages gradients over ``data``-many chunks (so an epoch takes
    ``ceil(n/data)`` steps) and BatchNorm uses cross-chunk batch
    statistics; a tail batch repeat-pads the last chunk. Loss CSVs get
    one row per step with the batched ids joined by ``;``. Default
    (``mesh=None``) keeps exact batch-1 reference semantics.
    """
    from ..engine.predict import UNetModel
    from ..models.unet import init_params

    save_output = out_dir is not None
    print("Output will be saved: ", save_output)
    print("Save directory: ", out_dir)
    if ids is None:
        ids = [name + f"_{i}" for i in range(len(x))]
    if vids is None:
        vids = [name + f"_val_{i}" for i in range(len(vx))]
    channels = _index_channels_if_none(channels, y)
    # model
    if fork_channels is None:
        spec = UNetSpec(1, len(channels),
                        chan_final_activations=chan_final_activations)
    else:
        spec = UNetSpec(1, tuple(fork_channels),
                        chan_final_activations=chan_final_activations)
    params = init_params(spec, seed=seed)
    weights_are = "naive"
    if weights is not None:
        if isinstance(weights, (str, os.PathLike)):
            params = load_checkpoint(weights)
        else:
            params = {k: jnp.asarray(np.asarray(v))
                      for k, v in dict(weights).items()}
        weights_are = "pretrained"
    trainable, bn_state = _split_params(params)
    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(trainable)
    loss_fn = make_loss_function(loss_function, chan_weights, losses,
                                 chan_losses)
    chan_log_fn = (
        loss_fn
        if loss_function in ("BCELoss", "DiceLoss", "DICELoss", "MSELoss")
        else make_loss_function("BCELoss")
    )
    if mesh is None and n_devices is not None:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(int(n_devices))
    sharded_step = None
    if mesh is not None:
        from ..parallel.mesh import make_sharded_train_step

        sharded_step = make_sharded_train_step(
            mesh, spec, loss_fn, optimizer, double_step=double_step,
            chan_log_fn=chan_log_fn, n_channels=len(channels),
        )
    train_step, val_step = _make_steps(
        spec, optimizer, loss_fn, chan_log_fn, len(channels), double_step,
        validate_in_train_mode,
    )
    loss_dict = _get_loss_dict(channels)
    validation_dict = {"epoch": [], "validation_loss": [], "data_id": [],
                       "batch_id": []}
    _print_train_info(loss_function, chan_weights, epochs, lr, weights_are,
                      str(jax.devices()[0]), out_dir, log and save_output,
                      chan_losses, losses, channels, fork_channels)

    # compact label uploads: channels that are {0,1} by construction
    # (affinity offsets and non-smoothed masks, train/labels.py grammar)
    # ship BIT-PACKED — 1/32 the bytes of f32 over the thin host link,
    # which is the training bottleneck (benchmarks/train_bench.py budget)
    # — and are unpacked back to f32 on device (bit -> f32 is exact:
    # losses bit-equal, tests/test_train.py). The binary/continuous split
    # is decided from the GRAMMAR, not the data, so input shapes never
    # flap and the train step never retraces; a cheap runtime {0,1} check
    # still guards custom data, falling back to the f32 upload.
    bin_idx = tuple(i for i, ch in enumerate(channels)
                    if _is_binary_channel(ch))
    cont_idx = tuple(i for i in range(len(channels)) if i not in bin_idx)
    n_chan = len(channels)
    _assemble_cache = {}

    def _get_assemble(spatial):
        if spatial not in _assemble_cache:
            nvox = len(bin_idx) * int(np.prod(spatial))

            @jax.jit
            def assemble(pk, f):
                bits = jnp.unpackbits(pk, count=nvox)
                b = bits.reshape((1, len(bin_idx)) + spatial)
                y = jnp.zeros((1, n_chan) + spatial, jnp.float32)
                y = y.at[:, list(bin_idx)].set(b.astype(jnp.float32))
                if cont_idx:
                    y = y.at[:, list(cont_idx)].set(f)
                return y

            _assemble_cache[spatial] = assemble
        return _assemble_cache[spatial]

    def _prep(img, tgt):
        xb = np.asarray(load_tensor_from_zarr(0, [img]), dtype=np.float32)
        yb = np.asarray(load_tensor_from_zarr(0, [tgt]), dtype=np.float32)
        # async uploads: the host→device copy of batch i+1 overlaps the
        # device compute of batch i (the thin host link is the training
        # bottleneck — see benchmarks/train_bench.py for the budget)
        xd = jnp.asarray(xb[None, None])
        if bin_idx:
            yb_bin = yb[list(bin_idx)]
            if ((yb_bin == 0) | (yb_bin == 1)).all():
                pk = jnp.asarray(np.packbits(yb_bin.astype(np.uint8)))
                f = (jnp.asarray(yb[list(cont_idx)][None]) if cont_idx
                     else jnp.zeros((1, 0), jnp.float32))
                return xd, _get_assemble(yb.shape[1:])(pk, f)
        return xd, jnp.asarray(yb[None])

    v_y_hats = None

    def run_validation(e, batch_no):
        nonlocal bn_state
        v_y_hats = []
        total = 0.0
        for i in range(len(vx)):
            xb, yb = _prep(vx[i], vy[i])
            # the loss epoch is PINNED at 0 for validation: the reference
            # sets its separate v_loss object's epoch only inside
            # `if validate and e == 0` (train.py:297-299), so epoch-
            # weighted validation losses always use the epoch-0 weights
            vl, out, bn_state = val_step(trainable, bn_state, xb, yb, 0)
            v_y_hats.append(np.asarray(out))
            total += float(vl)
            validation_dict["epoch"].append(e)
            validation_dict["validation_loss"].append(float(vl))
            validation_dict["data_id"].append(vids[i])
            validation_dict["batch_id"].append(batch_no)
        if len(vx):
            s = f"Epoch {e} - validation loss: {total / len(vx)}"
            print(s)
            if log and save_output:
                write_log(s, out_dir)
        return v_y_hats

    def _load_batch(idxs):
        """Stack chunks idxs into a ((b,1,z,y,x), (b,C,z,y,x)) numpy batch."""
        xb = np.stack([
            np.asarray(load_tensor_from_zarr(0, [x[i]]), dtype=np.float32)
            for i in idxs
        ])[:, None]
        yb = np.stack([
            np.asarray(load_tensor_from_zarr(0, [y[i]]), dtype=np.float32)
            for i in idxs
        ])
        return xb, yb

    def _record(e, step_no, loss, chan, data_id):
        loss_dict["epoch"].append(e)
        loss_dict["batch_num"].append(step_no)
        loss_dict["loss"].append(loss)
        loss_dict["data_id"].append(data_id)
        for ci, c in enumerate(channels):
            loss_dict[c].append(float(chan[ci]))

    if sharded_step is not None:
        # mesh path: dp chunks per step, repeat-padded tail batch
        dp = mesh.shape["data"]
        steps = []
        for b0 in range(0, len(x), dp):
            idxs = list(range(b0, min(b0 + dp, len(x))))
            steps.append(idxs + [idxs[-1]] * (dp - len(idxs)))
        step_fn, load = sharded_step, _load_batch

        def _step_id(idxs):
            return ";".join(ids[i] for i in dict.fromkeys(idxs))
    else:
        steps = [[i] for i in range(len(x))]
        step_fn = train_step

        def load(idxs):
            return _prep(x[idxs[0]], y[idxs[0]])

        def _step_id(idxs):
            return ids[idxs[0]]

    for e in range(epochs):
        if validate and e == 0:
            v_y_hats = run_validation(0, 0)
        running_loss = 0.0
        batch = load(steps[0]) if steps else None
        for si, idxs in enumerate(steps):
            xb, yb = batch
            trainable, bn_state, opt_state, loss, chan = step_fn(
                trainable, bn_state, opt_state, xb, yb, e
            )
            if si + 1 < len(steps):
                # double-buffer: read + upload the next batch while the
                # dispatched step runs on device
                batch = load(steps[si + 1])
            loss = float(loss)
            _record(e, si, loss, np.asarray(chan), _step_id(idxs))
            running_loss += loss
            if si % update_every == (update_every - 1):
                s = (f"Epoch {e} - running loss: "
                     f"{running_loss / update_every}")
                print(s)
                if log and save_output:
                    write_log(s, out_dir)
                running_loss = 0.0
        if validate:
            v_y_hats = run_validation(e, (e + 1) * len(steps))
        if save_output:
            print("Saving Training Checkpoint...")
            _save_checkpoint_file({**trainable, **bn_state}, out_dir,
                                  f"{name}_epoch-{e}")

    params = {**trainable, **bn_state}
    unet_path = None
    if save_output:
        print("Saving Final Results...")
        unet_path = _save_final_results(params, out_dir, name, ids, validate,
                                        loss_dict, v_y_hats, vids,
                                        validation_dict)
    model = UNetModel(params, spec)
    return model, unet_path


# ---------------------------------------------------------------------------
# bookkeeping (parity: train.py:228-432)
# ---------------------------------------------------------------------------


def _index_channels_if_none(channels, y):
    if channels is None:
        first = y[0]
        # shape is metadata for arrays/zarr — don't read the whole chunk
        c = (first.shape[0] if hasattr(first, "shape")
             else np.asarray(first).shape[0])
        return tuple("channel_" + str(i) for i in range(c))
    return tuple(channels)


def _get_loss_dict(channels):
    loss_dict = {"epoch": [], "batch_num": [], "loss": [], "data_id": []}
    for c in channels:
        loss_dict[c] = []
    return loss_dict


def _print_train_info(loss_function, chan_weights, epochs, lr, weights_are,
                      device_name, out_dir, log, chan_losses, losses,
                      channels, fork_channels):
    s = LINE + "\n" + f"Loss function: {loss_function} \n"
    if chan_weights is not None:
        s += f"    Loss function channel weights: {chan_weights} \n"
    if losses is not None:
        for i, l in enumerate(losses):
            s += f"    Loss for channels {chan_losses[i]}: {l}\n"
    s += "Optimiser: Adam \n" + f"Learning rate: {lr} \n" + LINE + "\n"
    s += f"Training {weights_are} U-net for {epochs} epochs with batch size 1 \n"
    s += f"Device: {device_name} \n"
    if channels is not None:
        s += f"Channels: {channels}\n"
    if fork_channels is not None:
        s += (
            f"Channels per fork (according to channel order): "
            f"{fork_channels}\n"
        )
    s += LINE
    print(s)
    if log:
        write_log(LINE, out_dir)
        write_log(s, out_dir)


def _save_checkpoint_file(params, out_dir, name, r=False):
    d = datetime.now().strftime("%y%d%m_%H%M%S")
    fname = d + "_unet_" + name + ".npz"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, fname)
    save_checkpoint(params, path)
    if r:
        return path


def _save_final_results(params, out_dir, name, ids, validate, loss_dict,
                        v_y_hats, v_ids, validation_dict):
    unet_path = _save_checkpoint_file(params, out_dir, name, r=True)
    loss_df = pd.DataFrame(loss_dict)
    loss_df.to_csv(os.path.join(out_dir, "loss_" + name + ".csv"))
    if validate:
        _save_output(v_y_hats, v_ids, out_dir, name="_validation")
        v_loss_df = pd.DataFrame(validation_dict)
        v_loss_df.to_csv(
            os.path.join(out_dir, "validation-loss_" + name + ".csv")
        )
    return unet_path


def _save_output(y_hats, ids, out_dir, name=""):
    """Save validation predictions as multi-page float32 tiffs, honouring
    the reference's file contract ``<id><name>_output.tif``
    (train.py:425-432, which uses tifffile). tifffile is not a dependency
    here; PIL writes the same planes as 32-bit-float pages (the leading
    (batch, channel, z) axes are flattened into the page sequence)."""
    if y_hats is None:
        return
    assert len(y_hats) == len(ids)
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    for i in range(len(y_hats)):
        p = os.path.join(out_dir, ids[i] + name + "_output.tif")
        arr = np.asarray(y_hats[i], dtype=np.float32)
        planes = arr.reshape((-1,) + arr.shape[-2:])
        pages = [Image.fromarray(pl, mode="F") for pl in planes]
        pages[0].save(p, save_all=True, append_images=pages[1:])
