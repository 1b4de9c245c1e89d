"""Device-mesh parallelism for inference and training.

The reference is strictly single-device (SURVEY.md §2.4); this module is the
TPU-native scaling layer it never had:

- **data parallelism** over frames / training batches (mesh axis
  ``"data"``),
- **spatial parallelism** over the x-axis of chunks (mesh axis
  ``"space"``): convolutions over spatially-sharded inputs are partitioned
  by XLA's SPMD partitioner, which inserts the halo exchanges over ICI
  automatically — the sharded-conv analog of the reference's margin-overlap
  chunk grid.

Everything is `jax.jit` + `NamedSharding`; no explicit collectives are
needed for the model itself (grads reduce via the partitioner because the
loss is a global mean).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import unet as unet_mod

__all__ = [
    "make_mesh",
    "replicate_params",
    "sharded_apply",
    "make_sharded_train_step",
    "sharded_predict_volume",
]


def _factor2(n: int) -> Tuple[int, int]:
    """Split n devices into (data, space) — space gets at most 4."""
    for sp in (4, 2, 1):
        if n % sp == 0 and sp <= n:
            return n // sp, sp
    return n, 1


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("data", "space"), devices=None) -> Mesh:
    """A 2D (data × space) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, sp = _factor2(len(devices))
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names)


def replicate_params(params, mesh: Mesh):
    """Place parameters replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def data_sharding(mesh: Mesh):
    """NCZYX batch sharding: batch over 'data', x over 'space'."""
    return NamedSharding(mesh, P("data", None, None, None, "space"))


def sharded_apply(params, spec, mesh: Mesh):
    """Jitted forward with batch+spatial sharding over the mesh."""
    xsh = data_sharding(mesh)

    @functools.partial(jax.jit, static_argnames=(), out_shardings=xsh)
    def fwd(p, x):
        return unet_mod.forward(p, spec, x, train=False)

    def run(x):
        x = jax.device_put(jnp.asarray(x, jnp.float32), xsh)
        return fwd(params, x)

    return run


def make_sharded_train_step(mesh: Mesh, spec, loss_fn, optimizer,
                            double_step=True, chan_log_fn=None,
                            n_channels=None):
    """Data+space-parallel training step.

    The global batch is sharded over the 'data' axis (one or more samples
    per device) with the x spatial axis sharded over 'space'; parameters and
    optimiser state are replicated. Because the loss is a global mean, the
    partitioner emits the gradient all-reduce over ICI.

    With ``chan_log_fn``/``n_channels`` set, the step additionally returns
    the per-channel losses of the batch (the training-CSV columns
    ``train_unet`` logs), computed inside the same compiled program.
    """
    import optax

    xsh = data_sharding(mesh)
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(trainable, bn_state, opt_state, x, y, epoch):
        def loss_wrapped(tr):
            p = {**tr, **bn_state}
            out, updates = unet_mod.forward(p, spec, x, train=True)
            return loss_fn(out, y, epoch), (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(trainable)
        u1, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, u1)
        if double_step:
            u2, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, u2)
        bn_state = {**bn_state, **updates}
        if chan_log_fn is not None:
            from ..train.losses import channel_losses

            chan = jnp.stack(
                channel_losses(out, y, chan_log_fn, n_channels, epoch)
            )
            return trainable, bn_state, opt_state, loss, chan
        return trainable, bn_state, opt_state, loss

    def run(trainable, bn_state, opt_state, x, y, epoch=0):
        x = jax.device_put(jnp.asarray(x, jnp.float32), xsh)
        y = jax.device_put(jnp.asarray(y, jnp.float32), xsh)
        trainable = jax.device_put(trainable, rep)
        bn_state = jax.device_put(bn_state, rep)
        opt_state = jax.device_put(opt_state, rep)
        return step(trainable, bn_state, opt_state, x, y, epoch)

    return run


def sharded_predict_volume(model, volume, mesh: Mesh,
                           chunk_size=(10, 256, 256), margin=(1, 64, 64)):
    """Chunk-grid inference with the chunk batch sharded over the mesh.

    Chunks of one frame fill the 'data' axis (frame parallelism composes on
    top by sharding frames across hosts); each chunk's x-axis is sharded
    over 'space'.
    """
    from ..core.chunks import make_chunks, chunk_slices

    volume = np.asarray(volume, dtype=np.float32)
    zyx = volume.shape[-3:]
    chunk_size = tuple(int(min(c, s)) for c, s in zip(chunk_size, zyx))
    starts, crops = make_chunks(zyx, chunk_size, margin)
    n = len(starts)
    C = model.out_channels
    out = np.zeros((C,) + zyx, dtype=np.float32)
    run = sharded_apply(
        replicate_params(model.params, mesh), model.spec, mesh
    )
    dp = mesh.shape["data"]

    def assemble(yb_dev, b0, b1):
        yb = np.asarray(yb_dev)  # the only host sync point per batch
        for i in range(b0, b1):
            cr = tuple(slice(int(lo), int(hi)) for lo, hi in crops[i])
            sl = (slice(None),) + chunk_slices(starts[i], chunk_size)
            out[sl][(slice(None),) + cr] = yb[i - b0][(slice(None),) + cr]

    # Double-buffered: dispatch batch b+1 (JAX async) before consuming
    # batch b on host, so host assembly overlaps device compute — same
    # pattern as the single-device predictor (engine/predict.py).
    pending = None
    for b0 in range(0, n, dp):
        b1 = min(b0 + dp, n)
        xb = np.stack(
            [volume[chunk_slices(starts[i], chunk_size)]
             for i in range(b0, b1)]
        )[:, None]
        if xb.shape[0] < dp:
            xb = np.concatenate(
                [xb, np.zeros((dp - xb.shape[0],) + xb.shape[1:], xb.dtype)]
            )
        yb_dev = run(xb)
        if pending is not None:
            assemble(*pending)
        pending = (yb_dev, b0, b1)
    if pending is not None:
        assemble(*pending)
    return out
