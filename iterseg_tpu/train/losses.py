"""Loss functions over NCZYX predictions (JAX/optax side).

Parity with iterseg ``custom_loss.py`` / torch losses used by the trainer
(``train.py:197-217``): BCELoss (with torch's −100 log clamp), DiceLoss
(1 − Dice, smooth=1, channel mean), WeightedBCE, EpochwiseWeightedBCE,
ChannelwiseLoss, MSELoss, plus the channel-flattening helper and per-channel
loss logging.

Losses are pure jittable functions; the "epoch-weighted" variant takes the
epoch weights as an argument instead of mutable module state.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "flatten_channels",
    "bce_loss",
    "mse_loss",
    "dice_loss",
    "weighted_bce_loss",
    "make_loss_function",
    "channel_losses",
]

_LOG_CLAMP = -100.0  # torch BCELoss clamps log terms at -100
# smallest normal f32: below this, log underflows (XLA flushes subnormals
# to zero, giving -inf) and 1/x overflows in the gradient
_MIN_NORMAL = float(np.finfo(np.float32).tiny)


def _safe_log(x):
    """log(x) clamped at -100 with a NaN/inf-free gradient.

    ``maximum(log(x), -100)`` has gradient ``[log(x) > -100] * 1/x`` which
    is 0·inf = NaN at x == 0 — saturated sigmoids reach exactly 0/1 in f32
    after a single training step, so the naive form NaNs real training runs.
    The double-where form gives: value log(x) for normal x (always > -87.3,
    so torch's -100 clamp never actually binds there), -100 for
    subnormal/zero x, and an exact-zero gradient in the clamped region.
    """
    tiny = x < _MIN_NORMAL
    return jnp.where(tiny, _LOG_CLAMP, jnp.log(jnp.where(tiny, 1.0, x)))


def flatten_channels(inputs, targets, channel_dim=1):
    """(N, C, z, y, x) → (C, N·z·y·x) for both tensors
    (parity: custom_loss.py:231-254)."""
    order = [channel_dim] + [i for i in range(inputs.ndim)
                             if i != channel_dim]
    inputs = jnp.transpose(inputs, order).reshape(inputs.shape[channel_dim],
                                                  -1)
    targets = jnp.transpose(targets, order).reshape(
        targets.shape[channel_dim], -1
    )
    return inputs, targets


def _bce_elementwise(x, y):
    return -(y * _safe_log(x) + (1.0 - y) * _safe_log(1.0 - x))


def bce_loss(inputs, targets):
    """torch ``nn.BCELoss()`` parity (mean reduction, log clamp)."""
    return jnp.mean(_bce_elementwise(inputs, targets))


def mse_loss(inputs, targets):
    return jnp.mean((inputs - targets) ** 2)


def dice_loss(inputs, targets, channel_dim=1, smooth=1.0):
    """1 − Dice, per-channel then mean (parity: custom_loss.py:24-53)."""
    inputs, targets = flatten_channels(inputs, targets, channel_dim)
    intersection = jnp.sum(inputs * targets, axis=-1)
    dice = (2.0 * intersection + smooth) / (
        jnp.sum(inputs, axis=-1) + jnp.sum(targets, axis=-1) + smooth
    )
    return jnp.mean(1.0 - dice)


def weighted_bce_loss(inputs, targets, chan_weights, channel_dim=1,
                      reduction="mean", final_reduction="mean"):
    """Per-channel-weighted BCE (parity: custom_loss.py:161-185)."""
    inputs, targets = flatten_channels(inputs, targets, channel_dim)
    unreduced = _bce_elementwise(inputs, targets)
    if reduction == "mean":
        channel_losses_ = jnp.mean(unreduced, axis=-1) * chan_weights
    elif reduction == "sum":
        channel_losses_ = jnp.sum(unreduced, axis=-1) * chan_weights
    else:
        raise ValueError("reduction param must be mean or sum")
    if final_reduction == "mean":
        return jnp.mean(channel_losses_)
    if final_reduction == "sum":
        return jnp.sum(channel_losses_)
    raise ValueError("final_reduction must be mean or sum")


def make_loss_function(loss_function: str, chan_weights=None, losses=None,
                       chan_losses=None) -> Callable:
    """Resolve a loss by name (parity: train.py:197-217).

    Returns ``f(y_hat, y, epoch=0)``; the epoch argument only matters for
    ``'EpochWeightedBCE'`` (per-epoch channel weight rows, replacing the
    reference's mutable ``current_epoch`` property).
    """
    if loss_function == "BCELoss":
        return lambda y_hat, y, epoch=0: bce_loss(y_hat, y)
    if loss_function in ("DiceLoss", "DICELoss"):
        return lambda y_hat, y, epoch=0: dice_loss(y_hat, y)
    if loss_function == "MSELoss":
        return lambda y_hat, y, epoch=0: mse_loss(y_hat, y)
    if loss_function == "WeightedBCE":
        w = jnp.asarray(chan_weights, dtype=jnp.float32)
        return lambda y_hat, y, epoch=0: weighted_bce_loss(y_hat, y, w)
    if loss_function == "EpochWeightedBCE":
        w = jnp.asarray(chan_weights, dtype=jnp.float32)  # (epochs, C)
        return lambda y_hat, y, epoch=0: weighted_bce_loss(y_hat, y,
                                                           w[epoch])
    if loss_function == "Channelwise":
        fns = [make_loss_function(l) if isinstance(l, str) else l
               for l in losses]
        chans = list(chan_losses)

        def channelwise(y_hat, y, epoch=0):
            vals = []
            for fn, c in zip(fns, chans):
                s_ = [slice(None)] * y_hat.ndim
                s_[1] = c
                s_ = tuple(s_)
                vals.append(fn(y_hat[s_], y[s_]))
            return jnp.mean(jnp.stack(vals))

        return channelwise
    raise ValueError(
        "Valid loss options are BCELoss, WeightedBCE, EpochWeightedBCE, "
        "Channelwise, MSELoss and DiceLoss"
    )


def channel_losses(y_hat, y, loss_fn, n_channels, epoch=0):
    """Per-channel scalar losses for logging
    (parity: custom_loss.py:8-17, which applies the training loss to each
    channel slice)."""
    out = []
    for i in range(n_channels):
        out.append(loss_fn(y_hat[:, i, ...], y[:, i, ...], epoch))
    return out
