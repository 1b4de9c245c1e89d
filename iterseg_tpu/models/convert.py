"""Checkpoint conversion: torch ``.pt`` state dicts ↔ JAX parameter dicts.

The reference ships pretrained platelet weights as a torch ``state_dict``
(iterseg ``predict.py:21-35``); this module loads them into the flat JAX
parameter dict used by ``models/unet.py`` (keys are identical by design)
and can export back to ``.pt`` for ecosystem compatibility.

Native checkpoints use ``.npz`` (no torch dependency at inference time).
"""
from __future__ import annotations

import io
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .unet import UNetSpec

__all__ = [
    "torch_state_dict_to_params",
    "params_to_torch_state_dict",
    "load_checkpoint",
    "save_checkpoint",
    "infer_spec_from_params",
]

_SKIP_SUFFIXES = ("num_batches_tracked",)


def torch_state_dict_to_params(state_dict) -> Dict[str, jnp.ndarray]:
    """Convert a torch state dict (tensors or arrays) to flat JAX params."""
    params = {}
    for k, v in state_dict.items():
        if k.endswith(_SKIP_SUFFIXES):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # copy=True: torch tensors share memory with their .numpy() views,
        # and jnp.asarray may zero-copy host buffers on the CPU backend —
        # without the copy, torch's in-place BatchNorm stat updates would
        # silently mutate the JAX parameters.
        params[k] = jnp.asarray(np.array(v, dtype=np.float32, copy=True))
    return params


def params_to_torch_state_dict(params):
    """Flat JAX params → torch state dict (requires torch)."""
    import torch

    sd = {}
    for k, v in params.items():
        sd[k] = torch.from_numpy(np.asarray(v))
    # torch BatchNorm tracks batch counts; synthesise zeros
    for k in list(sd.keys()):
        if k.endswith("running_var"):
            sd[k.replace("running_var", "num_batches_tracked")] = (
                __import__("torch").tensor(0, dtype=__import__("torch").int64)
            )
    return sd


def infer_spec_from_params(params) -> UNetSpec:
    """Recover the UNetSpec from parameter shapes (forks + channel counts)."""
    in_channels = params["c0.conv0.weight"].shape[1]
    forks = []
    i = 0
    while f"c8_{i}.conv1.weight" in params:
        forks.append(params[f"c8_{i}.conv1.weight"].shape[0])
        i += 1
    out = tuple(forks) if len(forks) > 1 else forks[0]
    return UNetSpec(in_channels=in_channels, out_channels=out)


def load_checkpoint(path) -> Dict[str, jnp.ndarray]:
    """Load ``.npz`` (native), ``.pt``/``.pth`` (torch) or orbax
    (directory) checkpoints."""
    path = str(path)
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: jnp.asarray(data[k]) for k in data.files}
    if path.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return torch_state_dict_to_params(sd)
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    raise ValueError(f"unknown checkpoint format: {path}")


def save_checkpoint_orbax(params, path):
    """Save via orbax (async-capable, multi-host/sharded-ready)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {k: np.asarray(v) for k, v in params.items()})
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path) -> Dict[str, jnp.ndarray]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(str(path)))
    return {k: jnp.asarray(v) for k, v in restored.items()}


def save_checkpoint(params, path):
    """Save flat params as ``.npz`` (or ``.pt`` when path says so)."""
    path = str(path)
    if path.endswith((".pt", ".pth")):
        import torch

        torch.save(params_to_torch_state_dict(params), path)
        return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    return path
