"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's fake-backend strategy gap (SURVEY.md §4): multi-chip
sharding is tested on host CPU devices; TPU-only behaviour is exercised by
bench.py / __graft_entry__.py on real hardware.
"""
import os
import sys

# force-override: the session may preset JAX_PLATFORMS to the TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    # A sitecustomize (e.g. the TPU session's .axon_site) pre-imported jax
    # and may have initialised a 1-device CPU backend before this conftest
    # ran; reset and force the virtual 8-device CPU mesh.
    import jax
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


def cpu_subprocess_env(n_devices=1, extra_pythonpath=(), **extra):
    """Environment for test subprocesses: CPU backend, NO axon TPU client.

    The TPU session's ``/root/.axon_site`` sitecustomize dials the axon
    tunnel from EVERY python process on its PYTHONPATH — even with
    ``JAX_PLATFORMS=cpu`` — and concurrent tunnel clients wedge it for
    minutes (CLAUDE.md). Strip any axon path, force the CPU platform, and
    pin the virtual device count via XLA_FLAGS (the subprocess imports
    jax fresh, so the flag applies)."""
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(list(extra_pythonpath) + parts)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={int(n_devices)}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.update({k: str(v) for k, v in extra.items()})
    return env


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def synthetic_blobs(shape=(48, 48, 48), volume_fraction=0.35, sigma=4.0, seed=0):
    """Dense random blob volume (stand-in for skimage.data.binary_blobs)."""
    from scipy import ndimage as ndi

    r = np.random.default_rng(seed)
    noise = r.random(shape)
    smooth = ndi.gaussian_filter(noise, sigma)
    thresh = np.quantile(smooth, 1 - volume_fraction)
    return smooth > thresh


@pytest.fixture
def blobs():
    return synthetic_blobs()
