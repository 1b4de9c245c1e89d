"""Data(+space)-parallel U-Net training over a device mesh.

TPU-native extension beyond the reference (whose training loop,
train.py:287-364, is single-device batch-1): ``train_unet(mesh=...)``
shards each step's chunk batch over the mesh's ``data`` axis and the
spatial dims over ``space``, with gradients all-reduced by XLA
collectives. Without a mesh the reference's batch-1 semantics remain the
default.

Run on a multi-chip TPU host as-is (the mesh picks up every local chip),
or simulate N devices on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_train.py out_dir

Usage: sharded_train.py [out_dir] [epochs] [n_chunks]
"""
import sys

import numpy as np
from scipy import ndimage as ndi

from iterseg_tpu.parallel.mesh import make_mesh
from iterseg_tpu.train.labels import get_training_labels
from iterseg_tpu.train.train import train_unet

out_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/sharded-train"
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 6

# synthetic blob volume + instance GT standing in for real training crops
r = np.random.default_rng(0)
vol = np.zeros((10, 64, 64), np.float32)
for c in np.stack([r.integers(2, s - 2, size=30) for s in vol.shape], 1):
    vol[tuple(c)] = 1.0
img = ndi.gaussian_filter(vol, (1, 2, 2))
img = (img / img.max()).astype(np.float32)
gt, _ = ndi.label(img > 0.3)

channels = ("z-1", "y-1", "x-1", "mask", "centreness-log")
yvol = get_training_labels(gt, channels, scale=(4, 1, 1))
xs = [img] * n_chunks
ys = [yvol] * n_chunks

mesh = make_mesh()  # every local device, factored into data x space
print(f"training over mesh {dict(mesh.shape)}")
model, unet_path = train_unet(
    x=xs, vx=xs[:1], y=ys, vy=ys[:1],
    out_dir=out_dir, name="sharded", channels=channels,
    epochs=epochs, lr=0.01, update_every=1, mesh=mesh,
)
print(f"saved {unet_path}")
