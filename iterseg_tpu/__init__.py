"""iterseg_tpu — TPU-native iterative 3D instance segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AbigailMcGovern/iterseg: affinity U-Net + seeded affinity watershed
segmentation of large tzyx microscopy volumes, classical DoG blob
segmentation, iterative ground-truth harvesting, U-Net training, and
VI/AP/object-count evaluation.
"""

__version__ = "0.1.0"
