"""Headless training example (reference examples/train_unet.py equivalent).

Loads image + ground-truth frame directories, trains an affinity U-Net and
predicts labels for the training stack with the fresh network.
"""
import sys

from iterseg_tpu import Viewer, _load_data, _train_from_viewer

out_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/train-example"
image_dir = sys.argv[2] if len(sys.argv) > 2 else "data/images"
gt_dir = sys.argv[3] if len(sys.argv) > 3 else "data/ground_truth"

v = Viewer()
_load_data(v, directory=image_dir, data_type="individual frames",
           layer_name="images", layer_type="Image",
           scale=(4, 1, 1), translate=(0, 0, 0))
_load_data(v, directory=gt_dir, data_type="individual frames",
           layer_name="gt", layer_type="Labels",
           scale=(4, 1, 1), translate=(0, 0, 0))

_train_from_viewer(v, v.layers["images"], v.layers["gt"], out_dir,
                   (4, 1, 1), training_name="mynet")
