"""Batch segmentation of a timeseries zarr with a trained U-Net
(reference examples/predict_from_path.py equivalent, headless)."""
import sys

from iterseg_tpu import Viewer, _load_data
from iterseg_tpu.engine.segmentation import affinity_unet_watershed

ip = sys.argv[1]            # path to a tzyx zarr
od = sys.argv[2]            # output directory
unet = sys.argv[3] if len(sys.argv) > 3 else None   # .npz/.pt or None
save_name = sys.argv[4] if len(sys.argv) > 4 else "labels-prediction"

v = Viewer()
_load_data(v, directory=ip, data_type="individual frames",
           layer_name="images", layer_type="Image",
           scale=(4, 1, 1), translate=(0, 0, 0))

affinity_unet_watershed(v, v.layers["images"], save_dir=od, name=save_name,
                        unet_or_config_file=unet)
