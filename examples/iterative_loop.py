"""The iterative-improvement loop iterseg is named for, as one headless
driver (the napari widgets drive exactly this sequence in the GUI —
reference call stacks SURVEY §3.1/3.2/3.3/3.5):

1. first-pass segmentation of a tzyx stack with the classical
   DoG-blob-watershed (no trained network needed),
2. assess the first pass against ground truth (VI / AP / object counts),
3. "proofread" a rectangular ROI — in real use a human corrects the
   first-pass labels in the viewer; here the corrected labels are stood
   in by the ground truth inside the ROI,
4. ``_ground_truth_from_ROI`` harvests the corrected ROI into fresh
   training frames (the data flywheel, _dock_widgets.py:1167-1330),
5. train an affinity U-Net on the harvested frames
   (``run_experiment``; the widget twin ``_train_from_viewer`` wraps the
   same calls — driven directly here so the crop shape is scriptable),
6. second-pass segmentation of the full stack with the fresh network,
7. assess the second pass and collate the round-over-round comparison
   figure (``compare_segmentations``).

Run: ``python iterative_loop.py <out_dir>`` (synthetic data), or import
``run`` with your own stack/GT.
"""
import os
import sys

import numpy as np

from iterseg_tpu import Viewer
from iterseg_tpu.widgets import (
    _assess_segmentation,
    _ground_truth_from_ROI,
    compare_segmentations,
    construct_channels_list,
    construct_conditions_list,
    segment_data,
)
from iterseg_tpu.train.experiments import get_experiment_dict, run_experiment


def synthetic_stack(shape=(2, 10, 128, 128), n_blobs=60, seed=0):
    """Bright-blob tzyx stack + instance ground truth (per frame)."""
    from scipy import ndimage as ndi

    r = np.random.default_rng(seed)
    frames, gts = [], []
    for _ in range(shape[0]):
        vol = np.zeros(shape[1:], np.float32)
        coords = np.stack(
            [r.integers(2, s - 2, size=n_blobs) for s in shape[1:]], 1
        )
        vol[tuple(coords.T)] = 1.0
        vol = ndi.gaussian_filter(vol, (1.0, 2.0, 2.0))
        vol /= vol.max()
        gt, _ = ndi.label(vol > 0.3)
        frames.append(vol)
        gts.append(gt.astype(np.int32))
    return np.stack(frames), np.stack(gts)


def run(
    image_stack,
    gt_stack,
    out_dir,
    roi=None,
    name="iterative",
    train_shape=(10, 256, 256),
    chunk_size=(10, 256, 256),
    margin=(1, 64, 64),
    assess_kwargs=None,
    epochs=2,
    n_each=25,
    number_of_tiles=4,
    show=False,
):
    """One turn of the loop; returns the collated per-round stats dict.

    ``roi``: the proofread rectangle as a shapes-layer vertex array over
    the stack's dims (default: the central half of frame 0 in xy).
    ``train_shape``: the random-crop shape for training data (the
    reference fixes (10, 256, 256); scriptable here so the loop runs at
    any scale).
    """
    os.makedirs(str(out_dir), exist_ok=True)
    cmp_dir = os.path.join(str(out_dir), "comparison")
    assess_kwargs = dict(assess_kwargs or {})
    assess_kwargs.setdefault("chunk_size", chunk_size)
    assess_kwargs.setdefault("margin", margin)

    viewer = Viewer()
    image_layer = viewer.add_image(np.asarray(image_stack, np.float32),
                                   name="images")
    gt_layer = viewer.add_labels(np.asarray(gt_stack), name="proofread")

    # 1. first pass: classical DoG segmentation, no network
    labels_dog = segment_data(
        viewer, image_layer, save_dir=None, name=f"{name}-round0",
        segmenter="DoG-blob-watershed", chunk_size=chunk_size,
        margin=margin, debug=True,
    )

    # 2. assess the first pass
    stats = {}
    _, stats["round0"] = _assess_segmentation(
        gt_layer, labels_dog, save_dir=cmp_dir, save_prefix="round0",
        name="round0-DoG", show=show, **assess_kwargs,
    )

    # 3.+4. harvest corrected ROI labels into training frames
    if roi is None:
        t, z, y, x = image_layer.data.shape
        roi = np.array([
            [0, 0, y // 4, x // 4],
            [0, 0, y // 4, x // 4 + x // 2],
            [0, 0, y // 4 + y // 2, x // 4 + x // 2],
            [0, 0, y // 4 + y // 2, x // 4],
        ], dtype=float)
    shapes_layer = viewer.add_shapes([roi], name="ROI")
    im_frames, gt_frames = _ground_truth_from_ROI(
        viewer, image_layer, gt_layer, shapes_layer,
        save_dir=str(out_dir), name=f"{name}-gt",
        number_of_tiles=number_of_tiles,
    )
    im_frames = np.asarray(im_frames, dtype=np.float32)
    gt_frames = np.asarray(gt_frames)
    if im_frames.ndim == 3:
        im_frames, gt_frames = im_frames[None], gt_frames[None]
    image_list = [im_frames[i] for i in range(im_frames.shape[0])]
    labels_list = [gt_frames[i] for i in range(gt_frames.shape[0])]

    # 5. train an affinity U-Net on the harvested frames (the widget twin
    # _train_from_viewer builds this same experiment dict internally; the
    # crop shape is reference-fixed there, scriptable here)
    channels_list = construct_channels_list(1, "mask", "centreness-log")
    conditions_list = construct_conditions_list(
        image_list, "BCELoss", 0.01, epochs, (1, 1, 1)
    )
    exp = get_experiment_dict(
        channels_list, [f"{name}-unet"], conditions_list=conditions_list,
        n_each=n_each, scale=(1, 1, 1),
    )
    exp["get_train_data"]["shape"] = tuple(train_shape)
    u_path = run_experiment(exp, image_list, labels_list, str(out_dir))

    # 6. second pass: segment the full stack with the fresh network
    labels_unet = segment_data(
        viewer, image_layer, save_dir=None, name=f"{name}-round1",
        segmenter="affinity-unet-watershed",
        network_or_config_file=u_path[0], chunk_size=chunk_size,
        margin=margin, debug=True,
    )

    # 7. assess round 1 and collate the round-over-round figure
    _, stats["round1"] = _assess_segmentation(
        gt_layer, labels_unet, save_dir=cmp_dir, save_prefix="round1",
        name="round1-unet", show=show, **assess_kwargs,
    )
    compare_segmentations(
        cmp_dir, save_name=f"{name}-rounds",
        output_directory=cmp_dir, show=show,
    )
    stats["unet_path"] = u_path[0]
    # segment_data returns the labels layer when a viewer is present
    stats["labels"] = {
        "round0": np.asarray(getattr(labels_dog, "data", labels_dog)),
        "round1": np.asarray(getattr(labels_unet, "data", labels_unet)),
    }
    return stats


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./iterative_loop_out"
    image, gt = synthetic_stack()
    result = run(image, gt, out)
    print(f"trained unet: {result['unet_path']}")
    print(result["round0"].T)
    print(result["round1"].T)
