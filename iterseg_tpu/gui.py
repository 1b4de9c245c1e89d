"""GUI widget factories — the ``magic_factory`` layer over ``widgets.py``.

The reference exposes its widgets as ``magicgui.magic_factory`` factories
with typed controls (choice lists, ``FileEdit``, ``LiteralEvalLineEdit``;
``/root/reference/src/iterseg/_dock_widgets.py:26-36,233-241,537-543,
619,696-700,896-902,1056-1059,1164-1166``), and napari's npe2 machinery
resolves the manifest's widget commands to those factories.  This module
reproduces that contract on top of the headless twins in ``widgets.py``:

* ``WIDGET_OPTIONS`` holds the per-widget magicgui option dicts,
  importable with no GUI stack present (tests pin them against the
  reference's, ``tests/test_gui.py``).
* ``WIDGET_ANNOTATIONS`` holds the napari type annotations the reference
  attaches to viewer/layer parameters — resolved lazily, only when
  napari is importable, so magicgui renders the same layer combo boxes.
* Each public name (``train_from_viewer`` … ``ground_truth_from_ROI``)
  is a ``magic_factory``-wrapped twin when magicgui is importable, and a
  ``HeadlessFactory`` otherwise — an object with the same call surface
  (calling the factory returns a callable widget; calling that runs the
  underlying function), so the manifest's commands always resolve and
  scripted use works on GUI-less hosts like this one.

``napari.yaml`` points its widget commands here.
"""
from __future__ import annotations

import functools
import inspect

from . import widgets as _w
from .engine.segmentation import segmenters

try:  # magicgui is a GUI-stack dependency; absent on headless hosts
    from magicgui import magic_factory as _magic_factory
except ImportError:  # pragma: no cover - exercised on this machine
    _magic_factory = None

__all__ = [
    "WIDGET_OPTIONS",
    "WIDGET_ANNOTATIONS",
    "HeadlessFactory",
    "get_factory",
    "train_from_viewer",
    "load_data",
    "segment_data",
    "combine_layers",
    "assess_segmentation",
    "compare_segmentations",
    "save_frames",
    "ground_truth_from_ROI",
]


# ---------------------------------------------------------------------------
# Option dicts — byte-for-byte the reference's magic_factory keyword
# arguments (the widget-control contract npe2/magicgui consume).
# ---------------------------------------------------------------------------

WIDGET_OPTIONS = {
    # _dock_widgets.py:26-36
    "train_from_viewer": {
        "call_button": True,
        "mask_prediction": {"choices": ["mask", "centreness"]},
        "centre_prediciton": {
            "choices": ["centreness-log", "centreness", "centroid-gauss"]
        },
        "affinities_extent": {"widget_type": "LiteralEvalLineEdit"},
        "training_name": {"widget_type": "LineEdit"},
        "loss_function": {"choices": ["BCELoss", "DiceLoss"]},
        "output_dir": {"widget_type": "FileEdit", "mode": "d"},
        "scale": {"widget_type": "LiteralEvalLineEdit"},
        "learning_rate": {"widget_type": "LiteralEvalLineEdit"},
    },
    # _dock_widgets.py:233-241
    "load_data": {
        "directory": {"widget_type": "FileEdit", "mode": "d"},
        "data_file": {"widget_type": "FileEdit"},
        "data_type": {"choices": ["individual frames", "image stacks"]},
        "layer_name": {"widget_type": "LineEdit"},
        "layer_type": {"choices": ["Image", "Labels", "Shapes"]},
        "scale": {"widget_type": "LiteralEvalLineEdit"},
        "translate": {"widget_type": "LiteralEvalLineEdit"},
    },
    # _dock_widgets.py:537-543 (the segmenter choices come from the live
    # registry, as in the reference)
    "segment_data": {
        "save_dir": {"widget_type": "FileEdit", "mode": "d"},
        "chunk_size": {"widget_type": "LiteralEvalLineEdit"},
        "margin": {"widget_type": "LiteralEvalLineEdit"},
        "segmenter": {"choices": list(segmenters.keys())},
        "network_or_config_file": {"widget_type": "FileEdit"},
    },
    # _dock_widgets.py:619
    "combine_layers": {},
    # _dock_widgets.py:696-700
    "assess_segmentation": {
        "save_dir": {"widget_type": "FileEdit", "mode": "d"},
        "chunk_size": {"widget_type": "LiteralEvalLineEdit"},
        "margin": {"widget_type": "LiteralEvalLineEdit"},
    },
    # _dock_widgets.py:896-902
    "compare_segmentations": {
        "comparison_directory": {"widget_type": "FileEdit", "mode": "d"},
        "fig_size": {"widget_type": "LiteralEvalLineEdit"},
        "VI_indexs": {"widget_type": "LiteralEvalLineEdit"},
        "output_directory": {"widget_type": "FileEdit", "mode": "d"},
        "file_exstention": {"choices": ["pdf", "svg", "png"]},
    },
    # _dock_widgets.py:1056-1059
    "save_frames": {
        "save_dir": {"widget_type": "FileEdit", "mode": "d"},
        "frames": {"widget_type": "LiteralEvalLineEdit"},
    },
    # _dock_widgets.py:1164-1166
    "ground_truth_from_ROI": {
        "save_dir": {"widget_type": "FileEdit", "mode": "d"},
    },
}

# napari type annotations the reference puts on viewer/layer parameters
# (these drive magicgui's layer combo boxes / viewer injection); values
# are attribute paths into the napari package, resolved lazily.
WIDGET_ANNOTATIONS = {
    # _dock_widgets.py:37-40
    "train_from_viewer": {
        "viewer": "viewer.Viewer",
        "image_stack": "layers.Image",
        "labels_stack": "layers.Labels",
    },
    # _dock_widgets.py:242-243
    "load_data": {"napari_viewer": "viewer.Viewer"},
    # _dock_widgets.py:544-546
    "segment_data": {
        "napari_viewer": "Viewer",
        "input_volume_layer": "layers.Image",
    },
    # _dock_widgets.py:620-623
    "combine_layers": {
        "napari_viewer": "Viewer",
        "base_layer": "layers.Layer",
        "to_append": "layers.Layer",
    },
    # _dock_widgets.py:701-704
    "assess_segmentation": {
        "napari_viewer": "Viewer",
        "ground_truth": "layers.Labels",
        "model_segmentation": "layers.Labels",
    },
    # _dock_widgets.py:903-904 (no viewer/layer params)
    "compare_segmentations": {},
    # _dock_widgets.py:1060-1062
    "save_frames": {
        "napari_viewer": "Viewer",
        "layer": "layers.Layer",
    },
    # _dock_widgets.py:1167-1171
    "ground_truth_from_ROI": {
        "napari_viewer": "Viewer",
        "image_layer": "layers.Image",
        "labels_layer": "layers.Labels",
        "shapes_layer": "layers.Shapes",
    },
}


def _resolve_annotation(path):
    """``"layers.Image"`` -> ``napari.layers.Image`` (None if napari is
    not importable)."""
    try:
        import napari
    except ImportError:
        return None
    obj = napari
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _annotated_twin(name):
    """A wrapper around ``widgets.<name>`` carrying the reference's
    napari annotations (when napari is importable) so magicgui infers
    the same controls.  The wrapper — not the shared headless function —
    is what gets annotations, keeping ``widgets.py`` import-light."""
    fn = getattr(_w, name)

    @functools.wraps(fn)
    def twin(*args, **kwargs):
        return fn(*args, **kwargs)

    annotations = {}
    for param, path in WIDGET_ANNOTATIONS[name].items():
        resolved = _resolve_annotation(path)
        if resolved is not None:
            annotations[param] = resolved
    if annotations:
        twin.__annotations__ = {**fn.__annotations__, **annotations}
        sig = inspect.signature(fn)
        twin.__signature__ = sig.replace(
            parameters=[
                p.replace(annotation=annotations.get(p.name, p.annotation))
                for p in sig.parameters.values()
            ]
        )
    return twin


class HeadlessFactory:
    """Stand-in for ``magicgui.MagicFactory`` on hosts without a GUI
    stack: calling the factory returns the underlying function (the
    "widget"), so npe2-style command resolution and scripted use both
    work; ``_function`` mirrors MagicFactory's handle to the wrapped
    callable."""

    def __init__(self, name, function, options):
        self._name = name
        self._function = function
        self.keywords = dict(options)

    @property
    def func(self):  # magicgui.MagicFactory parity
        return self._function

    def __call__(self, *args, **kwargs):
        if not args and not kwargs:
            return self._function  # factory() -> the "widget"
        return self._function(*args, **kwargs)

    def __repr__(self):
        return (f"<HeadlessFactory {self._name} "
                f"(magicgui not installed)>")


def get_factory(name):
    """The widget factory for ``name``: ``magic_factory``-wrapped when
    magicgui is importable, a ``HeadlessFactory`` otherwise."""
    options = WIDGET_OPTIONS[name]
    twin = _annotated_twin(name)
    if _magic_factory is not None:
        return _magic_factory(twin, **options)
    return HeadlessFactory(name, twin, options)


train_from_viewer = get_factory("train_from_viewer")
load_data = get_factory("load_data")
segment_data = get_factory("segment_data")
combine_layers = get_factory("combine_layers")
assess_segmentation = get_factory("assess_segmentation")
compare_segmentations = get_factory("compare_segmentations")
save_frames = get_factory("save_frames")
ground_truth_from_ROI = get_factory("ground_truth_from_ROI")
