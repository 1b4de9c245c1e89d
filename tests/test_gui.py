"""GUI factory layer: option-dict parity with the reference + manifest
resolution (importable without Qt/magicgui — the factories degrade to
``HeadlessFactory`` on this machine).

Reference option dicts transcribed from
``/root/reference/src/iterseg/_dock_widgets.py`` (line cites per widget
below); they are the widget-control contract magicgui/npe2 consume.
"""
import importlib
import inspect

import pytest

from iterseg_tpu import gui, widgets
from iterseg_tpu.engine.segmentation import segmenters

WIDGET_NAMES = [
    "train_from_viewer",
    "load_data",
    "segment_data",
    "combine_layers",
    "assess_segmentation",
    "compare_segmentations",
    "save_frames",
    "ground_truth_from_ROI",
]

# the reference's magic_factory keyword arguments, by widget
REFERENCE_OPTIONS = {
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
    # _dock_widgets.py:537-543 — segmenter choices are the live registry
    "segment_data": {
        "save_dir": {"widget_type": "FileEdit", "mode": "d"},
        "chunk_size": {"widget_type": "LiteralEvalLineEdit"},
        "margin": {"widget_type": "LiteralEvalLineEdit"},
        "segmenter": {"choices": list(segmenters.keys())},
        "network_or_config_file": {"widget_type": "FileEdit"},
    },
    # _dock_widgets.py:619 — bare @magic_factory()
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


@pytest.mark.parametrize("name", WIDGET_NAMES)
def test_option_dict_parity(name):
    assert gui.WIDGET_OPTIONS[name] == REFERENCE_OPTIONS[name]


@pytest.mark.parametrize("name", WIDGET_NAMES)
def test_options_name_real_parameters(name):
    """Every option key (except magicgui's own call_button) must be a
    parameter of the wrapped headless twin — a signature drift would
    make magic_factory raise at import time in a napari env."""
    params = inspect.signature(getattr(widgets, name)).parameters
    for key in gui.WIDGET_OPTIONS[name]:
        if key == "call_button":
            continue
        assert key in params, (name, key)


@pytest.mark.parametrize("name", WIDGET_NAMES)
def test_annotation_map_names_real_parameters(name):
    params = inspect.signature(getattr(widgets, name)).parameters
    for key in gui.WIDGET_ANNOTATIONS[name]:
        assert key in params, (name, key)


@pytest.mark.parametrize("name", WIDGET_NAMES)
def test_factory_resolves_and_wraps_twin(name):
    """The module-level factory exists, and its wrapped function is the
    headless twin (magic_factory's ``func`` / HeadlessFactory's
    ``_function`` both expose it; the wrapper carries __wrapped__)."""
    factory = getattr(gui, name)
    fn = getattr(factory, "func", None) or factory._function
    assert getattr(fn, "__wrapped__", None) is getattr(widgets, name)


def test_headless_factory_call_surface():
    """Without magicgui, factory() returns a callable widget standing in
    for the FunctionGui; direct calls pass through to the twin."""
    if gui._magic_factory is not None:
        pytest.skip("magicgui installed: factories are MagicFactory")
    widget = gui.compare_segmentations()
    assert callable(widget)
    assert widget.__wrapped__ is widgets.compare_segmentations


def test_manifest_widget_commands_resolve():
    """Every widget command in napari.yaml resolves to a factory in
    gui.py (npe2's python_name contract)."""
    import os

    import yaml

    path = os.path.join(os.path.dirname(gui.__file__), "napari.yaml")
    manifest = yaml.safe_load(open(path))
    commands = {
        c["id"]: c["python_name"]
        for c in manifest["contributions"]["commands"]
    }
    widget_cmds = [
        w["command"] for w in manifest["contributions"]["widgets"]
    ]
    # 7, not 8: combine_layers is a magic_factory in the reference code
    # but absent from its napari.yaml contributions — mirrored here
    assert len(widget_cmds) == 7
    assert "iterseg-tpu.combine_layers" not in widget_cmds
    for cmd in widget_cmds:
        modname, attr = commands[cmd].split(":")
        assert modname == "iterseg_tpu.gui"
        obj = getattr(importlib.import_module(modname), attr)
        name = cmd.split(".")[-1]
        assert obj is getattr(gui, name)
        fn = getattr(obj, "func", None) or obj._function
        assert getattr(fn, "__wrapped__", None) is getattr(widgets, name)


def test_annotations_applied_with_stub_napari(monkeypatch):
    """With napari importable, the twins carry the reference's layer
    annotations (the contract magicgui's combo boxes hang off); proven
    against a stub module so the branch is tested on this GUI-less
    host."""
    import sys
    import types

    napari = types.ModuleType("napari")
    napari.viewer = types.SimpleNamespace(Viewer=type("Viewer", (), {}))
    napari.Viewer = napari.viewer.Viewer
    napari.layers = types.SimpleNamespace(
        Image=type("Image", (), {}),
        Labels=type("Labels", (), {}),
        Shapes=type("Shapes", (), {}),
        Layer=type("Layer", (), {}),
    )
    monkeypatch.setitem(sys.modules, "napari", napari)
    twin = gui._annotated_twin("segment_data")
    sig = inspect.signature(twin)
    assert sig.parameters["napari_viewer"].annotation is napari.Viewer
    assert (sig.parameters["input_volume_layer"].annotation
            is napari.layers.Image)
    # non-layer params keep their originals (string under
    # `from __future__ import annotations`)
    assert sig.parameters["name"].annotation in (str, "str")
    twin2 = gui._annotated_twin("ground_truth_from_ROI")
    sig2 = inspect.signature(twin2)
    assert (sig2.parameters["shapes_layer"].annotation
            is napari.layers.Shapes)


def test_factory_uses_stub_magicgui(monkeypatch):
    """With magicgui importable, get_factory must hand the twin plus the
    reference option dict to magic_factory — proven against a recording
    stub."""
    calls = []

    def fake_magic_factory(fn, **options):
        calls.append((fn, options))

        class FakeFactory:
            def __init__(self):
                self.func = fn  # instance attr: plain functions would
                self.keywords = options  # otherwise bind as methods

            def __call__(self):
                return fn

        return FakeFactory()

    monkeypatch.setattr(gui, "_magic_factory", fake_magic_factory)
    factory = gui.get_factory("train_from_viewer")
    (fn, options), = calls
    assert options == gui.WIDGET_OPTIONS["train_from_viewer"]
    assert fn.__wrapped__ is widgets.train_from_viewer
    assert factory.func is fn


def test_annotations_skipped_without_napari():
    """On hosts without napari the twins stay un-annotated (no import
    error, no stale string annotations)."""
    try:
        import napari  # noqa: F401

        pytest.skip("napari installed")
    except ImportError:
        pass
    twin = gui._annotated_twin("segment_data")
    sig_twin = inspect.signature(twin)
    sig_fn = inspect.signature(widgets.segment_data)
    assert [p.annotation for p in sig_twin.parameters.values()] == [
        p.annotation for p in sig_fn.parameters.values()
    ]
