"""Structural validation of the napari plugin manifest.

npe2 is not installable in this image, so the schema rules its validator
enforces are encoded here directly (npe2.PluginManifest semantics):
command ids must be ``<plugin-name>.<suffix>`` and unique, every
``python_name`` must be an importable ``module:attr`` callable, and every
reader/widget contribution must reference a declared command. Contribution
parity with the reference manifest (iterseg ``napari.yaml:4-56``) is
asserted by suffix.
"""
import importlib
import os

import yaml

MANIFEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "iterseg_tpu", "napari.yaml",
)

# the reference manifest's contribution surface (napari.yaml:4-56)
EXPECTED_COMMANDS = {
    "train_from_viewer", "load_data", "assess_segmentation",
    "compare_segmentations", "segment_data", "save_frames",
    "ground_truth_from_ROI", "load_ome_zarr",
}
EXPECTED_WIDGETS = EXPECTED_COMMANDS - {"load_ome_zarr"}


def _load():
    with open(MANIFEST) as f:
        return yaml.safe_load(f)


def test_manifest_schema():
    m = _load()
    assert isinstance(m.get("name"), str) and m["name"]
    contributions = m["contributions"]
    commands = contributions["commands"]
    ids = [c["id"] for c in commands]
    assert len(ids) == len(set(ids)), "duplicate command ids"
    for c in commands:
        assert c["id"].startswith(m["name"] + "."), c["id"]
        assert isinstance(c.get("title"), str) and c["title"]
        assert ":" in c["python_name"], c["python_name"]


def test_python_names_resolve():
    m = _load()
    for c in m["contributions"]["commands"]:
        mod_name, attr = c["python_name"].split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), c["python_name"]


def test_contribution_cross_references():
    m = _load()
    contributions = m["contributions"]
    ids = {c["id"] for c in contributions["commands"]}
    for reader in contributions.get("readers", []):
        assert reader["command"] in ids
        pats = reader["filename_patterns"]
        assert isinstance(pats, list) and all(isinstance(p, str)
                                              for p in pats) and pats
    names = []
    for widget in contributions.get("widgets", []):
        assert widget["command"] in ids
        assert isinstance(widget.get("display_name"), str)
        names.append(widget["display_name"])
    assert len(names) == len(set(names)), "duplicate widget display names"


def test_parity_with_reference_manifest():
    m = _load()
    contributions = m["contributions"]
    suffixes = {c["id"].split(".", 1)[1] for c in contributions["commands"]}
    assert suffixes == EXPECTED_COMMANDS
    widget_ids = {w["command"].split(".", 1)[1]
                  for w in contributions["widgets"]}
    assert widget_ids == EXPECTED_WIDGETS
    reader_ids = {r["command"].split(".", 1)[1]
                  for r in contributions["readers"]}
    assert reader_ids == {"load_ome_zarr"}


def test_reader_contract():
    """The reader python_name follows the npe2 reader contract: called with
    a path it returns None (not ours) or a callable returning layer
    tuples."""
    m = _load()
    (reader,) = m["contributions"]["readers"]
    cmd = next(c for c in m["contributions"]["commands"]
               if c["id"] == reader["command"])
    mod_name, attr = cmd["python_name"].split(":")
    get_reader = getattr(importlib.import_module(mod_name), attr)
    assert get_reader("/nonexistent/file.tiff") is None
