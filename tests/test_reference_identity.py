"""End-to-end label identity on torch-reference feature maps.

The only cross-framework label-identity claim that can be exact: the U-Net
forward itself diverges between frameworks (JAX vs torch convs differ by
<=5e-4, bounded in test_unet.py), but everything downstream of the feature
maps is exact. So this test takes feature maps produced by the TORCH
reference architecture (tests/torch_unet_ref.py, state-dict-compatible with
the reference ``unet.py``), feeds the SAME maps to

  (a) the repo's production postprocessing — device feature prep + native
      C++ priority flood (``ops.watershed.segment_output_image`` defaults,
      reference semantics: watershed.py:165-223), and
  (b) a reference-semantics host pipeline — scipy float feature prep +
      the pure-Python heap oracle that bit-matches the reference numba
      kernel (``device_featuremaps=False, py_func=True``),

and asserts bit-identical instance labels. Together with the
fast-path==generic-path equality (test_device_pipeline.py) this ties the
whole inference stack to reference postprocessing semantics; the forward
float divergence is the only cross-framework deviation (PARITY.md).
"""
import numpy as np
import pytest
import torch
from scipy import ndimage as ndi

from iterseg_tpu.models.convert import (
    load_checkpoint,
    save_checkpoint,
    torch_state_dict_to_params,
)
from iterseg_tpu.models.unet import UNetSpec, apply as unet_apply
from iterseg_tpu.ops.watershed import segment_output_image

from torch_unet_ref import TorchUNetRef


def blob_volume(shape=(6, 64, 64), n=20, seed=4):
    r = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    for c in np.stack([r.integers(1, s - 1, size=n) for s in shape], 1):
        vol[tuple(c)] = 1.0
    vol = ndi.gaussian_filter(vol, (1, 2, 2))
    return (vol / vol.max()).astype(np.float32)


@pytest.fixture(scope="module")
def torch_maps(tmp_path_factory):
    """Feature maps from the torch reference architecture, using the
    shipped trained checkpoint (saturated, realistic maps)."""
    import os

    from iterseg_tpu.engine.predict import DEFAULT_UNET_PATH

    torch.manual_seed(0)
    model = TorchUNetRef(1, 5)
    if os.path.exists(DEFAULT_UNET_PATH):
        params = load_checkpoint(DEFAULT_UNET_PATH)
        pt = tmp_path_factory.mktemp("ref") / "ref.pt"
        save_checkpoint(params, str(pt))
        model.load_state_dict(torch.load(str(pt), weights_only=True))
    model.eval()
    vol = blob_volume()
    with torch.no_grad():
        maps = model(torch.from_numpy(vol)[None, None]).numpy()[0]
    return vol, maps.astype(np.float32)


class TestReferenceLabelIdentity:
    def test_production_equals_reference_semantics_otsu(self, torch_maps):
        _, maps = torch_maps
        labels, seeds, mask = segment_output_image(
            maps, (0, 1, 2), thresholding_channel=3, centroids_channel=4
        )
        labels_ref, seeds_ref, mask_ref = segment_output_image(
            maps, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            device_featuremaps=False, py_func=True,
        )
        np.testing.assert_array_equal(seeds, seeds_ref)
        np.testing.assert_array_equal(mask, mask_ref)
        np.testing.assert_array_equal(labels, labels_ref)

    def test_production_equals_reference_semantics_absolute(self, torch_maps):
        _, maps = torch_maps
        labels, _, _ = segment_output_image(
            maps, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            absolute_thresh=0.5,
        )
        labels_ref, _, _ = segment_output_image(
            maps, (0, 1, 2), thresholding_channel=3, centroids_channel=4,
            absolute_thresh=0.5, device_featuremaps=False, py_func=True,
        )
        np.testing.assert_array_equal(labels, labels_ref)

    def test_forward_divergence_is_bounded(self, torch_maps):
        """The one cross-framework residual: the JAX forward agrees with
        torch to <=5e-4 on the same weights (documented in PARITY.md)."""
        vol, maps = torch_maps
        from iterseg_tpu.engine.predict import DEFAULT_UNET_PATH
        import os

        if not os.path.exists(DEFAULT_UNET_PATH):
            pytest.skip("no shipped checkpoint")
        params = load_checkpoint(DEFAULT_UNET_PATH)
        jax_maps = np.asarray(
            unet_apply(params, UNetSpec(1, 5), vol[None, None])
        )[0]
        assert np.max(np.abs(jax_maps - maps)) <= 5e-4
