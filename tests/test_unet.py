"""U-Net parity tests: JAX model vs an independent torch oracle."""
import numpy as np
import pytest
import torch

from iterseg_tpu.models.unet import (
    UNetSpec,
    apply,
    forward,
    init_params,
)
from iterseg_tpu.models.convert import (
    torch_state_dict_to_params,
    infer_spec_from_params,
    save_checkpoint,
    load_checkpoint,
)

from torch_unet_ref import TorchUNetRef


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchUNetRef(1, 5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def x_small():
    torch.manual_seed(1)
    return torch.randn(1, 1, 4, 32, 32)


class TestForwardParity:
    def test_eval_forward_matches_torch(self, torch_model, x_small):
        params = torch_state_dict_to_params(torch_model.state_dict())
        spec = infer_spec_from_params(params)
        assert spec.out_channels == (5,)
        with torch.no_grad():
            ref = torch_model(x_small).numpy()
        ours = np.asarray(apply(params, spec, x_small.numpy()))
        assert ours.shape == ref.shape == (1, 5, 4, 32, 32)
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_shape_ladder_256(self, torch_model):
        # the reference-documented trace: (1,1,10,256,256) -> (1,5,10,256,256)
        params = torch_state_dict_to_params(torch_model.state_dict())
        spec = infer_spec_from_params(params)
        x = np.zeros((1, 1, 10, 64, 64), np.float32)  # 64 has same ladder
        out = np.asarray(apply(params, spec, x))
        assert out.shape == (1, 5, 10, 64, 64)

    def test_forked_forward_matches_torch(self):
        torch.manual_seed(2)
        model = TorchUNetRef(1, (3, 2))
        model.eval()
        params = torch_state_dict_to_params(model.state_dict())
        spec = infer_spec_from_params(params)
        assert spec.out_channels == (3, 2)
        x = torch.randn(1, 1, 4, 32, 32)
        with torch.no_grad():
            ref = model(x).numpy()
        ours = np.asarray(apply(params, spec, x.numpy()))
        assert ours.shape == (1, 5, 4, 32, 32)
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_train_mode_matches_torch(self, x_small):
        torch.manual_seed(3)
        model = TorchUNetRef(1, 5)
        model.train()
        params = torch_state_dict_to_params(model.state_dict())
        spec = infer_spec_from_params(params)
        ref = model(x_small).detach().numpy()
        out, updates = forward(params, spec, x_small.numpy(), train=True)
        # train-mode BN divides by batch std; near-dead ReLU channels under
        # random weights amplify f32 accumulation noise, so the tolerance is
        # looser than eval mode (batchnorm_train itself is exact to 5e-7,
        # verified in isolation).
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)
        # running stats were updated by the torch forward too — compare
        sd = model.state_dict()
        rm_ref = sd["c0.batch0.running_mean"].numpy()
        np.testing.assert_allclose(
            np.asarray(updates["c0.batch0.running_mean"]), rm_ref, atol=1e-4
        )
        rv_ref = sd["c0.batch0.running_var"].numpy()
        np.testing.assert_allclose(
            np.asarray(updates["c0.batch0.running_var"]), rv_ref, atol=1e-4
        )


class TestCheckpointRoundtrip:
    def test_npz_roundtrip(self, tmp_path, torch_model, x_small):
        params = torch_state_dict_to_params(torch_model.state_dict())
        spec = infer_spec_from_params(params)
        p = save_checkpoint(params, tmp_path / "unet_test")
        loaded = load_checkpoint(p)
        assert set(loaded) == set(params)
        a = np.asarray(apply(params, spec, x_small.numpy()))
        b = np.asarray(apply(loaded, spec, x_small.numpy()))
        np.testing.assert_array_equal(a, b)

    def test_pt_roundtrip(self, tmp_path, torch_model, x_small):
        params = torch_state_dict_to_params(torch_model.state_dict())
        p = save_checkpoint(params, str(tmp_path / "unet_test.pt"))
        loaded = load_checkpoint(p)
        model2 = TorchUNetRef(1, 5)
        sd = torch.load(p, weights_only=True)
        model2.load_state_dict(sd)
        model2.eval()
        with torch.no_grad():
            ref = model2(x_small).numpy()
        spec = infer_spec_from_params(loaded)
        ours = np.asarray(apply(loaded, spec, x_small.numpy()))
        np.testing.assert_allclose(ours, ref, atol=5e-4)


class TestInit:
    def test_init_params_shapes_match_torch(self, torch_model):
        params = init_params(UNetSpec(1, 5), seed=0)
        sd = torch_model.state_dict()
        ref_keys = {
            k for k in sd.keys() if not k.endswith("num_batches_tracked")
        }
        assert set(params.keys()) == ref_keys
        for k in ref_keys:
            assert params[k].shape == tuple(sd[k].shape), k


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        from iterseg_tpu.models.convert import (
            save_checkpoint_orbax,
            load_checkpoint,
        )

        params = init_params(UNetSpec(1, 5), seed=1)
        p = save_checkpoint_orbax(params, tmp_path / "ckpt_orbax")
        loaded = load_checkpoint(p)
        assert set(loaded) == set(params)
        for k in params:
            np.testing.assert_array_equal(
                np.asarray(loaded[k]), np.asarray(params[k])
            )


class TestConvOutputPadding:
    """The entry conv's output-channel padding (conv3d pads 1-in-channel
    convs to 64 outputs and slices back; benchmarks/mxu_pad_probe.json)
    must be numerically invisible."""

    def test_padded_entry_conv_bit_equal(self):
        import jax
        import jax.numpy as jnp

        from iterseg_tpu.models.unet import conv3d

        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((2, 1, 6, 16, 16)).astype(
            np.float32))
        w = jnp.asarray(r.standard_normal((32, 1, 3, 3, 3)).astype(
            np.float32))
        b = jnp.asarray(r.standard_normal(32).astype(np.float32))
        got = np.asarray(conv3d(x, w, b))
        # reference: the plain narrow conv
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        ) + b.reshape(1, -1, 1, 1, 1)
        np.testing.assert_array_equal(got, np.asarray(y))
