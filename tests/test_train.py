"""Training engine tests: gradient/optimiser parity vs torch, loss parity,
and an end-to-end experiment run on synthetic data."""
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from iterseg_tpu.models.unet import UNetSpec, forward, init_params
from iterseg_tpu.models.convert import torch_state_dict_to_params
from iterseg_tpu.train.losses import (
    bce_loss,
    dice_loss,
    weighted_bce_loss,
    make_loss_function,
)
from iterseg_tpu.train import train as train_mod

from torch_unet_ref import TorchUNetRef


class TestLossParity:
    def setup_method(self):
        torch.manual_seed(0)
        self.x = torch.rand(1, 5, 4, 8, 8)
        self.y = (torch.rand(1, 5, 4, 8, 8) > 0.5).float()

    def test_bce(self):
        ref = torch.nn.BCELoss()(self.x, self.y).item()
        ours = float(bce_loss(jnp.asarray(self.x.numpy()),
                              jnp.asarray(self.y.numpy())))
        assert abs(ours - ref) < 1e-5

    def test_dice(self):
        # reference DiceLoss (custom_loss.py:24-53): flatten channels,
        # 1 - (2I + 1)/(sum + 1), channel mean
        x, y = self.x, self.y
        xt = x.permute(1, 0, 2, 3, 4).flatten(1)
        yt = y.permute(1, 0, 2, 3, 4).flatten(1)
        inter = (xt * yt).sum(-1)
        dice = (2 * inter + 1) / (xt.sum(-1) + yt.sum(-1) + 1)
        ref = (1 - dice).mean().item()
        ours = float(dice_loss(jnp.asarray(x.numpy()),
                               jnp.asarray(y.numpy())))
        assert abs(ours - ref) < 1e-5

    def test_weighted_bce(self):
        w = (0.5, 1.0, 2.0, 1.0, 3.0)
        bce = torch.nn.BCELoss(reduction="none")(self.x, self.y)
        per_chan = bce.permute(1, 0, 2, 3, 4).flatten(1).mean(-1)
        ref = (per_chan * torch.tensor(w)).mean().item()
        ours = float(
            weighted_bce_loss(
                jnp.asarray(self.x.numpy()), jnp.asarray(self.y.numpy()),
                jnp.asarray(w),
            )
        )
        assert abs(ours - ref) < 1e-5

    def test_epoch_weighted(self):
        w = [[1.0] * 5, [2.0] * 5]
        fn = make_loss_function("EpochWeightedBCE", chan_weights=w)
        l0 = float(fn(jnp.asarray(self.x.numpy()),
                      jnp.asarray(self.y.numpy()), 0))
        l1 = float(fn(jnp.asarray(self.x.numpy()),
                      jnp.asarray(self.y.numpy()), 1))
        assert abs(l1 - 2 * l0) < 1e-4


class TestGradAndStepParity:
    """Gradients vs torch autograd; Adam double-step mechanics vs torch.

    Note: comparing *parameters after* an Adam step through the net is not
    meaningful — Adam's first step is ±lr·sign(grad), so f32 noise on
    near-zero gradients flips full steps. Gradients and optimiser mechanics
    are therefore tested separately.
    """

    def test_eval_mode_gradients_match_torch(self):
        """Full-net gradient parity with BN in eval mode (affine running
        stats — no batch-stat noise amplification, so tolerances are tight).
        Train-mode BN gradients are covered in isolation below; train-mode
        forward/stat parity is covered in test_unet.py."""
        import jax

        torch.manual_seed(1)
        model = TorchUNetRef(1, 5)
        model.eval()
        params = torch_state_dict_to_params(model.state_dict())
        spec = UNetSpec(1, 5)
        x = torch.rand(1, 1, 4, 16, 16)
        y = (torch.rand(1, 5, 4, 16, 16) > 0.5).float()

        out = model(x)
        loss = torch.nn.BCELoss()(out, y)
        loss.backward()
        ref_grads = {k: p.grad.numpy() for k, p in model.named_parameters()}

        from iterseg_tpu.train.train import _split_params
        from iterseg_tpu.train.losses import make_loss_function

        trainable, bn_state = _split_params(params)
        loss_fn = make_loss_function("BCELoss")

        def loss_wrapped(tr):
            p = {**tr, **bn_state}
            o = forward(p, spec, x.numpy(), train=False)
            return loss_fn(o, y.numpy())

        l, grads = jax.value_and_grad(loss_wrapped)(trainable)
        assert abs(float(l) - loss.item()) < 1e-4
        gmax = max(np.abs(g).max() for g in ref_grads.values())
        for k, g in ref_grads.items():
            ours = np.asarray(grads[k])
            # atol relative to the global gradient scale
            np.testing.assert_allclose(ours, g, atol=5e-3 * gmax,
                                       err_msg=k)

    def test_train_mode_batchnorm_gradients(self):
        """Isolated train-mode BN gradient parity (batch-stat backprop)."""
        import jax
        import jax.numpy as jnp
        from iterseg_tpu.models.unet import batchnorm_train

        torch.manual_seed(3)
        bn = torch.nn.BatchNorm3d(8)
        bn.train()
        with torch.no_grad():
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
        x = torch.rand(1, 8, 4, 8, 8, requires_grad=True)
        out = bn(x)
        loss = (out**2).mean()
        loss.backward()

        def f(w, b, xx):
            y, _, _ = batchnorm_train(
                xx, w, b,
                jnp.zeros(8), jnp.ones(8),
            )
            return jnp.mean(y**2)

        gw, gb, gx = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(bn.weight.detach().numpy()),
            jnp.asarray(bn.bias.detach().numpy()),
            jnp.asarray(x.detach().numpy()),
        )
        np.testing.assert_allclose(np.asarray(gw), bn.weight.grad.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), bn.bias.grad.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), x.grad.numpy(),
                                   atol=1e-5)

    def test_double_adam_step_mechanics(self):
        """Fixed synthetic gradients: our double optax step must equal
        torch's double Adam step (the reference quirk, train.py:310+353)."""
        import optax

        torch.manual_seed(2)
        p0 = torch.randn(32, 16)
        g = torch.randn(32, 16) * 0.1
        p_t = p0.clone().requires_grad_(True)
        opt = torch.optim.Adam([p_t], lr=0.01)
        p_t.grad = g.clone()
        opt.step()
        opt.step()  # same grads, second step (grads not zeroed)
        ref = p_t.detach().numpy()

        optimizer = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
        params = {"p": jnp.asarray(p0.numpy())}
        grads = {"p": jnp.asarray(g.numpy())}
        state = optimizer.init(params)
        import optax as _o

        u1, state = optimizer.update(grads, state, params)
        params = _o.apply_updates(params, u1)
        u2, state = optimizer.update(grads, state, params)
        params = _o.apply_updates(params, u2)
        np.testing.assert_allclose(np.asarray(params["p"]), ref, atol=1e-5)


class TestTrainUnet:
    @pytest.fixture(scope="class")
    def tiny_data(self):
        from scipy import ndimage as ndi
        from iterseg_tpu.train.labels import get_training_labels

        r = np.random.default_rng(0)
        vol = np.zeros((4, 32, 32), np.float32)
        for c in np.stack([r.integers(1, s - 1, size=6) for s in vol.shape],
                          1):
            vol[tuple(c)] = 1.0
        img = ndi.gaussian_filter(vol, (1, 2, 2))
        img = img / img.max()
        from scipy import ndimage

        gt, _ = ndimage.label(img > 0.3)
        chans = ("z-1", "y-1", "x-1", "mask", "centreness-log")
        yvol = get_training_labels(gt, chans, (4, 1, 1))
        xs = [img, img]
        ys = [yvol, yvol]
        return xs, ys, chans

    def test_train_and_checkpoint(self, tiny_data, tmp_path):
        xs, ys, chans = tiny_data
        model, path = train_mod.train_unet(
            x=xs, vx=xs[:1], y=ys, vy=ys[:1],
            out_dir=str(tmp_path), name="t", channels=chans,
            epochs=2, lr=0.01, update_every=1,
        )
        assert path is not None and os.path.exists(path)
        # loss csv written with per-channel columns
        import pandas as pd

        df = pd.read_csv(tmp_path / "loss_t.csv")
        assert set(chans) <= set(df.columns)
        assert len(df) == 4  # 2 epochs x 2 batches
        vdf = pd.read_csv(tmp_path / "validation-loss_t.csv")
        assert len(vdf) == 3  # epoch-0 start + 2 epoch ends
        # loss should drop from the first to the last epoch
        assert df["loss"].iloc[-1] < df["loss"].iloc[0]
        # model usable for inference
        out = model(np.zeros((1, 1, 4, 32, 32), np.float32))
        assert out.shape == (1, 5, 4, 32, 32)

    def test_packed_label_upload_bit_equal(self, tiny_data, tmp_path,
                                           monkeypatch):
        """The compact bit-packed upload of {0,1} label channels must leave
        every recorded loss bit-identical to the plain f32 upload path
        (pack/unpack roundtrips exactly, and bit→f32 is exact, so the
        train step sees the same bits either way)."""
        import pandas as pd
        from iterseg_tpu.train.labels import is_binary_channel

        xs, ys, chans = tiny_data
        bin_idx = [i for i, c in enumerate(chans) if is_binary_channel(c)]
        assert bin_idx == [0, 1, 2, 3]  # affinities + mask; centreness not
        for yv in ys:  # fixture really is {0,1} on those channels
            assert set(np.unique(yv[bin_idx]).tolist()) <= {0.0, 1.0}

        def run(sub):
            d = tmp_path / sub
            d.mkdir()
            train_mod.train_unet(
                x=xs, vx=xs[:1], y=ys, vy=ys[:1], out_dir=str(d),
                name="t", channels=chans, epochs=1, lr=0.01,
                update_every=1,
            )
            ldf = pd.read_csv(d / "loss_t.csv")
            vdf = pd.read_csv(d / "validation-loss_t.csv")
            return ldf, vdf

        fast_l, fast_v = run("fast")  # packed path taken for bin_idx
        monkeypatch.setattr(train_mod, "_is_binary_channel",
                            lambda c: False)
        slow_l, slow_v = run("slow")  # forced plain-f32 uploads
        assert (fast_l["loss"].to_numpy()
                == slow_l["loss"].to_numpy()).all()
        for c in chans:
            assert (fast_l[c].to_numpy() == slow_l[c].to_numpy()).all()
        assert (fast_v["validation_loss"].to_numpy()
                == slow_v["validation_loss"].to_numpy()).all()

    def test_run_experiment(self, tiny_data, tmp_path):
        from iterseg_tpu.train.experiments import (
            get_experiment_dict,
            run_experiment,
        )

        xs, ys, chans = tiny_data
        img = xs[0]
        from scipy import ndimage

        gt, _ = ndimage.label(img > 0.3)
        exp = get_experiment_dict(
            [chans], ["cond-a"], [{"epochs": 1}],
            n_each=3, scale=(4, 1, 1), name="mini",
        )
        exp["get_train_data"]["shape"] = (2, 16, 16)
        paths = run_experiment(exp, [img], [gt], str(tmp_path))
        assert len(paths) == 1 and os.path.exists(paths[0])
        assert os.path.exists(tmp_path / "unet_paths.txt")


class TestSaturationSafety:
    def test_bce_grads_finite_at_saturation(self):
        """Regression: grad of the -100-clamped log must be NaN/inf-free at
        x == 0/1 (saturated sigmoids occur after a single real train step)."""
        import jax
        from iterseg_tpu.train.losses import bce_loss

        x = jnp.array([0.0, 1.0, 0.5, 1e-45, 1e-7, 1.0 - 1e-7])
        y = jnp.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0])
        g = jax.grad(lambda x: bce_loss(x, y))(x)
        assert bool(jnp.isfinite(g).all())
        ref = torch.nn.BCELoss()(
            torch.tensor([0.0, 1.0, 0.5, 1e-45, 1e-7, 1.0 - 1e-7]),
            torch.tensor([1.0, 0.0, 1.0, 0.0, 1.0, 0.0]),
        ).item()
        assert abs(float(bce_loss(x, y)) - ref) < 1e-4


class TestShardedTrainUnet:
    """The public mesh path (train_unet(mesh=...)): data+space-sharded
    steps via parallel.mesh.make_sharded_train_step."""

    def test_mesh_training_end_to_end(self, tmp_path):
        import pandas as pd
        from scipy import ndimage as ndi

        from iterseg_tpu.parallel.mesh import make_mesh
        from iterseg_tpu.train.labels import get_training_labels

        r = np.random.default_rng(0)
        vol = np.zeros((4, 32, 32), np.float32)
        for c in np.stack([r.integers(1, s - 1, size=6) for s in vol.shape],
                          1):
            vol[tuple(c)] = 1.0
        img = ndi.gaussian_filter(vol, (1, 2, 2))
        img = img / img.max()
        gt, _ = ndi.label(img > 0.3)
        chans = ("z-1", "y-1", "x-1", "mask", "centreness-log")
        yvol = get_training_labels(gt, chans, (4, 1, 1))
        xs = [img, img, img]  # 3 chunks, dp=2 -> 2 steps (tail repeat-pad)
        ys = [yvol, yvol, yvol]
        mesh = make_mesh(8)
        assert dict(mesh.shape) == {"data": 2, "space": 4}
        model, path = train_mod.train_unet(
            x=xs, vx=xs[:1], y=ys, vy=ys[:1],
            out_dir=str(tmp_path), name="tm", channels=chans,
            epochs=2, lr=0.01, update_every=1, mesh=mesh,
        )
        assert path is not None and os.path.exists(path)
        df = pd.read_csv(tmp_path / "loss_tm.csv")
        assert len(df) == 4  # 2 epochs x 2 sharded steps
        assert set(chans) <= set(df.columns)
        assert np.isfinite(df["loss"]).all()
        # tail step logs its (deduplicated) batched ids joined by ';'
        assert df["data_id"].iloc[0].count(";") == 1
        assert df["data_id"].iloc[1].count(";") == 0
        vdf = pd.read_csv(tmp_path / "validation-loss_tm.csv")
        assert len(vdf) == 3
        out = model(np.zeros((1, 1, 4, 32, 32), np.float32))
        assert out.shape == (1, 5, 4, 32, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_n_devices_kwarg_builds_mesh(self):
        r = np.random.default_rng(1)
        shape = (2, 16, 32)
        xs = [r.random(shape, dtype=np.float32) for _ in range(2)]
        ys = [(r.random((5,) + shape) > 0.5).astype(np.float32)
              for _ in range(2)]
        model, path = train_mod.train_unet(
            x=xs, vx=[], y=ys, vy=[], out_dir=None, epochs=1,
            n_devices=8, validate=False,
        )
        assert path is None
        out = model(np.zeros((1, 1) + shape, np.float32))
        assert np.isfinite(np.asarray(out)).all()


class TestValidationEpochPinning:
    def test_validation_uses_epoch0_weights(self, tmp_path):
        """The reference sets its validation loss's epoch only at e == 0
        (train.py:297-299), so epoch-weighted validation always scores
        with the epoch-0 weight row — a 100x epoch-1 row must NOT blow up
        the later validation losses."""
        import pandas as pd
        from scipy import ndimage
        from iterseg_tpu.train.labels import get_training_labels

        r = np.random.default_rng(0)
        vol = np.zeros((4, 32, 32), np.float32)
        for c in np.stack([r.integers(1, s - 1, size=6)
                           for s in vol.shape], 1):
            vol[tuple(c)] = 1.0
        from scipy import ndimage as ndi
        img = ndi.gaussian_filter(vol, (1, 2, 2))
        img = img / img.max()
        gt, _ = ndimage.label(img > 0.3)
        chans = ("z-1", "y-1", "x-1", "mask", "centreness-log")
        yvol = get_training_labels(gt, chans, (4, 1, 1))

        w = np.ones((2, 5), np.float32)
        w[1] *= 100.0
        train_mod.train_unet(
            x=[img, img], vx=[img], y=[yvol, yvol], vy=[yvol],
            out_dir=str(tmp_path), name="ew", channels=chans, epochs=2,
            loss_function="EpochWeightedBCE", chan_weights=w,
            update_every=1,
        )
        vdf = pd.read_csv(tmp_path / "validation-loss_ew.csv")
        assert len(vdf) == 3
        # pinned at w[0]: the end-of-epoch-1 validation stays on the same
        # scale as the first (it would be ~100x with w[1])
        assert (vdf["validation_loss"].iloc[-1]
                < 10 * vdf["validation_loss"].iloc[0])
