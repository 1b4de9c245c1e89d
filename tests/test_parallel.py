"""Device-mesh parallelism tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from iterseg_tpu.models.unet import UNetSpec, init_params, apply
from iterseg_tpu.engine.predict import UNetModel, predict_volume
from iterseg_tpu.parallel.mesh import (
    make_mesh,
    replicate_params,
    sharded_apply,
    make_sharded_train_step,
    sharded_predict_volume,
)


@pytest.fixture(scope="module")
def model():
    return UNetModel(init_params(UNetSpec(1, 5), seed=0))


class TestMesh:
    def test_mesh_factorisation(self):
        mesh = make_mesh(8)
        assert mesh.shape["data"] * mesh.shape["space"] == 8

    def test_sharded_forward_matches_single(self, model):
        mesh = make_mesh(8)
        run = sharded_apply(replicate_params(model.params, mesh),
                            model.spec, mesh)
        x = np.random.default_rng(0).random((8, 1, 2, 16, 64)).astype(
            np.float32
        )
        sharded = np.asarray(run(x))
        single = np.asarray(apply(model.params, model.spec, x))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_sharded_predict_volume_matches(self, model):
        mesh = make_mesh(8)
        vol = np.random.default_rng(1).random((4, 64, 64)).astype(np.float32)
        sharded = sharded_predict_volume(
            model, vol, mesh, chunk_size=(2, 32, 64), margin=(0, 8, 8)
        )
        single = predict_volume(model, vol, chunk_size=(2, 32, 64),
                                margin=(0, 8, 8))
        np.testing.assert_allclose(sharded, single, atol=1e-5)


class TestShardedTraining:
    def test_train_step_runs_and_reduces(self, model):
        import optax

        from iterseg_tpu.train.losses import make_loss_function
        from iterseg_tpu.train.train import _split_params

        mesh = make_mesh(8)
        dp = mesh.shape["data"]
        sp = mesh.shape["space"]
        trainable, bn_state = _split_params(model.params)
        optimizer = optax.adam(0.01)
        opt_state = optimizer.init(trainable)
        loss_fn = make_loss_function("BCELoss")
        step = make_sharded_train_step(mesh, model.spec, loss_fn, optimizer,
                                       double_step=True)
        r = np.random.default_rng(0)
        x = r.random((dp, 1, 2, 16, 16 * sp)).astype(np.float32)
        y = (r.random((dp, 5, 2, 16, 16 * sp)) > 0.5).astype(np.float32)
        tr2, bn2, opt2, loss = step(trainable, bn_state, opt_state, x, y)
        assert np.isfinite(float(loss))
        # parameters actually moved and stayed replicated/consistent
        moved = any(
            not np.allclose(np.asarray(tr2[k]), np.asarray(trainable[k]))
            for k in list(tr2)[:3]
        )
        assert moved
