"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import TrainConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.parallel import (
    batch_sharding,
    make_mesh,
    make_parallel_predict,
    make_parallel_train_step,
    shard_train_state,
)
from lanetpu.train.steps import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def _make_state(cfg):
    module = UNet(config=UNetConfig(features=cfg.features))
    return create_train_state(module, jax.random.PRNGKey(0), cfg)


def test_mesh_shapes():
    mesh = make_mesh(data=4, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh = make_mesh(spatial=2)  # data inferred
    assert mesh.shape["data"] * mesh.shape["spatial"] == 8


def test_parallel_train_step_matches_single_device():
    cfg = TrainConfig(features=(4,), image_size=(32, 32), batch_size=8,
                      compute_dtype="float32")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, 32, 32, 3)).astype(np.float32))
    masks = jnp.asarray((rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32))

    # single device
    state1 = _make_state(cfg)
    step1 = jax.jit(make_train_step(cfg))
    state1, m1 = step1(state1, images, masks)

    # 4x2 mesh (data x spatial)
    mesh = make_mesh(data=4, spatial=2)
    state2 = shard_train_state(_make_state(cfg), mesh)
    step2 = make_parallel_train_step(cfg, mesh)
    sh = batch_sharding(mesh)
    state2, m2 = step2(state2, jax.device_put(images, sh),
                       jax.device_put(masks, sh))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_parallel_predict_matches_single():
    mesh = make_mesh(data=8, spatial=1)
    module = UNet(config=UNetConfig(features=(4,)))
    x = jnp.zeros((1, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(0), x)

    def predict(frames):
        return module.apply(variables, frames, train=False)

    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.random((8, 32, 32, 3)).astype(np.float32))
    pfn = make_parallel_predict(predict, mesh, spatial=False)
    out_p = pfn(jax.device_put(frames, batch_sharding(mesh, spatial=False)))
    out_s = predict(frames)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), atol=1e-5)
