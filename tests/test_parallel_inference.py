"""Sharded inference of the FULL lane pipeline over the device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import PipelineConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.parallel import batch_sharding, make_mesh
from lanetpu.runtime.lane import LaneSegmenter

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def test_lane_pipeline_data_parallel_matches_single():
    """The fused warped pipeline pjit'ed over an 8-way data mesh produces
    the same masks as the single-device run (frame-batch DP)."""
    cfg = PipelineConfig(compute_dtype="float32")
    seg = LaneSegmenter(module=UNet(config=UNetConfig(features=(4,))),
                        config=cfg)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=8, spatial=1)
    sh = batch_sharding(mesh, spatial=False)
    rep = NamedSharding(mesh, P())
    out_sh = NamedSharding(mesh, P("data", None, None))  # masks are rank 3

    fn = jax.jit(seg._predict_warped_fn,
                 in_shardings=(rep, sh, rep),
                 out_shardings=out_sh)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 96, 128, 3), dtype=np.uint8)
    thr = jnp.float32(0.5)
    variables = jax.device_put(seg.variables, rep)
    sharded = np.asarray(fn(variables,
                            jax.device_put(jnp.asarray(frames), sh),
                            jax.device_put(thr, rep)))
    single = np.asarray(jax.jit(seg._predict_warped_fn)(
        seg.variables, jnp.asarray(frames), thr))
    np.testing.assert_array_equal(sharded, single)


def test_unet_spatial_sharded_forward_matches():
    """H-axis (spatial) sharding of the raw U-Net forward: XLA inserts conv
    halo exchanges; outputs must match the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    module = UNet(config=UNetConfig(features=(4, 8)))
    x0 = jnp.zeros((2, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x0)
    mesh = make_mesh(data=2, spatial=4)
    sh = NamedSharding(mesh, P("data", "spatial", None, None))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    fwd = jax.jit(lambda v, xx: module.apply(v, xx, train=False),
                  in_shardings=(None, sh), out_shardings=sh)
    out_sharded = np.asarray(fwd(variables, jax.device_put(x, sh)))
    out_single = np.asarray(module.apply(variables, x, train=False))
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)


def test_multimodel_data_parallel_matches_single():
    """The fused three-model serving program pjit'ed over the 8-way data
    mesh (parallel.make_parallel_multimodel) matches the single-device
    program on every output."""
    import jax.numpy as jnp

    from lanetpu.core.config import ResNetConfig, YoloConfig
    from lanetpu.models.resnet import ResNetRegressor
    from lanetpu.models.yolo import YoloDetector
    from lanetpu.parallel import make_parallel_multimodel
    from lanetpu.pipeline.multimodel import MultiModelPipeline

    ycfg = YoloConfig(num_classes=3, img_size=(128, 128), width_mult=0.25,
                      depth_mult=0.33)
    pipe = MultiModelPipeline(
        unet=UNet(config=UNetConfig(features=(4,))),
        resnet=ResNetRegressor(config=ResNetConfig(depth=18, num_outputs=4)),
        yolo=YoloDetector(config=ycfg),
        config=PipelineConfig(compute_dtype="float32"),
        yolo_config=ycfg, classes=("a", "b", "c"))

    mesh = make_mesh(data=8, spatial=1)
    par_fn = make_parallel_multimodel(pipe, mesh)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (8, 240, 320, 3), dtype=np.uint8))
    thr = jnp.float32(0.5)
    args = (pipe.unet_vars, pipe.resnet_vars, pipe.yolo_vars, frames, thr)
    single = pipe._jitted(*args)
    sharded = par_fn(*args)
    for s, p, name in zip(single, sharded,
                          ("mask", "points", "boxes", "scores", "cls")):
        np.testing.assert_allclose(np.asarray(s, np.float32),
                                   np.asarray(p, np.float32),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    # the input really was distributed: 8 shards, one per device
    assert len(sharded[0].sharding.device_set) == 8


def test_unet_s2d_spatial_sharded_forward_matches():
    """The s2d topology under H-axis sharding: the space_to_depth reshape
    and conv halos must compose under GSPMD and match the unsharded
    forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    module = UNet(config=UNetConfig(features=(4, 8), s2d=2))
    x0 = jnp.zeros((2, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x0)
    mesh = make_mesh(data=2, spatial=4)
    sh = NamedSharding(mesh, P("data", "spatial", None, None))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    fwd = jax.jit(lambda v, xx: module.apply(v, xx, train=False),
                  in_shardings=(None, sh), out_shardings=sh)
    out_sharded = np.asarray(fwd(variables, jax.device_put(x, sh)))
    out_single = np.asarray(module.apply(variables, x, train=False))
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)
