"""Model topology tests: shapes, parameter counts, preset structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import ResNetConfig, UNetConfig, YoloConfig
from lanetpu.models.resnet import ResNetRegressor
from lanetpu.models.unet import UNet
from lanetpu.models.yolo import YoloDetector


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


def test_unet_deployed_shapes():
    model = UNet(config=UNetConfig.deployed())
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 1)


def test_unet_deployed_op_census():
    """The deployed RKNN graph contains 14 ConvRelu / 3 MaxPool /
    3 ConvTranspose / 3 Concat (SURVEY.md §2.1 #18). Our 3-level preset must
    produce the same op census: 3 enc blocks x2 conv + bottleneck x2 +
    3 dec blocks x2 conv + 1 head = 14 convs, 3 pools, 3 transpose convs."""
    cfg = UNetConfig.deployed()
    n_levels = len(cfg.features)
    convs = 2 * n_levels + 2 + 2 * n_levels + 1
    assert convs == 15  # 14 ConvRelu + 1 final 1x1 conv (fused w/ sigmoid in RKNN)
    assert n_levels == 3


def test_unet_readme_preset_param_count():
    """README model: 4 levels [64,128,256,512], ~31M params
    (reference README.md:1493-1503)."""
    model = UNet(config=UNetConfig.readme())
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    n = _param_count(variables["params"])
    assert 30e6 < n < 32e6


def test_unet_batch_and_dtype():
    model = UNet(config=UNetConfig(features=(8, 16)), dtype=jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32, 32, 1)


def test_unet_final_sigmoid_flag():
    cfg = UNetConfig(features=(8,), final_sigmoid=True)
    model = UNet(config=cfg)
    x = jnp.ones((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


@pytest.mark.parametrize("num_outputs", [4, 12])
def test_resnet_regressor_shapes(num_outputs):
    model = ResNetRegressor(config=ResNetConfig(depth=18, num_outputs=num_outputs))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, num_outputs)
    assert float(np.min(out)) >= 0.0 and float(np.max(out)) <= 1.0


def test_resnet50_param_count():
    model = ResNetRegressor(config=ResNetConfig(depth=50, num_outputs=4))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    n = _param_count(variables["params"])
    # torchvision resnet50 backbone is ~23.5M (sans fc)
    assert 22e6 < n < 27e6


def test_yolo_output_structure():
    cfg = YoloConfig(num_classes=11, img_size=(128, 128))
    model = YoloDetector(config=cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    for (box, cls), stride in zip(outs, (8, 16, 32)):
        assert box.shape == (1, 128 // stride, 128 // stride, 64)
        assert cls.shape == (1, 128 // stride, 128 // stride, 11)


def test_space_to_depth_roundtrip():
    from lanetpu.ops.space2depth import depth_to_space, space_to_depth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
    packed = space_to_depth(x, 2)
    assert packed.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space(packed, 2)),
                                  np.asarray(x))


def test_unet_s2d_topology_shapes():
    """UNetConfig(s2d=2): same in/out contract as the parity topology, but
    the whole net runs at half spatial resolution on packed channels."""
    cfg = UNetConfig(features=(8, 16), s2d=2)
    model = UNet(config=cfg)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32, 32, 1)
    # head emits s2d^2 channels, unpacked by depth_to_space
    assert variables["params"]["head"]["kernel"].shape[-1] == 4


def test_unet_s2d_folded_forward_parity():
    """The folded functional forward reproduces the Flax s2d model."""
    from lanetpu.quant.fold import fold_unet_batchnorm
    from lanetpu.quant.functional_unet import unet_forward_folded

    cfg = UNetConfig(features=(8, 16), s2d=2)
    model = UNet(config=cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    folded = fold_unet_batchnorm(jax.device_get(variables), cfg.features)
    ref = model.apply(variables, x, train=False)
    ours = unet_forward_folded(folded, x, cfg.features, s2d=2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
