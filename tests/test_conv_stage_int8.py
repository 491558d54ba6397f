"""Parity gates for the int8-resident fused stage kernel + forward.

The fused kernel must match the unfused XLA int8 math to <=1 LSB
(identical algebra, f32 associativity differences only), and the fully
fused U-Net forward must track mode="int8" to within the skip-requant
rounding. Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from lanetpu.core.config import UNetConfig
from lanetpu.kernels.conv_stage_int8 import (
    fused_double_conv_int8,
    pick_tile_h,
    stage_requant_params,
)
from lanetpu.models.unet import UNet
from lanetpu.quant import (
    calibrate_unet,
    fold_unet_batchnorm,
    quantize_unet,
    unet_forward_folded,
)
from lanetpu.quant.qtensor import (
    asymmetric_qparams,
    quantize_asymmetric,
    quantize_symmetric_per_channel,
)

FEATURES = (4, 8)


def _xla_int8_conv(xq, wq, wsum, wscale, bias, qp_in, relu):
    """The unfused reference conv math (calibrate._hook_int8, from int8)."""
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=np.int8(qp_in.zero_point))
    acc = lax.conv_general_dilated(
        xp, wq, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    corr = jnp.asarray(wsum, jnp.int32) * jnp.int32(qp_in.zero_point)
    y = (acc - corr).astype(jnp.float32) * (
        jnp.float32(qp_in.scale)
        * jnp.asarray(wscale, jnp.float32).reshape(1, 1, 1, -1)) \
        + jnp.asarray(bias)
    return jax.nn.relu(y) if relu else y


def _make_pair(cin, cmid, cout, seed):
    rng = np.random.default_rng(seed)
    w0 = rng.normal(0, 0.3, (3, 3, cin, cmid)).astype(np.float32)
    w1 = rng.normal(0, 0.3, (3, 3, cmid, cout)).astype(np.float32)
    b0 = rng.normal(0, 0.2, cmid).astype(np.float32)
    b1 = rng.normal(0, 0.2, cout).astype(np.float32)
    w0q, qp0 = quantize_symmetric_per_channel(w0)
    w1q, qp1 = quantize_symmetric_per_channel(w1)
    return (w0, b0, w0q, qp0.scale, w0q.astype(np.int32).sum((0, 1, 2))), \
           (w1, b1, w1q, qp1.scale, w1q.astype(np.int32).sum((0, 1, 2)))


@pytest.mark.parametrize("zp_out_mode", ["int8", "f32"])
def test_fused_pair_matches_unfused_int8(zp_out_mode):
    cin, cmid, cout = 4, 8, 8
    (w0, b0, w0q, s0, sum0), (w1, b1, w1q, s1, sum1) = _make_pair(
        cin, cmid, cout, 0)
    qp_in = asymmetric_qparams(-1.2, 2.0)
    qp_mid = asymmetric_qparams(0.0, 3.5)
    qp_out = asymmetric_qparams(0.0, 4.0)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.8, (2, 16, 24, cin)).astype(np.float32)
    xq = quantize_asymmetric(jnp.asarray(x), qp_in)

    # unfused reference: conv -> f32 relu -> quantize -> conv -> relu
    y = _xla_int8_conv(xq, jnp.asarray(w0q), sum0, s0, b0, qp_in, True)
    mid_q = quantize_asymmetric(y, qp_mid)
    ref = _xla_int8_conv(mid_q, jnp.asarray(w1q), sum1, s1, b1, qp_mid,
                         True)

    m0, bb0 = stage_requant_params(qp_in.scale, qp_in.zero_point, s0, sum0,
                                   b0, qp_mid.scale, qp_mid.zero_point)
    if zp_out_mode == "int8":
        m1, bb1 = stage_requant_params(qp_mid.scale, qp_mid.zero_point, s1,
                                       sum1, b1, qp_out.scale,
                                       qp_out.zero_point)
        got = fused_double_conv_int8(
            xq, jnp.asarray(w0q), m0, bb0, jnp.asarray(w1q), m1, bb1,
            zp_in=qp_in.zero_point, zp_mid=qp_mid.zero_point,
            zp_out=qp_out.zero_point, tile_h=8, interpret=True)
        ref_q = quantize_asymmetric(ref, qp_out)
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref_q,
                                                             np.int32))
        assert diff.max() <= 1                  # f32-associativity LSB
        assert (diff > 0).mean() < 0.02
    else:
        m1, bb1 = stage_requant_params(qp_mid.scale, qp_mid.zero_point, s1,
                                       sum1, b1, None, None)
        got = fused_double_conv_int8(
            xq, jnp.asarray(w0q), m0, bb0, jnp.asarray(w1q), m1, bb1,
            zp_in=qp_in.zero_point, zp_mid=qp_mid.zero_point, zp_out=None,
            tile_h=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


def test_pick_tile_h():
    assert pick_tile_h(224) == 16   # measured best that compiles
    assert pick_tile_h(112) == 16
    assert pick_tile_h(56) == 8
    assert pick_tile_h(28) == 28    # single strip (any height ok at j=0)
    assert pick_tile_h(6) == 6


@pytest.fixture(scope="module")
def quantized_unet():
    module = UNet(config=UNetConfig(features=FEATURES))
    x = jnp.zeros((1, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(3), x)
    folded = fold_unet_batchnorm(variables, FEATURES)
    rng = np.random.default_rng(7)
    calib = [rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
             for _ in range(2)]
    ranges = calibrate_unet(folded, FEATURES, calib)
    return quantize_unet(folded, FEATURES, ranges)


def test_fused_forward_tracks_unfused(quantized_unet):
    import copy

    # Function-scoped copy: mutating _interpret on the module-scoped fixture
    # would leak interpret mode into other tests sharing it.
    q = copy.copy(quantized_unet)
    q._interpret = True
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(q.forward(jnp.asarray(x), mode="int8"))
    got = np.asarray(q.forward(jnp.asarray(x), mode="int8_fused"))
    assert got.shape == ref.shape
    # identical algebra; only the skip-requant double rounding differs
    scale_out = np.abs(ref).max() or 1.0
    assert np.abs(got - ref).max() / scale_out < 0.05
    assert np.abs(got - ref).mean() / scale_out < 0.005
    # both must segment identically vs the fp forward at mask level
    fp = np.asarray(unet_forward_folded(q.folded, jnp.asarray(x), FEATURES))
    m_ref = ref > 0
    m_got = got > 0
    agree = (m_ref == m_got).mean()
    assert agree > 0.995
    assert ((fp > 0) == m_got).mean() > 0.97


def test_fused_forward_rejects_partial_quant(quantized_unet):
    import dataclasses

    q = quantized_unet
    partial_qp = dict(q.act_qp)
    partial_qp.pop("head")
    q2 = dataclasses.replace(q, act_qp=partial_qp) \
        if dataclasses.is_dataclass(q) else None
    if q2 is None:
        import copy

        q2 = copy.copy(q)
        q2.act_qp = partial_qp
    from lanetpu.quant.fused_forward import supports_fused

    assert not supports_fused(q2)
    with pytest.raises(ValueError, match="head"):
        q2.forward(jnp.zeros((1, 32, 32, 3)), mode="int8_fused")
