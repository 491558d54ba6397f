"""Quantization path tests: BN folding exactness, calibration, int8/fakequant
parity gates (README.md:3556-3562 MAE gates; BASELINE.json IoU>=0.99)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.quant import (
    calibrate_unet,
    fold_unet_batchnorm,
    parity_report,
    quantize_unet,
    unet_forward_folded,
)
from lanetpu.quant.qtensor import (
    asymmetric_qparams,
    dequantize,
    fake_quant,
    quantize_asymmetric,
    quantize_symmetric_per_channel,
)

FEATURES = (4, 8)


@pytest.fixture(scope="module")
def trained_unet():
    """A UNet with random-but-nontrivial params + batch stats."""
    module = UNet(config=UNetConfig(features=FEATURES))
    x = jnp.zeros((1, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(3), x)
    # perturb batch stats so folding is non-trivial
    import flax

    state = flax.core.unfreeze(variables)
    rng = np.random.default_rng(0)

    def perturb(d):
        for k, v in d.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == "mean":
                d[k] = jnp.asarray(rng.normal(0, 0.3, v.shape), jnp.float32)
            elif k == "var":
                d[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape), jnp.float32)

    perturb(state["batch_stats"])
    return module, state


def test_qparams_roundtrip():
    qp = asymmetric_qparams(-1.0, 3.0)
    x = jnp.linspace(-1.0, 3.0, 100)
    err = np.abs(np.asarray(dequantize(quantize_asymmetric(x, qp), qp)) - x)
    assert err.max() <= qp.scale  # within one quantization step


def test_qparams_zero_exactly_representable():
    qp = asymmetric_qparams(-0.37, 2.11)
    z = np.asarray(dequantize(quantize_asymmetric(jnp.zeros(()), qp), qp))
    assert abs(float(z)) < qp.scale * 0.51


def test_per_channel_weight_quant(rng):
    w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    w[..., 0] *= 100.0  # wildly different channel scale
    q, qp = quantize_symmetric_per_channel(w)
    recon = q.astype(np.float32) * qp.scale
    rel = np.abs(recon - w).max(axis=(0, 1, 2)) / np.abs(w).max(axis=(0, 1, 2))
    assert rel.max() < 0.01  # per-channel keeps relative error tight


def test_fold_batchnorm_matches_flax(trained_unet, rng):
    """Folded functional forward == Flax eval forward (bit parity gate)."""
    module, variables = trained_unet
    folded = fold_unet_batchnorm(variables, FEATURES)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = module.apply(variables, x, train=False)
    ours = unet_forward_folded(folded, x, FEATURES)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_quantized_parity_gates(trained_unet, rng):
    """Calibrate + quantize; fakequant and int8 modes must both pass the
    MAE<0.05 gate vs fp32 and agree with each other closely."""
    module, variables = trained_unet
    folded = fold_unet_batchnorm(variables, FEATURES)
    calib = [rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 2.0
             for _ in range(4)]
    ranges = calibrate_unet(folded, FEATURES, calib)
    assert len(ranges) == 2 * len(FEATURES) * 2 + 2 + 1  # all convs seen
    q = quantize_unet(folded, FEATURES, ranges)

    x = jnp.asarray(calib[0])
    prob_fp = jax.nn.sigmoid(unet_forward_folded(folded, x, FEATURES))
    prob_fq = jax.nn.sigmoid(q.forward(x, mode="fakequant"))
    prob_i8 = jax.nn.sigmoid(q.forward(x, mode="int8"))

    rep_fq = parity_report(np.asarray(prob_fp), np.asarray(prob_fq))
    rep_i8 = parity_report(np.asarray(prob_fp), np.asarray(prob_i8))
    assert rep_fq["mae_verdict"] in ("good", "acceptable")
    assert rep_i8["mae_verdict"] in ("good", "acceptable")
    # int8-with-zero-point-correction is the same arithmetic as fakequant in
    # a different order; f32 rounding differences amplify across the 10+
    # layers, so gate on MAE with a loose max
    diff = np.abs(np.asarray(prob_i8) - np.asarray(prob_fq))
    assert diff.mean() < 2e-3
    assert diff.max() < 0.15


def test_int8_conv_is_integer_exact(rng):
    """The int8 conv accumulation path is exactly s_x*s_w*(acc - z*sum_w)+b."""
    from jax import lax

    x = rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    qp = asymmetric_qparams(-1.0, 1.0)
    xq = np.asarray(quantize_asymmetric(jnp.asarray(x), qp))
    wq, wqp = quantize_symmetric_per_channel(w)
    acc = lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    wsum = wq.astype(np.int64).sum(axis=(0, 1, 2))
    y_int = (np.asarray(acc) - qp.zero_point * wsum) * (
        qp.scale * wqp.scale.reshape(1, 1, 1, -1))
    # reference: fp conv on dequantized tensors
    x_dq = (xq.astype(np.float32) - qp.zero_point) * qp.scale
    w_dq = wq.astype(np.float32) * wqp.scale
    y_fp = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x_dq), jnp.asarray(w_dq), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(y_int, y_fp, atol=1e-4)
