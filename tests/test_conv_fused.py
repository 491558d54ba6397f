"""Fused Pallas double-conv stage kernel vs the XLA reference.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel is
benchmarked compiled on the TPU (docs/performance.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.kernels.conv_fused import fused_double_conv, reference_double_conv

RNG = np.random.default_rng(7)


def _params(cin, cmid, cout, scale=0.2):
    w0 = RNG.normal(0, scale, (3, 3, cin, cmid)).astype(np.float32)
    b0 = RNG.normal(0, 0.1, cmid).astype(np.float32)
    w1 = RNG.normal(0, scale, (3, 3, cmid, cout)).astype(np.float32)
    b1 = RNG.normal(0, 0.1, cout).astype(np.float32)
    return w0, b0, w1, b1


@pytest.mark.parametrize("pool", [False, True])
def test_fused_stage_matches_xla(pool):
    x = RNG.normal(0, 1, (2, 16, 24, 8)).astype(np.float32)
    w0, b0, w1, b1 = _params(8, 8, 16)
    got = np.asarray(fused_double_conv(
        jnp.asarray(x), w0, b0, w1, b1, pool=pool, tile_h=8, interpret=True))
    want = np.asarray(reference_double_conv(
        jnp.asarray(x), w0, b0, w1, b1, pool=pool))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_stage_multi_strip_halo():
    """Strip boundaries must be seamless (halo DMA correctness)."""
    x = RNG.normal(0, 1, (1, 32, 16, 4)).astype(np.float32)
    w0, b0, w1, b1 = _params(4, 6, 4)
    got = np.asarray(fused_double_conv(
        jnp.asarray(x), w0, b0, w1, b1, tile_h=8, interpret=True))
    want = np.asarray(reference_double_conv(jnp.asarray(x), w0, b0, w1, b1))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # strips of 8: rows 7..9 cross the boundary; check them explicitly
    np.testing.assert_allclose(got[0, 6:10], want[0, 6:10], atol=1e-4,
                               rtol=1e-4)


def test_fused_stage_bf16():
    x = (RNG.normal(0, 1, (1, 16, 16, 8))).astype(jnp.bfloat16)
    w0, b0, w1, b1 = _params(8, 8, 8)
    got = np.asarray(fused_double_conv(
        jnp.asarray(x), w0, b0, w1, b1, tile_h=8, interpret=True)
        .astype(jnp.float32))
    want = np.asarray(reference_double_conv(
        jnp.asarray(x), w0, b0, w1, b1).astype(jnp.float32))
    # bf16 activations: tolerance at bf16 resolution
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)
