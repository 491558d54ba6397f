"""Parity gates for the v2 fused double-conv stage kernel.

The kernel must match two SAME-padded XLA convs + ReLUs exactly (same
dtypes, fp32 accumulation). Runs in Pallas interpret mode on CPU; the
device compile/adoption decision lives in scripts/probe_conv_stage.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.kernels.conv_stage import (
    fused_double_conv,
    reference_double_conv,
)


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape)
            .astype(np.float32) * scale)


@pytest.mark.parametrize("cin,cmid,cout", [(3, 8, 8), (8, 8, 16)])
def test_fused_stage_matches_xla_f32(cin, cmid, cout):
    x = jnp.asarray(_rand((2, 16, 24, cin), 0))
    w0 = jnp.asarray(_rand((3, 3, cin, cmid), 1, 0.2))
    b0 = jnp.asarray(_rand((cmid,), 2))
    w1 = jnp.asarray(_rand((3, 3, cmid, cout), 3, 0.2))
    b1 = jnp.asarray(_rand((cout,), 4))
    ref = reference_double_conv(x, w0, b0, w1, b1,
                                compute_dtype=jnp.float32)
    got = fused_double_conv(x, w0, b0, w1, b1, tile_h=8,
                            compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_stage_matches_xla_bf16():
    """bf16 MXU path: bf16 taps, fp32 accumulation — tolerance only for
    summation-order differences."""
    x = jnp.asarray(_rand((1, 16, 16, 8), 5)).astype(jnp.bfloat16)
    w0 = jnp.asarray(_rand((3, 3, 8, 16), 6, 0.2))
    b0 = jnp.asarray(_rand((16,), 7))
    w1 = jnp.asarray(_rand((3, 3, 16, 8), 8, 0.2))
    b1 = jnp.asarray(_rand((8,), 9))
    ref = reference_double_conv(x, w0, b0, w1, b1)
    got = fused_double_conv(x, w0, b0, w1, b1, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_fused_stage_boundary_masking():
    """The halo ring outside the image must act as zero padding for
    conv2 — a constant-bias weight set exposes any leakage."""
    cin = cmid = cout = 8
    x = jnp.ones((1, 16, 16, cin), jnp.float32)
    w0 = jnp.zeros((3, 3, cin, cmid), jnp.float32)
    b0 = jnp.full((cmid,), 2.0, jnp.float32)   # mid == 2 everywhere
    w1 = jnp.zeros((3, 3, cmid, cout), jnp.float32)
    w1 = w1.at[0, 0].set(np.eye(cmid, cout, dtype=np.float32))  # top-left tap
    b1 = jnp.zeros((cout,), jnp.float32)
    ref = reference_double_conv(x, w0, b0, w1, b1,
                                compute_dtype=jnp.float32)
    got = fused_double_conv(x, w0, b0, w1, b1, tile_h=8,
                            compute_dtype=jnp.float32, interpret=True)
    # row 0 / col 0 must be 0 (zero pad), interior 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    assert float(got[0, 0, 5, 0]) == 0.0 and float(got[0, 5, 5, 0]) == 2.0


def test_tile_divisibility_error():
    x = jnp.zeros((1, 18, 16, 4))
    w = jnp.zeros((3, 3, 4, 4))
    b = jnp.zeros((4,))
    with pytest.raises(ValueError, match="divisible"):
        fused_double_conv(x, w, b, w, b, tile_h=8, interpret=True)
