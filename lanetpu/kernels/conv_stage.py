"""Pallas fused U-Net stage, v2: conv3x3 -> ReLU -> conv3x3 -> ReLU in one
kernel launch, built exclusively from Mosaic patterns this toolchain
compiles (see docs/performance.md support matrix).

Motivation (same as kernels/conv_fused.py): the 224^2-spatial /
<=64-channel U-Net stages are HBM-bound — XLA materializes the
full-resolution intermediate activation between the two convs of every
stage, so each stage pair pays a write + re-read of ~6.4 MB/image. This
kernel keeps the intermediate in VMEM.

v1 (`conv_fused.py`) used overlapping row strips via manual HBM->VMEM DMA,
which this environment's remote Mosaic compiler rejects (as do >=2
distinct-unaligned-offset strip reads). v2 removes the overlap instead of
expressing it:

  * The padded input is passed FIVE times, as row-shifted aliases
    x_k = xpad[:, k:k+H] (k = 0..4). Each alias gets a plain
    non-overlapping BlockSpec [1, th, W+4, C]; block j of alias k covers
    padded rows [j*th+k, j*th+k+th). The union of the five aliases'
    j-blocks is exactly the (th+4)-row haloed window the stage needs —
    no overlapping blocks, no manual DMA. XLA materializes the aliases
    once in HBM (5x input traffic), which is far cheaper than the
    intermediate round-trip the fusion removes.
  * Row halos inside the kernel are static leading-dim slices + concats
    (alias dy contributes rows [0, th), alias dy+2 rows [th-2, th)),
    the exact "im2col concat (leading dims) + dot" pattern the support
    matrix records as working.
  * conv1 is evaluated on the (th+2, W+2) halo ring around the strip;
    ring positions outside the image are then masked to zero so conv2
    sees the same zero padding XLA's SAME conv does (conv1 evaluated in
    the zero-padded margin is NOT zero — bias + partial taps).
  * Both convs run as im2col matmuls: contraction 9*Cin, output lanes
    Cmid/Cout, fp32 accumulation via preferred_element_type.

Parity contract: identical math to two SAME-padded
`lax.conv_general_dilated` + ReLU at the same input/weight dtypes with
fp32 accumulation — gated by tests/test_conv_stage.py in interpret mode
and (when a TPU is present) against the compiled XLA reference.

Reference correspondence: replaces the per-stage double-conv of the
deployed U-Net (reference RKNN graph: 14 ConvRelu, SURVEY.md §2 #18);
the RKNN compiler performs the equivalent stage fusion on the NPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _stage_kernel(x0, x1, x2, x3, x4, w0_ref, b0_ref, w1_ref, b1_ref,
                  out_ref, *, tile_h, width, h_total, cin, cmid, cout,
                  compute_dtype):
    th, w = tile_h, width
    j = pl.program_id(1)
    ops = (x0, x1, x2, x3, x4)

    # conv1 over the (th+2, w+2) halo ring: for tap row dy, the th+2
    # consecutive padded-input rows live in alias dy (first th) plus the
    # last two rows of alias dy+2.
    cols = []
    for dy in range(3):
        a = ops[dy][0]        # [th, w+4, cin]
        b = ops[dy + 2][0][th - 2:]  # [2, w+4, cin]
        rows = jnp.concatenate([a, b], axis=0)  # [th+2, w+4, cin]
        for dx in range(3):
            cols.append(rows[:, dx:dx + w + 2, :])
    patches = jnp.concatenate(cols, axis=-1).astype(compute_dtype)
    patches = patches.reshape((th + 2) * (w + 2), 9 * cin)
    mid = jnp.dot(patches, w0_ref[...].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    mid = jax.nn.relu(mid + b0_ref[...]).reshape(th + 2, w + 2, cmid)

    # zero the ring positions that fall outside the image: conv2 must see
    # XLA's SAME zero padding there, not conv1-evaluated-in-the-margin.
    row_g = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 0) \
        + j * th - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 2, 1), 1) - 1
    valid = ((row_g >= 0) & (row_g < h_total)
             & (col_g >= 0) & (col_g < w))
    mid = jnp.where(valid, mid, 0.0).astype(compute_dtype)

    cols = [mid[dy:dy + th, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(th * w, 9 * cmid)
    y = jnp.dot(patches, w1_ref[...].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = jax.nn.relu(y + b1_ref[...]).reshape(th, w, cout)
    out_ref[0] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_h", "compute_dtype", "interpret"))
def fused_double_conv(x, w0, b0, w1, b1, *, tile_h: int = 8,
                      compute_dtype=jnp.bfloat16, interpret: bool = False):
    """conv3x3(w0)+ReLU -> conv3x3(w1)+ReLU, SAME padding, one launch.

    x [N, H, W, Cin]; w0 [3, 3, Cin, Cmid]; w1 [3, 3, Cmid, Cout]
    (HWIO); biases [Cmid]/[Cout]. H must be divisible by tile_h.
    Inputs are cast to `compute_dtype` for the MXU with fp32
    accumulation; the result is returned in x.dtype.
    """
    n, h, w, cin = x.shape
    cmid = w0.shape[-1]
    cout = w1.shape[-1]
    if h % tile_h:
        raise ValueError(f"H={h} not divisible by tile_h={tile_h}")

    # pad 2 rows/cols each side (conv1 halo ring needs input at +-2)
    xpad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    aliases = [jax.lax.slice_in_dim(xpad, k, k + h, axis=1)
               for k in range(5)]

    w0_r = w0.reshape(9 * cin, cmid)
    w1_r = w1.reshape(9 * cmid, cout)
    b0_r = b0.reshape(1, cmid).astype(jnp.float32)
    b1_r = b1.reshape(1, cout).astype(jnp.float32)

    grid = (n, h // tile_h)
    in_block = pl.BlockSpec((1, tile_h, w + 4, cin),
                            lambda i, j: (i, j, 0, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    kernel = partial(_stage_kernel, tile_h=tile_h, width=w, h_total=h,
                     cin=cin, cmid=cmid, cout=cout,
                     compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_block] * 5 + [
            full((9 * cin, cmid)), full((1, cmid)),
            full((9 * cmid, cout)), full((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, cout),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        interpret=interpret,
    )(*aliases, w0_r, b0_r, w1_r, b1_r)


def reference_double_conv(x, w0, b0, w1, b1, compute_dtype=jnp.bfloat16):
    """The XLA program the kernel must match: two SAME convs + ReLUs."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w0.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w0.astype(compute_dtype), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    y = jax.nn.relu(y + b0.astype(jnp.float32)).astype(compute_dtype)
    dn = jax.lax.conv_dimension_numbers(y.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, w1.astype(compute_dtype), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    return jax.nn.relu(y + b1.astype(jnp.float32)).astype(x.dtype)
