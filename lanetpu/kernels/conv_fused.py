"""Pallas fused U-Net stage kernel: conv3x3 -> ReLU -> conv3x3 -> ReLU
(-> optional 2x2 maxpool) in ONE kernel launch.

Why: the U-Net's 224^2-spatial / <=32-channel stages are HBM-bound — XLA
runs each conv as its own HBM->HBM op, so a stage writes + re-reads the
full-resolution intermediate activation (3.2 MB/image at enc0, x256 batch
~1.6 GB of round-trip traffic per stage pair). This kernel keeps the
intermediate in VMEM: it DMAs one haloed row-strip of the input, computes
both convs as im2col matmuls on the MXU (contraction dim 9*Cin, 288 for
32 channels — well above the 128 MXU width), applies the pool, and writes
only the final (possibly pooled) strip.

Parity contract: identical math to two SAME-padded
`lax.conv_general_dilated` calls + ReLUs (+ reduce_window max pool) at
fp32 accumulation — gated by tests/test_conv_fused.py against the XLA
reference in interpret mode (CPU) and on device.

Grid: (N, H/tile_h). The input is pre-padded by 2 (two 3x3 halos) so every
strip DMA is in-bounds; strips overlap by 4 rows, which BlockSpec's
block-aligned indexing can't express — hence the manual HBM->VMEM DMA with
a per-step scratch buffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_im2col(x, w_r, bias, th, tw, cin, cout):
    """x [th+2, tw+2, cin] -> SAME-conv center [th, tw, cout], fp32.

    Patch layout matches w_r = w.reshape(9 * cin, cout) with w in HWIO:
    (ky, kx, cin) fastest-last.
    """
    cols = [x[dy:dy + th, dx:dx + tw, :] for dy in range(3)
            for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(th * tw, 9 * cin)
    y = jnp.dot(patches, w_r, preferred_element_type=jnp.float32)
    return (y + bias).reshape(th, tw, cout)


def _stage_kernel(x_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
                  x_vmem, sem, *, tile_h, w, h_total, cin, cmid, cout, pool,
                  compute_dtype):
    i = pl.program_id(0)   # batch
    j = pl.program_id(1)   # row strip
    th = tile_h
    # overlapping strip [th+4, w+4, cin] from the pre-padded input
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * th, th + 4)], x_vmem, sem)
    dma.start()
    dma.wait()
    x = x_vmem[:].astype(compute_dtype)

    # conv0 over the +1-halo region so conv1 sees its own halo
    y0 = _conv_im2col(x, w0_ref[:], b0_ref[:], th + 2, w + 2, cin, cmid)
    y0 = jnp.maximum(y0, 0.0)
    # SAME-padding semantics for conv1: its halo must be ZEROS, not conv0
    # evaluated on x's padding (bias + relu make that nonzero). Zero out
    # y0 positions that fall outside the real image.
    row_g = (j * th - 1
             + jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1)
    ok = ((row_g >= 0) & (row_g < h_total) & (col >= 1) & (col <= w))
    y0 = jnp.where(ok, y0, 0.0).astype(compute_dtype)
    y1 = _conv_im2col(y0, w1_ref[:], b1_ref[:], th, w, cmid, cout)
    y1 = jnp.maximum(y1, 0.0)

    if pool:
        y1 = y1.reshape(th // 2, 2, w // 2, 2, cout)
        y1 = jnp.max(jnp.max(y1, axis=3), axis=1)
    out_ref[0] = y1.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("pool", "tile_h", "interpret"))
def fused_double_conv(x, w0, b0, w1, b1, pool: bool = False,
                      tile_h: int = 28, interpret: bool = False):
    """relu(conv3x3(relu(conv3x3(x)))) [+ 2x2 maxpool], one Pallas launch.

    x  [N, H, W, Cin]  (H % tile_h == 0; W, H even when pool=True)
    w0 [3, 3, Cin, Cmid], w1 [3, 3, Cmid, Cout] (HWIO), biases [Cmid]/[Cout].
    Returns [N, H, W, Cout] or [N, H/2, W/2, Cout] in x.dtype.
    """
    n, h, w, cin = x.shape
    cmid = w0.shape[-1]
    cout = w1.shape[-1]
    assert h % tile_h == 0, (h, tile_h)
    if pool:
        assert tile_h % 2 == 0 and w % 2 == 0
    compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    w0_r = w0.reshape(9 * cin, cmid).astype(compute_dtype)
    w1_r = w1.reshape(9 * cmid, cout).astype(compute_dtype)
    b0_r = jnp.asarray(b0, jnp.float32).reshape(1, cmid)
    b1_r = jnp.asarray(b1, jnp.float32).reshape(1, cout)

    oh, ow = (h // 2, w // 2) if pool else (h, w)
    out_th = tile_h // 2 if pool else tile_h

    kernel = partial(_stage_kernel, tile_h=tile_h, w=w, h_total=h, cin=cin,
                     cmid=cmid, cout=cout, pool=pool,
                     compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0_r
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1_r
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
        ],
        out_specs=pl.BlockSpec(
            (1, out_th, ow, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 4, w + 4, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w0_r, b0_r, w1_r, b1_r)


def reference_double_conv(x, w0, b0, w1, b1, pool: bool = False):
    """XLA reference with identical semantics (the parity target)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w0.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0
    y = jax.nn.relu(y).astype(x.dtype)
    y = lax.conv_general_dilated(
        y.astype(jnp.float32), w1.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jax.nn.relu(y)
    if pool:
        y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return y.astype(x.dtype)
