"""Space-to-depth / depth-to-space (NHWC, static block size).

TPU-first input packing: the U-Net's 224x224x3 input gives the MXU a
contraction of only 9*3=27 on the stem conv and makes every full-res
activation 4x the HBM traffic of its half-res equivalent. Packing 2x2
pixel blocks into channels (224x224x3 -> 112x112x12) quadruples the stem
contraction depth and quarters the spatial extent of the most expensive
stages; the head emits block_size^2 output channels which unpack back to
full resolution. Used by `UNetConfig(s2d=2)` (`models/unet.py`).

Pure reshapes/transposes — XLA fuses them into the neighbouring convs.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/block, W/block, block*block*C]."""
    if block == 1:
        return x
    n, h, w, c = x.shape
    if h % block or w % block:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {block}")
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[N, H, W, block*block*C] -> [N, H*block, W*block, C]. Inverse of
    `space_to_depth` (same block-major channel order)."""
    if block == 1:
        return x
    n, h, w, c = x.shape
    if c % (block * block):
        raise ValueError(f"channels {c} not divisible by {block * block}")
    cout = c // (block * block)
    x = x.reshape(n, h, w, block, block, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, cout)
