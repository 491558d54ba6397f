"""Input normalization.

The deployed RKNN models bake ImageNet normalization into the graph
(mean [123.675, 116.28, 103.53], std [58.395, 57.12, 57.375] on 0-255 RGB;
reference README.md:3110-3113 and the .rknn graph metadata). Here the same
folding happens at trace time: uint8 frames go to the device and the
normalize fuses into the first conv.
"""

import jax.numpy as jnp

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize_image(
    img: jnp.ndarray,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8/float [..., H, W, C] image -> normalized `dtype` tensor."""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, dtype=jnp.float32)
    out = (img.astype(jnp.float32) - mean) * inv_std
    return out.astype(dtype)
