"""Channel-order conversions.

The reference mixes BGR and RGB deliberately: the U-Net and ResNet paths feed
RGB (reference src/unet_ros_node.py:310, src/resnet50_node.py:104-112) while
the 6-point regressor feeds BGR (reference src/rknpu_inference.py:35-44).
We make channel order an explicit op instead of an implicit convention.
"""

import jax.numpy as jnp


def bgr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Reverse the channel axis of an [..., H, W, 3] image."""
    return img[..., ::-1]


def rgb_to_bgr(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1]
