"""Functional (module-free) UNet forward over folded params.

This is the quantization/kernel substrate: the same execution plan runs
  * fp32/bf16 (conv_hook=None) — must match the Flax UNet bit-for-bit up to
    dtype,
  * fake-quant int8 (hook quantizes activations+weights, dequantizes), and
  * true int8 (hook dispatches to the int8 conv kernel).

Conv layout is NHWC x HWIO -> NHWC (XLA's native TPU layout).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from lanetpu.quant.fold import unet_layer_plan


def conv2d(x, kernel, bias, stride: int = 1):
    # fp32 accumulation regardless of activation dtype (bf16-safe); the
    # caller casts back to its compute dtype
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + bias


def conv2d_transpose(x, kernel, bias, stride: int = 2):
    """2x2 stride-2 transpose conv, matching flax nn.ConvTranspose."""
    out = lax.conv_transpose(
        x, kernel,
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + bias


def unet_forward_folded(folded: dict, x: jnp.ndarray, features,
                        conv_hook: Callable | None = None,
                        final_sigmoid: bool = False,
                        s2d: int = 1) -> jnp.ndarray:
    """Run the folded UNet. conv_hook(x, kernel, bias, name, relu) -> y
    overrides plain convs (transpose convs and pools stay fp). s2d>1 packs
    the input / unpacks the head output (UNetConfig.s2d topologies)."""
    if s2d > 1:
        from lanetpu.ops.space2depth import space_to_depth

        x = space_to_depth(x, s2d)
    plan = unet_layer_plan(features)
    dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    skips = {}
    for op in plan:
        kind = op[0]
        if kind == "conv":
            _, name, relu = op
            p = folded[name]
            if conv_hook is not None:
                x = conv_hook(x, p["kernel"], p["bias"], name, relu)
            else:
                x = conv2d(x, jnp.asarray(p["kernel"], dtype),
                           jnp.asarray(p["bias"]))
                if relu:
                    x = jax.nn.relu(x)
                x = x.astype(dtype)
        elif kind == "pool":
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        elif kind == "save_skip":
            skips[op[1]] = x
        elif kind == "convT":
            p = folded[op[1]]
            x = conv2d_transpose(x, jnp.asarray(p["kernel"], dtype),
                                 jnp.asarray(p["bias"])).astype(dtype)
        elif kind == "concat":
            x = jnp.concatenate([skips[op[1]], x], axis=-1)
    if s2d > 1:
        from lanetpu.ops.space2depth import depth_to_space

        x = depth_to_space(x, s2d)
    if final_sigmoid:
        x = jax.nn.sigmoid(x)
    return x
