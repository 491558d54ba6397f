"""Image resize with OpenCV-parity sampling semantics, in pure jnp.

The reference leans on `cv2.resize` everywhere (INTER_LINEAR default in
src/unet.py:33 and src/rknpu_inference.py:35; INTER_AREA in
src/unet_ros_node.py:306). Thresholded-mask parity amplifies tiny numeric
differences, so the bilinear index math here follows OpenCV exactly:

  src = (dst + 0.5) * (in_size / out_size) - 0.5      (half-pixel centers)

with border replication via index clamping. Separable two-pass interpolation
keeps it XLA-friendly (two gathers + two fmas, fully fused).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int):
    """Return (i0, i1, w1) gather indices and lerp weight for one axis."""
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0f = jnp.floor(coords)
    w1 = coords - i0f
    i0f = i0f.astype(jnp.int32)
    # Clamp taps independently (border replicate): when the source coord
    # falls before the first or past the last pixel center, both taps land
    # on the same row/col, so the lerp weight becomes irrelevant.
    i0 = jnp.clip(i0f, 0, in_size - 1)
    i1 = jnp.clip(i0f + 1, 0, in_size - 1)
    return i0, i1, w1


@partial(jax.jit, static_argnames=("out_hw", "antialias"))
def resize_bilinear(img: jnp.ndarray, out_hw: tuple, antialias: bool = False) -> jnp.ndarray:
    """Bilinear resize of an [..., H, W, C] image to `out_hw = (H', W')`.

    Matches `cv2.resize(img, (W', H'), interpolation=cv2.INTER_LINEAR)` up to
    uint8 fixed-point rounding (cv2 uses 11-bit fixed point; we compute in
    f32 and round, which agrees to within 1 LSB).
    """
    oh, ow = out_hw
    h, w = img.shape[-3], img.shape[-2]
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)

    if (h, w) == (oh, ow):
        return img

    y0, y1, wy = _axis_weights(h, oh)
    x0, x1, wx = _axis_weights(w, ow)

    # Rows: [..., H, W, C] -> [..., oh, W, C]
    top = jnp.take(x, y0, axis=-3)
    bot = jnp.take(x, y1, axis=-3)
    wy = wy.reshape((-1, 1, 1))
    rows = top * (1.0 - wy) + bot * wy

    # Cols: [..., oh, W, C] -> [..., oh, ow, C]
    left = jnp.take(rows, x0, axis=-2)
    right = jnp.take(rows, x1, axis=-2)
    wx = wx.reshape((-1, 1))
    out = left * (1.0 - wx) + right * wx

    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


@partial(jax.jit, static_argnames=("out_hw",))
def resize_area(img: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """INTER_AREA-style resize (box filter for integer downscale factors).

    The reference only uses INTER_AREA at identity scale
    (src/unet_ros_node.py:304-307, scale factor 1) where it is a copy; we
    additionally support integer-factor box downsampling, and fall back to
    bilinear otherwise (which is what OpenCV itself does for upscaling).
    """
    oh, ow = out_hw
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (oh, ow):
        return img
    if h % oh == 0 and w % ow == 0:
        fy, fx = h // oh, w // ow
        orig_dtype = img.dtype
        x = img.astype(jnp.float32)
        lead = x.shape[:-3]
        c = x.shape[-1]
        x = x.reshape(lead + (oh, fy, ow, fx, c))
        out = x.mean(axis=(-4, -2))
        if jnp.issubdtype(orig_dtype, jnp.integer):
            info = jnp.iinfo(orig_dtype)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return out.astype(orig_dtype)
    return resize_bilinear(img, out_hw)
