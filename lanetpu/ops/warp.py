"""Perspective (homography) transforms with OpenCV-parity semantics.

Replaces the `cv2.getPerspectiveTransform` + `cv2.warpPerspective` pair the
reference uses for inverse-perspective mapping (IPM) of the camera frame to a
bird's-eye view (reference src/unet_ros_node.py:239-255, :300-301).

`get_perspective_transform` runs once on the host (numpy, 8x8 solve).
`warp_perspective` is a jnp gather that fuses into the device program, so the
IPM warp rides along with the U-Net forward pass in a single XLA launch
instead of a host OpenCV call per frame.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def get_perspective_transform(src_points, dst_points) -> np.ndarray:
    """3x3 homography M mapping src quad -> dst quad (cv2-compatible).

    Solves the standard 8-unknown linear system; M[2,2] = 1.
    """
    src = np.asarray(src_points, dtype=np.float64)
    dst = np.asarray(dst_points, dtype=np.float64)
    assert src.shape == (4, 2) and dst.shape == (4, 2)
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros((8,), dtype=np.float64)
    for i in range(4):
        sx, sy = src[i]
        dx, dy = dst[i]
        a[i] = [sx, sy, 1, 0, 0, 0, -sx * dx, -sy * dx]
        a[i + 4] = [0, 0, 0, sx, sy, 1, -sx * dy, -sy * dy]
        b[i] = dx
        b[i + 4] = dy
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


@partial(jax.jit, static_argnames=("out_wh", "nearest"))
def warp_perspective(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_wh: tuple,
    nearest: bool = False,
) -> jnp.ndarray:
    """Warp an [..., H, W, C] image by homography `matrix` (src->dst).

    Matches `cv2.warpPerspective(img, M, (W', H'))` defaults: inverse mapping
    of dst pixel centers through M^-1, bilinear sampling, BORDER_CONSTANT=0.
    Out-of-range taps contribute the border value, so edge pixels blend to
    zero exactly as OpenCV does.

    `matrix` may be a numpy array (constant-folded under jit).
    """
    ow, oh = out_wh
    h, w = img.shape[-3], img.shape[-2]
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)

    minv = jnp.linalg.inv(jnp.asarray(matrix, dtype=jnp.float32))

    dx = jnp.arange(ow, dtype=jnp.float32)
    dy = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(dx, dy)  # [oh, ow]
    denom = minv[2, 0] * gx + minv[2, 1] * gy + minv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = (minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]) / denom
    sy = (minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]) / denom

    if nearest:
        xi = jnp.round(sx).astype(jnp.int32)
        yi = jnp.round(sy).astype(jnp.int32)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        flat = x.reshape(x.shape[:-3] + (h * w, x.shape[-1]))
        out = jnp.take(flat, yi * w + xi, axis=-2)
        out = jnp.where(valid[..., None], out, 0.0)
    else:
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        fx = sx - x0f
        fy = sy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        flat = x.reshape(x.shape[:-3] + (h * w, x.shape[-1]))

        def tap(yi, xi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            v = jnp.take(flat, yc * w + xc, axis=-2)  # [..., oh*ow? no: oh,ow? ]
            return jnp.where(valid[..., None], v, 0.0)

        # Gather indices are [oh, ow]; jnp.take flattens them, result
        # [..., oh, ow, C] after reshape.
        def tap2(yi, xi):
            v = tap(yi.reshape(-1), xi.reshape(-1))
            return v.reshape(x.shape[:-3] + (oh, ow, x.shape[-1]))

        v00 = tap2(y0, x0)
        v01 = tap2(y0, x0 + 1)
        v10 = tap2(y0 + 1, x0)
        v11 = tap2(y0 + 1, x0 + 1)
        wx = fx[..., None]
        wy = fy[..., None]
        out = (
            v00 * (1 - wy) * (1 - wx)
            + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx)
            + v11 * wy * wx
        )

    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)
