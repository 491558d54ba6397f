"""MXU-based image resampling: resize and perspective warp as matmuls.

Why: XLA lowers per-pixel gathers to near-scalar loads on TPU. The M0 gather
warp measured ~340 ms for a batch of 32 camera frames on a v5e chip — 20x
the whole U-Net forward. Bilinear resampling, however, is a linear map, and
the TPU's MXU eats linear maps:

  * 1-D bilinear resize is `out = W @ in` with a 2-taps-per-row matrix W;
    2-D resize is two such contractions (rows then cols).
  * A projective warp factors into two 1-D resampling passes
    (Catmull-Smith two-pass warping): a horizontal pass with a per-source-row
    mapping, then a vertical pass with a per-output-column mapping. Each
    pass contracts one axis with an on-the-fly weight tensor
    W = relu(1 - |iota - coord|), which is exactly the 2-tap bilinear
    kernel, and out-of-range coordinates lose weight to an implicit zero —
    matching cv2.warpPerspective's BORDER_CONSTANT blending.

The per-pass source coordinates have closed forms in the homography
coefficients (derived below), computed once in numpy at trace time.

Numerical note: the two-pass factorization samples the same bilinear
surface as a direct gather warp up to the order of the horizontal/vertical
lerp along curved scanlines; agreement with the gather version is ~1 uint8
LSB except at strong perspective distortion (covered by tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Resize as matmul
# ---------------------------------------------------------------------------


def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear resize matrix with cv2 half-pixel + border-replicate
    semantics (same index math as ops.resize._axis_weights)."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0f = np.floor(coords)
    w1 = coords - i0f
    i0 = np.clip(i0f.astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0f.astype(np.int64) + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - w1).astype(np.float32))
    np.add.at(m, (rows, i1), w1.astype(np.float32))
    return m


@partial(jax.jit, static_argnames=("out_hw", "compute_dtype"))
def resize_bilinear_mxu(img: jnp.ndarray, out_hw: tuple,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """MXU resize of [..., H, W, C] to (H', W'): two einsum contractions."""
    oh, ow = out_hw
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (oh, ow):
        return img
    orig_dtype = img.dtype
    x = img.astype(compute_dtype)
    wy = jnp.asarray(resize_matrix(h, oh), compute_dtype)
    wx = jnp.asarray(resize_matrix(w, ow), compute_dtype)
    x = jnp.einsum("Yh,...hwc->...Ywc", wy, x,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("Xw,...Ywc->...YXc", wx, x.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        x = jnp.clip(jnp.round(x), info.min, info.max)
        return x.astype(orig_dtype)
    return x.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Two-pass perspective warp as matmuls
# ---------------------------------------------------------------------------


def _twopass_coords(matrix: np.ndarray, in_hw: tuple, out_wh: tuple):
    """Closed-form source coordinates for the two resampling passes.

    Given the forward homography M (src -> dst) with rows m0, m1, m2:

    Horizontal pass (per source row y, per output column x'): the source
    x-coordinate where the horizontal line v=y crosses the preimage of the
    vertical output line u=x'. From X(sx, y) = x':
        sx = (x' (m21 y + m22) - m01 y - m02) / (m00 - m20 x')

    Vertical pass (per output pixel (x', y')): the source row t whose
    horizontal-pass sample lands on output row y'. Substituting
    sx(t) = (A t + B) / d with d = m00 - m20 x', A = x' m21 - m01,
    B = x' m22 - m02 into Y(sx, t) = y':
        t = (y' (m20 B + d m22) - m10 B - d m12)
            / (m10 A + d m11 - y' (m20 A + d m21))

    Returns (sxr [H, ow], tv [oh, ow]) float32.
    """
    m = np.asarray(matrix, dtype=np.float64)
    h, w = in_hw
    ow, oh = out_wh
    m00, m01, m02 = m[0]
    m10, m11, m12 = m[1]
    m20, m21, m22 = m[2]

    xp = np.arange(ow, dtype=np.float64)[None, :]       # [1, ow]
    y = np.arange(h, dtype=np.float64)[:, None]         # [H, 1]
    d = m00 - m20 * xp                                   # [1, ow]
    if np.min(np.abs(d)) < 1e-9:
        raise ValueError("degenerate two-pass factorization for this "
                         "homography; use the gather warp")
    sxr = (xp * (m21 * y + m22) - m01 * y - m02) / d     # [H, ow]

    yp = np.arange(oh, dtype=np.float64)[:, None]        # [oh, 1]
    a = xp * m21 - m01                                   # [1, ow]
    b = xp * m22 - m02                                   # [1, ow]
    num = yp * (m20 * b + d * m22) - m10 * b - d * m12   # [oh, ow]
    den = (m10 * a + d * m11) - yp * (m20 * a + d * m21)  # [oh, ow]
    bad = np.abs(den) < 1e-9
    if bad.any():
        den = np.where(bad, 1e-9, den)
    tv = num / den                                       # [oh, ow]
    return sxr.astype(np.float32), tv.astype(np.float32)


@partial(jax.jit, static_argnames=("out_wh", "in_hw_static", "compute_dtype"))
def _warp_mxu_impl(img, sxr, tv, out_wh, in_hw_static, compute_dtype):
    ow, oh = out_wh
    h, w = in_hw_static
    orig_dtype = img.dtype
    x = img.astype(compute_dtype)

    # Pass 1 (horizontal): W1[y, x', x] = relu(1 - |x - sxr[y, x']|)
    ix = jnp.arange(w, dtype=jnp.float32)
    w1 = jax.nn.relu(1.0 - jnp.abs(ix[None, None, :] - sxr[:, :, None]))
    inter = jnp.einsum("yXx,...yxc->...yXc", w1.astype(compute_dtype), x,
                       preferred_element_type=jnp.float32)

    # Pass 2 (vertical): W2[y', x', y] = relu(1 - |y - tv[y', x']|)
    iy = jnp.arange(h, dtype=jnp.float32)
    w2 = jax.nn.relu(1.0 - jnp.abs(iy[None, None, :] - tv[:, :, None]))
    out = jnp.einsum("YXy,...yXc->...YXc", w2.astype(compute_dtype),
                     inter.astype(compute_dtype),
                     preferred_element_type=jnp.float32)

    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
        return out.astype(orig_dtype)
    return out.astype(orig_dtype)


def warp_perspective_mxu(img: jnp.ndarray, matrix, out_wh: tuple,
                         compute_dtype=jnp.float32,
                         fallback: bool = True) -> jnp.ndarray:
    """Perspective-warp an [..., H, W, C] image on the MXU.

    Drop-in for `ops.warp.warp_perspective` on the TPU hot path (bilinear,
    BORDER_CONSTANT 0). `matrix` must be a concrete (numpy) homography —
    the pass coordinates are precomputed on the host.

    Validity envelope (quantified by tests/test_resample_mxu.py). The
    error mechanism: the pass-2 lerp samples along the tilted per-column
    preimage curve, chording across cells instead of interpolating inside
    one — so the error grows with the curve's horizontal run between the
    source rows actually blended, AND with how fast the content changes
    over that run. Measured bounds:
      (a) near-axis-aligned maps at near-unit scale (quad-fit corner
          jitter <= 3%): <= 1.6 LSB mean, >= 98% of in-range pixels within
          5 LSB vs the gather warp, even on uniform-noise content;
      (b) the production IPM trapezoid (strong m21 ~ 6e-3/px perspective
          + ~8x vertical upscale): median <= 1 / p99 <= 4 LSB on natural
          (locally smooth) content; white-noise content chords across the
          upscale and is OUT of this envelope (~20 LSB mean) — real
          camera frames are locally smooth, which is what the pipeline
          feeds it;
      (c) oblique maps (rotation/shear, corner jitter >= ~5%): several
          LSB mean even on smooth content — pass those to
          `ops.warp.warp_perspective` (exact gather) instead.
    Homographies whose factorization degenerates outright (near-90-degree
    rotations, where m00 - m20*x' ~ 0) raise internally and auto-fall
    back to the exact gather warp when `fallback=True`.
    """
    in_hw = (img.shape[-3], img.shape[-2])
    try:
        sxr, tv = _twopass_coords(np.asarray(matrix), in_hw, out_wh)
    except ValueError:
        if not fallback:
            raise
        from lanetpu.ops.warp import warp_perspective

        return warp_perspective(img, jnp.asarray(np.asarray(matrix),
                                                 jnp.float32), out_wh)
    return _warp_mxu_impl(img, jnp.asarray(sxr), jnp.asarray(tv), out_wh,
                          in_hw, compute_dtype)


def compose_warp_to(matrix: np.ndarray, warp_out_wh: tuple,
                    final_hw: tuple) -> np.ndarray:
    """Compose homography `matrix` (-> warp_out_wh frame) with the bilinear
    downscale to final_hw, as a single homography.

    The production pipeline warps the camera frame DIRECTLY to the model's
    224x224 input — one resampling instead of the reference's warp -> resize
    chain (src/unet_ros_node.py:300-307) — which is both faster and sharper.
    Scale uses the half-pixel-center convention so pixel centers line up
    with cv2.resize's sampling grid.
    """
    ow, oh = warp_out_wh
    fh, fw = final_hw
    sx = fw / ow
    sy = fh / oh
    # dst' = S @ dst with half-pixel alignment: x_f = (x + 0.5) * s - 0.5
    s = np.array([[sx, 0.0, 0.5 * sx - 0.5],
                  [0.0, sy, 0.5 * sy - 0.5],
                  [0.0, 0.0, 1.0]], dtype=np.float64)
    return s @ np.asarray(matrix, dtype=np.float64)
