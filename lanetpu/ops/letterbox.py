"""Aspect-preserving letterbox resize + pad, and its inverse box mapping.

Parity target: the reference's `COCO_test_helper.letter_box`
(src/py_utils/coco_utils.py:48-76) — scale by r = min(H'/H, W'/W), bilinear
resize, split the padding across both sides with OpenCV's
round(d - 0.1)/round(d + 0.1) tie-breaking, constant pad color — and
`get_real_box` (coco_utils.py:87-107) for mapping detections back.

Unlike the reference (host cv2 + stateful info list), the geometry here is a
pure function of the two shapes, so the resize/pad runs on device and the
inverse mapping is stateless.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.ops.resize import resize_bilinear


@dataclass(frozen=True)
class LetterboxParams:
    in_hw: tuple
    out_hw: tuple
    ratio: float
    new_unpad_wh: tuple  # (w, h) of the resized (pre-pad) image
    pad: tuple  # (top, bottom, left, right)
    dwdh: tuple  # float half-paddings (dw, dh), for inverse mapping


def letterbox_params(in_hw: tuple, out_hw: tuple) -> LetterboxParams:
    h, w = in_hw
    oh, ow = out_hw
    r = min(oh / h, ow / w)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw = (ow - new_w) / 2
    dh = (oh - new_h) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    return LetterboxParams(
        in_hw=(h, w),
        out_hw=(oh, ow),
        ratio=r,
        new_unpad_wh=(new_w, new_h),
        pad=(top, bottom, left, right),
        dwdh=(dw, dh),
    )


@partial(jax.jit, static_argnames=("out_hw", "pad_value", "use_mxu"))
def letterbox(img: jnp.ndarray, out_hw: tuple, pad_value: int = 0,
              use_mxu: bool = True) -> jnp.ndarray:
    """Letterbox an [..., H, W, C] image to `out_hw`, preserving aspect.

    use_mxu=True (default) resizes via the MXU matmul kernel — per-pixel
    gathers are ~60x slower on TPU (kernels/resample.py); the gather path
    (use_mxu=False) remains the exact-cv2-semantics parity reference, and
    the two agree within 2 uint8 LSB (tests/test_resample_mxu.py)."""
    p = letterbox_params((img.shape[-3], img.shape[-2]), out_hw)
    new_w, new_h = p.new_unpad_wh
    if use_mxu:
        from lanetpu.kernels.resample import resize_bilinear_mxu

        resized = resize_bilinear_mxu(img, (new_h, new_w))
    else:
        resized = resize_bilinear(img, (new_h, new_w))
    top, bottom, left, right = p.pad
    pad_widths = [(0, 0)] * (img.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return jnp.pad(resized, pad_widths, constant_values=pad_value)


def unletterbox_boxes(boxes, params: LetterboxParams, clip: bool = True):
    """Map xyxy boxes from letterboxed coords back to the original frame.

    numpy in / numpy out — this runs host-side after NMS, like the
    reference's get_real_box (src/py_utils/coco_utils.py:87-107).
    """
    boxes = np.asarray(boxes, dtype=np.float32).copy()
    if boxes.size == 0:
        return boxes
    dw, dh = params.dwdh
    h, w = params.in_hw
    boxes[:, [0, 2]] = (boxes[:, [0, 2]] - dw) / params.ratio
    boxes[:, [1, 3]] = (boxes[:, [1, 3]] - dh) / params.ratio
    if clip:
        boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, w)
        boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, h)
    return boxes
