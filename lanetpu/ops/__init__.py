from lanetpu.ops.color import bgr_to_rgb, rgb_to_bgr
from lanetpu.ops.resize import resize_bilinear, resize_area
from lanetpu.ops.warp import (
    get_perspective_transform,
    warp_perspective,
)
from lanetpu.ops.letterbox import letterbox, letterbox_params, unletterbox_boxes
from lanetpu.ops.threshold import sigmoid, binarize
from lanetpu.ops.normalize import normalize_image

__all__ = [
    "bgr_to_rgb",
    "rgb_to_bgr",
    "resize_bilinear",
    "resize_area",
    "get_perspective_transform",
    "warp_perspective",
    "letterbox",
    "letterbox_params",
    "unletterbox_boxes",
    "sigmoid",
    "binarize",
    "normalize_image",
]
