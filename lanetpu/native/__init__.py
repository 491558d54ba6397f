from lanetpu.native.hostops import (
    FrameRing,
    available,
    build,
    nms_native,
    resize_bilinear_native,
    warp_perspective_native,
)

__all__ = [
    "FrameRing",
    "available",
    "build",
    "nms_native",
    "resize_bilinear_native",
    "warp_perspective_native",
]
