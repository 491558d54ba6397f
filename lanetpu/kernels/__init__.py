from lanetpu.kernels.resample import (
    resize_bilinear_mxu,
    resize_matrix,
    warp_perspective_mxu,
    compose_warp_to,
)

__all__ = [
    "resize_bilinear_mxu",
    "resize_matrix",
    "warp_perspective_mxu",
    "compose_warp_to",
]
