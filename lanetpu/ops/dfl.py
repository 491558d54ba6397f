"""DFL (Distribution Focal Loss) box decode — on device, no torch.

Parity target: reference src/tool.py:103-130. The reference's `dfl` routes a
numpy tensor through torch for a softmax-expectation over 16 bins per box
side, then `box_process` decodes grid+stride boxes on the host. Here the
whole decode is jnp: it fuses into the detector's XLA program, and only the
(tiny) top-k survivors travel back to the host for NMS.

Layout is NHWC: box tensor [N, H, W, 4*bins], class tensor [N, H, W, C].
"""

from functools import partial

import jax
import jax.numpy as jnp


def dfl_expectation(box_dfl: jnp.ndarray, bins: int = 16) -> jnp.ndarray:
    """[..., 4*bins] DFL logits -> [..., 4] expected side distances.

    softmax over each side's `bins` logits, then expectation against
    bin indices 0..bins-1 (reference src/tool.py:103-114).
    """
    shape = box_dfl.shape[:-1] + (4, bins)
    x = box_dfl.reshape(shape).astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    idx = jnp.arange(bins, dtype=jnp.float32)
    return jnp.sum(p * idx, axis=-1)


def decode_branch(box_dfl: jnp.ndarray, stride: int, img_size: tuple,
                  bins: int = 16) -> jnp.ndarray:
    """One FPN branch [N, H, W, 4*bins] -> xyxy boxes [N, H*W, 4] in pixels.

    Reproduces reference src/tool.py:117-130: anchor centers at grid+0.5,
    ltrb distances subtracted/added, scaled by stride.
    """
    n, h, w, _ = box_dfl.shape
    dist = dfl_expectation(box_dfl, bins)  # [N, H, W, 4] (l, t, r, b)
    gx = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    gy = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    x1 = (gx[None, :, :] - dist[..., 0]) * stride
    y1 = (gy[None, :, :] - dist[..., 1]) * stride
    x2 = (gx[None, :, :] + dist[..., 2]) * stride
    y2 = (gy[None, :, :] + dist[..., 3]) * stride
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return boxes.reshape(n, h * w, 4)


@partial(jax.jit, static_argnames=("img_size", "strides", "bins", "top_k"))
def decode_detections(branch_outputs, img_size=(640, 640),
                      strides=(8, 16, 32), bins: int = 16, top_k: int = 300):
    """Full on-device decode + top-k prefilter.

    branch_outputs: sequence of (box_dfl [N,h,w,4*bins], cls_logits
    [N,h,w,C]) finest-stride first (the model's output order).

    Returns (boxes [N, top_k, 4], scores [N, top_k], classes [N, top_k])
    sorted by descending score. Low-score slots pad with score 0. The
    reference filters at OBJ_THRESH on the host (src/tool.py:55-69); here the
    device keeps the best `top_k` candidates and the host applies the
    threshold + NMS to that small set — same results for any scene with
    fewer than `top_k` raw candidates above threshold.
    """
    all_boxes, all_scores = [], []
    for (box_dfl, cls_logits), stride in zip(branch_outputs, strides):
        boxes = decode_branch(box_dfl, stride, img_size, bins)
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        n, h, w, c = scores.shape
        all_boxes.append(boxes)
        all_scores.append(scores.reshape(n, h * w, c))
    boxes = jnp.concatenate(all_boxes, axis=1)    # [N, A, 4]
    scores = jnp.concatenate(all_scores, axis=1)  # [N, A, C]

    best_score = jnp.max(scores, axis=-1)         # [N, A]
    best_class = jnp.argmax(scores, axis=-1)      # [N, A]
    k = min(top_k, best_score.shape[1])
    top_scores, top_idx = jax.lax.top_k(best_score, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_classes = jnp.take_along_axis(best_class, top_idx, axis=1)
    return top_boxes, top_scores, top_classes
