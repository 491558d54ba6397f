"""Non-maximum suppression.

The reference runs greedy per-class NMS on the host in numpy
(src/tool.py:72-100, IoU thresh 0.45 with a +1e-5 size epsilon). Greedy NMS
is inherently sequential, so we keep the same split the reference has: the
device does the heavy decode + top-k prefilter (`ops.dfl.decode_detections`)
and the host suppresses the few survivors. `nms` here matches the reference
implementation numerically, epsilon included.
"""

import numpy as np


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45) -> np.ndarray:
    """Greedy NMS over xyxy boxes. Returns kept indices (descending score)."""
    boxes = np.asarray(boxes, dtype=np.float32)
    scores = np.asarray(scores, dtype=np.float32)
    if boxes.size == 0:
        return np.empty((0,), dtype=np.int64)
    x = boxes[:, 0]
    y = boxes[:, 1]
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    areas = w * h
    order = scores.argsort()[::-1]

    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x[i], x[order[1:]])
        yy1 = np.maximum(y[i], y[order[1:]])
        xx2 = np.minimum(x[i] + w[i], x[order[1:]] + w[order[1:]])
        yy2 = np.minimum(y[i] + h[i], y[order[1:]] + h[order[1:]])
        w1 = np.maximum(0.0, xx2 - xx1 + 1e-5)
        h1 = np.maximum(0.0, yy2 - yy1 + 1e-5)
        inter = w1 * h1
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= iou_thresh)[0] + 1]
    return np.array(keep, dtype=np.int64)


def per_class_nms(boxes, scores, classes, score_thresh: float = 0.25,
                  iou_thresh: float = 0.45):
    """Threshold + per-class greedy NMS (reference src/tool.py:156-180).

    Inputs are the [K], [K, 4] host arrays from the device prefilter.
    Returns (boxes, classes, scores) or (None, None, None) when empty,
    matching the reference's return convention.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    scores = np.asarray(scores, dtype=np.float32)
    classes = np.asarray(classes)
    mask = scores >= score_thresh
    boxes, scores, classes = boxes[mask], scores[mask], classes[mask]

    nboxes, nclasses, nscores = [], [], []
    for c in sorted(set(classes.tolist())):
        inds = np.where(classes == c)[0]
        keep = nms(boxes[inds], scores[inds], iou_thresh)
        if len(keep):
            nboxes.append(boxes[inds][keep])
            nclasses.append(classes[inds][keep])
            nscores.append(scores[inds][keep])
    if not nclasses:
        return None, None, None
    return (np.concatenate(nboxes), np.concatenate(nclasses),
            np.concatenate(nscores))
