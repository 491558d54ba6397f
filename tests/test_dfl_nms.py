"""DFL decode + NMS parity vs a numpy re-derivation of the reference math
(src/tool.py:103-180), torch-free."""

import numpy as np

from lanetpu.ops.dfl import decode_branch, decode_detections, dfl_expectation
from lanetpu.ops.nms import nms, per_class_nms


def _ref_dfl(position_nchw):
    """Reference dfl (src/tool.py:103-114) in numpy: softmax-expectation."""
    n, c, h, w = position_nchw.shape
    mc = c // 4
    y = position_nchw.reshape(n, 4, mc, h, w)
    e = np.exp(y - y.max(axis=2, keepdims=True))
    p = e / e.sum(axis=2, keepdims=True)
    acc = np.arange(mc, dtype=np.float32).reshape(1, 1, mc, 1, 1)
    return (p * acc).sum(axis=2)


def _ref_box_process(position_nchw, img_size=(640, 640)):
    """Reference box_process (src/tool.py:117-130) in numpy."""
    grid_h, grid_w = position_nchw.shape[2:4]
    col, row = np.meshgrid(np.arange(grid_w), np.arange(grid_h))
    grid = np.concatenate(
        (col.reshape(1, 1, grid_h, grid_w), row.reshape(1, 1, grid_h, grid_w)),
        axis=1).astype(np.float32)
    stride = np.array([img_size[1] // grid_h,
                       img_size[0] // grid_w]).reshape(1, 2, 1, 1)
    pos = _ref_dfl(position_nchw)
    box_xy = grid + 0.5 - pos[:, 0:2]
    box_xy2 = grid + 0.5 + pos[:, 2:4]
    return np.concatenate((box_xy * stride, box_xy2 * stride), axis=1)


def test_dfl_expectation_matches_reference(rng):
    nchw = rng.standard_normal((1, 64, 8, 8)).astype(np.float32)
    nhwc = nchw.transpose(0, 2, 3, 1)
    ours = np.asarray(dfl_expectation(nhwc))  # [1, 8, 8, 4]
    ref = _ref_dfl(nchw).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_decode_branch_matches_reference(rng):
    nchw = rng.standard_normal((1, 64, 80, 80)).astype(np.float32)
    nhwc = nchw.transpose(0, 2, 3, 1)
    ours = np.asarray(decode_branch(nhwc, stride=8, img_size=(640, 640)))
    ref = _ref_box_process(nchw).transpose(0, 2, 3, 1).reshape(1, -1, 4)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_decode_detections_topk(rng):
    outs = []
    for s in (8, 16, 32):
        h = 64 // s
        box = rng.standard_normal((2, h, h, 64)).astype(np.float32)
        cls = rng.standard_normal((2, h, h, 5)).astype(np.float32)
        outs.append((box, cls))
    boxes, scores, classes = decode_detections(
        tuple(outs), img_size=(64, 64), top_k=10)
    assert boxes.shape == (2, 10, 4)
    assert scores.shape == (2, 10)
    assert classes.shape == (2, 10)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted descending


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # high IoU with first
        [50, 50, 60, 60],
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = nms(boxes, scores, iou_thresh=0.45)
    assert list(keep) == [0, 2]


def test_per_class_nms_keeps_classes_separate():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    classes = np.array([0, 1])
    b, c, s = per_class_nms(boxes, scores, classes, score_thresh=0.25)
    assert len(b) == 2  # different classes: both survive


def test_per_class_nms_empty_returns_none():
    b, c, s = per_class_nms(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,)))
    assert b is None and c is None and s is None
