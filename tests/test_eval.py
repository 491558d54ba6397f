"""Metric tests: segmentation metrics + self-contained COCO-style mAP."""

import numpy as np
import pytest

from lanetpu.eval.cocoeval import DetectionRecorder
from lanetpu.eval.metrics import dice_score, iou_score, mask_metrics


def test_iou_dice_perfect():
    m = np.ones((10, 10), bool)
    assert iou_score(m, m) == 1.0
    assert dice_score(m, m) == 1.0


def test_iou_disjoint():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:5] = True
    b[5:] = True
    assert iou_score(a, b) == 0.0


def test_iou_half_overlap():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:, :6] = True  # 60
    b[:, 4:] = True  # 60, overlap 20
    assert iou_score(a, b) == pytest.approx(20 / 100)
    assert dice_score(a, b) == pytest.approx(2 * 20 / 120)


def test_mask_metrics_block():
    a = np.zeros((10, 10), bool)
    a[2:8, 2:8] = True
    m = mask_metrics(a, a)
    for k in ("iou", "dice", "precision", "recall", "f1", "pixel_accuracy"):
        assert m[k] == 1.0


def test_empty_masks_score_one():
    z = np.zeros((5, 5), bool)
    assert iou_score(z, z) == 1.0
    assert dice_score(z, z) == 1.0


def test_map_perfect_detections():
    rec = DetectionRecorder()
    for img in range(3):
        rec.add_ground_truth(img, 0, (10, 10, 50, 50))
        rec.add_detection(img, 0, (10, 10, 50, 50), 0.9)
    result = rec.evaluate()
    assert result["map50"] == pytest.approx(1.0, abs=0.02)
    assert result["map"] == pytest.approx(1.0, abs=0.02)


def test_map_false_positive_hurts():
    rec = DetectionRecorder()
    rec.add_ground_truth(0, 0, (10, 10, 50, 50))
    rec.add_detection(0, 0, (10, 10, 50, 50), 0.5)
    rec.add_detection(0, 0, (200, 200, 250, 250), 0.9)  # high-score FP
    result = rec.evaluate()
    assert result["map50"] < 0.8


def test_map_localization_quality_differentiates():
    """A sloppy box passes IoU 0.5 but fails 0.95 -> map95 < map50."""
    rec = DetectionRecorder()
    rec.add_ground_truth(0, 0, (0, 0, 100, 100))
    rec.add_detection(0, 0, (0, 0, 100, 80), 0.9)  # IoU 0.8
    result = rec.evaluate()
    assert result["map50"] > 0.9
    assert result["map95"] == 0.0


def test_map_export_json(tmp_path):
    rec = DetectionRecorder()
    rec.add_detection(7, 2, (1, 2, 11, 22), 0.77)
    path = tmp_path / "dets.json"
    rec.export_json(str(path))
    import json

    data = json.loads(path.read_text())
    assert data[0]["image_id"] == 7
    assert data[0]["bbox"] == [1, 2, 10, 20]  # xywh


# ---------------------------------------------------------------------------
# COCO compressed RLE (reference coco_utils.py:152-175 record shape)
# ---------------------------------------------------------------------------


def test_rle_known_vectors():
    from lanetpu.eval.cocoeval import rle_encode

    # all-background 3x3: single run of 9 -> one char '9' (9+48)
    assert rle_encode(np.zeros((3, 3), np.uint8)) == {
        "size": [3, 3], "counts": "9"}
    # leading foreground pixel: counts [0, 1] -> "01"
    assert rle_encode(np.ones((1, 1), np.uint8)) == {
        "size": [1, 1], "counts": "01"}
    # column-major scan: mask column of ones first
    m = np.zeros((2, 3), np.uint8)
    m[:, 0] = 1  # flat(F-order) = 1 1 0 0 0 0 -> counts [0, 2, 4]
    assert rle_encode(m)["counts"] == "024"


def test_rle_roundtrip_random():
    from lanetpu.eval.cocoeval import rle_decode, rle_encode

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (7, 5), (64, 64), (37, 83)]:
        for p in (0.05, 0.5, 0.95):
            m = (rng.random(shape) < p).astype(np.uint8)
            rle = rle_encode(m)
            assert isinstance(rle["counts"], str)
            np.testing.assert_array_equal(rle_decode(rle), m)


def test_rle_delta_encoding_long_runs():
    """Counts beyond the third are delta-encoded (i-2); decode must invert
    exactly, including negative deltas and multi-char (>31) values."""
    from lanetpu.eval.cocoeval import rle_decode, rle_encode

    m = np.zeros((100, 100), np.uint8)
    m[10:90, 3] = 1   # long runs -> multi-char counts
    m[5:6, 50] = 1    # short run later -> negative delta vs earlier count
    m[:, 99] = 1
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle), m)


def test_recorder_segmentation_record_shape(tmp_path):
    """With a mask, the exported record carries a `segmentation` RLE with a
    utf-8 counts string, like the reference's single_encode path."""
    import json

    from lanetpu.eval.cocoeval import rle_decode

    rec = DetectionRecorder()
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 1
    rec.add_detection(1, 3, [2, 2, 6, 6], 0.9, mask=mask)
    rec.add_detection(1, 3, [0, 0, 2, 2], 0.5)  # box-only record unchanged
    path = tmp_path / "det.json"
    rec.export_json(str(path))
    a, b = json.load(open(path))
    assert a["segmentation"]["size"] == [8, 8]
    assert isinstance(a["segmentation"]["counts"], str)
    np.testing.assert_array_equal(rle_decode(a["segmentation"]), mask)
    assert "segmentation" not in b
    assert a["bbox"] == [2, 2, 4, 4] and a["score"] == 0.9
