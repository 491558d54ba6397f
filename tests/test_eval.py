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
