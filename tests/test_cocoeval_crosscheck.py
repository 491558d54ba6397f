"""Anchor the self-contained mAP evaluator to pycocotools.

The reference's detection metric IS pycocotools (reference
src/py_utils/coco_utils.py:18-37); our evaluator (`eval.cocoeval`) is a
reimplementation. This module cross-validates the two on a randomized
detection workload when pycocotools is importable, and otherwise SKIPS —
the build environment has no pycocotools, but any deployment that installs
it gets the cross-check in CI for free.
"""

import numpy as np
import pytest

from lanetpu.eval.cocoeval import DetectionRecorder

pycocotools = pytest.importorskip("pycocotools")


def _random_workload(seed=0, images=12, classes=3):
    rng = np.random.default_rng(seed)
    rec = DetectionRecorder()
    gt_json = {"images": [], "annotations": [], "categories": [
        {"id": c, "name": str(c)} for c in range(classes)]}
    ann_id = 1
    for img_id in range(images):
        gt_json["images"].append({"id": img_id, "width": 640, "height": 480})
        for _ in range(rng.integers(1, 4)):
            c = int(rng.integers(0, classes))
            x1, y1 = rng.uniform(0, 400, 2)
            w, h = rng.uniform(40, 150, 2)
            rec.add_ground_truth(img_id, c, (x1, y1, x1 + w, y1 + h))
            gt_json["annotations"].append({
                "id": ann_id, "image_id": img_id, "category_id": c,
                "bbox": [x1, y1, w, h], "area": w * h, "iscrowd": 0})
            ann_id += 1
            # detection: jittered copy (sometimes), plus noise boxes
            if rng.random() < 0.8:
                jx, jy = rng.normal(0, 6, 2)
                rec.add_detection(img_id, c, (x1 + jx, y1 + jy,
                                              x1 + w + jx, y1 + h + jy),
                                  float(rng.uniform(0.5, 1.0)))
        for _ in range(rng.integers(0, 3)):
            c = int(rng.integers(0, classes))
            x1, y1 = rng.uniform(0, 400, 2)
            w, h = rng.uniform(30, 120, 2)
            rec.add_detection(img_id, c, (x1, y1, x1 + w, y1 + h),
                              float(rng.uniform(0.05, 0.6)))
    return rec, gt_json


def test_map_matches_pycocotools(tmp_path):
    import json

    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    rec, gt_json = _random_workload()
    ours = rec.evaluate()

    gt_path = tmp_path / "gt.json"
    dt_path = tmp_path / "dt.json"
    with open(gt_path, "w") as f:
        json.dump(gt_json, f)
    rec.export_json(str(dt_path))
    coco = COCO(str(gt_path))
    ev = COCOeval(coco, coco.loadRes(str(dt_path)), "bbox")
    ev.params.areaRng = [[0, 1e10]]
    ev.params.areaRngLbl = ["all"]
    ev.params.maxDets = [100]
    ev.evaluate()
    ev.accumulate()
    # mean over IoU thresholds of the 101-pt interpolated AP
    precision = ev.eval["precision"]  # [T, R, K, A, M]
    ref_map = float(np.mean(precision[precision > -1]))
    assert abs(ours["map"] - ref_map) < 5e-3
