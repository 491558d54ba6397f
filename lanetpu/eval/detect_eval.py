"""Detector evaluation harness on the synthetic detection set.

The reference evaluates its detectors with pycocotools over COCO-format
records (reference src/py_utils/coco_utils.py:18-37, :128-175). This is the
framework-native equivalent: run a YoloEngine over held-out synthetic
scenes with exact ground truth and score COCO-style mAP with the
self-contained evaluator (`eval.cocoeval`).
"""

from __future__ import annotations

import numpy as np

from lanetpu.eval.cocoeval import DetectionRecorder


def evaluate_detector(engine, num_samples: int = 64, offset: int = 5000,
                      seed: int = 42, img_size=(256, 256),
                      batch_size: int = 16,
                      score_thresh: float = 0.05, hard: bool = False) -> dict:
    """engine: YoloEngine (fp32 or int8). Returns the mAP report dict.

    score_thresh defaults to 0.05 (mAP convention: measure recall at low
    confidence), NOT the 0.25 deployment threshold. `hard` evaluates on
    the de-saturated scene distribution (clutter, distractors, truncation,
    3x scale range — see train.detect_task.render_detection_sample)."""
    from lanetpu.train.detect_task import render_detection_sample

    num_classes = engine.cfg.num_classes
    rec = DetectionRecorder()
    for start in range(0, num_samples, batch_size):
        idx = range(offset + start, offset + min(start + batch_size,
                                                 num_samples))
        samples = [render_detection_sample(i, seed, tuple(img_size),
                                           num_classes, hard=hard)
                   for i in idx]
        frames_rgb = np.stack([s[0] for s in samples])
        results = engine.detect_batch(frames_rgb[..., ::-1],  # engine is BGR
                                      score_thresh=score_thresh)
        for image_id, ((boxes, classes, scores), (_, gt_boxes, gt_classes)) \
                in enumerate(zip(results, samples), start=offset + start):
            for gb, gc in zip(gt_boxes, gt_classes):
                rec.add_ground_truth(image_id, int(gc), gb)
            if boxes is None:
                continue
            for b, c, s in zip(boxes, classes, scores):
                rec.add_detection(image_id, int(c), b, float(s))
    return rec.evaluate()
