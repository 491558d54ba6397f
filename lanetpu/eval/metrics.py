"""Segmentation quality metrics.

The reference reports IoU / Dice / Precision / Recall / F1 / pixel accuracy
(README.md:4179-4184) and uses hard Dice for validation checkpointing
(README.md:2115-2120). All metrics here accept binary masks (any dtype;
nonzero = positive) and work in numpy so they can score both device outputs
and file-based golden masks.
"""

from __future__ import annotations

import numpy as np


def confusion_counts(pred, target):
    pred = np.asarray(pred) != 0
    target = np.asarray(target) != 0
    tp = float(np.logical_and(pred, target).sum())
    fp = float(np.logical_and(pred, ~target).sum())
    fn = float(np.logical_and(~pred, target).sum())
    tn = float(np.logical_and(~pred, ~target).sum())
    return tp, fp, fn, tn


def iou_score(pred, target) -> float:
    tp, fp, fn, _ = confusion_counts(pred, target)
    union = tp + fp + fn
    if union == 0:
        return 1.0  # both empty
    return tp / union


def dice_score(pred, target) -> float:
    tp, fp, fn, _ = confusion_counts(pred, target)
    denom = 2 * tp + fp + fn
    if denom == 0:
        return 1.0
    return 2 * tp / denom


def pixel_accuracy(pred, target) -> float:
    tp, fp, fn, tn = confusion_counts(pred, target)
    total = tp + fp + fn + tn
    return (tp + tn) / total if total else 1.0


def mask_metrics(pred, target) -> dict:
    """Full metric block matching the reference's reported table."""
    tp, fp, fn, tn = confusion_counts(pred, target)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {
        "iou": iou_score(pred, target),
        "dice": dice_score(pred, target),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "pixel_accuracy": pixel_accuracy(pred, target),
    }
