"""Quantization parity gates.

Parity target: the reference's ONNX-vs-RKNN comparison
(README.md:3503-3571): mean-absolute-error on sigmoid probabilities with
gates MAE < 0.05 good / < 0.10 acceptable, plus the framework-level gate of
mask IoU >= 0.99 between the quantized and fp32 paths (BASELINE.json).
"""

from __future__ import annotations

import numpy as np

from lanetpu.eval.metrics import iou_score

MAE_GOOD = 0.05
MAE_ACCEPTABLE = 0.10
IOU_GATE = 0.99


def parity_report(prob_ref: np.ndarray, prob_test: np.ndarray,
                  threshold: float = 0.5) -> dict:
    """Compare two probability maps; returns MAE/max-err/IoU + verdicts."""
    prob_ref = np.asarray(prob_ref, dtype=np.float32)
    prob_test = np.asarray(prob_test, dtype=np.float32)
    mae = float(np.mean(np.abs(prob_ref - prob_test)))
    max_err = float(np.max(np.abs(prob_ref - prob_test)))
    iou = iou_score(prob_test > threshold, prob_ref > threshold)
    return {
        "mae": mae,
        "max_err": max_err,
        "mask_iou": iou,
        "mae_verdict": ("good" if mae < MAE_GOOD
                        else "acceptable" if mae < MAE_ACCEPTABLE
                        else "fail"),
        "iou_pass": iou >= IOU_GATE,
    }
