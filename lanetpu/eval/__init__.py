from lanetpu.eval.metrics import (
    confusion_counts,
    dice_score,
    iou_score,
    mask_metrics,
    pixel_accuracy,
)

__all__ = [
    "confusion_counts",
    "dice_score",
    "iou_score",
    "mask_metrics",
    "pixel_accuracy",
]
