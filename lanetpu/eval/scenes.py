"""Per-scene segmentation quality reporting.

The reference reports IoU broken down by scene condition — normal /
low-light / bright / shadow / rain / curves (README.md:4189-4206). The
synthetic generator tags each sample with its lighting/blur scene
(`generate_sample(..., return_meta=True)`); this harness groups validation
quality by that tag.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from lanetpu.train.synthetic import generate_sample


def evaluate_by_scene(predict_batch, num_samples: int = 64, seed: int = 43,
                      image_size=(224, 224), offset: int = 0,
                      batch_size: int = 16, threshold: int = 127,
                      balanced: bool = True) -> dict:
    """predict_batch: fn([N, H, W, 3] uint8 RGB) -> [N, H, W] uint8 masks.

    With balanced=True (default) the scene conditions are cycled so every
    bucket — normal / low_light / bright / blur / shadow / rain / curve —
    receives num_samples // len(SCENES) samples, guaranteeing the full
    reference-style table (README.md:4189-4206) regardless of sample count.
    Returns {scene: {iou, dice, count}, "overall": {...}}.
    """
    from lanetpu.train.synthetic import SCENES

    per_scene = defaultdict(lambda: {"tp": 0.0, "fp": 0.0, "fn": 0.0,
                                     "count": 0})
    overall = {"tp": 0.0, "fp": 0.0, "fn": 0.0, "count": 0}

    idx = 0
    while idx < num_samples:
        batch_idx = range(offset + idx, offset + min(idx + batch_size,
                                                     num_samples))
        samples = [generate_sample(
            i, seed, image_size, return_meta=True,
            scene=SCENES[(i - offset) % len(SCENES)] if balanced else None)
            for i in batch_idx]
        imgs = np.stack([s[0] for s in samples])
        masks = np.stack([s[1] for s in samples])
        preds = np.asarray(predict_batch(imgs))
        for p, m, (_, _, meta) in zip(preds, masks, samples):
            pred_b = p > threshold
            true_b = m[..., 0] > 0.5
            tp = float(np.logical_and(pred_b, true_b).sum())
            fp = float(np.logical_and(pred_b, ~true_b).sum())
            fn = float(np.logical_and(~pred_b, true_b).sum())
            for bucket in (per_scene[meta["scene"]], overall):
                bucket["tp"] += tp
                bucket["fp"] += fp
                bucket["fn"] += fn
                bucket["count"] += 1
        idx += batch_size

    def finish(b):
        union = b["tp"] + b["fp"] + b["fn"]
        denom = 2 * b["tp"] + b["fp"] + b["fn"]
        return {"iou": b["tp"] / union if union else 1.0,
                "dice": 2 * b["tp"] / denom if denom else 1.0,
                "count": b["count"]}

    report = {scene: finish(b) for scene, b in per_scene.items()}
    report["overall"] = finish(overall)
    return report
