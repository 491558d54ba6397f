"""Detection evaluation: COCO-style mAP without pycocotools.

Capability parity with the reference's COCO_test_helper + pycocotools flow
(src/py_utils/coco_utils.py:18-37, :128-175): accumulate per-image detection
records, export COCO-format JSON, and compute AP at IoU thresholds
0.50:0.05:0.95 (reporting mAP, mAP50, mAP75, mAP85, mAP95 like
coco_eval_with_json prints). pycocotools is not available in this
environment, so the evaluator is self-contained: standard 101-point
interpolated AP per class per IoU threshold, matched greedily by score like
COCOeval.
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np


def rle_encode(mask) -> dict:
    """Binary mask -> COCO compressed RLE, byte-identical to
    pycocotools.mask.encode with a utf-8 decoded counts string (the record
    shape the reference exports, src/py_utils/coco_utils.py:152-170).

    Column-major (Fortran) scan; runs alternate background/foreground
    starting with background; counts beyond the third are delta-encoded
    against counts[i-2] and packed 5 bits per ascii char (chars 48-111,
    0x20 continuation, sign-extension on 0x10) — the pycocotools
    rleToString scheme."""
    m = np.asarray(mask)
    h, w = m.shape
    flat = (m.reshape(h * w, order="F") != 0).astype(np.int8)
    if flat.size:
        change = np.flatnonzero(np.diff(flat)) + 1
        runs = np.diff(np.concatenate([[0], change, [flat.size]]))
        counts = [int(c) for c in runs]
        if flat[0] == 1:
            counts = [0] + counts
    else:
        counts = [0]
    out = []
    for i, c in enumerate(counts):
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return {"size": [int(h), int(w)], "counts": "".join(out)}


def rle_decode(rle: dict) -> np.ndarray:
    """COCO compressed RLE -> binary uint8 mask (pycocotools
    rleFrString + rleDecode semantics)."""
    s = rle["counts"]
    counts: list[int] = []
    i = 0
    while i < len(s):
        x, k, more = 0, 0, True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << k
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (k + 5)
            k += 5
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    h, w = rle["size"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


class DetectionRecorder:
    """Accumulates detections + ground truth; exports JSON; evaluates mAP."""

    def __init__(self):
        self.detections: list[dict] = []
        self.ground_truth: list[dict] = []

    def add_detection(self, image_id, category_id, bbox_xyxy, score,
                      mask=None):
        """`mask`: optional [H, W] binary instance mask; recorded as a COCO
        compressed-RLE `segmentation` entry, matching the reference's
        record shape (src/py_utils/coco_utils.py:157-175)."""
        x1, y1, x2, y2 = [float(v) for v in bbox_xyxy]
        rec = {
            "image_id": image_id,
            "category_id": int(category_id),
            "bbox": [round(x1, 3), round(y1, 3),
                     round(x2 - x1, 3), round(y2 - y1, 3)],  # xywh (COCO)
            "score": round(float(score), 5),
        }
        if mask is not None:
            rec["segmentation"] = rle_encode(mask)
        self.detections.append(rec)

    def add_ground_truth(self, image_id, category_id, bbox_xyxy):
        x1, y1, x2, y2 = [float(v) for v in bbox_xyxy]
        self.ground_truth.append({
            "image_id": image_id,
            "category_id": int(category_id),
            "bbox": [x1, y1, x2 - x1, y2 - y1],
        })

    def export_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.detections, f)

    def evaluate(self, iou_thresholds=None) -> dict:
        if iou_thresholds is None:
            iou_thresholds = np.arange(0.5, 1.0, 0.05)
        aps = {t: [] for t in iou_thresholds}
        cats = sorted({g["category_id"] for g in self.ground_truth})
        for cat in cats:
            dets = [d for d in self.detections if d["category_id"] == cat]
            gts = [g for g in self.ground_truth if g["category_id"] == cat]
            for t in iou_thresholds:
                aps[t].append(_average_precision(dets, gts, t))
        per_t = {round(float(t), 2): float(np.mean(v)) if v else 0.0
                 for t, v in aps.items()}
        vals = list(per_t.values())
        # np.arange float keys drift (0.7500000000000002); rounded keys +
        # nearest-match lookups keep the headline numbers honest
        return {
            "map": float(np.mean(vals)) if vals else 0.0,
            "map50": _closest(per_t, 0.50),
            "map75": _closest(per_t, 0.75),
            "map85": _closest(per_t, 0.85),
            "map95": _closest(per_t, 0.95),
            "per_threshold": per_t,
        }


def _closest(per_t: dict, target: float) -> float:
    if not per_t:
        return 0.0
    key = min(per_t, key=lambda k: abs(k - target))
    return per_t[key]


def _iou_xywh(a, b):
    ax1, ay1, aw, ah = a
    bx1, by1, bw, bh = b
    ax2, ay2 = ax1 + aw, ay1 + ah
    bx2, by2 = bx1 + bw, by1 + bh
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax2, bx2), min(ay2, by2)
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def _average_precision(dets, gts, iou_thresh) -> float:
    """101-point interpolated AP, greedy best-IoU matching by score order."""
    if not gts:
        return 0.0
    gt_by_img = defaultdict(list)
    for i, g in enumerate(gts):
        gt_by_img[g["image_id"]].append(i)
    matched = set()
    dets = sorted(dets, key=lambda d: -d["score"])
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for di, d in enumerate(dets):
        best_iou, best_gt = 0.0, None
        for gi in gt_by_img.get(d["image_id"], []):
            if gi in matched:
                continue
            iou = _iou_xywh(d["bbox"], gts[gi]["bbox"])
            if iou > best_iou:
                best_iou, best_gt = iou, gi
        if best_gt is not None and best_iou >= iou_thresh:
            tp[di] = 1
            matched.add(best_gt)
        else:
            fp[di] = 1
    if len(dets) == 0:
        return 0.0
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / len(gts)
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # precision envelope + 101-point sampling (COCO style)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    sample_points = np.linspace(0, 1, 101)
    ap = 0.0
    for r in sample_points:
        idx = np.searchsorted(recall, r, side="left")
        ap += precision[idx] if idx < len(precision) else 0.0
    return ap / 101.0
