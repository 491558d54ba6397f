"""YOLO detector training task.

The reference ships its detectors only as compiled NPU blobs (model/806.rknn
etc., stripped from the repo) with no training code; regenerating detector
artifacts from scratch therefore needs a trainer. This module provides:

  * a synthetic detection dataset (distinct colored shapes per class on a
    textured background, with exact boxes);
  * anchor-free center-sampling target assignment matching the decode
    geometry of `ops.dfl` (anchors at (x+0.5, y+0.5)*stride per FPN level,
    finest stride first, ltrb distances in stride units);
  * the YOLOv8-style loss family: BCE on class logits + DFL cross-entropy
    on the two adjacent distance bins + L1 on the decoded distances;
  * a compact training loop producing a `.ltpu` detector artifact.

Two assigners are provided:
  * "center" — static center-sampling with smallest-area tie-break
    (host numpy, prediction-independent); simple and audit-able;
  * "tal" (default) — task-aligned assignment (TOOD/YOLOv8 style): the
    alignment metric t = score^alpha * IoU^beta over center-inside-box
    candidates, top-k per gt, conflict resolution by max alignment, soft
    classification targets normalized per gt, plus CIoU box loss. TAL is
    prediction-dependent, so it runs INSIDE the jitted train step as pure
    jnp — no host round trip per step (TPU-first; the data loader only
    ships padded gt arrays).
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanetpu.core.config import YoloConfig
from lanetpu.models.yolo import YoloDetector
from lanetpu.runtime.engine import save_checkpoint

# ---------------------------------------------------------------------------
# Synthetic detection data
# ---------------------------------------------------------------------------

_SHAPE_COLORS = [
    (220, 40, 40), (40, 220, 40), (60, 60, 230), (230, 230, 40),
    (230, 40, 230), (40, 230, 230), (245, 140, 20), (140, 70, 20),
    (255, 255, 255), (20, 20, 20), (120, 230, 120), (180, 180, 255),
]


# Muted colors far from every class color — drawn as distractors in hard
# scenes (no ground truth) so color alone stops being a sufficient feature.
_DISTRACTOR_COLORS = [
    (150, 120, 100), (90, 110, 90), (170, 170, 140), (100, 100, 130),
    (200, 180, 170), (70, 80, 100),
]


def _paint_shape(img, rng, x1, y1, x2, y2, color, kind, jitter=0.0):
    """Draw a filled square/circle (class kinds) or ring/triangle
    (distractor-only kinds), clipped to the image."""
    h, w = img.shape[:2]
    cx1, cy1 = max(0, x1), max(0, y1)
    cx2, cy2 = min(w, x2), min(h, y2)
    if cx2 <= cx1 or cy2 <= cy1:
        return False
    color = np.asarray(color, np.float32)
    if jitter:
        color = np.clip(color + rng.uniform(-jitter, jitter, 3), 0, 255)
    yy, xx = np.mgrid[cy1:cy2, cx1:cx2]
    cy, cx = (y1 + y2) / 2, (x1 + x2) / 2
    r = (x2 - x1) / 2
    if kind == "square":
        mask = np.ones((cy2 - cy1, cx2 - cx1), bool)
    elif kind == "circle":
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    elif kind == "ring":
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        mask = (d2 <= r ** 2) & (d2 >= (0.6 * r) ** 2)
    else:  # triangle
        mask = (yy >= cy1) & (np.abs(xx - cx) <= (yy - y1) / 2)
    region = img[cy1:cy2, cx1:cx2]
    region[mask] = color
    img[cy1:cy2, cx1:cx2] = region
    return True


def _clutter_background(rng, h, w):
    """Textured background: base noise + muted patches + soft stripes."""
    img = rng.normal(110, 25, (h, w, 3))
    for _ in range(int(rng.integers(4, 9))):  # muted rectangles
        pw = int(rng.uniform(0.1, 0.45) * w)
        ph = int(rng.uniform(0.1, 0.45) * h)
        px = int(rng.uniform(0, w - pw))
        py = int(rng.uniform(0, h - ph))
        c = np.asarray(_DISTRACTOR_COLORS[
            int(rng.integers(len(_DISTRACTOR_COLORS)))], np.float32)
        img[py:py + ph, px:px + pw] = (
            0.6 * img[py:py + ph, px:px + pw] + 0.4 * c)
    # soft diagonal illumination stripes
    yy, xx = np.mgrid[0:h, 0:w]
    phase = rng.uniform(0, 2 * np.pi)
    freq = rng.uniform(0.02, 0.06)
    img *= (1.0 + 0.15 * np.sin(freq * (xx + yy) + phase))[..., None]
    return img.clip(0, 255)


def render_detection_sample(index: int, seed: int = 42, image_size=(256, 256),
                            num_classes: int = 11, max_objects: int = 4,
                            max_occlusion: float = 0.25, hard: bool = False):
    """-> (img uint8 [H, W, 3], boxes [M, 4] xyxy, classes [M]).

    Placement is rejection-sampled so no object is covered more than
    `max_occlusion` by a later draw — otherwise heavily-occluded objects
    keep full ground-truth boxes that nothing can detect (measured: such
    label noise capped recall@0.5 at ~0.91 and mAP50 at ~0.91).

    ``hard=True`` is the de-saturated benchmark distribution (the easy one
    measured mAP50 = 1.00 — too easy to certify a detector): background
    clutter (muted patches + illumination stripes), distractor shapes in
    non-class colors (rings/triangles, no ground truth), 3x the scale
    range (0.06-0.5 vs 0.15-0.4), edge-truncated objects (clipped boxes,
    kept if >=25% visible), more objects (up to 7), deeper overlap
    (occlusion cap 0.45), and per-object color jitter.

    ``hard="v2"`` (or 2) is the round-4 re-hardening — the hard set
    saturated at mAP50 0.995 once the detector was trained on it
    (artifacts/round3_report.json: yolo_hard). On top of hard:
    same-class pairs may overlap to 0.65 (occlusion between same-class
    objects defeats per-class NMS), the scale floor drops to ~9 px
    (sub-16-px instances), and a global lighting draw (gain 0.55-1.45 +
    color cast) varies exposure scene-to-scene."""
    h, w = image_size
    v2 = hard in (2, "v2")
    hard = bool(hard)
    rng = np.random.default_rng(np.random.SeedSequence([seed, index]))
    if hard:
        max_objects = max(max_objects, 7)
        max_occlusion = max(max_occlusion, 0.45)
        img = _clutter_background(rng, h, w)
        size_range, jitter = ((0.035, 0.5), 25.0) if v2 else ((0.06, 0.5),
                                                             20.0)
    else:
        img = rng.normal(110, 25, (h, w, 3)).clip(0, 255)
        size_range, jitter = (0.15, 0.4), 0.0

    def _coverage(b, others, other_cls=None, cls=None):
        """Worst mutual-coverage vs existing boxes; with classes given,
        same-class pairs are reported separately (v2 allows them deeper)."""
        x1, y1, x2, y2 = b
        area = (x2 - x1) * (y2 - y1)
        worst = worst_same = 0.0
        for j, o in enumerate(others):
            ix = max(0, min(x2, o[2]) - max(x1, o[0]))
            iy = max(0, min(y2, o[3]) - max(y1, o[1]))
            oarea = (o[2] - o[0]) * (o[3] - o[1])
            cov = max(ix * iy / area, ix * iy / oarea)
            if other_cls is not None and cls is not None \
                    and other_cls[j] == cls:
                worst_same = max(worst_same, cov)
            else:
                worst = max(worst, cov)
        return worst, worst_same

    n = int(rng.integers(1, max_objects + 1))
    boxes, classes = [], []
    for _ in range(n):
        cls = int(rng.integers(0, num_classes))
        size = int(rng.uniform(*size_range) * min(h, w))
        size = max(size, 8)
        placed = None
        # v2: bias a third of draws next to an existing same-class object
        # so deep same-class occlusion actually occurs (random placement
        # almost never produces it)
        same_idx = [j for j, c in enumerate(classes) if c == cls]
        crowd = v2 and same_idx and rng.random() < 0.5
        for _try in range(20):
            if crowd:
                ax1, ay1, ax2, ay2 = boxes[same_idx[0]]
                cx = (ax1 + ax2) / 2 + rng.uniform(-0.8, 0.8) * size
                cy = (ay1 + ay2) / 2 + rng.uniform(-0.8, 0.8) * size
                x1, y1 = int(cx - size / 2), int(cy - size / 2)
            elif hard:  # centers may fall near the edge: truncated objects
                x1 = int(rng.uniform(-0.4 * size, w - 0.6 * size))
                y1 = int(rng.uniform(-0.4 * size, h - 0.6 * size))
            else:
                x1 = int(rng.uniform(0, w - size))
                y1 = int(rng.uniform(0, h - size))
            cand = (x1, y1, x1 + size, y1 + size)
            clipped = (max(0, x1), max(0, y1),
                       min(w, x1 + size), min(h, y1 + size))
            vis = ((clipped[2] - clipped[0]) * (clipped[3] - clipped[1])
                   / float(size * size))
            if vis < 0.25:
                continue  # hopelessly truncated: resample
            cov, cov_same = _coverage(clipped, boxes, classes, cls)
            same_cap = 0.65 if v2 else max_occlusion
            if cov <= max_occlusion and cov_same <= same_cap:
                placed = (cand, clipped)
                break
        if placed is None:
            continue  # no clean spot: draw fewer objects
        (x1, y1, x2, y2), clipped = placed
        color = _SHAPE_COLORS[cls % len(_SHAPE_COLORS)]
        kind = "square" if cls % 2 == 0 else "circle"
        if _paint_shape(img, rng, x1, y1, x2, y2, color, kind, jitter):
            boxes.append(list(clipped))  # GT = visible extent
            classes.append(cls)
    if hard:  # distractors painted last (may partially occlude objects)
        for _ in range(int(rng.integers(1, 4))):
            size = int(rng.uniform(0.08, 0.3) * min(h, w))
            x1 = int(rng.uniform(0, w - size))
            y1 = int(rng.uniform(0, h - size))
            cand = (x1, y1, x1 + size, y1 + size)
            if _coverage(cand, boxes)[0] > 0.3:
                continue  # distractors must not bury real objects
            c = _DISTRACTOR_COLORS[int(rng.integers(len(_DISTRACTOR_COLORS)))]
            _paint_shape(img, rng, x1, y1, x1 + size, y1 + size, c,
                         "ring" if rng.random() < 0.5 else "triangle")
    if v2:  # scene-level exposure/cast variation (lighting robustness axis)
        gain = rng.uniform(0.55, 1.45)
        cast = rng.uniform(0.82, 1.18, size=3)
        img = (img * gain * cast).clip(0, 255)
    return (img.astype(np.uint8), np.array(boxes, np.float32),
            np.array(classes, np.int64))


# ---------------------------------------------------------------------------
# Target assignment (matches ops.dfl decode geometry)
# ---------------------------------------------------------------------------


def _anchor_centers(img_size, strides):
    """Per-level anchor centers in pixels, concatenated finest-first."""
    h, w = img_size
    centers, level_strides = [], []
    for s in strides:
        gh, gw = h // s, w // s
        ys, xs = np.mgrid[0:gh, 0:gw]
        cx = (xs + 0.5) * s
        cy = (ys + 0.5) * s
        centers.append(np.stack([cx.ravel(), cy.ravel()], axis=-1))
        level_strides.append(np.full(gh * gw, s, np.float32))
    return (np.concatenate(centers).astype(np.float32),
            np.concatenate(level_strides))


def assign_targets(boxes, classes, img_size, strides=(8, 16, 32),
                   num_classes: int = 11, bins: int = 16):
    """-> (cls_target [A, C], ltrb_target [A, 4] in stride units,
    pos_mask [A]) for one image."""
    centers, anchor_strides = _anchor_centers(img_size, strides)
    a = len(centers)
    cls_t = np.zeros((a, num_classes), np.float32)
    ltrb_t = np.zeros((a, 4), np.float32)
    pos = np.zeros(a, bool)
    if len(boxes) == 0:
        return cls_t, ltrb_t, pos

    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    # ltrb distance of every anchor to every box, in pixels
    l = centers[:, None, 0] - boxes[None, :, 0]
    t = centers[:, None, 1] - boxes[None, :, 1]
    r = boxes[None, :, 2] - centers[:, None, 0]
    b = boxes[None, :, 3] - centers[:, None, 1]
    inside = (np.stack([l, t, r, b], -1).min(-1) > 0)  # [A, M]
    # representable: distances must fit the DFL range at this stride
    max_d = np.stack([l, t, r, b], -1).max(-1) / anchor_strides[:, None]
    candidate = inside & (max_d < bins - 1)
    if not candidate.any():
        return cls_t, ltrb_t, pos
    # smallest-area box wins per anchor
    masked_area = np.where(candidate, areas[None, :], np.inf)
    best = masked_area.argmin(axis=1)
    pos = candidate.any(axis=1)
    idx = np.nonzero(pos)[0]
    bi = best[idx]
    cls_t[idx, classes[bi]] = 1.0
    s = anchor_strides[idx, None]
    ltrb_t[idx] = np.stack([l[idx, bi], t[idx, bi],
                            r[idx, bi], b[idx, bi]], axis=-1) / s
    return cls_t, ltrb_t, pos


def make_batch(indices, seed, img_size, num_classes, strides=(8, 16, 32),
               bins=16):
    imgs, cls_ts, ltrb_ts, poss = [], [], [], []
    metas = []
    for i in indices:
        img, boxes, classes = render_detection_sample(
            i, seed, img_size, num_classes)
        c, lt, p = assign_targets(boxes, classes, img_size, strides,
                                  num_classes, bins)
        imgs.append(img)
        cls_ts.append(c)
        ltrb_ts.append(lt)
        poss.append(p)
        metas.append((boxes, classes))
    return (np.stack(imgs), np.stack(cls_ts), np.stack(ltrb_ts),
            np.stack(poss).astype(np.float32), metas)


def make_gt_batch(indices, seed, img_size, num_classes, max_objects: int = 8,
                  hard: bool = False):
    """Padded ground-truth arrays for the in-step (TAL) assigner.

    -> (imgs [N,H,W,3] u8, gt_boxes [N,M,4] xyxy f32, gt_classes [N,M] i32,
        gt_valid [N,M] f32). Padding slots carry zeros + valid=0.
    """
    imgs, bs, cs, vs = [], [], [], []
    for i in indices:
        img, boxes, classes = render_detection_sample(
            i, seed, img_size, num_classes, hard=hard)
        m = min(len(boxes), max_objects)
        gb = np.zeros((max_objects, 4), np.float32)
        gc = np.zeros(max_objects, np.int32)
        gv = np.zeros(max_objects, np.float32)
        gb[:m] = boxes[:max_objects]
        gc[:m] = classes[:max_objects]
        gv[:m] = 1.0
        imgs.append(img)
        bs.append(gb)
        cs.append(gc)
        vs.append(gv)
    return np.stack(imgs), np.stack(bs), np.stack(cs), np.stack(vs)


# ---------------------------------------------------------------------------
# Task-aligned assignment (jnp, runs inside the jitted step)
# ---------------------------------------------------------------------------


def pairwise_iou(boxes1, boxes2, eps: float = 1e-7):
    """xyxy [A, 4] x [M, 4] -> IoU [A, M]."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((boxes1[:, 2] - boxes1[:, 0])
          * (boxes1[:, 3] - boxes1[:, 1]))[:, None]
    a2 = ((boxes2[:, 2] - boxes2[:, 0])
          * (boxes2[:, 3] - boxes2[:, 1]))[None, :]
    return inter / (a1 + a2 - inter + eps)


def ciou(b1, b2, eps: float = 1e-7):
    """Complete IoU between aligned xyxy boxes [..., 4] -> [...]."""
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    w1, h1 = b1[..., 2] - b1[..., 0], b1[..., 3] - b1[..., 1]
    w2, h2 = b2[..., 2] - b2[..., 0], b2[..., 3] - b2[..., 1]
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / (union + eps)
    # enclosing box diagonal
    elt = jnp.minimum(b1[..., :2], b2[..., :2])
    erb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    c2 = jnp.sum((erb - elt) ** 2, axis=-1) + eps
    # center distance
    rho2 = (jnp.sum(((b1[..., :2] + b1[..., 2:])
                     - (b2[..., :2] + b2[..., 2:])) ** 2, axis=-1)) / 4.0
    # aspect-ratio consistency
    v = (4.0 / np.pi**2) * (jnp.arctan(w2 / (h2 + eps))
                            - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1.0 + eps))
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def tal_assign(pred_boxes, pred_probs, gt_boxes, gt_cls, gt_valid, centers,
               topk: int = 10, alpha: float = 0.5, beta: float = 6.0):
    """Task-aligned assignment for ONE image.

    pred_boxes [A, 4] xyxy px, pred_probs [A, C] sigmoid scores,
    gt_boxes [M, 4], gt_cls [M] i32, gt_valid [M], centers [A, 2].
    Returns (pos [A] bool, t_hat [A] soft target weight,
             tgt_boxes [A, 4], tgt_cls [A] i32).
    """
    a = pred_boxes.shape[0]
    iou = pairwise_iou(pred_boxes, gt_boxes)                      # [A, M]
    s = jnp.clip(pred_probs[:, gt_cls], 1e-9, 1.0)                # [A, M]
    align = (s ** alpha) * (jnp.clip(iou, 0.0) ** beta)
    inside = ((centers[:, None, 0] > gt_boxes[None, :, 0])
              & (centers[:, None, 0] < gt_boxes[None, :, 2])
              & (centers[:, None, 1] > gt_boxes[None, :, 1])
              & (centers[:, None, 1] < gt_boxes[None, :, 3]))
    align = align * inside * gt_valid[None, :]
    # top-k candidate anchors per gt (kth value as threshold handles ties)
    topv, _ = jax.lax.top_k(align.T, min(topk, a))                # [M, k]
    thr = jnp.maximum(topv[:, -1:], 1e-9)                         # [M, 1]
    cand = (align.T >= thr).T & (align > 0)                       # [A, M]
    # conflict resolution: an anchor claimed by several gts keeps the
    # highest-alignment one
    best_gt = jnp.argmax(jnp.where(cand, align, -1.0), axis=1)    # [A]
    pos = cand.any(axis=1)
    rows = jnp.arange(a)
    a_align = align[rows, best_gt]
    a_iou = iou[rows, best_gt]
    # per-gt normalization: t_hat = align / max_align_gt * max_iou_gt
    pos_align = jnp.where(cand, align, 0.0)
    max_align = pos_align.max(axis=0)                             # [M]
    max_iou = jnp.where(cand, iou, 0.0).max(axis=0)               # [M]
    t_hat = a_align * max_iou[best_gt] / (max_align[best_gt] + 1e-9)
    t_hat = jnp.where(pos, t_hat, 0.0)
    del a_iou
    return pos, t_hat, gt_boxes[best_gt], gt_cls[best_gt]


def _flatten_levels(outputs, bins: int):
    box_list, cls_list = [], []
    for box_dfl, cls_log in outputs:
        n, h, w, _ = box_dfl.shape
        box_list.append(box_dfl.reshape(n, h * w, 4, bins))
        cls_list.append(cls_log.reshape(n, h * w, -1))
    return (jnp.concatenate(box_list, axis=1).astype(jnp.float32),
            jnp.concatenate(cls_list, axis=1).astype(jnp.float32))


def yolo_loss_tal(outputs, gt_boxes, gt_classes, gt_valid, img_size,
                  strides=(8, 16, 32), bins: int = 16,
                  cls_weight: float = 0.5, box_weight: float = 7.5,
                  dfl_weight: float = 1.5, topk: int = 10):
    """Task-aligned YOLOv8-style loss: soft BCE + CIoU + DFL.

    outputs: model branch list [(box_dfl [N,h,w,4*bins], cls [N,h,w,C])],
    gt_*: padded arrays from make_gt_batch. Everything is jnp — the
    assignment runs on device inside the caller's jit.
    """
    from lanetpu.ops.dfl import dfl_expectation

    box_dfl, cls_log = _flatten_levels(outputs, bins)   # [N,A,4,bins] [N,A,C]
    n, a, c = cls_log.shape
    centers_np, stride_np = _anchor_centers(img_size, strides)
    centers = jnp.asarray(centers_np)                   # [A, 2]
    stride_v = jnp.asarray(stride_np)[None, :, None]    # [1, A, 1]

    dist = dfl_expectation(box_dfl.reshape(n, a, 4 * bins), bins)  # [N,A,4]
    pd = dist * stride_v
    pred_boxes = jnp.stack([
        centers[None, :, 0] - pd[..., 0], centers[None, :, 1] - pd[..., 1],
        centers[None, :, 0] + pd[..., 2], centers[None, :, 1] + pd[..., 3],
    ], axis=-1)                                         # [N, A, 4] px
    probs = jax.nn.sigmoid(cls_log)

    pos, t_hat, tgt_boxes, tgt_cls = jax.vmap(
        tal_assign, in_axes=(0, 0, 0, 0, 0, None, None))(
        jax.lax.stop_gradient(pred_boxes), jax.lax.stop_gradient(probs),
        gt_boxes, gt_classes, gt_valid, centers, topk)

    denom = jnp.maximum(t_hat.sum(), 1.0)

    # classification: BCE against soft one-hot * t_hat over ALL anchors
    cls_target = jax.nn.one_hot(tgt_cls, c) * t_hat[..., None]
    cls_loss = optax.sigmoid_binary_cross_entropy(
        cls_log, cls_target).sum() / denom

    # box: CIoU on positives, alignment-weighted
    ciou_v = ciou(pred_boxes, tgt_boxes)
    box_loss = ((1.0 - ciou_v) * t_hat).sum() / denom

    # DFL: two-adjacent-bin cross-entropy on ltrb targets in stride units
    tl = jnp.stack([
        centers[None, :, 0] - tgt_boxes[..., 0],
        centers[None, :, 1] - tgt_boxes[..., 1],
        tgt_boxes[..., 2] - centers[None, :, 0],
        tgt_boxes[..., 3] - centers[None, :, 1],
    ], axis=-1) / stride_v
    tgt = jnp.clip(tl, 0.0, bins - 1 - 1e-3)
    lo = jnp.floor(tgt)
    w_hi = tgt - lo
    logp = jax.nn.log_softmax(box_dfl, axis=-1)
    lo_i = lo.astype(jnp.int32)[..., None]
    hi_i = jnp.clip(lo + 1, 0, bins - 1).astype(jnp.int32)[..., None]
    ce = -((1.0 - w_hi) * jnp.take_along_axis(logp, lo_i, axis=-1)[..., 0]
           + w_hi * jnp.take_along_axis(logp, hi_i, axis=-1)[..., 0])
    dfl_loss = (ce.mean(-1) * t_hat).sum() / denom

    total = cls_weight * cls_loss + box_weight * box_loss + dfl_weight * dfl_loss
    return total, {"cls": cls_loss, "box": box_loss, "dfl": dfl_loss,
                   "num_pos": pos.sum()}


# ---------------------------------------------------------------------------
# Loss (static center-sampling variant)
# ---------------------------------------------------------------------------


def yolo_loss(outputs, cls_target, ltrb_target, pos_mask, bins: int = 16,
              cls_weight: float = 1.0, dfl_weight: float = 0.3,
              l1_weight: float = 2.0):
    """outputs: model branch list [(box_dfl [N,h,w,4*bins], cls [N,h,w,C])].

    Flattens finest-first to align with the assignment's anchor order.
    """
    box_list, cls_list = [], []
    for box_dfl, cls_log in outputs:
        n, h, w, _ = box_dfl.shape
        box_list.append(box_dfl.reshape(n, h * w, 4, bins))
        cls_list.append(cls_log.reshape(n, h * w, -1))
    box_dfl = jnp.concatenate(box_list, axis=1).astype(jnp.float32)
    cls_log = jnp.concatenate(cls_list, axis=1).astype(jnp.float32)

    num_pos = jnp.maximum(pos_mask.sum(), 1.0)

    # classification: BCE over all anchors (positives carry the one-hot)
    cls_loss = optax.sigmoid_binary_cross_entropy(cls_log, cls_target)
    cls_loss = cls_loss.sum() / num_pos

    # DFL: cross-entropy against the two adjacent integer bins
    tgt = jnp.clip(ltrb_target, 0.0, bins - 1 - 1e-3)
    lo = jnp.floor(tgt)
    hi = lo + 1.0
    w_hi = tgt - lo
    w_lo = 1.0 - w_hi
    logp = jax.nn.log_softmax(box_dfl, axis=-1)
    lo_i = lo.astype(jnp.int32)[..., None]
    hi_i = jnp.clip(hi, 0, bins - 1).astype(jnp.int32)[..., None]
    ce = -(w_lo * jnp.take_along_axis(logp, lo_i, axis=-1)[..., 0]
           + w_hi * jnp.take_along_axis(logp, hi_i, axis=-1)[..., 0])
    dfl_loss = (ce.mean(-1) * pos_mask).sum() / num_pos

    # L1 on the decoded expectation
    exp = jnp.sum(jax.nn.softmax(box_dfl, axis=-1)
                  * jnp.arange(bins, dtype=jnp.float32), axis=-1)
    l1 = (jnp.abs(exp - tgt).mean(-1) * pos_mask).sum() / num_pos

    total = cls_weight * cls_loss + dfl_weight * dfl_loss + l1_weight * l1
    return total, {"cls": cls_loss, "dfl": dfl_loss, "l1": l1}


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


def train_yolo(num_classes: int = 11, img_size=(256, 256), epochs: int = 10,
               num_train: int = 256, batch_size: int = 8,
               learning_rate: float = 1e-3, width_mult: float = 0.25,
               depth_mult: float = 0.33, seed: int = 42,
               save_path: str | None = None, compute_dtype=jnp.bfloat16,
               verbose: bool = True, assigner: str = "tal",
               data=None, hard: bool = False) -> dict:
    """`data`: optional real dataset (e.g. `train.ingest.CocoDetectionDataset`)
    with `__len__`, `.num_classes`, `.img_size`, and
    `.gt_batch(indices) -> (imgs, gt_boxes, gt_classes, gt_valid)`;
    overrides the synthetic generator (TAL assigner only).
    `hard`: train on the de-saturated scene distribution
    (render_detection_sample(hard=True))."""
    assert assigner in ("tal", "center")
    if data is not None:
        assert assigner == "tal", "real datasets require the TAL assigner"
        num_train = len(data)
        num_classes = data.num_classes
        img_size = tuple(data.img_size)
    cfg = YoloConfig(num_classes=num_classes, img_size=tuple(img_size),
                     width_mult=width_mult, depth_mult=depth_mult)
    module = YoloDetector(config=cfg, dtype=compute_dtype)
    h, w = img_size
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    steps = max(1, num_train // batch_size)
    sched = optax.cosine_decay_schedule(learning_rate, epochs * steps,
                                        alpha=0.05)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(sched, weight_decay=5e-4))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, cls_t, ltrb_t, pos):
        x = imgs.astype(jnp.float32) / 255.0

        def loss_fn(p):
            outs, new_state = module.apply(
                {"params": p, "batch_stats": batch_stats},
                x.astype(compute_dtype), train=True, mutable=["batch_stats"])
            loss, aux = yolo_loss(outs, cls_t, ltrb_t, pos, cfg.dfl_bins)
            return loss, (aux, new_state)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, loss, aux

    @jax.jit
    def train_step_tal(params, batch_stats, opt_state, imgs, gb, gc, gv):
        x = imgs.astype(jnp.float32) / 255.0

        def loss_fn(p):
            outs, new_state = module.apply(
                {"params": p, "batch_stats": batch_stats},
                x.astype(compute_dtype), train=True, mutable=["batch_stats"])
            loss, aux = yolo_loss_tal(outs, gb, gc, gv, img_size,
                                      cfg.strides, cfg.dfl_bins)
            return loss, (aux, new_state)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, loss, aux

    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(num_train)
        losses = []
        for s in range(steps):
            idx = order[s * batch_size:(s + 1) * batch_size]
            if assigner == "tal":
                if data is not None:
                    imgs, gb, gc, gv = data.gt_batch(idx)
                else:
                    imgs, gb, gc, gv = make_gt_batch(idx, seed, img_size,
                                                     num_classes, hard=hard)
                params, batch_stats, opt_state, loss, aux = train_step_tal(
                    params, batch_stats, opt_state, jnp.asarray(imgs),
                    jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(gv))
            else:
                imgs, cls_t, ltrb_t, pos, _ = make_batch(
                    idx, seed, img_size, num_classes, cfg.strides,
                    cfg.dfl_bins)
                params, batch_stats, opt_state, loss, aux = train_step(
                    params, batch_stats, opt_state, jnp.asarray(imgs),
                    jnp.asarray(cls_t), jnp.asarray(ltrb_t), jnp.asarray(pos))
            losses.append(float(loss))
        record = {"epoch": epoch, "loss": float(np.mean(losses))}
        history.append(record)
        if verbose:
            print(f"epoch {epoch}: loss {record['loss']:.4f}", flush=True)

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        meta = {"arch": "yolo", "num_classes": num_classes,
                "width_mult": width_mult, "depth_mult": depth_mult,
                "img_size": list(img_size)}
        if data is not None and getattr(data, "class_names", None):
            # Real-dataset class names ride the artifact so load-time label
            # strings don't fall back to the count-matched synthetic tuples.
            meta["classes"] = list(data.class_names)
        save_checkpoint(save_path,
                        {"params": params, "batch_stats": batch_stats}, meta)
    return {"history": history, "params": params, "batch_stats": batch_stats,
            "module": module, "config": cfg}
