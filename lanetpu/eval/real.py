"""Real-data validation against the reference's own published outputs.

The reference ships, next to its README effect table (README.md:107-121),
real captured frames and its deployed model's outputs:

  * ``assets/demo/normal_raw.jpg``  — a bird's-eye (IPM-warped) camera
    frame, 1054x684 (the IPM output geometry, src/unet_ros_node.py:239-255);
  * ``assets/demo/normal_unet.jpg`` — the reference U-Net's binary lane
    mask (640x416 display size);
  * ``assets/demo/normal_hsv.jpg``  — the HSV-threshold baseline's mask;
  * ``assets/demo/No_IPM.png`` / ``IPM.jpg`` — a camera-view frame and a
    published IPM warp;
  * ``test_images/frame_001410.jpg`` — a raw 224x224 camera frame.

MEASURED CAVEAT (the scoring below is designed around it): the published
pairs are NOT pixel-aligned to each other — they are stills from
different video instants. Evidence, reproduced by
``published_mask_consistency()``: the white lane stripes photometrically
extracted from ``normal_raw.jpg`` itself score **IoU 0.0** against
``normal_unet.jpg`` (the raw frame's lanes are tilted; the published
mask's are vertical), so no model output on this frame — including the
reference model's own — could match the published mask. Likewise
``IPM.jpg`` shows a different scene state than ``No_IPM.png``.

Ground truth therefore comes from the frame itself: on this track, lane
lines ARE the white stripes on the blue floor, so a photometric
extraction (min(RGB) high inside the valid warp region) is exact up to
JPEG noise — `photometric_lane_truth`. Model masks are scored against
that; the published-mask IoU is still reported, next to the
consistency number that explains its ceiling. The IPM warp is validated
on the part that IS frame-invariant: the valid-region trapezoid
geometry of the published warp.
"""

from __future__ import annotations

import os

import numpy as np

DEMO_DIR = "/root/reference/assets/demo"
GOLDEN_FRAME = "/root/reference/test_images/frame_001410.jpg"


def assets_present() -> bool:
    return os.path.isdir(DEMO_DIR) and os.path.exists(
        os.path.join(DEMO_DIR, "normal_raw.jpg"))


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _resize_rgb(arr: np.ndarray, wh: tuple) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(arr).resize(wh, Image.BILINEAR))


def binarize_mask(img: np.ndarray, thr: int = 127) -> np.ndarray:
    """Displayed mask image (possibly RGB, jpeg-compressed) -> bool mask."""
    if img.ndim == 3:
        img = img.mean(axis=-1)
    return img > thr


def mask_iou_dice(pred: np.ndarray, truth: np.ndarray) -> dict:
    p, t = pred.astype(bool), truth.astype(bool)
    inter = np.logical_and(p, t).sum()
    union = np.logical_or(p, t).sum()
    denom = p.sum() + t.sum()
    return {"iou": float(inter / union) if union else 1.0,
            "dice": float(2 * inter / denom) if denom else 1.0,
            "precision": float(inter / p.sum()) if p.sum() else 1.0,
            "recall": float(inter / t.sum()) if t.sum() else 1.0}


def centerline_recall(pred: np.ndarray, truth: np.ndarray,
                      tol_px: int = 5) -> float:
    """Fraction of per-row truth stripe segments whose CENTER falls within
    ``tol_px`` columns of a predicted pixel in the same row.

    IoU against a photometric truth is width-sensitive: the brightness
    threshold catches the JPEG/blur halo around each stripe while a model
    trained on exact-width masks marks the core, so a perfectly centered
    but thinner prediction scores poorly. What the downstream controller
    consumes (reference src/unet_ros_node.py mask -> per-row lane center
    -> PID) is the stripe CENTER, so "was each stripe found where it is"
    is the application-relevant recall."""
    p, t = pred.astype(bool), truth.astype(bool)
    found = total = 0
    for row_t, row_p in zip(t, p):
        xs = np.flatnonzero(row_t)
        if not len(xs):
            continue
        # split the row's truth into contiguous stripe segments
        brk = np.flatnonzero(np.diff(xs) > 1)
        pcols = np.flatnonzero(row_p)
        for seg in np.split(xs, brk + 1):
            total += 1
            c = int(seg.mean())
            if len(pcols) and np.abs(pcols - c).min() <= tol_px:
                found += 1
    return float(found / total) if total else 1.0


def valid_region(img: np.ndarray, thr: int = 8) -> np.ndarray:
    """Non-black area of a warped frame (inside the IPM trapezoid)."""
    return img.mean(axis=-1) > thr


def photometric_lane_truth(img: np.ndarray, white_thr: int = 150) -> np.ndarray:
    """Exact-by-construction lane truth for track frames: the white
    stripes (high min-channel) inside the valid warp region. On this
    track lane lines are white paint on a blue floor, so whiteness IS the
    label, up to JPEG noise at stripe borders."""
    return (img.min(axis=-1) > white_thr) & valid_region(img)


def demo_frames() -> dict:
    """All real frames, keyed by name."""
    out = {"normal_raw": _load_rgb(os.path.join(DEMO_DIR, "normal_raw.jpg")),
           "ipm": _load_rgb(os.path.join(DEMO_DIR, "IPM.jpg")),
           "no_ipm": _load_rgb(os.path.join(DEMO_DIR, "No_IPM.png"))}
    if os.path.exists(GOLDEN_FRAME):
        out["golden"] = _load_rgb(GOLDEN_FRAME)
    return out


def published_unet_mask(shape_hw: tuple) -> np.ndarray:
    """The reference model's published mask, resized to `shape_hw`."""
    mask_img = _load_rgb(os.path.join(DEMO_DIR, "normal_unet.jpg"))
    h, w = shape_hw
    return binarize_mask(_resize_rgb(mask_img, (w, h)))


def published_mask_consistency() -> dict:
    """The measured mismatch between the published pair: photometric lanes
    of normal_raw vs normal_unet.jpg. ~0.0 IoU = different instants; this
    number is the ceiling context for any model-vs-published comparison."""
    raw = _load_rgb(os.path.join(DEMO_DIR, "normal_raw.jpg"))
    return mask_iou_dice(photometric_lane_truth(raw),
                         published_unet_mask(raw.shape[:2]))


# ---------------------------------------------------------------------------
# Photometric conditions (the reference's six-scene robustness axes)
# ---------------------------------------------------------------------------


def photometric_conditions(frame: np.ndarray) -> dict:
    """Deterministic variants of a real frame along the reference's scene
    axes (README.md:4179-4206: normal / strong light / yellow WB / blue WB
    / shadow). Derived from the real frame — documented as such — because
    the reference publishes no per-scene real set; the measurement is
    prediction stability on real content. Strong light is partial
    overexposure (the reference's description: HSV loses the blown-out
    region, U-Net stays stable), not full saturation."""
    f = frame.astype(np.float32)
    h, w = frame.shape[:2]
    # smooth half-frame shadow, like a trackside structure's cast
    ramp = np.clip((np.arange(w, dtype=np.float32) - 0.35 * w) / (0.3 * w),
                   0.0, 1.0)
    shadow_gain = (0.45 + 0.55 * ramp)[None, :, None]
    return {
        "normal": frame,
        "strong_light": np.clip(f * 1.35 + 15, 0, 255).astype(np.uint8),
        "dim_light": np.clip(f * 0.55, 0, 255).astype(np.uint8),
        "wb_yellow": np.clip(f * np.float32([1.25, 1.12, 0.72]),
                             0, 255).astype(np.uint8),
        "wb_blue": np.clip(f * np.float32([0.70, 0.95, 1.30]),
                           0, 255).astype(np.uint8),
        "shadow": np.clip(f * shadow_gain, 0, 255).astype(np.uint8),
    }


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------


def reference_demo_score(segmenter, threshold: float = 0.5) -> dict:
    """Run the lane pipeline on the reference's published real bird's-eye
    frame (already IPM-warped, so the plain resize->segment path).

    Primary score: IoU/Dice vs the photometric lane truth of the SAME
    frame. Context scores: vs the published (different-instant) mask, and
    that mask's own consistency ceiling."""
    raw = _load_rgb(os.path.join(DEMO_DIR, "normal_raw.jpg"))
    truth = photometric_lane_truth(raw)
    pred = segmenter.predict_batch(raw[None], threshold=threshold)[0] > 127
    return {
        "vs_photometric_truth": mask_iou_dice(pred, truth),
        "vs_published_mask": mask_iou_dice(
            pred, published_unet_mask(raw.shape[:2])),
        "published_mask_consistency": published_mask_consistency(),
        "pred_lane_frac": float(pred.mean()),
        "truth_lane_frac": float(truth.mean()),
    }


def birdseye_frame_scores(segmenter, threshold: float = 0.5) -> dict:
    """Photometric-truth scores on every real bird's-eye frame available:
    normal_raw and the published IPM warp (a second real scene)."""
    frames = demo_frames()
    out = {}
    for name in ("normal_raw", "ipm"):
        img = frames[name]
        truth = photometric_lane_truth(img)
        pred = segmenter.predict_batch(
            img[None], threshold=threshold)[0] > 127
        out[name] = mask_iou_dice(pred & valid_region(img), truth)
    return out


def golden_warped_score(segmenter, threshold: float | None = None) -> dict:
    """The bundled real CAMERA frame through the PRODUCTION path: IPM warp
    -> segment (reference src/unet_ros_node.py:292-321 order). Scored vs
    the photometric truth of the warped frame. The frame ships at 224x224;
    it is upscaled to the 640x480 camera geometry the homography was
    calibrated for.

    ``threshold=None`` scores the production operating point
    (cfg.warped_threshold, pool-calibrated); pass a value to probe other
    points."""
    import jax.numpy as jnp

    from lanetpu.ops.warp import get_perspective_transform, warp_perspective

    frames = demo_frames()
    if "golden" not in frames:
        return {}
    cam = _resize_rgb(frames["golden"], (640, 480))
    # BGR like the camera feed
    mask, _ = segmenter.predict_warped(cam[..., ::-1], threshold=threshold)
    cfg = segmenter.cfg
    m = get_perspective_transform(cfg.ipm_src_points, cfg.ipm_dst_points)
    warped = np.asarray(warp_perspective(
        jnp.asarray(cam[None]), jnp.asarray(m), cfg.ipm_output_size)[0])
    truth = photometric_lane_truth(warped, white_thr=140)
    pred = (mask > 127) & valid_region(warped)
    out = mask_iou_dice(pred, truth)
    # The IPM far field magnifies distant pixels enormously: glare and
    # background smear into broad bright blobs that the photometric
    # threshold counts as "lane", so the raw IoU under-states near-field
    # quality. Report the bottom-half (near-field) scores — the rows the
    # controller actually steers from — and the centerline recall.
    h = warped.shape[0]
    near = mask_iou_dice(pred[h // 2:], truth[h // 2:])
    out["near_field"] = near
    out["centerline_recall"] = centerline_recall(pred, truth)
    out["pred_px"] = int(pred.sum())
    out["truth_px"] = int(truth.sum())
    return out


def condition_stability_score(segmenter, threshold: float = 0.5) -> dict:
    """Per-condition IoU/Dice of the prediction on each photometric
    variant of the real frame, scored against the clean-frame prediction
    (the stability axis of the reference's robustness table)."""
    raw = _load_rgb(os.path.join(DEMO_DIR, "normal_raw.jpg"))
    conds = photometric_conditions(raw)
    clean = segmenter.predict_batch(
        conds["normal"][None], threshold=threshold)[0] > 127
    out = {}
    for name, img in conds.items():
        if name == "normal":
            continue
        pred = segmenter.predict_batch(img[None], threshold=threshold)[0] > 127
        out[name] = mask_iou_dice(pred, clean)
    return out


def ipm_warp_score(config=None) -> dict:
    """Validate the IPM homography against the frame-invariant part of the
    published warp: the valid-region trapezoid. (The published No_IPM /
    IPM pair are different instants — see the module docstring — so lane
    CONTENT cannot be compared, but the warp border geometry is a pure
    function of the homography + output size and must match.)"""
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig
    from lanetpu.ops.warp import get_perspective_transform, warp_perspective

    cfg = config or PipelineConfig()
    cam = _load_rgb(os.path.join(DEMO_DIR, "No_IPM.png"))
    ref_warp = _load_rgb(os.path.join(DEMO_DIR, "IPM.jpg"))
    matrix = get_perspective_transform(cfg.ipm_src_points, cfg.ipm_dst_points)
    ow, oh = cfg.ipm_output_size
    ours = np.asarray(warp_perspective(
        jnp.asarray(cam[None]), jnp.asarray(matrix), (ow, oh))[0])
    rh, rw = ref_warp.shape[:2]
    ours_al = _resize_rgb(ours, (rw, rh))
    score = mask_iou_dice(valid_region(ours_al, thr=20),
                          valid_region(ref_warp, thr=20))
    score["note"] = "valid-region trapezoid IoU (content is another instant)"
    return score
