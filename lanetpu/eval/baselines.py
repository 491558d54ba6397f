"""Classical lane-detection baselines: fixed HSV threshold, adaptive HSV,
and Canny edges — the comparison systems the reference's headline table
measures the U-Net against (reference README.md:4210-4215: U-Net 0.847 vs
HSV 0.652 / adaptive HSV 0.714 / Canny 0.583; the HSV recipe itself is
printed at README.md:205-226 from the reference's ``follow_line.py``:
cv2.inRange(H 0-180, S 0-40, V 185-255) then 5x5 morphological close +
open).

Pure numpy re-implementations (no cv2 dependency) so the "how much does
the NN buy you" claim is reproducible on this framework's own eval sets:
real frames with photometric truth (eval.real) and the synthetic scene
buckets (eval.scenes). On the *normal* condition the photometric truth is
itself a brightness extraction, so fixed HSV scores well by construction —
the margin the table demonstrates lives in the robustness axes (white
balance, dim light, shadow) where thresholds break and the U-Net holds.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Color space + morphology primitives (numpy)
# ---------------------------------------------------------------------------


def rgb_to_hsv_cv(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> OpenCV-convention HSV (H in [0,180), S,V in [0,255]).

    The reference's thresholds are quoted in this convention."""
    f = img.astype(np.float32) / 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    maxc = f.max(axis=-1)
    minc = f.min(axis=-1)
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-8), 0.0)
    safe = np.maximum(delta, 1e-8)
    h = np.where(
        maxc == r, (g - b) / safe % 6.0,
        np.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = np.where(delta == 0, 0.0, h) * 30.0  # 60 deg / 2 (cv convention)
    return np.stack([h, s * 255.0, maxc * 255.0], axis=-1)


def _dilate(m: np.ndarray, k: int) -> np.ndarray:
    r = k // 2
    p = np.pad(m, r)
    out = np.zeros_like(m)
    for dy in range(k):
        for dx in range(k):
            out |= p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
    return out


def _erode(m: np.ndarray, k: int) -> np.ndarray:
    # cv2 parity: erode's default border is constant +inf (outside the
    # frame counts as foreground), so border-touching stripes keep their
    # ends — ~dilate(~m) reproduces exactly that. The flip side, also
    # matching cv2: a blob whose window reaches outside cannot fully
    # erode, so close+open does NOT remove speckles within k//2 of the
    # border after closing.
    return ~_dilate(~m, k)


def morph_close_open(mask: np.ndarray, k: int = 5) -> np.ndarray:
    """The reference's denoise step: close (fill pinholes) then open
    (drop speckles) with a k x k kernel."""
    closed = _erode(_dilate(mask, k), k)
    return _dilate(_erode(closed, k), k)


# ---------------------------------------------------------------------------
# Baselines
# ---------------------------------------------------------------------------


def hsv_lane_mask(img: np.ndarray, s_max: float = 40.0,
                  v_min: float = 185.0) -> np.ndarray:
    """Fixed-threshold white-lane extraction (reference README.md:205-226):
    unsaturated + bright in HSV, then 5x5 close/open."""
    hsv = rgb_to_hsv_cv(img)
    raw = (hsv[..., 1] <= s_max) & (hsv[..., 2] >= v_min)
    return morph_close_open(raw)


def adaptive_hsv_lane_mask(img: np.ndarray, s_max: float = 60.0,
                           v_quantile: float = 0.93,
                           v_floor: float = 120.0) -> np.ndarray:
    """Per-frame adaptive variant (the reference's middle row): the V
    threshold follows the frame's own brightness distribution instead of a
    hard-coded 185, recovering dim/overexposed frames at the cost of
    keying on *relative* brightness (still fails under strong color casts
    because the S gate is fixed)."""
    hsv = rgb_to_hsv_cv(img)
    v = hsv[..., 2]
    thr = max(float(np.quantile(v, v_quantile)) * 0.92, v_floor)
    raw = (hsv[..., 1] <= s_max) & (v >= thr)
    return morph_close_open(raw)


def _sobel(gray: np.ndarray):
    p = np.pad(gray, 1, mode="edge")
    gx = (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2])
    gy = (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[:-2, 1:-1] - p[:-2, 2:])
    return gx, gy


def canny_lane_mask(img: np.ndarray, low: float = 60.0,
                    high: float = 140.0, close_k: int = 9) -> np.ndarray:
    """Canny-style edge baseline: Gaussian smooth -> Sobel -> non-maximum
    suppression -> hysteresis, then a closing so edge pairs form stripe
    regions comparable against region truth (the reference's table scores
    it as a segmentation method; bare 1-px edges would score ~0 IoU
    against any region truth)."""
    gray = img.astype(np.float32).mean(axis=-1)
    # 5-tap separable Gaussian
    kern = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    kern /= kern.sum()
    gray = np.apply_along_axis(
        lambda m: np.convolve(m, kern, mode="same"), 0, gray)
    gray = np.apply_along_axis(
        lambda m: np.convolve(m, kern, mode="same"), 1, gray)
    gx, gy = _sobel(gray)
    mag = np.hypot(gx, gy)
    # NMS over 4 quantized directions
    angle = (np.rad2deg(np.arctan2(gy, gx)) + 180.0) % 180.0
    p = np.pad(mag, 1)
    c = p[1:-1, 1:-1]
    neighbors = {
        0: (p[1:-1, 2:], p[1:-1, :-2]),
        45: (p[:-2, 2:], p[2:, :-2]),
        90: (p[:-2, 1:-1], p[2:, 1:-1]),
        135: (p[:-2, :-2], p[2:, 2:]),
    }
    quant = (np.round(angle / 45.0) % 4) * 45
    nms = np.zeros_like(mag, dtype=bool)
    for q, (n1, n2) in neighbors.items():
        sel = quant == q
        nms |= sel & (c >= n1) & (c >= n2)
    strong = nms & (mag >= high)
    weak = nms & (mag >= low)
    # hysteresis: keep weak edges connected to strong ones (few dilations)
    keep = strong
    for _ in range(8):
        grown = _dilate(keep, 3) & weak
        if (grown == keep).all():
            break
        keep = grown
    # Edge bands -> stripe regions: dilate then close. No opening — the
    # bands are a few px wide and an opening erases them wholesale
    # (hysteresis already removed speckle). A stripe scores only its edge
    # neighborhoods, which is why this baseline bottoms the reference's
    # table (0.583, README.md:4210-4215).
    band = _dilate(keep, close_k // 2 * 2 + 1)
    return _erode(_dilate(band, close_k), close_k)


BASELINES = {
    "hsv": hsv_lane_mask,
    "adaptive_hsv": adaptive_hsv_lane_mask,
    "canny": canny_lane_mask,
}


# ---------------------------------------------------------------------------
# Scoring harnesses (same sets the U-Net tiers are scored on)
# ---------------------------------------------------------------------------


def baseline_predict_batch(fn):
    """Adapt a single-image baseline to the evaluate_by_scene /
    LaneSegmenter.predict_batch signature (uint8 [N,H,W,3] -> uint8 masks)."""

    def predict(imgs, threshold=None):
        return np.stack([fn(np.asarray(im)).astype(np.uint8) * 255
                         for im in imgs])

    return predict


def score_baselines_real() -> dict:
    """Every baseline on the real bird's-eye frames + condition variants,
    scored exactly like the U-Net tiers (eval.real): IoU vs photometric
    truth per frame, plus per-condition quality (vs the condition frame's
    own clean-frame truth — thresholds break under conditions, which is
    the point of the table)."""
    from lanetpu.eval import real

    frames = real.demo_frames()
    out = {}
    for name, fn in BASELINES.items():
        entry = {"birdseye": {}}
        for fname in ("normal_raw", "ipm"):
            img = frames[fname]
            truth = real.photometric_lane_truth(img)
            pred = fn(img) & real.valid_region(img)
            entry["birdseye"][fname] = real.mask_iou_dice(pred, truth)
        # condition table: prediction on each variant scored against the
        # CLEAN frame's truth (the stripes do not move; only photometry
        # changes) — same axis the U-Net stability table measures
        raw = frames["normal_raw"]
        truth = real.photometric_lane_truth(raw)
        conds = real.photometric_conditions(raw)
        entry["conditions"] = {
            cname: real.mask_iou_dice(fn(cimg) & real.valid_region(raw),
                                      truth)
            for cname, cimg in conds.items() if cname != "normal"}
        out[name] = entry
    return out


def score_baselines_scenes(num_samples: int = 70, **kw) -> dict:
    """Per-scene synthetic IoU table for each baseline (the same
    evaluate_by_scene harness the U-Net tiers report through)."""
    from lanetpu.eval.scenes import evaluate_by_scene

    return {name: evaluate_by_scene(baseline_predict_batch(fn),
                                    num_samples=num_samples, **kw)
            for name, fn in BASELINES.items()}
