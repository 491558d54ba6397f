"""Classical-baseline comparison gates (reference README.md:4210-4215).

The reference's headline table is U-Net 0.847 vs HSV 0.652 / adaptive HSV
0.714 / Canny 0.583, and its README narrates WHY thresholds lose: fixed
HSV collapses under white-balance drift and lighting change
(README.md:34-49). These tests reproduce both halves on this framework's
own eval sets: the baselines work on clean frames, collapse on the
robustness axes, and the shipped U-Net holds — the measured NN-vs-threshold
margin (recorded in artifacts/round4_report.json: baselines_real)."""

import numpy as np
import pytest

from lanetpu.eval import real
from lanetpu.eval.baselines import (
    BASELINES,
    adaptive_hsv_lane_mask,
    baseline_predict_batch,
    hsv_lane_mask,
    morph_close_open,
    rgb_to_hsv_cv,
)


def _stripe_scene(wb=(1.0, 1.0, 1.0), gain=1.0):
    """Blue floor + one white vertical stripe, optional WB/gain cast."""
    img = np.zeros((64, 64, 3), np.float32)
    img[..., :] = (90, 110, 170)
    img[:, 28:36] = (235, 235, 235)
    img = np.clip(img * gain * np.float32(wb), 0, 255).astype(np.uint8)
    truth = np.zeros((64, 64), bool)
    truth[:, 28:36] = True
    return img, truth


def test_rgb_to_hsv_cv_convention():
    # pure red: H=0, S=255, V=255; white: S=0, V=255
    px = np.array([[[255, 0, 0], [255, 255, 255], [0, 0, 128]]], np.uint8)
    hsv = rgb_to_hsv_cv(px)
    assert hsv[0, 0, 0] == pytest.approx(0.0, abs=1e-3)
    assert hsv[0, 0, 1] == pytest.approx(255.0, abs=1e-3)
    assert hsv[0, 1, 1] == pytest.approx(0.0, abs=1e-3)
    assert hsv[0, 1, 2] == pytest.approx(255.0, abs=1e-3)
    assert hsv[0, 2, 0] == pytest.approx(120.0, abs=1.0)  # blue = 120 (cv)


def test_morphology_close_open():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    m[12, 12] = False          # pinhole: close fills it
    speck = np.zeros_like(m)
    # interior 1-px speckle: open drops it (cv2 border semantics keep
    # speckles within k//2 of the border — see _erode — so place it
    # clear of the frame edge like cv2 would require)
    speck[16, 4] = True
    out = morph_close_open(m | speck, k=5)
    assert out[12, 12]
    assert not out[16, 4]
    assert out[10:22, 10:22].all()
    # border-touching stripes keep their full extent (cv2 parity)
    stripe = np.zeros((32, 32), bool)
    stripe[:, 10:16] = True
    assert morph_close_open(stripe, k=5)[:, 12].all()


def test_hsv_finds_clean_stripe_and_loses_it_under_wb():
    img, truth = _stripe_scene()
    clean = hsv_lane_mask(img)
    inter = (clean & truth).sum()
    assert inter / max(truth.sum(), 1) >= 0.9       # clean: found
    # strong blue white balance (the eval.real wb_blue gains): V of the
    # white stripe survives but S explodes past the fixed gate
    cast, _ = _stripe_scene(wb=(0.70, 0.95, 1.30))
    assert hsv_lane_mask(cast).sum() < 0.1 * truth.sum()
    # dim light: V drops below the hard-coded 185
    dim, _ = _stripe_scene(gain=0.55)
    assert hsv_lane_mask(dim).sum() < 0.1 * truth.sum()
    # adaptive variant recovers dim (relative threshold)...
    adim = adaptive_hsv_lane_mask(dim)
    assert (adim & truth).sum() / max(truth.sum(), 1) >= 0.7
    # ...but still loses the color cast (fixed S gate)
    assert adaptive_hsv_lane_mask(cast).sum() < 0.2 * truth.sum()


@pytest.mark.skipif(not real.assets_present(),
                    reason="reference demo assets not mounted")
def test_baselines_on_real_frames_and_unet_margin():
    """The reproduced headline table: thresholds score well on the clean
    real frame (the photometric truth IS a brightness extraction) but
    collapse on the robustness conditions, where the shipped U-Net holds
    >= 0.70 IoU (test_real_eval.py::test_real_condition_stability)."""
    import os

    from lanetpu.eval.baselines import score_baselines_real

    scores = score_baselines_real()
    # clean-frame sanity: fixed HSV really does work on the normal frame
    assert scores["hsv"]["birdseye"]["normal_raw"]["iou"] >= 0.70
    # collapse axes (the reference's failure story, README.md:34-49):
    # fixed HSV loses dim light and both white-balance casts outright
    for cond in ("dim_light", "wb_yellow", "wb_blue"):
        assert scores["hsv"]["conditions"][cond]["iou"] <= 0.30, cond
    # adaptive recovers some brightness change but not color casts
    assert scores["adaptive_hsv"]["conditions"]["wb_blue"]["iou"] <= 0.30
    # canny is the weakest region segmenter, as in the reference's table
    assert (scores["canny"]["birdseye"]["normal_raw"]["iou"]
            < scores["hsv"]["birdseye"]["normal_raw"]["iou"])

    # U-Net margin on the SAME conditions, same truth, if artifact present
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "lane_unet", "best_model.ltpu")
    if not os.path.exists(art):
        pytest.skip("lane_unet artifact not present")
    from lanetpu.core.config import PipelineConfig
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    module, variables, _ = load_engine(art, backend="cpu")
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(backend="cpu",
                                              compute_dtype="float32",
                                              use_mxu_resample=False))
    raw = real.demo_frames()["normal_raw"]
    truth = real.photometric_lane_truth(raw)
    conds = real.photometric_conditions(raw)
    for cond in ("dim_light", "wb_yellow", "wb_blue"):
        pred = seg.predict_batch(conds[cond][None])[0] > 127
        unet_iou = real.mask_iou_dice(pred & real.valid_region(raw),
                                      truth)["iou"]
        margin = unet_iou - scores["hsv"]["conditions"][cond]["iou"]
        assert margin >= 0.30, (cond, unet_iou, margin)


def test_baseline_predict_batch_adapter():
    imgs = np.stack([_stripe_scene()[0]] * 2)
    out = baseline_predict_batch(hsv_lane_mask)(imgs)
    assert out.shape == (2, 64, 64) and out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 255}


def test_all_baselines_registered():
    assert set(BASELINES) == {"hsv", "adaptive_hsv", "canny"}
