"""Real-data gates: the shipped artifacts scored on the reference's own
published real frames (eval.real), not the synthetic generator.

Measured round-4 values after the halo-label retrain (wide soft stripes,
photometric-halo label convention, real-crop pool + anisotropic smear —
round4_report.json: real_eval): bird's-eye IoU vs photometric truth
0.80-0.83 on every tier incl. int8, warp trapezoid IoU 0.999, condition
stability 0.886-0.972 (wb_blue was 0.743 in round 3; the per-channel WB
gain augmentation closed it). Golden-frame production path (the round-4
target axis): whole-frame IoU 0.55 (parity; was 0.40), near-field IoU
0.57 (was 0.47), near-field precision 0.987, centerline recall 0.82
(was 0.77). See test_real_golden_production_path for why the
decomposition, not whole-frame IoU alone, is gated.
Gates carry margin below the measured values; they exist to stop
real-frame quality from silently regressing, and get RAISED as retraining
lifts the numbers (round-3 -> round-4: every golden gate below went up).
"""

import os

import numpy as np
import pytest

from lanetpu.eval import real

pytestmark = pytest.mark.skipif(
    not real.assets_present(), reason="reference demo assets not mounted")

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")


def _segmenter(path, quantized=False):
    from lanetpu.core.config import PipelineConfig
    from lanetpu.runtime.engine import build_apply_fn, load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    full = os.path.join(ART, path)
    if not os.path.exists(full):
        pytest.skip(f"artifact {path} not present")
    module, variables, meta = load_engine(full, backend="cpu")
    kwargs = {}
    if quantized:
        kwargs["forward_fn"] = build_apply_fn(module, meta)
    return LaneSegmenter(module=module, variables=variables,
                         config=PipelineConfig(backend="cpu",
                                               compute_dtype="float32",
                                               use_mxu_resample=False),
                         **kwargs)


def test_published_pair_mismatch_is_measured():
    """The published normal_raw/normal_unet pair are different video
    instants: the raw frame's own photometric lanes score ~0 IoU against
    the published mask. This fact shapes the scoring design (module
    docstring of eval.real); assert it so an asset change resurfaces it."""
    c = real.published_mask_consistency()
    assert c["iou"] < 0.05, c


def test_ipm_homography_matches_published_trapezoid():
    """The warp's valid-region geometry is frame-invariant and must match
    the published IPM warp almost exactly."""
    s = real.ipm_warp_score()
    assert s["iou"] >= 0.99, s


@pytest.mark.parametrize("path,quant,gate", [
    # gates = measured round-5 values minus margin (parity 0.845/0.847,
    # int8 within 0.001, s2d4 0.826/0.824 — the scoring-convention pool
    # labels lifted every tier ~0.02 over round 4; round-4 gate was 0.78)
    ("lane_unet/best_model.ltpu", False, 0.81),
    ("lane_unet/model_int8.ltpu", True, 0.81),
    ("lane_unet_s2d4/best_model.ltpu", False, 0.81),
])
def test_real_birdseye_quality(path, quant, gate):
    """Lane IoU vs photometric truth on BOTH real bird's-eye frames."""
    seg = _segmenter(path, quantized=quant)
    scores = real.birdseye_frame_scores(seg)
    for frame, s in scores.items():
        assert s["iou"] >= gate, (path, frame, s)


def test_real_golden_production_path():
    """The bundled real camera frame through warp->segment (the production
    order) vs the warped frame's photometric truth.

    Gated on the application-relevant decomposition, not whole-frame IoU
    alone: the IPM far field smears glare into broad bright blobs the
    photometric threshold counts as lane, so whole-frame IoU punishes a
    model for NOT hallucinating there. Measured round-3 trade (docstring
    of eval.real.centerline_recall): the round-2 model scored whole-frame
    IoU 0.505 but near-field precision 0.649 (border hallucination); the
    wedge-trained round-3 model scores 0.397 whole-frame but near-field
    precision 0.991 and near-field IoU 0.473 — strictly better where the
    controller steers."""
    seg = _segmenter("lane_unet/best_model.ltpu")
    s = real.golden_warped_score(seg)
    # round-5 measured (scoring-convention pool labels, thr_calib
    # operating point 0.20): whole-frame IoU 0.6156, near IoU 0.6587,
    # near precision 0.9524, centerline recall 0.8568 — every gate RAISED
    # again (round 4: 0.598 / 0.616 / 0.984 / 0.832 at thr 0.25; round-4
    # gates 0.54 / 0.56 / 0.95 / 0.79). The model now sits at the
    # ~@155-photometric-oracle level on BOTH whole-IoU and recall
    # (measured ceilings in test_centerline_recall_ceiling_is_measured).
    assert s["near_field"]["precision"] >= 0.95, s  # no hallucinated lanes
    assert s["near_field"]["iou"] >= 0.62, s
    assert s["centerline_recall"] >= 0.82, s        # stripes are FOUND
    assert s["iou"] >= 0.58, s                      # regression floor


def test_real_condition_stability():
    """Prediction stability across the reference's scene axes on the real
    frame: no condition may collapse."""
    seg = _segmenter("lane_unet/best_model.ltpu")
    scores = real.condition_stability_score(seg)
    assert set(scores) == {"strong_light", "dim_light", "wb_yellow",
                           "wb_blue", "shadow"}
    for cond, s in scores.items():
        # round-5 measured 0.892 (strong_light) - 0.978 (shadow) on the
        # parity tier (round 4: 0.886-0.972 with wb_blue weakest; the
        # convention-matched retrain moved the floor up and wb_blue to
        # 0.937); gate raised 0.84 -> 0.87
        assert s["iou"] >= 0.87, (cond, s)


def test_centerline_recall_ceiling_is_measured():
    """Ceiling context for the golden recall gate: even an ORACLE that
    extracts the warped golden frame's own photometric lanes at the
    training-label convention (white_thr=150) scores only ~0.875
    centerline recall against the eval truth (white_thr=140) — on a
    heavily upscale-smeared frame the metric is that sensitive to the
    brightness convention alone. The shipped model's 0.832 sits at the
    level of a thr~160 photometric oracle (0.831), i.e. the residual gap
    to 1.0 is convention sensitivity, not missed stripes. Assert the
    measurement so the context stays true if assets or the warp change."""
    import jax.numpy as jnp
    from PIL import Image

    from lanetpu.core.config import PipelineConfig
    from lanetpu.ops.warp import get_perspective_transform, warp_perspective

    cfg = PipelineConfig()
    frames = real.demo_frames()
    if "golden" not in frames:
        pytest.skip("golden frame not mounted")
    cam = np.asarray(Image.fromarray(frames["golden"]).resize((640, 480)))
    m = get_perspective_transform(cfg.ipm_src_points, cfg.ipm_dst_points)
    warped = np.asarray(warp_perspective(
        jnp.asarray(cam[None]), jnp.asarray(m), cfg.ipm_output_size)[0])
    truth = real.photometric_lane_truth(warped, white_thr=140)
    oracle150 = real.photometric_lane_truth(warped, white_thr=150)
    cr = real.centerline_recall(oracle150, truth)
    assert 0.82 <= cr <= 0.93, cr  # measured 0.875
    # Whole-warp IoU has the same convention ceiling (round-5 measurement):
    # a pixel-perfect extraction 10 brightness units stricter than the
    # truth scores IoU 0.724; at 15 units, 0.611. The shipped model's
    # round-5 numbers (IoU 0.616, recall 0.857 @ thr 0.20) sit at the
    # ~@155-oracle level on BOTH metrics (round 4 was ~@160) — the
    # residual gap to 1.0 is brightness-convention sensitivity on this
    # upscale-smeared frame, not missed stripes.
    iou150 = real.mask_iou_dice(oracle150, truth)["iou"]
    oracle155 = real.photometric_lane_truth(warped, white_thr=155)
    iou155 = real.mask_iou_dice(oracle155, truth)["iou"]
    assert 0.67 <= iou150 <= 0.78, iou150  # measured 0.724
    assert 0.56 <= iou155 <= 0.67, iou155  # measured 0.611


def test_photometric_truth_sane():
    """The photometric truth itself: thin bright stripes, plausible area,
    inside the valid region."""
    frames = real.demo_frames()
    for name in ("normal_raw", "ipm"):
        t = real.photometric_lane_truth(frames[name])
        assert 0.005 < t.mean() < 0.08, (name, t.mean())
        assert not (t & ~real.valid_region(frames[name])).any()


def test_centerline_recall_metric():
    """Unit semantics of the application-relevant recall: a prediction
    centered on each truth stripe counts as found regardless of width; a
    prediction further than tol_px from every stripe center does not."""
    truth = np.zeros((4, 32), dtype=bool)
    truth[1, 4:9] = True    # stripe centered at col 6
    truth[1, 20:25] = True  # second stripe in the same row, center 22
    truth[2, 10:13] = True  # center 11

    exact = np.zeros_like(truth)
    exact[1, 6] = True      # 1-px-wide but perfectly centered
    exact[1, 22] = True
    exact[2, 11] = True
    assert real.centerline_recall(exact, truth) == 1.0

    offset = np.zeros_like(truth)
    offset[1, 6] = True     # finds stripe 1 only; col 14 is 8 px from 22
    offset[1, 14] = True
    assert real.centerline_recall(offset, truth, tol_px=5) == pytest.approx(1 / 3)

    assert real.centerline_recall(np.zeros_like(truth), truth) == 0.0
    # no truth stripes -> vacuous success
    assert real.centerline_recall(exact, np.zeros_like(truth)) == 1.0
