"""Round-4 diagnostic: WHERE does the production-path golden prediction
miss?  Per-row recall profile, stripe width comparison, and threshold
sensitivity — run on CPU (no TPU client), informs the real-frame
fine-tune design (VERDICT r3 item 1).
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.ops.warp import get_perspective_transform, warp_perspective
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    module, variables, meta = load_engine(
        "artifacts/lane_unet/best_model.ltpu", backend="cpu")
    cfg = PipelineConfig(backend="cpu", compute_dtype="float32",
                         use_mxu_resample=False)
    seg = LaneSegmenter(module=module, variables=variables, config=cfg)

    frames = real.demo_frames()
    from PIL import Image

    cam = np.asarray(Image.fromarray(frames["golden"]).resize((640, 480)))
    m = get_perspective_transform(cfg.ipm_src_points, cfg.ipm_dst_points)
    warped = np.asarray(warp_perspective(
        jnp.asarray(cam[None]), jnp.asarray(m), cfg.ipm_output_size)[0])
    truth = real.photometric_lane_truth(warped, white_thr=140)
    valid = real.valid_region(warped)

    h, w = truth.shape
    print(f"warped {h}x{w}, truth_px={truth.sum()}, "
          f"truth frac of valid={truth.sum()/valid.sum():.4f}")

    # Threshold sweep on the production path
    for thr in (0.5, 0.3, 0.15, 0.05):
        mask, _ = seg.predict_warped(cam[..., ::-1], threshold=thr)
        pred = (mask > 127) & valid
        s = real.mask_iou_dice(pred, truth)
        nf = real.mask_iou_dice(pred[h // 2:], truth[h // 2:])
        cr = real.centerline_recall(pred, truth)
        print(f"thr={thr}: IoU={s['iou']:.3f} P={s['precision']:.3f} "
              f"R={s['recall']:.3f} | near IoU={nf['iou']:.3f} "
              f"P={nf['precision']:.3f} R={nf['recall']:.3f} | "
              f"centerline_recall={cr:.3f} pred_px={int(pred.sum())}")

    # Per-row profile at the default threshold
    mask, _ = seg.predict_warped(cam[..., ::-1], threshold=0.5)
    pred = (mask > 127) & valid
    print("\nrow-band profile (thr=0.5):")
    bands = 8
    for b in range(bands):
        sl = slice(b * h // bands, (b + 1) * h // bands)
        t, p = truth[sl], pred[sl]
        if t.sum() == 0:
            print(f" band {b}: no truth")
            continue
        s = real.mask_iou_dice(p, t)
        cr = real.centerline_recall(p, t)
        # mean stripe width per row, truth vs pred
        tw = [np.flatnonzero(r).size for r in t if r.any()]
        pw = [np.flatnonzero(r).size for r in p if r.any()]
        print(f" band {b}: IoU={s['iou']:.3f} P={s['precision']:.3f} "
              f"R={s['recall']:.3f} cr={cr:.3f} "
              f"truth_w={np.mean(tw) if tw else 0:.1f} "
              f"pred_w={np.mean(pw) if pw else 0:.1f} "
              f"rows_with_truth={len(tw)} rows_with_pred={len(pw)}")

    # Also: raw prob stats where truth is on but pred off
    probs = seg.predict_warped(cam[..., ::-1], threshold=None) \
        if hasattr(seg, "predict_warped_probs") else None

    # birdseye frames for comparison: what does the model see there
    for name in ("normal_raw", "ipm"):
        img = frames[name]
        t = real.photometric_lane_truth(img)
        pred = seg.predict_batch(img[None], threshold=0.5)[0] > 127
        pred = pred & real.valid_region(img)
        s = real.mask_iou_dice(pred, t)
        tw = [np.flatnonzero(r).size for r in t if r.any()]
        pw = [np.flatnonzero(r).size for r in pred if r.any()]
        print(f"\n{name}: IoU={s['iou']:.3f} P={s['precision']:.3f} "
              f"R={s['recall']:.3f} truth_w={np.mean(tw):.1f} "
              f"pred_w={np.mean(pw):.1f}")


if __name__ == "__main__":
    main()
