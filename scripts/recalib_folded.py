"""Recalibrate the BN-folded int8 U-Net pkl, picking the calibration
method by golden-frame (real OOD) parity, not just synthetic parity.

The round-3 retrain moved the model's decision boundaries on the real
frame; the previous percentile-calibrated pkl measured mask IoU 0.961
there (gate: 0.98). Try percentile and mmse, keep the winner.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from lanetpu.ops.normalize import normalize_image
    from lanetpu.ops.resize import resize_bilinear
    from lanetpu.quant import (calibrate_unet, fold_unet_batchnorm,
                               parity_report, quantize_unet,
                               unet_forward_folded)
    from lanetpu.quant.pipeline import lane_batches
    from lanetpu.runtime.engine import load_engine

    _, variables, meta = load_engine("artifacts/lane_unet/best_model.ltpu")
    features = tuple(meta["features"])
    folded = fold_unet_batchnorm(variables, features)
    batches = lane_batches(100, seed=123)

    frame = np.asarray(
        Image.open("/root/reference/test_images/frame_001410.jpg")
        .convert("RGB"))
    xg = normalize_image(resize_bilinear(jnp.asarray(frame[None]),
                                         (224, 224)))

    fp_fn = jax.jit(lambda v: jax.nn.sigmoid(
        unet_forward_folded(folded, v, features)))
    xv = jnp.asarray(batches[0])
    prob_fp_val = np.asarray(fp_fn(xv))
    prob_fp_g = np.asarray(fp_fn(xg))[0]

    def golden_iou(q):
        prob = np.asarray(jax.nn.sigmoid(
            q.forward(xg, mode="int8")[..., 0].astype(jnp.float32)))[0]
        a, b = prob_fp_g[..., 0] > 0.5, prob > 0.5
        union = np.logical_or(a, b).sum()
        return float(np.logical_and(a, b).sum() / union) if union else 1.0

    best = None
    for method in ("percentile", "mmse"):
        log(f"calibrating ({method})...")
        ranges = calibrate_unet(folded, features, batches, method=method)
        q = quantize_unet(folded, features, ranges,
                          final_sigmoid=meta.get("final_sigmoid", False))
        i8_fn = jax.jit(lambda v, q=q: jax.nn.sigmoid(
            q.forward(v, mode="int8")))
        rep = parity_report(prob_fp_val, np.asarray(i8_fn(xv)))
        giou = golden_iou(q)
        log(f"{method}: val {rep} golden_iou {giou:.4f}")
        if best is None or giou > best[1]:
            best = (method, giou, q, rep)

    method, giou, q, rep = best
    log(f"winner: {method} (golden IoU {giou:.4f})")
    with open("artifacts/lane_unet/model_int8.pkl", "wb") as f:
        pickle.dump(q, f)
    rep["golden_mask_iou"] = giou
    rep["calib_method"] = method

    import json
    path = "artifacts/round3_report.json"
    full = json.load(open(path))
    full["quant_unet"]["folded"] = rep
    with open(path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    log("saved pkl + report")


if __name__ == "__main__":
    main()
