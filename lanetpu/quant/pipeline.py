"""Artifact quantization driver: any .ltpu checkpoint -> int8 .ltpu.

The reference deployed EVERY model family as an int8 NPU blob through one
converter (reference .MISSING_LARGE_BLOBS:1-8, src/py_utils/rknn_executor.py:9,
conversion flow README.md:3079-3202). This module is the lanetpu analogue:
`quantize_checkpoint` loads any self-describing checkpoint, builds the
arch-appropriate calibration set (scene-quota-stratified for the lane
models, reference README.md:3313-3336), calibrates + quantizes every
Conv/Dense via the generic interception substrate (`quant.generic`), runs
the arch-appropriate parity gate (the README.md:3503-3571 ONNX-vs-RKNN MAE
check analogue), and writes an int8 artifact that `load_engine` +
`build_apply_fn` (or the runtime pipelines' `.from_checkpoint`) execute as
true int8 MXU programs.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from lanetpu.quant.generic import (
    collect_ranges,
    make_quantized_forward,
    quantize_variables,
)
from lanetpu.quant.parity import MAE_GOOD, MAE_ACCEPTABLE, parity_report
from lanetpu.runtime.engine import load_engine, save_quantized_checkpoint


# Bundled real assets: the camera frame + the bird's-eye (post-IPM) shot
# (reference test_images/frame_001410.jpg, picture.jpg —
# src/unet_ros_node.py:379 uses both as its test inputs).
GOLDEN_FRAMES = ("/root/reference/test_images/frame_001410.jpg",
                 "/root/reference/picture.jpg")


def real_frame_calibration_batch(image_size=(224, 224)) -> np.ndarray | None:
    """Bundled REAL camera frames (+ photometric variants) as calibration
    images. The reference calibrates on real captures (README.md:3313-3336);
    synthetic-only calibration leaves real-frame activations outside the
    quantization range (measured: golden-frame int8-vs-fp mask IoU 0.972
    without this batch, >= 0.99 with it). Returns uint8 [K, H, W, 3] or
    None when the assets aren't mounted."""
    frames = []
    for path in GOLDEN_FRAMES:
        if not os.path.exists(path):
            continue
        from PIL import Image

        img = Image.open(path).convert("RGB").resize(
            (image_size[1], image_size[0]))
        base = np.asarray(img, np.float32)
        for gain in (0.7, 1.0, 1.3):
            frames.append(np.clip(base * gain, 0, 255).astype(np.uint8))
            frames.append(np.clip(base[:, ::-1] * gain, 0, 255)
                          .astype(np.uint8))
    return np.stack(frames) if frames else None


def lane_batches(n: int, seed: int, batch: int = 8, image_size=(224, 224),
                 offset: int = 0, include_real: bool = True):
    """Scene-quota-stratified synthetic lane images + the bundled real
    frames, normalized (the exact tensors the U-Net / point regressors
    see). The shared calibration-set contract between the folded and the
    generic quantization paths (and the CLI / retrain scripts)."""
    from lanetpu.ops.normalize import normalize_image
    from lanetpu.train.synthetic import calibration_indices, generate_batch

    idx = calibration_indices(n, seed=seed, image_size=image_size,
                              offset=offset)
    out = []
    for i in range(0, len(idx), batch):
        imgs, _ = generate_batch(idx[i:i + batch], seed, image_size)
        out.append(np.asarray(normalize_image(jnp.asarray(imgs))))
    if include_real:
        real = real_frame_calibration_batch(image_size)
        if real is not None:
            out.append(np.asarray(normalize_image(jnp.asarray(real))))
    return out


_lane_batches = lane_batches  # back-compat alias for the old private name


def _detect_batches(n: int, seed: int, num_classes: int, img_size,
                    batch: int = 8, offset: int = 0):
    """Synthetic detection scenes, scaled to [0, 1] RGB (the tensors the
    YOLO model sees after letterbox + /255, YoloEngine._device_fn)."""
    from lanetpu.train.detect_task import render_detection_sample

    out = []
    for i in range(0, n, batch):
        imgs = [render_detection_sample(offset + j, seed, tuple(img_size),
                                        num_classes)[0]
                for j in range(i, min(i + batch, n))]
        out.append(np.stack(imgs).astype(np.float32) / 255.0)
    return out


def _flatten_outputs(out) -> np.ndarray:
    leaves = jax.tree_util.tree_leaves(out)
    return np.concatenate(
        [np.asarray(x, dtype=np.float32).ravel() for x in leaves])


def quantize_checkpoint(model_path: str, output_path: str,
                        calib_images: int = 100, mode: str = "int8",
                        seed: int = 123, val_offset: int = 10_000,
                        val_images: int = 16, deploy: bool = False,
                        calib_method: str = "percentile") -> dict:
    """Calibrate + quantize a checkpoint; write the int8 artifact + report.

    Works on every arch in the registry (unet / resnet_regressor / yolo).
    Returns the parity report dict (also embedded in the artifact meta).
    ``deploy=True`` writes the deployment tier (fp weights of quantized
    layers stripped + compressed payload; see
    `engine.save_quantized_checkpoint`).
    """
    module, variables, meta = load_engine(model_path)
    variables = jax.device_put(variables)  # not per-call host->device uploads
    arch = meta.get("arch")

    if arch == "unet":
        calib = lane_batches(calib_images, seed)
        val = lane_batches(val_images, seed + 1, offset=val_offset)
    elif arch == "resnet_regressor":
        calib = lane_batches(calib_images, seed)
        val = lane_batches(val_images, seed + 1, offset=val_offset)
    elif arch == "yolo":
        nc = meta.get("num_classes", 12)
        img_size = tuple(meta.get("img_size", (640, 640)))
        calib = _detect_batches(calib_images, seed, nc, img_size)
        val = _detect_batches(val_images, seed + 1, nc, img_size,
                              offset=val_offset)
    else:
        raise ValueError(f"unknown arch {arch!r} in {model_path}")

    def forward(v, x):
        return module.apply(v, x, train=False)

    ranges = collect_ranges(forward, variables, calib, method=calib_method)
    qarrays, act_qp = quantize_variables(variables, ranges)
    bundle = {"fp": variables, "q": qarrays}
    qforward = jax.jit(make_quantized_forward(forward, act_qp, mode))
    fp_jit = jax.jit(forward)

    # Parity gate over a held-out batch (reference README.md:3503-3571:
    # fp-vs-quantized MAE; for the U-Net on sigmoid probabilities + mask IoU)
    xv = jnp.asarray(val[0])
    out_fp = fp_jit(variables, xv)
    out_q = qforward(bundle, xv)
    if arch == "unet":
        prob_fp = np.asarray(jax.nn.sigmoid(jnp.asarray(out_fp)))
        prob_q = np.asarray(jax.nn.sigmoid(jnp.asarray(out_q)))
        report = parity_report(prob_fp, prob_q)
    elif arch == "yolo":
        # class sigmoid probabilities (the reference compares sigmoid probs)
        probs_fp = _flatten_outputs([jax.nn.sigmoid(c) for _, c in out_fp])
        probs_q = _flatten_outputs([jax.nn.sigmoid(c) for _, c in out_q])
        mae = float(np.abs(probs_fp - probs_q).mean())
        report = {"mae": mae, "max_err": float(np.abs(probs_fp - probs_q).max()),
                  "mae_verdict": ("good" if mae < MAE_GOOD else "acceptable"
                                  if mae < MAE_ACCEPTABLE else "fail")}
    else:
        flat_fp = _flatten_outputs(out_fp)
        flat_q = _flatten_outputs(out_q)
        mae = float(np.abs(flat_fp - flat_q).mean())
        report = {"mae": mae, "max_err": float(np.abs(flat_fp - flat_q).max()),
                  "mae_verdict": ("good" if mae < MAE_GOOD else "acceptable"
                                  if mae < MAE_ACCEPTABLE else "fail")}
    report["num_quantized_layers"] = len(act_qp)

    save_quantized_checkpoint(output_path, meta, variables, qarrays, act_qp,
                              mode=mode, parity=report, deploy=deploy)
    return report
