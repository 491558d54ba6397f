"""YOLO detection engine.

Capability parity with the reference's detect path (src/yolo_detector.py:
314-338 process_single_frame and src/tool.py post_process): letterbox to
640x640, run the detector, decode, NMS. TPU-first split: letterbox +
forward + DFL decode + top-k run as one jitted device program
(`lanetpu.ops.dfl.decode_detections`); the host applies score threshold +
greedy per-class NMS to the <=top_k survivors and maps boxes back to the
original frame.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.core.config import YoloConfig
from lanetpu.models.yolo import CLASSES_12, YoloDetector
from lanetpu.ops.dfl import decode_detections
from lanetpu.ops.letterbox import letterbox, letterbox_params, unletterbox_boxes
from lanetpu.ops.nms import per_class_nms


class YoloEngine:
    def __init__(self, module: YoloDetector | None = None,
                 variables: dict | None = None,
                 config: YoloConfig | None = None,
                 classes: Sequence[str] = CLASSES_12,
                 compute_dtype="bfloat16", rng_seed: int = 0, apply_fn=None):
        self.cfg = config or YoloConfig(num_classes=len(classes))
        self.classes = tuple(classes)
        self.module = module or YoloDetector(config=self.cfg)
        # apply_fn(variables, x) overrides module.apply — the hook that runs
        # int8 artifacts (runtime.engine.build_apply_fn) in this pipeline.
        self._apply = apply_fn or (
            lambda v, x: self.module.apply(v, x, train=False))
        ih, iw = self.cfg.img_size
        if variables is None:
            variables = self.module.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, ih, iw, 3), jnp.float32))
        # device-resident weights (loaded checkpoints are host numpy; jit
        # args re-upload per call otherwise)
        self.variables = jax.device_put(variables)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self._jitted = jax.jit(self._device_fn)

    @classmethod
    def from_checkpoint(cls, path: str, classes: Sequence[str] | None = None,
                        **kwargs):
        """Build from a .ltpu artifact (fp32 or int8-quantized)."""
        from lanetpu.models.yolo import yolo_from_meta
        from lanetpu.runtime.engine import build_apply_fn, load_engine

        module, variables, meta = load_engine(path)
        cfg, classes = yolo_from_meta(meta, classes)
        return cls(module=module, variables=variables, config=cfg,
                   classes=classes, apply_fn=build_apply_fn(module, meta),
                   **kwargs)

    def _device_fn(self, variables, frames_bgr: jnp.ndarray):
        """[N, H, W, 3] uint8 BGR frames -> top-k (boxes, scores, classes).

        Letterbox + BGR->RGB + scale (reference src/yolo_detector.py:319-326)
        + forward + decode, one launch. Boxes are in 640x640 letterbox coords
        like the reference's post_process output.
        """
        ih, iw = self.cfg.img_size
        img = letterbox(frames_bgr, (ih, iw))
        rgb = img[..., ::-1].astype(jnp.float32) / 255.0
        outputs = self._apply(variables, rgb.astype(self.compute_dtype))
        return decode_detections(tuple(outputs), img_size=self.cfg.img_size,
                                 strides=self.cfg.strides, bins=self.cfg.dfl_bins)

    def detect_batch(self, frames_bgr: np.ndarray, map_to_original: bool = True,
                     score_thresh: float | None = None):
        """[N, H, W, 3] uint8 BGR -> list of (boxes, classes, scores) per frame.

        Returns `(None, None, None)` entries for empty frames, matching the
        reference's post_process convention (src/tool.py:173-174).
        `score_thresh` overrides the deployment threshold (cfg.obj_thresh,
        reference OBJ_THRESH=0.25) — mAP evaluation conventionally uses a
        much lower one so recall at low confidence is measured.
        """
        h, w = frames_bgr.shape[1:3]
        params = letterbox_params((h, w), self.cfg.img_size)
        b, s, c = self._jitted(self.variables, jnp.asarray(frames_bgr, dtype=jnp.uint8))
        b, s, c = np.asarray(b), np.asarray(s), np.asarray(c)
        thr = self.cfg.obj_thresh if score_thresh is None else score_thresh
        results = []
        for i in range(len(frames_bgr)):
            boxes, classes, scores = per_class_nms(
                b[i], s[i], c[i],
                score_thresh=thr, iou_thresh=self.cfg.nms_thresh)
            if boxes is not None and map_to_original:
                boxes = unletterbox_boxes(boxes, params)
            results.append((boxes, classes, scores))
        return results

    def detect(self, frame_bgr: np.ndarray, map_to_original: bool = True):
        """Single frame -> ((boxes, classes, scores), time)."""
        t0 = time.perf_counter()
        out = self.detect_batch(frame_bgr[None], map_to_original)[0]
        return out, time.perf_counter() - t0

    def release(self):
        self.variables = None
