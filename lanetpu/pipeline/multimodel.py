"""Multi-model perception pipeline: U-Net + point regressor + YOLO, fused.

The reference runs its three model families as separate ROS nodes, each with
its own camera subscription, host preprocessing, and NPU round trip
(src/unet_ros_node.py, src/resnet50_node.py, src/yolo_debug.py). Here all
three run inside ONE jitted device program per frame batch:

    frames [N, H, W, 3] BGR
      ├─ composed IPM warp -> 224x224 bird's-eye (shared by both lane heads)
      │    ├─ U-Net -> lane mask (upscaled to the 1055x685 bird's-eye frame)
      │    └─ ResNet regressor -> 4 normalized lane x-coordinates
      └─ letterbox 640 -> YOLO -> on-device DFL decode + top-k

XLA schedules the three forwards inside one launch; the host does only NMS
on the <=top_k YOLO survivors and the pixel-scaling of the points.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.core.config import PipelineConfig, ResNetConfig, UNetConfig, YoloConfig
from lanetpu.kernels.resample import (
    compose_warp_to,
    resize_bilinear_mxu,
    warp_perspective_mxu,
)
from lanetpu.models.resnet import FIXED_Y_COORDS, ResNetRegressor
from lanetpu.models.unet import UNet
from lanetpu.models.yolo import CLASSES_12, YoloDetector
from lanetpu.ops.dfl import decode_detections
from lanetpu.ops.letterbox import letterbox, letterbox_params, unletterbox_boxes
from lanetpu.ops.normalize import normalize_image
from lanetpu.ops.nms import per_class_nms
from lanetpu.ops.warp import get_perspective_transform


class MultiModelPipeline:
    def __init__(self, unet: UNet | None = None, unet_vars: dict | None = None,
                 resnet: ResNetRegressor | None = None,
                 resnet_vars: dict | None = None,
                 yolo: YoloDetector | None = None,
                 yolo_vars: dict | None = None,
                 config: PipelineConfig | None = None,
                 yolo_config: YoloConfig | None = None,
                 classes=CLASSES_12, rng_seed: int = 0,
                 unet_apply=None, resnet_apply=None, yolo_apply=None):
        """apply overrides (fn(variables, x) -> out) plug alternate
        executions — int8 artifacts via runtime.engine.build_apply_fn, or
        the BN-folded U-Net forward (applied automatically when unet_vars
        carry batch_stats, like LaneSegmenter)."""
        self.cfg = config or PipelineConfig()
        self.ycfg = yolo_config or YoloConfig(num_classes=len(classes))
        self.classes = tuple(classes)
        dtype = jnp.dtype(self.cfg.compute_dtype)

        self.unet = unet or UNet(config=UNetConfig.deployed(), dtype=dtype)
        self.resnet = resnet or ResNetRegressor(
            config=ResNetConfig(depth=50, num_outputs=4), dtype=dtype)
        self.yolo = yolo or YoloDetector(config=self.ycfg, dtype=dtype)

        ih, iw = self.cfg.input_size
        key = jax.random.PRNGKey(rng_seed)
        zeros224 = jnp.zeros((1, ih, iw, 3), jnp.float32)
        self.unet_vars = unet_vars if unet_vars is not None \
            else self.unet.init(key, zeros224)
        self.resnet_vars = resnet_vars if resnet_vars is not None \
            else self.resnet.init(key, zeros224)
        yh, yw = self.ycfg.img_size
        self.yolo_vars = yolo_vars if yolo_vars is not None else \
            self.yolo.init(key, jnp.zeros((1, yh, yw, 3), jnp.float32))

        self._unet_apply = unet_apply or (
            lambda v, x: self.unet.apply(v, x, train=False))
        if (unet_apply is None and isinstance(self.unet_vars, dict)
                and "batch_stats" in self.unet_vars
                and getattr(self.cfg, "fold_bn", True)):
            from lanetpu.quant.fold import fold_unet_batchnorm
            from lanetpu.quant.functional_unet import unet_forward_folded

            folded = fold_unet_batchnorm(jax.device_get(self.unet_vars),
                                         self.unet.config.features)
            self.unet_vars = {k: {"kernel": jnp.asarray(v["kernel"], dtype),
                                  "bias": jnp.asarray(v["bias"], jnp.float32)}
                              for k, v in folded.items()}
            feats = self.unet.config.features
            s2d = getattr(self.unet.config, "s2d", 1)
            self._unet_apply = lambda v, x: unet_forward_folded(
                v, x, feats, s2d=s2d)
        self._resnet_apply = resnet_apply or (
            lambda v, x: self.resnet.apply(v, x, train=False))
        self._yolo_apply = yolo_apply or (
            lambda v, x: self.yolo.apply(v, x, train=False))

        # device-resident weights: loaded checkpoints are host numpy, and
        # jit args re-upload per call (measured: the fp stack spent 1.8 s
        # PER BATCH re-sending the ResNet50 over the host link)
        self.unet_vars = jax.device_put(self.unet_vars)
        self.resnet_vars = jax.device_put(self.resnet_vars)
        self.yolo_vars = jax.device_put(self.yolo_vars)

        ipm = get_perspective_transform(self.cfg.ipm_src_points,
                                        self.cfg.ipm_dst_points)
        self.direct_matrix = compose_warp_to(
            ipm, self.cfg.ipm_output_size, self.cfg.input_size)
        self.compute_dtype = dtype
        self._jitted = jax.jit(self._device_fn)

    @classmethod
    def from_checkpoints(cls, unet_path: str, points_path: str,
                         yolo_path: str, config: PipelineConfig | None = None):
        """Build the fused pipeline from .ltpu artifacts — fp32 OR int8
        (mixed freely): the all-int8 deployment stack is
        from_checkpoints('lane_unet/model_int8.ltpu',
        'points_xcoords_int8.ltpu', 'yolo_synthetic_int8.ltpu')."""
        from lanetpu.models.yolo import yolo_from_meta
        from lanetpu.runtime.engine import build_apply_fn, load_engine

        um, uv, umeta = load_engine(unet_path)
        pm, pv, pmeta = load_engine(points_path)
        ym, yv, ymeta = load_engine(yolo_path)
        ycfg, classes = yolo_from_meta(ymeta)
        # rebuild the modules at the pipeline compute dtype (the registry
        # builders default to f32; fp stacks should run bf16 on the MXU)
        dtype = jnp.dtype((config or PipelineConfig()).compute_dtype)
        um = UNet(config=um.config, dtype=dtype)
        pm = ResNetRegressor(config=pm.config, dtype=dtype)
        ym = YoloDetector(config=ycfg, dtype=dtype)
        return cls(unet=um, unet_vars=uv, resnet=pm, resnet_vars=pv,
                   yolo=ym, yolo_vars=yv, config=config, yolo_config=ycfg,
                   classes=classes,
                   unet_apply=build_apply_fn(um, umeta)
                   if "quant" in umeta else None,
                   resnet_apply=build_apply_fn(pm, pmeta)
                   if "quant" in pmeta else None,
                   yolo_apply=build_apply_fn(ym, ymeta)
                   if "quant" in ymeta else None)

    def _device_fn(self, unet_vars, resnet_vars, yolo_vars, frames_bgr,
                   threshold):
        ow, oh = self.cfg.ipm_output_size
        ih, iw = self.cfg.input_size

        # Shared bird's-eye view for the two lane heads
        small = warp_perspective_mxu(frames_bgr, self.direct_matrix, (iw, ih))
        rgb = small[..., ::-1]
        x = normalize_image(rgb, self.cfg.mean, self.cfg.std,
                            dtype=self.compute_dtype)

        logits = self._unet_apply(unet_vars, x)
        prob = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        binary = (prob > threshold).astype(jnp.uint8) * jnp.uint8(255)
        mask = resize_bilinear_mxu(binary[..., None], (oh, ow))[..., 0]

        points_raw = self._resnet_apply(resnet_vars, x).astype(jnp.float32)

        # YOLO branch on the raw camera frames
        yh, yw = self.ycfg.img_size
        img = letterbox(frames_bgr, (yh, yw))
        yolo_in = img[..., ::-1].astype(jnp.float32) / 255.0
        outs = self._yolo_apply(yolo_vars, yolo_in.astype(self.compute_dtype))
        boxes, scores, cls = decode_detections(
            tuple(outs), img_size=self.ycfg.img_size,
            strides=self.ycfg.strides, bins=self.ycfg.dfl_bins)
        return mask, points_raw, boxes, scores, cls

    # ------------------------------------------------------------------

    def process_batch(self, frames_bgr: np.ndarray,
                      threshold: float | None = None) -> dict:
        """[N, H, W, 3] uint8 BGR -> {masks, points, detections}.

        Default threshold is the pool-calibrated camera-path operating
        point (PipelineConfig.warped_threshold) — this is the same raw
        camera -> warp -> segment path as LaneSegmenter.predict_warped,
        and the two must stay consistent (test_single_program_consistency)."""
        h, w = frames_bgr.shape[1:3]
        thr = jnp.float32(self.cfg.warped_threshold if threshold is None
                          else threshold)
        mask, pts_raw, boxes, scores, cls = self._jitted(
            self.unet_vars, self.resnet_vars, self.yolo_vars,
            jnp.asarray(frames_bgr, jnp.uint8), thr)
        mask = np.asarray(mask)
        pts_raw = np.clip(np.asarray(pts_raw), 0.0, 1.0)
        boxes, scores, cls = (np.asarray(boxes), np.asarray(scores),
                              np.asarray(cls))

        # points -> pixel coords in the bird's-eye frame
        ow, oh = self.cfg.ipm_output_size
        xs = pts_raw * ow
        ys = np.asarray(FIXED_Y_COORDS, np.float32) * (oh / 685.0)
        points = np.stack([xs, np.broadcast_to(ys, xs.shape)], axis=-1)

        # YOLO host NMS + unletterbox
        lb = letterbox_params((h, w), self.ycfg.img_size)
        detections = []
        for i in range(len(frames_bgr)):
            b, c, s = per_class_nms(boxes[i], scores[i], cls[i],
                                    score_thresh=self.ycfg.obj_thresh,
                                    iou_thresh=self.ycfg.nms_thresh)
            if b is not None:
                b = unletterbox_boxes(b, lb)
            detections.append((b, c, s))
        return {"masks": mask, "points": points, "detections": detections}

    def benchmark(self, batch_size: int = 32, num_runs: int = 30,
                  warmup: int = 3) -> dict:
        """Pipelined throughput (num_runs dispatches, one sync) — per-call
        sync would measure the dispatch floor, not the program
        (docs/performance.md)."""
        from lanetpu.utils.timing import device_sync

        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(
            0, 256, (batch_size, 480, 640, 3), dtype=np.uint8))
        thr = jnp.float32(0.5)
        args = (self.unet_vars, self.resnet_vars, self.yolo_vars, frames, thr)
        for _ in range(warmup):
            device_sync(self._jitted(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(num_runs):
            # keep-last-ref: finished batches free their HBM immediately
            out = self._jitted(*args)
        device_sync(out)
        avg = (time.perf_counter() - t0) / num_runs
        return {"batch_size": batch_size, "avg_ms": avg * 1e3,
                "fps": batch_size / avg}
