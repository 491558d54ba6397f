"""Lane-segmentation inference pipelines.

Capability parity with `RKNNLaneInference` (reference src/unet.py:14-156) and
the streaming node's per-frame path (src/unet_ros_node.py:292-338), designed
TPU-first: instead of host-OpenCV pre/postprocessing around a single device
call, the *entire* frame->mask chain — optional IPM warp, resize to 224x224,
normalize, U-Net, sigmoid, threshold, resize back — is one jitted XLA
program, batched over frames.

Two entry pipelines:
  * `LaneSegmenter.predict(frame)`           — RGB frame -> binary mask
    (parity with src/unet.py:74-97)
  * `LaneSegmenter.predict_warped(frame_bgr)`— raw BGR camera frame ->
    IPM-warped bird's-eye mask (parity with the full callback chain
    src/unet_ros_node.py:292-321: warp -> BGR->RGB -> predict)
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.core.config import PipelineConfig, UNetConfig
from lanetpu.kernels.resample import (
    compose_warp_to,
    resize_bilinear_mxu,
    warp_perspective_mxu,
)
from lanetpu.models.unet import UNet
from lanetpu.ops.normalize import normalize_image
from lanetpu.ops.resize import resize_bilinear
from lanetpu.ops.warp import get_perspective_transform, warp_perspective


class LaneSegmenter:
    """Batched lane segmentation engine around a Flax U-Net."""

    def __init__(self, module: UNet | None = None, variables: dict | None = None,
                 config: PipelineConfig | None = None, rng_seed: int = 0,
                 forward_fn=None, fold_bn: bool | None = None):
        """`forward_fn(variables, x_normalized) -> logits/probs [N,h,w,1]`
        overrides the Flax forward — used to plug in the int8 quantized
        model (quant.calibrate.QuantizedUNet.forward) or any custom engine
        while keeping the fused pre/post pipeline.

        fold_bn (default from config): fold BatchNorm into the conv
        weights at load time and run the functional folded forward — the
        same transform the RKNN compiler applies to the deployed graphs
        (14 plain ConvRelu ops, SURVEY.md §2.1 #18). Measured ~7% pipeline
        throughput over Flax-with-BN at identical outputs (f32-exact
        algebra; docs/performance.md)."""
        self.cfg = config or PipelineConfig()
        self.module = module or UNet(config=UNetConfig.deployed())
        self.forward_fn = forward_fn
        if variables is None:
            h, w = self.cfg.input_size
            variables = self.module.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, h, w, 3), jnp.float32)
            )
        if self.cfg.backend == "cpu":
            self.device = jax.devices("cpu")[0]
        else:
            self.device = jax.devices()[0]
        self.compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        fold = getattr(self.cfg, "fold_bn", True) if fold_bn is None else fold_bn
        already_folded = (isinstance(variables, dict) and "head" in variables
                          and "params" not in variables)
        if forward_fn is None and (fold or already_folded):
            from lanetpu.quant.fold import fold_unet_batchnorm
            from lanetpu.quant.functional_unet import unet_forward_folded

            if already_folded:
                folded = variables  # a folded dict passed back in
            elif isinstance(variables, dict) and "batch_stats" in variables:
                folded = fold_unet_batchnorm(jax.device_get(variables),
                                             self.module.config.features)
            else:
                folded = None
            if folded is not None:
                kdtype = self.compute_dtype
                variables = {k: {"kernel": jnp.asarray(v["kernel"], kdtype),
                                 "bias": jnp.asarray(v["bias"], jnp.float32)}
                             for k, v in folded.items()}
                feats = self.module.config.features
                sig = self.module.config.final_sigmoid
                s2d = getattr(self.module.config, "s2d", 1)
                self.forward_fn = lambda v, x: unet_forward_folded(
                    v, x, feats, final_sigmoid=sig, s2d=s2d)
                self._folded_emits_prob = sig
        self.variables = jax.device_put(variables, self.device)
        # IPM homography, computed once on the host
        # (reference src/unet_ros_node.py:255).
        self.ipm_matrix = get_perspective_transform(
            self.cfg.ipm_src_points, self.cfg.ipm_dst_points
        )
        # Composed camera->model-input homography for the fast path: one
        # MXU warp replaces the reference's warp -> resize chain.
        self.direct_matrix = compose_warp_to(
            self.ipm_matrix, self.cfg.ipm_output_size, self.cfg.input_size)
        self._jit_cache: dict[tuple, Any] = {}

    @property
    def _mxu(self) -> bool:
        """Use MXU matmul resampling (the TPU hot path). Gather resampling
        remains the cv2-parity reference (cpu backend)."""
        return self.cfg.use_mxu_resample

    def _resize(self, img, out_hw):
        if self._mxu:
            return resize_bilinear_mxu(img, out_hw)
        return resize_bilinear(img, out_hw)

    # ------------------------------------------------------------------
    # Fused device programs
    # ------------------------------------------------------------------

    def _apply_model(self, variables, x_normalized: jnp.ndarray) -> jnp.ndarray:
        """Normalized [N, h, w, C] -> [N, h, w] probabilities.

        `variables` is threaded through as a jit ARGUMENT everywhere —
        closing over device arrays makes jax fetch them back to the host at
        lowering time to embed as constants (minutes over a slow tunnel,
        and a program-size bloat on any backend).
        """
        if self.forward_fn is not None:
            logits = self.forward_fn(variables, x_normalized)
            emits_prob = getattr(self, "_folded_emits_prob", False)
        else:
            logits = self.module.apply(variables, x_normalized, train=False)
            emits_prob = self.module.config.final_sigmoid
        prob = logits[..., 0].astype(jnp.float32)
        if self.cfg.apply_sigmoid and not emits_prob:
            prob = jax.nn.sigmoid(prob)
        return prob

    def _forward_prob(self, variables, frames_rgb: jnp.ndarray) -> jnp.ndarray:
        """[N, h, w, 3] uint8 RGB -> [N, 224, 224] probabilities."""
        ih, iw = self.cfg.input_size
        x = self._resize(frames_rgb, (ih, iw))
        x = normalize_image(x, self.cfg.mean, self.cfg.std,
                            dtype=self.compute_dtype)
        return self._apply_model(variables, x)

    @classmethod
    def from_quantized(cls, quantized, config: PipelineConfig | None = None,
                       mode: str = "int8"):
        """Build a pipeline around an int8 QuantizedUNet artifact (the
        deployment analogue of loading a .rknn blob)."""
        from lanetpu.core.config import UNetConfig as _UC

        cfg = config or PipelineConfig()
        module = UNet(config=_UC(features=tuple(quantized.features)))
        seg = cls(module=module, config=cfg,
                  forward_fn=lambda _v, x: quantized.forward(
                      x.astype(jnp.float32), mode=mode))
        return seg

    def _predict_fn(self, variables, frames_rgb, threshold):
        """uint8 RGB frames -> uint8 {0..255} masks at input resolution.

        Threshold-then-resize, matching reference src/unet.py:63-70 (the
        224x224 binary mask is bilinearly resized back, so edge pixels take
        intermediate values exactly as cv2.resize produces).
        """
        h, w = frames_rgb.shape[1:3]
        prob = self._forward_prob(variables, frames_rgb)
        binary = (prob > threshold).astype(jnp.uint8) * jnp.uint8(255)
        return self._resize(binary[..., None], (h, w))[..., 0]

    def _predict_warped_fn(self, variables, frames_bgr, threshold):
        """Raw BGR camera frames -> bird's-eye binary masks.

        Fuses the reference's host chain (src/unet_ros_node.py:300-313):
        IPM warp, BGR->RGB, segment — one XLA launch. On the MXU path the
        camera frame warps DIRECTLY to the 224x224 model input through the
        composed homography (one resampling); the gather path replicates
        the reference's warp-to-1055x685-then-resize chain exactly.
        """
        ow, oh = self.cfg.ipm_output_size
        ih, iw = self.cfg.input_size
        if self._mxu:
            if self.cfg.warp_impl == "pallas":
                from lanetpu.kernels.warp_pallas import warp_perspective_pallas

                small = warp_perspective_pallas(
                    frames_bgr, self.direct_matrix, (iw, ih),
                    compute_dtype=self.compute_dtype)
            else:
                small = warp_perspective_mxu(frames_bgr, self.direct_matrix,
                                             (iw, ih))
            rgb = small[..., ::-1]
            x = normalize_image(rgb, self.cfg.mean, self.cfg.std,
                                dtype=self.compute_dtype)
            prob = self._apply_model(variables, x)
        else:
            warped = warp_perspective(frames_bgr, self.ipm_matrix, (ow, oh))
            rgb = warped[..., ::-1]
            prob = self._forward_prob(variables, rgb)
        binary = (prob > threshold).astype(jnp.uint8) * jnp.uint8(255)
        return self._resize(binary[..., None], (oh, ow))[..., 0]

    def _predict_warped_nv12_fn(self, variables, nv12_buf, threshold):
        """Packed NV12 camera buffers [N, 3H/2, W] uint8 -> bird's-eye
        binary masks. Camera-native ingest (VERDICT r4 item 5): the host
        ships 1.5 B/px 4:2:0 planes — HALF the RGB ingest bandwidth — and
        the BT.601 decode fuses into the device program ahead of the IPM
        warp (ops.yuv; the reference converts host-side upstream of
        /image_rect_color, SURVEY.md §3.1). The decode emits RGB, so the
        BGR flip of the byte-camera path is skipped."""
        from lanetpu.ops.yuv import nv12_to_rgb, nv12_unpack

        rgb = nv12_to_rgb(*nv12_unpack(nv12_buf))
        # reuse the warped chain; its input convention is BGR, and the
        # two channel flips fuse to nothing under XLA
        return self._predict_warped_fn(variables, rgb[..., ::-1], threshold)

    def _get_jitted(self, kind: str):
        """Jitted fn(variables, frames, threshold) for each pipeline kind."""
        fn = self._jit_cache.get(kind)
        if fn is None:
            raw = {"plain": self._predict_fn,
                   "warped": self._predict_warped_fn,
                   "warped_nv12": self._predict_warped_nv12_fn,
                   "prob": lambda v, f, t: self._forward_prob(v, f)}[kind]
            fn = jax.jit(raw)
            self._jit_cache[kind] = fn
        return fn

    # ------------------------------------------------------------------
    # Public API (parity with RKNNLaneInference)
    # ------------------------------------------------------------------

    def predict_batch(self, frames_rgb: np.ndarray, threshold: float | None = None,
                      warped_input: bool = False) -> np.ndarray:
        """[N, H, W, 3] uint8 frames -> [N, H, W] uint8 masks (device-batched).

        Default threshold follows the entry point's operating point: the
        camera path (warped_input=True — same program as predict_warped)
        uses the pool-calibrated cfg.warped_threshold, the bird's-eye /
        offline path uses cfg.threshold."""
        if threshold is None:
            threshold = (self.cfg.warped_threshold if warped_input
                         else self.cfg.threshold)
        kind = "warped" if warped_input else "plain"
        fn = self._get_jitted(kind)
        x = jax.device_put(jnp.asarray(frames_rgb, dtype=jnp.uint8), self.device)
        out = fn(self.variables, x, jnp.float32(threshold))
        if warped_input:
            # output is already in the bird's-eye frame
            pass
        return np.asarray(out)

    def predict(self, image, threshold: float | None = None,
                safe: bool = False):
        """Single RGB frame (or path) -> (mask, inference_time).

        Contract parity with reference src/unet.py:74-97: accepts an image
        path or array, returns a uint8 mask at the input resolution and the
        wall-clock device time. With `safe=True`, inference errors return a
        zero mask instead of raising (the reference's defensive fallback,
        src/unet.py:85-98).
        """
        if isinstance(image, str):
            image = _imread_rgb(image)
        t0 = time.perf_counter()
        try:
            mask = self.predict_batch(image[None], threshold)[0]
        except Exception as e:  # noqa: BLE001 — parity: degrade, don't crash
            if not safe:
                raise
            import logging

            logging.getLogger("lanetpu").error("inference error: %s", e)
            return (np.zeros(image.shape[:2], dtype=np.uint8),
                    time.perf_counter() - t0)
        dt = time.perf_counter() - t0
        return mask, dt

    def predict_warped(self, frame_bgr: np.ndarray, threshold: float | None = None):
        """Raw BGR camera frame -> (bird's-eye mask, time). One device
        launch. Default threshold is the pool-calibrated camera-path
        operating point (PipelineConfig.warped_threshold), not the
        bird's-eye default — see the config field's rationale."""
        threshold = (self.cfg.warped_threshold if threshold is None
                     else threshold)
        fn = self._get_jitted("warped")
        t0 = time.perf_counter()
        x = jax.device_put(jnp.asarray(frame_bgr[None], dtype=jnp.uint8), self.device)
        out = np.asarray(fn(self.variables, x, jnp.float32(threshold))[0])
        return out, time.perf_counter() - t0

    def predict_warped_nv12_batch(self, nv12_buf: np.ndarray,
                                  threshold: float | None = None) -> np.ndarray:
        """[N, 3H/2, W] packed NV12 uint8 camera buffers -> [N, oh, ow]
        uint8 bird's-eye masks, one device launch (camera-native ingest at
        1.5 B/px; see _predict_warped_nv12_fn)."""
        threshold = (self.cfg.warped_threshold if threshold is None
                     else threshold)
        fn = self._get_jitted("warped_nv12")
        x = jax.device_put(jnp.asarray(nv12_buf, dtype=jnp.uint8), self.device)
        return np.asarray(fn(self.variables, x, jnp.float32(threshold)))

    def predict_prob(self, frames_rgb: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] uint8 -> [N, 224, 224] float probabilities."""
        fn = self._get_jitted("prob")
        x = jax.device_put(jnp.asarray(frames_rgb, dtype=jnp.uint8), self.device)
        return np.asarray(fn(self.variables, x, jnp.float32(0.5)))

    # ------------------------------------------------------------------
    # Video / benchmark (parity with src/unet.py:99-188)
    # ------------------------------------------------------------------

    def predict_video(self, video_path: str, output_path: str,
                      threshold: float | None = None, batch_size: int | None = None):
        """Segment a video file, writing a JET-overlay result video.

        Batched equivalent of reference src/unet.py:99-146.
        Requires OpenCV for codec I/O (gated import).
        """
        import cv2

        bs = batch_size or self.cfg.batch_size
        cap = cv2.VideoCapture(video_path)
        fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
        width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        out = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (width, height))
        frame_count, total_time = 0, 0.0
        done = False
        while not done:
            frames = []
            for _ in range(bs):
                ret, frame = cap.read()
                if not ret:
                    done = True
                    break
                frames.append(frame)
            if not frames:
                break
            batch = np.stack(frames)[..., ::-1]  # BGR -> RGB
            t0 = time.perf_counter()
            masks = self.predict_batch(batch, threshold)
            total_time += time.perf_counter() - t0
            for frame, mask in zip(frames, masks):
                colored = cv2.applyColorMap(mask, cv2.COLORMAP_JET)
                result = cv2.addWeighted(frame, 0.7, colored, 0.3, 0)
                out.write(result)
                frame_count += 1
            if frame_count % 30 < bs:
                print(f"Processed {frame_count} frames, "
                      f"avg FPS: {frame_count / max(total_time, 1e-9):.1f}")
        cap.release()
        out.release()
        fps_avg = frame_count / max(total_time, 1e-9)
        print(f"Video done. Average FPS: {fps_avg:.1f}")
        return fps_avg

    def benchmark(self, batch_size: int | None = None, num_runs: int = 100,
                  warmup: int = 10, warped: bool = False, image=None) -> dict:
        """Throughput benchmark (reference src/unet.py:152-188: 10 warmup +
        100 timed runs, avg/std/min/max + FPS), batched."""
        bs = batch_size or self.cfg.batch_size
        if image is None:
            if warped:
                shape = (bs, 480, 640, 3)
            else:
                oh, ow = 685, 1055
                shape = (bs, oh, ow, 3)
            rng = np.random.default_rng(0)
            batch = rng.integers(0, 256, size=shape, dtype=np.uint8)
        else:
            batch = np.broadcast_to(image, (bs,) + image.shape).copy()
        from lanetpu.utils.timing import time_fn

        fn = self._get_jitted("warped" if warped else "plain")
        thr = jnp.float32(self.cfg.warped_threshold if warped
                          else self.cfg.threshold)
        x = jax.device_put(jnp.asarray(batch), self.device)
        stats = time_fn(fn, self.variables, x, thr, warmup=warmup, runs=num_runs)
        stats["batch_size"] = bs
        stats["fps"] = float(bs / (stats["avg_ms"] / 1e3))
        return stats

    def release(self):
        self.variables = None
        self._jit_cache.clear()


def _imread_rgb(path: str) -> np.ndarray:
    """Read an image file as RGB uint8 (PIL; cv2 fallback)."""
    try:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError:
        import cv2

        return cv2.imread(path)[..., ::-1]
