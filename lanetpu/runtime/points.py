"""Lane-point regression pipelines.

Capability parity with the reference's two point regressors:
  * `LanePointsRegressor(mode="centerline")` — 6 (x, y) centerline points
    (reference src/rknpu_inference.py:18-142; note its deliberate BGR input,
    :35-44 — channel order is an explicit flag here);
  * `LanePointsRegressor(mode="xcoords")` — 4 x-coordinates at fixed
    bird's-eye rows y = [530, 582, 633, 685] scaled to the frame height
    (reference src/resnet50_node.py:96-165).

The device program fuses resize + (optional) channel swap + normalize +
ResNet forward; postprocess (clip, scale to pixels) is a few host flops.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.core.config import ResNetConfig
from lanetpu.models.resnet import FIXED_Y_COORDS, ResNetRegressor
from lanetpu.ops.normalize import normalize_image


class LanePointsRegressor:
    def __init__(self, mode: str = "xcoords", module: ResNetRegressor | None = None,
                 variables: dict | None = None, input_size=(224, 224),
                 bgr_input: bool = False, compute_dtype="bfloat16",
                 rng_seed: int = 0, apply_fn=None):
        assert mode in ("xcoords", "centerline")
        self.mode = mode
        self.num_points = 4 if mode == "xcoords" else 6
        num_outputs = 4 if mode == "xcoords" else 12
        self.module = module or ResNetRegressor(
            config=ResNetConfig(depth=50, num_outputs=num_outputs))
        self.input_size = input_size
        self.bgr_input = bgr_input
        self.compute_dtype = jnp.dtype(compute_dtype)
        # apply_fn(variables, x) overrides module.apply — the hook that runs
        # int8 artifacts (runtime.engine.build_apply_fn) through the same
        # pipeline.
        self._apply = apply_fn or (
            lambda v, x: self.module.apply(v, x, train=False))
        if variables is None:
            h, w = input_size
            variables = self.module.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, h, w, 3), jnp.float32))
        # device-resident weights: loaded checkpoints arrive as host numpy,
        # and passing those as jit args re-uploads them EVERY call (~47 MB
        # per ResNet50 call — seconds over a slow link)
        self.variables = jax.device_put(variables)
        self._jitted = jax.jit(self._forward)

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs):
        """Build from a .ltpu artifact (fp32 or int8-quantized)."""
        from lanetpu.runtime.engine import build_apply_fn, load_engine

        module, variables, meta = load_engine(path)
        mode = meta.get("mode", "xcoords")
        return cls(mode=mode, module=module, variables=variables,
                   apply_fn=build_apply_fn(module, meta), **kwargs)

    def _forward(self, variables, frames: jnp.ndarray) -> jnp.ndarray:
        # variables as a jit ARG (closed-over device arrays get fetched to
        # host at lowering to become constants — slow and bloaty).
        # MXU matmul resize on the hot path (gathers are ~60x slower on
        # TPU); agrees with the cv2-parity gather resize within 2 LSB.
        from lanetpu.kernels.resample import resize_bilinear_mxu

        x = resize_bilinear_mxu(frames, self.input_size)
        if self.bgr_input:
            x = x[..., ::-1]
        x = normalize_image(x, dtype=self.compute_dtype)
        out = self._apply(variables, x)
        return out.astype(jnp.float32)

    def inference_batch(self, frames: np.ndarray):
        """[N, H, W, 3] uint8 -> [N, num_points, 2] pixel coordinates."""
        h, w = frames.shape[1:3]
        raw = np.asarray(self._jitted(self.variables,
                                      jnp.asarray(frames, dtype=jnp.uint8)))
        raw = np.clip(raw, 0.0, 1.0)  # reference rknpu_inference.py:81
        if self.mode == "centerline":
            pts = raw.reshape(-1, self.num_points, 2).copy()
            pts[..., 0] *= w
            pts[..., 1] *= h
            return pts
        # xcoords: combine with fixed rows scaled by frame height
        # (reference src/resnet50_node.py:153-165).
        xs = raw * w
        ys = np.asarray(FIXED_Y_COORDS, dtype=np.float32) * (h / 685.0)
        pts = np.stack([xs, np.broadcast_to(ys, xs.shape)], axis=-1)
        return pts

    def inference(self, image: np.ndarray):
        """Single frame -> (points [num_points, 2], inference_time).

        Contract parity with reference src/rknpu_inference.py:114-142 /
        src/resnet50_node.py benchmark path.
        """
        t0 = time.perf_counter()
        pts = self.inference_batch(image[None])[0]
        return pts, time.perf_counter() - t0

    def benchmark(self, test_iterations: int = 100, batch_size: int = 32) -> dict:
        """Random-input throughput test (reference src/resnet50_node.py:344-380)."""
        rng = np.random.default_rng(0)
        batch = rng.integers(0, 256, size=(batch_size, 685, 1055, 3), dtype=np.uint8)
        from lanetpu.utils.timing import device_sync

        x = jnp.asarray(batch)
        for _ in range(10):
            device_sync(self._jitted(self.variables, x))
        times = []
        for _ in range(test_iterations):
            t0 = time.perf_counter()
            device_sync(self._jitted(self.variables, x))
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)
        return {
            "batch_size": batch_size,
            "avg_ms": float(times.mean() * 1e3),
            "std_ms": float(times.std() * 1e3),
            "min_ms": float(times.min() * 1e3),
            "max_ms": float(times.max() * 1e3),
            "fps": float(batch_size / times.mean()),
        }

    def release(self):
        self.variables = None
