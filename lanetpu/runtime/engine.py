"""Executor layer: backend-agnostic `.run()` engines.

Parity target: the reference's three executors behind one interface —
`Container(model_path).run(inputs: list[np.ndarray]) -> list[np.ndarray]`
plus `.release()` (reference src/py_utils/rknn_executor.py:26-42,
onnx_executor.py:69-75, pytorch_executor.py:24-52), selected by file
extension (src/yolo_detector.py:223-238).

Here the "backends" are XLA compilation targets of the *same* Flax model:
  * ``tpu``  — bf16 compute on the TPU (the production path; the analogue of
               the RKNN/NPU backend),
  * ``cpu``  — f32 on the host CPU (the parity/CI reference, analogue of the
               ONNX CPUExecutionProvider path and the RKNN simulator mode in
               rknn_executor.py:12-15),
  * ``fp32`` — f32 on the default device (the "golden" path, analogue of the
               TorchScript fp32 executor),
  * ``int8`` — quantized path (see lanetpu.quant).

Model artifacts are flax msgpack checkpoints (``.msgpack``) with a small
JSON header describing the architecture, produced by `save_checkpoint`.
"""

from __future__ import annotations

import json
import struct
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

MAGIC = b"LTPU"


# ---------------------------------------------------------------------------
# Checkpoint container format
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, variables: dict, meta: dict,
                    codec: str | None = None) -> None:
    """Write a model artifact: MAGIC | u32 header_len | json header | msgpack.

    `meta` identifies the architecture (e.g. {"arch": "unet",
    "features": [32, 64, 128], ...}) so `load_engine` can rebuild the module.
    This replaces the reference's opaque .rknn blobs (src/py_utils/
    rknn_executor.py:9) with a self-describing container.

    ``codec="zlib"`` compresses the msgpack payload (recorded in the header
    so `load_checkpoint` is transparent) — used by deploy-tier artifacts
    where size on disk is the point (reference ships a 2.29 MB int8 blob vs
    ~120 MB fp32, README.md:1497-1499).
    """
    if codec not in (None, "zlib"):
        raise ValueError(f"unknown payload codec {codec!r}")
    payload = serialization.to_bytes(variables)
    if codec == "zlib":
        import zlib

        meta = dict(meta, codec="zlib")
        payload = zlib.compress(payload, 6)
    header = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)


def load_meta(path: str) -> dict:
    """Read ONLY the JSON header of an artifact — no variable
    deserialization (dispatch decisions shouldn't pay a full model load)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a lanetpu checkpoint")
        (hlen,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(hlen).decode("utf-8"))


def load_checkpoint(path: str, template: dict | None = None):
    """Read (meta, variables) from a model artifact."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a lanetpu checkpoint")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        payload = f.read()
    if meta.get("codec") == "zlib":
        import zlib

        payload = zlib.decompress(payload)
    if template is not None:
        variables = serialization.from_bytes(template, payload)
    else:
        variables = serialization.msgpack_restore(payload)
    return meta, variables


# ---------------------------------------------------------------------------
# Engines
# ---------------------------------------------------------------------------


def adapt_input(x, target_shape=None, target_dtype=None):
    """Coerce a host array toward an expected input signature.

    Parity with the reference ONNX executor's robustness shims
    (src/py_utils/onnx_executor.py:5-27, :53-66): dtype coercion via a type
    map and shape repair that ignores size-1 dims (so [H, W, C] vs
    [1, H, W, C] vs [1, 1, H, W, C] all land on the engine's signature).
    """
    x = np.asarray(x)
    if target_dtype is not None:
        x = x.astype(target_dtype, copy=False)
    if target_shape is not None and tuple(x.shape) != tuple(target_shape):
        core = [d for d in x.shape if d != 1]
        core_t = [d for d in target_shape if d != 1]
        if core == core_t:
            x = x.reshape(target_shape)
        else:
            raise ValueError(
                f"input shape {x.shape} incompatible with {target_shape}")
    return x


class Engine:
    """Backend-agnostic executor interface (reference rknn_executor.py:26-42)."""

    def run(self, inputs: Sequence[np.ndarray]) -> list:
        raise NotImplementedError

    def release(self) -> None:
        pass


class XLAEngine(Engine):
    """A jit-compiled Flax forward as an executor.

    `apply_fn(variables, *inputs)` is traced once per input shape/dtype and
    cached; `.run()` accepts host numpy arrays and returns host numpy arrays,
    mirroring the reference executors' contract. Prefer the higher-level
    pipelines (LaneSegmenter etc.) in hot loops — they keep data on device.
    """

    def __init__(self, apply_fn: Callable, variables: dict,
                 backend: str = "tpu", compute_dtype=jnp.float32):
        self.backend = backend
        self.compute_dtype = compute_dtype
        devices = jax.devices("cpu") if backend == "cpu" else jax.devices()
        self.device = devices[0]
        self._variables = jax.device_put(variables, self.device)
        self._jitted = jax.jit(apply_fn)

    def run(self, inputs: Sequence[np.ndarray]) -> list:
        dev_inputs = [jax.device_put(np.asarray(x), self.device) for x in inputs]
        out = self._jitted(self._variables, *dev_inputs)
        leaves = jax.tree_util.tree_leaves(out)
        return [np.asarray(x) for x in leaves]

    def release(self) -> None:
        self._variables = None


_ARCH_BUILDERS: dict[str, Callable] = {}


def register_arch(name: str):
    def deco(fn):
        _ARCH_BUILDERS[name] = fn
        return fn
    return deco


@register_arch("unet")
def _build_unet(meta: dict):
    from lanetpu.core.config import UNetConfig
    from lanetpu.models.unet import UNet

    cfg = UNetConfig(
        in_channels=meta.get("in_channels", 3),
        out_channels=meta.get("out_channels", 1),
        features=tuple(meta.get("features", (32, 64, 128))),
        final_sigmoid=meta.get("final_sigmoid", False),
        s2d=meta.get("s2d", 1),
    )
    return UNet(config=cfg)


@register_arch("resnet_regressor")
def _build_resnet(meta: dict):
    from lanetpu.core.config import ResNetConfig
    from lanetpu.models.resnet import ResNetRegressor

    cfg = ResNetConfig(
        depth=meta.get("depth", 50),
        num_outputs=meta.get("num_outputs", 4),
    )
    return ResNetRegressor(config=cfg)


@register_arch("yolo")
def _build_yolo(meta: dict):
    from lanetpu.core.config import YoloConfig
    from lanetpu.models.yolo import YoloDetector

    cfg = YoloConfig(
        num_classes=meta.get("num_classes", 12),
        img_size=tuple(meta.get("img_size", (640, 640))),
        width_mult=meta.get("width_mult", 0.25),
        depth_mult=meta.get("depth_mult", 0.33),
    )
    return YoloDetector(config=cfg)


def load_engine(model_path: str, backend: str = "tpu") -> tuple:
    """Load a checkpoint and build (module, variables, meta).

    The extension-dispatch analogue of the reference's setup_model
    (src/yolo_detector.py:223-238), except the artifact is self-describing.
    `backend="cpu"` places the variables on the host CPU device (the
    simulator-mode analogue); otherwise they go to the default device.

    For int8 artifacts (meta["quant"] present, written by
    save_quantized_checkpoint) `variables` is the {"fp": ..., "q": ...}
    bundle consumed by the apply fn from `build_apply_fn`.
    """
    meta, variables = load_checkpoint(model_path)
    arch = meta.get("arch")
    if arch not in _ARCH_BUILDERS:
        raise ValueError(f"unknown arch {arch!r} in {model_path}")
    module = _ARCH_BUILDERS[arch](meta)
    if backend == "cpu":
        variables = jax.device_put(variables, jax.devices("cpu")[0])
    return module, variables, meta


def save_quantized_checkpoint(path: str, base_meta: dict, fp_variables: dict,
                              qarrays: dict, act_qp: dict,
                              mode: str = "int8",
                              parity: dict | None = None,
                              deploy: bool = False) -> None:
    """Write an int8 model artifact (the deployed-.rknn-blob analogue,
    reference .MISSING_LARGE_BLOBS:1-8). The container carries the fp
    variables (golden path), int8 weights, and the activation quant params;
    `load_engine` + `build_apply_fn` reconstruct the int8 program.

    ``deploy=True`` writes the deployment tier: the fp kernels/biases of
    every quantized layer are stripped (the int8 program never reads them —
    interception replaces those calls outright) and the payload is
    zlib-compressed, so the artifact is a fraction of the fp twin — the
    size-is-the-point property of the reference's 2.29 MB .rknn blob
    (README.md:1497-1499, :4273). Deploy artifacts cannot run the fp
    golden path; keep the non-deploy twin for that.
    """
    meta = dict(base_meta)
    meta["quant"] = {
        "mode": mode,
        "act_qp": {p: [float(s), int(z)] for p, (s, z) in act_qp.items()},
    }
    if parity is not None:
        meta["quant"]["parity"] = parity
    if deploy:
        meta["quant"]["deploy"] = True
        fp_variables = strip_quantized_fp(fp_variables, qarrays)
        save_checkpoint(path, {"fp": fp_variables, "q": qarrays}, meta,
                        codec="zlib")
    else:
        save_checkpoint(path, {"fp": fp_variables, "q": qarrays}, meta)


def strip_quantized_fp(fp_variables: dict, qarrays: dict) -> dict:
    """Return a copy of the fp variables with the kernel/bias of every
    quantized layer replaced by empty sentinels.

    Those arrays are dead weight in an int8 artifact: `make_quantized_forward`
    intercepts the Conv/Dense call before its body runs, so `self.param`
    is never invoked for quantized layers. BatchNorm params/stats and any
    non-quantized layer are kept intact. A sentinel (empty array) rather
    than deletion keeps the tree structure self-describing — and makes any
    accidental fp use fail loudly on shape."""
    variables = serialization.to_state_dict(fp_variables)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    empty = np.zeros((0,), np.float32)
    for path in qarrays:
        node = variables["params"]
        for part in path.split("/") if path else ():
            node = node[part]
        for name in ("kernel", "bias"):
            if name in node:
                node[name] = empty
    return variables


def make_deploy_artifact(src_path: str, dst_path: str) -> dict:
    """Convert a full int8 artifact into its deploy tier (strip + compress).

    Pure container surgery — no calibration, no forward pass; the int8
    program and its parity metadata are unchanged. Returns the new meta."""
    meta, variables = load_checkpoint(src_path)
    if "quant" not in meta:
        raise ValueError(f"{src_path}: not a quantized artifact")
    if meta["quant"].get("deploy"):
        raise ValueError(f"{src_path}: already a deploy artifact")
    meta = dict(meta, quant=dict(meta["quant"], deploy=True))
    meta.pop("codec", None)  # save_checkpoint re-adds it for the new payload
    fp = strip_quantized_fp(variables["fp"], variables["q"])
    save_checkpoint(dst_path, {"fp": fp, "q": variables["q"]}, meta,
                    codec="zlib")
    return meta


def build_apply_fn(module, meta: dict) -> Callable:
    """apply_fn(variables, x) for a checkpoint, honoring int8 quant metadata.

    fp artifacts:    variables are the plain Flax variables.
    int8 artifacts:  variables are the {"fp", "q"} bundle; every Conv/Dense
                     runs as a true int8 MXU op (lanetpu.quant.generic).
    """
    if "quant" in meta:
        from lanetpu.quant.generic import make_quantized_forward

        act_qp = {p: (float(s), int(z))
                  for p, (s, z) in meta["quant"]["act_qp"].items()}
        base = lambda v, x: module.apply(v, x, train=False)  # noqa: E731
        return make_quantized_forward(base, act_qp,
                                      mode=meta["quant"].get("mode", "int8"))
    return lambda v, x: module.apply(v, x, train=False)


class Stopwatch:
    """Per-stage wall-clock profiler (README.md:4425-4450 PerformanceProfiler)."""

    def __init__(self):
        self.stages: dict[str, list] = {}

    def measure(self, name: str):
        sw = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                sw.stages.setdefault(name, []).append(time.perf_counter() - self.t0)

        return _Ctx()

    def summary(self) -> dict:
        return {
            k: {"mean_ms": float(np.mean(v) * 1e3),
                "p50_ms": float(np.percentile(v, 50) * 1e3),
                "p99_ms": float(np.percentile(v, 99) * 1e3),
                "count": len(v)}
            for k, v in self.stages.items()
        }
