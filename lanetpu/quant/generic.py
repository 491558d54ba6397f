"""Model-agnostic int8 quantization via Flax method interception.

Generalizes the U-Net-specific quantization path (`quant/functional_unet.py`
+ `quant/calibrate.py`) to ANY Flax model: every `nn.Conv` / `nn.Dense` call
is intercepted (`flax.linen.intercept_methods`) and replaced by a true-int8
equivalent — int8 x int8 -> int32 MXU accumulation with asymmetric
zero-point correction — while BatchNorm / activations / pooling stay fp and
XLA fuses them into the surrounding ops.

This is the capability analogue of the reference deploying *every* model
family as an int8 NPU blob (reference .MISSING_LARGE_BLOBS:1-8 — fp.rknn,
resnet50.rknn, 806.rknn — all loaded through the same
src/py_utils/rknn_executor.py:9 path). Quantization semantics match the
documented RKNN conversion flow (reference README.md:3079-3202):
per-tensor asymmetric int8 activations, per-output-channel symmetric int8
weights, calibration over representative images.

Three execution modes (same contract as the folded U-Net path):
  * ``fp``        — interception disabled; the original fp forward;
  * ``fakequant`` — fp convs over dequantized int8 weights + fake-quantized
                    activations: the accuracy semantics of the int8 graph
                    with fp arithmetic (RKNN-simulator analogue, reference
                    src/py_utils/rknn_executor.py:12-15);
  * ``int8``      — true int8 convs: quantize at the layer boundary, pad
                    with the zero-point (so border taps see exact zeros
                    after dequant), accumulate int32, requantize via
                    (acc - z_x * sum(w_q)) * s_x * s_w + b.

Usage:
    forward = lambda v, x: module.apply(v, x, train=False)
    ranges  = collect_ranges(forward, variables, calib_batches)
    qarrays, act_qp = quantize_variables(variables, ranges)
    qfwd    = make_quantized_forward(forward, act_qp, mode="int8")
    out     = jax.jit(qfwd)({"fp": variables, "q": qarrays}, x)

The int8 weight arrays ride the variables bundle as jit ARGUMENTS (never
closed over — closed-over device arrays are fetched to host at lowering);
the scalar act_qp scales/zero-points are compile-time constants.
"""

from __future__ import annotations

from typing import Callable, Iterable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lanetpu.quant.qtensor import (
    asymmetric_qparams,
    quantize_symmetric_per_channel,
)

__all__ = [
    "collect_ranges",
    "quantize_variables",
    "make_quantized_forward",
    "quantize_forward",
]


# ---------------------------------------------------------------------------
# Interception plumbing
# ---------------------------------------------------------------------------


def _path_of(mod: nn.Module) -> str:
    return "/".join(mod.path)


def _is_quantizable(mod: nn.Module, method_name: str) -> bool:
    if method_name != "__call__":
        return False
    if isinstance(mod, nn.Dense):
        return True
    if isinstance(mod, nn.ConvTranspose):
        # Non-overlapping (kernel == stride) transposed convs — the only
        # kind in this zoo (U-Net up0..2, k=2 s=2) — quantize exactly as an
        # int8 matmul + depth-to-space (see _int8_conv_transpose). Other
        # geometries stay fp.
        k = tuple(mod.kernel_size)
        s = mod.strides if mod.strides is not None else k
        s = (s, s) if isinstance(s, int) else tuple(s)
        return k == s
    if isinstance(mod, nn.Conv):
        # Grouped / dilated convs are left fp (none in this model zoo).
        if getattr(mod, "feature_group_count", 1) != 1:
            return False
        kd = getattr(mod, "kernel_dilation", 1) or 1
        if isinstance(kd, (tuple, list)) and any(d != 1 for d in kd):
            return False
        if isinstance(kd, int) and kd != 1:
            return False
        return True
    return False


def _conv_geometry(mod: nn.Conv, in_shape):
    """Resolve (strides, explicit pads) for an NHWC conv, matching
    flax/lax SAME semantics (pad_total = (ceil(in/s)-1)*s + k - in)."""
    kh, kw = mod.kernel_size
    s = mod.strides if mod.strides is not None else 1
    sh, sw = (s, s) if isinstance(s, int) else tuple(s)
    pad = mod.padding

    def same_pad(n, k, s_):
        out = -(-n // s_)
        total = max((out - 1) * s_ + k - n, 0)
        return (total // 2, total - total // 2)

    if isinstance(pad, str):
        p = pad.upper()
        if p == "VALID":
            pads = ((0, 0), (0, 0))
        elif p == "SAME":
            pads = (same_pad(in_shape[1], kh, sh), same_pad(in_shape[2], kw, sw))
        else:
            raise NotImplementedError(f"int8 conv: padding {pad!r}")
    elif isinstance(pad, int):
        pads = ((pad, pad), (pad, pad))
    else:
        pads = tuple((p_, p_) if isinstance(p_, int) else tuple(p_)
                     for p_ in pad)
    return (sh, sw), pads


def _quantize_act(x, scale: float, zp: int):
    q = jnp.round(x.astype(jnp.float32) / jnp.float32(scale)) + zp
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def _int8_conv(mod: nn.Conv, x, q, scale: float, zp: int):
    strides, pads = _conv_geometry(mod, x.shape)
    xq = _quantize_act(x, scale, zp)
    if any(p for pair in pads for p in pair):
        # Asymmetric-quant border: int8 zeros dequantize to -zp*scale; pad
        # with the zero-point so padded taps see exact 0 input.
        xq = jnp.pad(xq, ((0, 0), pads[0], pads[1], (0, 0)),
                     constant_values=np.int8(zp))
    acc = lax.conv_general_dilated(
        xq, q["wq"], strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    corr = q["w_sum"].astype(jnp.int32) * jnp.int32(zp)
    requant = jnp.float32(scale) * q["w_scale"].reshape(1, 1, 1, -1)
    y = (acc - corr).astype(jnp.float32) * requant
    return y + q["bias"]


def _int8_dense(mod: nn.Dense, x, q, scale: float, zp: int):
    xq = _quantize_act(x, scale, zp)
    acc = lax.dot_general(
        xq, q["wq"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    corr = q["w_sum"].astype(jnp.int32) * jnp.int32(zp)
    requant = jnp.float32(scale) * q["w_scale"]
    return (acc - corr).astype(jnp.float32) * requant + q["bias"]


def _conv_transpose_core(xq, wq, out_dtype):
    """Shared geometry of the k==s transposed conv: every input pixel emits
    one (kh, kw) output block, so the op is a single contraction over Cin —
    [N,H,W,Cin] x [kh,kw,Cin,Cout] -> [N,H,W,kh,kw,Cout] — followed by
    depth-to-space. On TPU this is one MXU matmul (vs a lhs-dilated conv
    whose inserted zeros waste MXU lanes). Callers pass the kernel
    spatially flipped (wq[::-1, ::-1]) to match flax ConvTranspose
    (transpose_kernel=False) numerics exactly."""
    acc = lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (2,)), ((), ())),
        preferred_element_type=out_dtype)
    n, h, w, kh, kw, c = acc.shape
    return acc, (n, h, w, kh, kw, c)


def _depth_to_space_blocks(y, dims):
    n, h, w, kh, kw, c = dims
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * kh, w * kw, c)


def _int8_conv_transpose(mod: nn.ConvTranspose, x, q, scale: float, zp: int):
    """True-int8 non-overlapping transposed conv.

    The lhs-dilated formulation can't carry an asymmetric zero-point (the
    inserted zeros would dequantize to -zp*scale), but the matmul
    formulation contracts only over Cin, so the standard correction
    zp * sum_cin(wq) applies per (kh, kw, cout) tap. That correction is
    computed from wq here (shape [kh,kw,cout], trivially cheap) rather
    than stored, because the precomputed w_sum in qarrays is summed over
    kh*kw*cin (the Conv convention)."""
    xq = _quantize_act(x, scale, zp)
    wq = q["wq"][::-1, ::-1]
    acc, dims = _conv_transpose_core(xq, wq, jnp.int32)
    corr = wq.astype(jnp.int32).sum(axis=2) * jnp.int32(zp)
    requant = jnp.float32(scale) * q["w_scale"].reshape(1, 1, 1, 1, 1, -1)
    y = (acc - corr[None, None, None]).astype(jnp.float32) * requant
    return _depth_to_space_blocks(y + q["bias"], dims)


def _fakequant_conv_transpose(mod: nn.ConvTranspose, x, q,
                              scale: float, zp: int):
    xq = _quantize_act(x, scale, zp)
    x_dq = (xq.astype(jnp.float32) - zp) * jnp.float32(scale)
    w_dq = (q["wq"][::-1, ::-1].astype(jnp.float32)
            * q["w_scale"].reshape(1, 1, 1, -1))
    y, dims = _conv_transpose_core(x_dq, w_dq, jnp.float32)
    return _depth_to_space_blocks(y + q["bias"], dims)


def _fakequant_conv(mod: nn.Conv, x, q, scale: float, zp: int):
    strides, pads = _conv_geometry(mod, x.shape)
    xq = _quantize_act(x, scale, zp)
    x_dq = (xq.astype(jnp.float32) - zp) * jnp.float32(scale)
    if any(p for pair in pads for p in pair):
        x_dq = jnp.pad(x_dq, ((0, 0), pads[0], pads[1], (0, 0)))
    w_dq = q["wq"].astype(jnp.float32) * q["w_scale"].reshape(1, 1, 1, -1)
    y = lax.conv_general_dilated(
        x_dq, w_dq, strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + q["bias"]


def _fakequant_dense(mod: nn.Dense, x, q, scale: float, zp: int):
    xq = _quantize_act(x, scale, zp)
    x_dq = (xq.astype(jnp.float32) - zp) * jnp.float32(scale)
    w_dq = q["wq"].astype(jnp.float32) * q["w_scale"]
    return x_dq @ w_dq + q["bias"]


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def collect_ranges(forward: Callable, variables, batches: Iterable,
                   extra_args: tuple = (),
                   percentile: float | None = 99.99,
                   method: str = "percentile") -> dict:
    """Record per-layer input activation ranges over calibration batches.

    ``forward(variables, batch, *extra_args)`` must be the EXACT inference
    program (including any preprocessing), so each conv sees the tensors it
    will see in production. Returns {path: (lo, hi)} over all batches —
    plain min/max with percentile=None, else per-batch percentile clipping
    averaged across batches (outliers otherwise inflate the scale; see
    quant.calibrate.calibrate_unet for the measured effect).
    ``method="mmse"`` instead grid-searches a shrink factor of the min/max
    envelope minimizing quantize-dequantize MSE (the reference's
    quantized_algorithm='mmse', README.md:3139; see qtensor.mmse_stats).
    The per-batch collection is ONE jitted program returning a small dict
    of scalars (eager per-op execution is pathological on tunneled
    backends).
    """
    if method not in ("percentile", "mmse"):
        raise ValueError(f"unknown calibration method {method!r}")
    from lanetpu.quant.qtensor import mmse_combine, mmse_stats

    qs = (jnp.asarray([0.0, 100.0]) if percentile is None
          else jnp.asarray([100.0 - percentile, percentile]))

    def traced(variables, x, *extra):
        records: dict[str, object] = {}

        def ic(next_fn, args, kwargs, context):
            mod = context.module
            if _is_quantizable(mod, context.method_name):
                p = _path_of(mod)
                h = args[0].astype(jnp.float32)
                if method == "mmse":
                    lo, hi, mse = mmse_stats(h)
                    if p in records:  # shared module called twice
                        plo, phi, pmse = records[p]
                        lo, hi = jnp.minimum(lo, plo), jnp.maximum(hi, phi)
                        mse = mse + pmse
                    records[p] = (lo, hi, mse)
                else:
                    lohi = jnp.percentile(h.ravel(), qs)
                    if p in records:
                        prev = records[p]
                        lohi = jnp.stack([jnp.minimum(lohi[0], prev[0]),
                                          jnp.maximum(lohi[1], prev[1])])
                    records[p] = lohi
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(ic):
            forward(variables, x, *extra)
        return records

    fn = jax.jit(traced)
    per_batch: dict[str, list] = {}
    for batch in batches:
        out = jax.device_get(fn(variables, jnp.asarray(batch), *extra_args))
        for name, rec in out.items():
            if method == "mmse":
                per_batch.setdefault(name, []).append(
                    (float(rec[0]), float(rec[1]), np.asarray(rec[2])))
            else:
                per_batch.setdefault(name, []).append(
                    (float(rec[0]), float(rec[1])))
    if method == "mmse":
        return {k: mmse_combine(v) for k, v in per_batch.items()}
    if percentile is None:
        return {k: (min(lo for lo, _ in v), max(hi for _, hi in v))
                for k, v in per_batch.items()}
    return {k: (float(np.mean([lo for lo, _ in v])),
                float(np.mean([hi for _, hi in v])))
            for k, v in per_batch.items()}


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


def quantize_variables(variables: dict, ranges: dict) -> tuple:
    """fp variables + calibrated ranges -> (qarrays, act_qp).

    qarrays: {path: {wq int8, w_scale [cout], w_sum [cout], bias [cout]}} —
    a pytree passed alongside the fp variables as a jit argument.
    act_qp:  {path: (scale, zero_point)} — host scalars baked into the
    compiled program.
    """
    params = variables["params"]
    qarrays, act_qp = {}, {}
    for path, (lo, hi) in ranges.items():
        node = params
        for part in path.split("/") if path else ():
            node = node[part]
        kernel = np.asarray(node["kernel"], np.float32)
        wq, wqp = quantize_symmetric_per_channel(kernel, axis=-1)
        cout = kernel.shape[-1]
        bias = (np.asarray(node["bias"], np.float32) if "bias" in node
                else np.zeros(cout, np.float32))
        qarrays[path] = {
            "wq": wq,
            "w_scale": np.asarray(wqp.scale, np.float32).reshape(-1),
            "w_sum": wq.astype(np.int32).reshape(-1, cout).sum(axis=0),
            "bias": bias,
        }
        qp = asymmetric_qparams(lo, hi)
        act_qp[path] = (float(qp.scale), int(qp.zero_point))
    return qarrays, act_qp


def make_quantized_forward(forward: Callable, act_qp: dict,
                           mode: str = "int8") -> Callable:
    """Wrap an fp forward into a quantized one.

    Returns ``qforward(bundle, *args)`` where
    ``bundle = {"fp": fp_variables, "q": qarrays}``. Every intercepted
    Conv/Dense whose path appears in act_qp runs in int8 (or fakequant);
    unlisted layers run fp via the original module code.
    """
    if mode == "fp":
        return lambda bundle, *args, **kw: forward(bundle["fp"], *args, **kw)
    if mode not in ("int8", "fakequant"):
        raise ValueError(f"unknown quant mode {mode!r}")
    conv_impl = _int8_conv if mode == "int8" else _fakequant_conv
    dense_impl = _int8_dense if mode == "int8" else _fakequant_dense
    convt_impl = (_int8_conv_transpose if mode == "int8"
                  else _fakequant_conv_transpose)

    def qforward(bundle, *args, **kwargs):
        qarrays = bundle["q"]

        def ic(next_fn, fargs, fkwargs, context):
            mod = context.module
            if not _is_quantizable(mod, context.method_name):
                return next_fn(*fargs, **fkwargs)
            path = _path_of(mod)
            if path not in act_qp or path not in qarrays:
                return next_fn(*fargs, **fkwargs)
            scale, zp = act_qp[path]
            impl = (dense_impl if isinstance(mod, nn.Dense)
                    else convt_impl if isinstance(mod, nn.ConvTranspose)
                    else conv_impl)
            return impl(mod, fargs[0], qarrays[path], scale, zp)

        with nn.intercept_methods(ic):
            return forward(bundle["fp"], *args, **kwargs)

    return qforward


def quantize_forward(forward: Callable, variables: dict,
                     calib_batches: Iterable, mode: str = "int8",
                     extra_args: tuple = (),
                     calib_method: str = "percentile") -> tuple:
    """One-shot convenience: calibrate + quantize + wrap.

    Returns (qforward, bundle, act_qp) with
    ``qforward(bundle, batch, *extra_args)`` ready to jit.
    """
    batches = list(calib_batches)
    ranges = collect_ranges(forward, variables, batches, extra_args,
                            method=calib_method)
    qarrays, act_qp = quantize_variables(variables, ranges)
    bundle = {"fp": variables, "q": qarrays}
    return make_quantized_forward(forward, act_qp, mode), bundle, act_qp
