"""Quantization primitives with RKNN-parity semantics.

The deployed models use `asymmetric_quantized-8` with layer-wise activation
quantization (shipped .rknn graph metadata: qmethod 'layer', qtype 'asym')
and the documented pipeline optionally uses per-channel weight quantization
(reference README.md:3114-3116 quantized_method='channel'). We implement:

  * asymmetric per-tensor int8 for activations:
      q = clip(round(x / scale) + zero_point, -128, 127)
      scale = (max - min) / 255, zero_point = -128 - round(min / scale)
  * symmetric per-channel int8 for conv weights (output-channel axis):
      scale_c = max|w_c| / 127

Exact RKNN rounding is undocumented; the spec is the MAE/IoU parity gate
(README.md:3556-3562), not bit-exactness (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class QuantParams:
    scale: np.ndarray | float
    zero_point: np.ndarray | int
    axis: int | None = None  # None = per-tensor


def asymmetric_qparams(x_min: float, x_max: float) -> QuantParams:
    """Asymmetric int8 params covering [x_min, x_max] (zero included)."""
    x_min = min(float(x_min), 0.0)
    x_max = max(float(x_max), 0.0)
    scale = (x_max - x_min) / 255.0
    if scale == 0.0:
        scale = 1.0
    zero_point = int(np.clip(np.round(-128 - x_min / scale), -128, 127))
    return QuantParams(scale=scale, zero_point=zero_point)


def quantize_asymmetric(x, qp: QuantParams):
    q = jnp.round(x / qp.scale) + qp.zero_point
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def quantize_symmetric_per_channel(w, axis: int = -1) -> tuple:
    """Conv kernel [kh, kw, cin, cout] -> (int8 weights, QuantParams).

    Symmetric per-output-channel: zero_point = 0, scale_c = max|w_c|/127.
    """
    w = np.asarray(w, dtype=np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    absmax = np.maximum(absmax, 1e-12)
    scale = absmax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, QuantParams(scale=scale.astype(np.float32), zero_point=0,
                          axis=axis % w.ndim)


def dequantize(q, qp: QuantParams):
    return (q.astype(jnp.float32) - qp.zero_point) * qp.scale


def fake_quant(x, qp: QuantParams):
    """Quantize-dequantize round trip (simulated int8)."""
    return dequantize(quantize_asymmetric(x, qp), qp)
