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


# ---------------------------------------------------------------------------
# MMSE range search (the reference README.md:3139 'mmse' quantized_algorithm)
# ---------------------------------------------------------------------------

MMSE_ALPHAS = np.linspace(0.3, 1.0, 15)


def mmse_stats(h, alphas=None):
    """In-jit per-layer MMSE statistics for one calibration batch.

    For each candidate shrink factor alpha applied to the batch's min/max
    envelope, computes the MSE between the activations and their
    quantize-dequantize image under the shrunk range. Returns
    (lo, hi, mse[K]) as jnp scalars/vector — the host-side
    `mmse_combine` picks the error-minimizing alpha across batches.
    This is the quantization-error-minimizing scale search the reference
    documents as quantized_algorithm='mmse' (README.md:3104-3139).
    """
    if alphas is None:
        alphas = MMSE_ALPHAS
    h = h.astype(jnp.float32).ravel()
    lo, hi = jnp.min(h), jnp.max(h)

    def mse_for(alpha):
        lo_a, hi_a = lo * alpha, hi * alpha
        scale = jnp.maximum((hi_a - lo_a) / 255.0, 1e-12)
        zp = jnp.clip(jnp.round(-128.0 - lo_a / scale), -128, 127)
        q = jnp.clip(jnp.round(h / scale) + zp, -128, 127)
        dq = (q - zp) * scale
        return jnp.mean((dq - h) ** 2)

    import jax

    mse = jax.vmap(mse_for)(jnp.asarray(alphas, jnp.float32))
    return lo, hi, mse


def mmse_combine(per_batch: list, alphas=None) -> tuple:
    """Host-side: [(lo, hi, mse[K])] over batches -> final (lo, hi).

    MSEs are summed across batches per candidate (each batch's envelope is
    its own reference, so candidates stay comparable); the winning alpha
    scales the averaged envelope — mirroring how percentile calibration
    averages per-batch ranges."""
    if alphas is None:
        alphas = MMSE_ALPHAS
    total = np.sum([np.asarray(m) for _, _, m in per_batch], axis=0)
    alpha = float(alphas[int(np.argmin(total))])
    lo = float(np.mean([lo for lo, _, _ in per_batch]))
    hi = float(np.mean([hi for _, hi, _ in per_batch]))
    return alpha * lo, alpha * hi
