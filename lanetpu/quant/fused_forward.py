"""int8-resident U-Net forward: activations stay int8 in HBM end-to-end.

Executes the same layer plan as `functional_unet.unet_forward_folded`
(mode="int8" on `QuantizedUNet`), but every conv0/conv1 stage pair runs
as ONE Pallas launch (`kernels.conv_stage_int8.fused_double_conv_int8`)
with the requantize in-register, and everything between pairs operates
directly on the int8 tensors:

  * maxpool on int8 q-values (round/clip are monotonic, so
    pool-then-quantize == quantize-then-pool — exact),
  * encoder skips are kept int8 and REquantized to the decoder conv's
    input scale at the concat (the RKNN runtime inserts the same requant
    ops; costs <=1 LSB vs the unfused path's single rounding),
  * transpose convs stay fp32 (as in the unfused artifact); their inputs
    come from f32-output pair variants and their outputs are quantized
    once into the next pair's input scale,
  * the head conv consumes int8 directly and emits f32 logits.

HBM traffic per stage pair drops from ~12 B/element (int32 accumulator
round-trips + separate quantize/pad passes) to ~4 B/element.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lanetpu.kernels.conv_stage_int8 import (
    fused_double_conv_int8,
    pick_tile_h,
    stage_requant_params,
)
from lanetpu.quant.functional_unet import conv2d_transpose
from lanetpu.quant.qtensor import quantize_asymmetric


def _requant(q, qp_from, qp_to):
    """int8 -> int8 rescale: round((q - zp_f) * s_f/s_t) + zp_t."""
    if (qp_from.scale == qp_to.scale
            and qp_from.zero_point == qp_to.zero_point):
        return q
    r = (q.astype(jnp.float32) - qp_from.zero_point) \
        * jnp.float32(qp_from.scale / qp_to.scale) + qp_to.zero_point
    return jnp.clip(jnp.round(r), -128, 127).astype(jnp.int8)


def _maxpool_int8(q):
    return lax.reduce_window(q, np.int8(-128), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def _head_conv_int8(q, xq, name):
    """Single int8 conv (no relu) from a pre-quantized input -> f32."""
    qp = q.act_qp[name]
    wq = jnp.asarray(q.wq[name])
    ph, pw = wq.shape[0] // 2, wq.shape[1] // 2
    xp = jnp.pad(xq, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                 constant_values=np.int8(qp.zero_point))
    acc = lax.conv_general_dilated(
        xp, wq, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    corr = jnp.asarray(q.w_sum[name], jnp.int32) * jnp.int32(qp.zero_point)
    scale = jnp.float32(qp.scale) * jnp.asarray(
        q.w_scale[name], jnp.float32).reshape(1, 1, 1, -1)
    return (acc - corr).astype(jnp.float32) * scale + jnp.asarray(
        q.bias[name])


def _fused_pair(q, xq, c0, c1, qp_in, qp_out):
    """One stage pair as a fused kernel. qp_out=None -> f32 output."""
    qp_mid = q.act_qp[c1]
    m0, b0 = stage_requant_params(
        qp_in.scale, qp_in.zero_point, q.w_scale[c0], q.w_sum[c0],
        q.bias[c0], qp_mid.scale, qp_mid.zero_point)
    if qp_out is None:
        m1, b1 = stage_requant_params(
            qp_mid.scale, qp_mid.zero_point, q.w_scale[c1], q.w_sum[c1],
            q.bias[c1], None, None)
        zp_out = None
    else:
        m1, b1 = stage_requant_params(
            qp_mid.scale, qp_mid.zero_point, q.w_scale[c1], q.w_sum[c1],
            q.bias[c1], qp_out.scale, qp_out.zero_point)
        zp_out = qp_out.zero_point
    return fused_double_conv_int8(
        xq, jnp.asarray(q.wq[c0]), m0, b0, jnp.asarray(q.wq[c1]), m1, b1,
        zp_in=qp_in.zero_point, zp_mid=qp_mid.zero_point, zp_out=zp_out,
        tile_h=pick_tile_h(xq.shape[1]), interpret=q_interpret(q))


def q_interpret(q) -> bool:
    """Interpret-mode escape hatch for CPU tests (set on the artifact)."""
    return bool(getattr(q, "_interpret", False))


def _required_names(q) -> list:
    """Every conv layer the fused forward needs qparams for — shared by
    unet_forward_int8_fused and supports_fused so they can never drift."""
    n = len(q.features)
    return ([f"enc{i}.conv{k}" for i in range(n) for k in (0, 1)]
            + ["bottleneck.conv0", "bottleneck.conv1", "head"]
            + [f"dec{i}.conv{k}" for i in range(n) for k in (0, 1)])


def unet_forward_int8_fused(q, x, final_sigmoid: bool | None = None):
    """QuantizedUNet `q`, f32/bf16 input `x` -> f32 output.

    Requires every conv layer to carry quant params (no mixed-precision
    fallback layers) — callers check `supports_fused(q)`.
    """
    n = len(q.features)
    missing = [nm for nm in _required_names(q) if nm not in q.act_qp]
    if missing:
        raise ValueError(f"fused int8 forward needs qparams for {missing}")

    qp = q.act_qp["enc0.conv0"]
    xq = quantize_asymmetric(jnp.asarray(x, jnp.float32), qp)
    skips = {}
    for i in range(n):
        nxt = f"enc{i + 1}.conv0" if i + 1 < n else "bottleneck.conv0"
        qp_out = q.act_qp[nxt]
        xq = _fused_pair(q, xq, f"enc{i}.conv0", f"enc{i}.conv1", qp, qp_out)
        skips[i] = (xq, qp_out)
        xq = _maxpool_int8(xq)
        qp = qp_out

    y = _fused_pair(q, xq, "bottleneck.conv0", "bottleneck.conv1", qp, None)

    dtype = jnp.float32
    for i in range(n):
        p = q.folded[f"up{i}"]
        y = conv2d_transpose(y, jnp.asarray(p["kernel"], dtype),
                             jnp.asarray(p["bias"])).astype(dtype)
        qp_d = q.act_qp[f"dec{i}.conv0"]
        sk, sk_qp = skips[n - 1 - i]
        xq = jnp.concatenate(
            [_requant(sk, sk_qp, qp_d), quantize_asymmetric(y, qp_d)],
            axis=-1)
        if i < n - 1:
            y = _fused_pair(q, xq, f"dec{i}.conv0", f"dec{i}.conv1",
                            qp_d, None)
        else:
            qp_head = q.act_qp["head"]
            xq = _fused_pair(q, xq, f"dec{i}.conv0", f"dec{i}.conv1",
                             qp_d, qp_head)

    y = _head_conv_int8(q, xq, "head")
    if final_sigmoid if final_sigmoid is not None else q.final_sigmoid:
        y = jax.nn.sigmoid(y)
    return y


def supports_fused(q) -> bool:
    return all(nm in q.act_qp for nm in _required_names(q))
