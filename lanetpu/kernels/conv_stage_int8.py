"""Pallas int8-resident fused U-Net stage: int8 conv3x3 -> requantize ->
int8 conv3x3 -> requantize, all in ONE kernel, activations never leaving
int8 in HBM.

Why this exists: the XLA int8 path (`quant/calibrate.py::_hook_int8`) is
*capability*-correct but *bandwidth*-wrong on an HBM-bound model — every
conv writes an int32 accumulator (4 B/px·ch) to HBM, re-reads it for the
f32 requantize pass, writes f32, and the next layer re-quantizes and
zero-point-pads: ~12+ bytes of traffic per element per conv, vs ~8 for
the bf16 path — which is exactly why int8 measured *slower* than bf16
(docs/performance.md). This kernel keeps the int32 accumulator and the
f32 requantize in registers/VMEM and streams int8 in, int8 out:
~4 bytes/element for a whole *pair* of convs.

Toolchain constraints (docs/performance.md support matrix, round-2
bisection): no manual DMA, no lane-axis concatenation (kills in-kernel
im2col), no int8 `maximum`. So:
  * row halos via 5 row-shifted operand aliases of the zero-point-padded
    input (non-overlapping BlockSpecs; compiles),
  * the conv as NINE accumulated per-tap dots (int8 x int8 -> int32,
    K = Cin; compiles) instead of one K=9*Cin im2col dot,
  * ReLU in the quantized domain as the *lower clip bound* of the
    requantize (`clip(round(acc*M + B), zp, 127)`), never an int8 max.

Quantization algebra (exact match to the unfused XLA int8 forward):
with input quant (s_in, zp_in), symmetric per-channel weights (s_w),
output quant (s_out, zp_out):

    y_q = clip(round(acc * M + B), zp_out if relu else -128, 127)
    M[o] = s_in * s_w[o] / s_out
    B[o] = bias[o]/s_out + zp_out - zp_in * wsum[o] * M[o]

which equals `round(relu((acc - zp_in*wsum)*s_in*s_w + bias)/s_out) + zp_out`
for every branch (relu-clip identity: round(x + zp) = round(x) + zp for
integer zp). The f32-output variant used before fp transpose convs sets
M = s_in*s_w, B = bias - zp_in*wsum*M and applies a plain f32 relu.

Out-of-image ring positions of the intermediate are forced to zp_mid
(the int8 encoding of 0.0) so the second conv sees the same zero padding
the reference's SAME conv provides.

Parity: tests/test_conv_stage_int8.py gates this against the unfused
XLA int8 reference to <=1 LSB. Reference correspondence: the RKNN
runtime's fused ConvRelu int8 graph ops (SURVEY.md §2 #18: 14 ConvRelu
nodes, layer-wise asym int8) — this is the TPU equivalent of what
librknnrt does on the NPU, which is why the reference's int8 NPU path
was fast and a layer-by-layer XLA translation isn't.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _conv_taps(rows3, w_ref, w_out, cin, base=0):
    """Nine accumulated per-tap int8 dots.

    rows3[dy] is the [th_rows, >=base+w_out+2, cin] int8 row band for
    tap row dy; w_ref holds [9*cin, cout] int8 with tap-major rows.
    Returns an int32 [th_rows * w_out, cout] accumulator. `w_out` must
    be a 32-multiple (int8 sublane tile) for the reshape merge.
    """
    acc = None
    for dy in range(3):
        rows = rows3[dy]
        n_rows = rows.shape[0]
        for dx in range(3):
            o = base + dx
            p = rows[:, o:o + w_out, :].reshape(n_rows * w_out, cin)
            tap = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            d = jax.lax.dot_general(p, tap, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
    return acc


def _stage_kernel(*refs, tile_h, width, h_total, mid_w, left, out_w,
                  cin, cmid, cout, zp_mid, zp_out, out_int8):
    """One (batch, row-strip) program.

    refs = ceil((th+4)/8) EIGHT-row input blocks of the SAME padded
    array (the row halo without overlapping blocks, manual DMA, or
    materialized row-shifted copies — consecutive aligned 8-row blocks
    of one buffer cover the strip-plus-halo window, so HBM read
    amplification is only ~(th+8)/th, no alias buffers exist, and each
    DMA is a full 8-sublane tile rather than a latency-bound single
    row), then w0, m0, b0, w1, m1, b1, out_ref.

    Width geometry (all static): Mosaic reshapes that merge a sublane
    dim require tile-aligned sublane counts (8 for f32, 32 for int8 —
    the round-2 bisection root cause), so the conv1 ring is evaluated on
    `mid_w` columns (a 32-multiple covering the image plus margin;
    column `left` is image column 0) and conv2 on `out_w` columns (the
    32-multiple >= width); the final `[:, :width]` slice drops the
    alignment margin.
    """
    th, w = tile_h, width
    j = pl.program_id(1)
    n_blocks = (th + 4 + 7) // 8
    row_refs = refs[:n_blocks]
    w0_ref, m0_ref, b0_ref, w1_ref, m1_ref, b1_ref, out_ref = refs[n_blocks:]

    rows_full = jnp.concatenate([r[0] for r in row_refs], axis=0)
    rows3 = [rows_full[dy:dy + th + 2] for dy in range(3)]
    acc = _conv_taps(rows3, w0_ref, mid_w, cin)
    mid = acc.astype(jnp.float32) * m0_ref[...] + b0_ref[...]
    mid = jnp.clip(jnp.round(mid), float(zp_mid), 127.0)
    mid = mid.reshape(th + 2, mid_w, cmid)

    row_g = jax.lax.broadcasted_iota(jnp.int32, (th + 2, mid_w, 1), 0) \
        + j * th - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (th + 2, mid_w, 1), 1) \
        - left
    valid = ((row_g >= 0) & (row_g < h_total)
             & (col_g >= 0) & (col_g < w))
    mid = jnp.where(valid, mid, float(zp_mid)).astype(jnp.int8)

    rows3 = [mid[dy:dy + th] for dy in range(3)]
    acc = _conv_taps(rows3, w1_ref, out_w, cmid, base=left - 1)
    y = acc.astype(jnp.float32) * m1_ref[...] + b1_ref[...]
    if out_int8:
        y = jnp.clip(jnp.round(y), float(zp_out), 127.0)
    else:
        y = jax.nn.relu(y)
    out_ref[0] = y.reshape(th, out_w, cout)[:, :w].astype(out_ref.dtype)


def pick_tile_h(h: int, target: int = 16) -> int:
    """Row-strip height: the largest divisor of h that is <= target and
    a multiple of 8 (so strip starts land on 8-row block boundaries), or
    h itself (single strip — any height works when j == 0).

    target=16 is the measured best that also compiles on this Mosaic
    build (th=56 exceeds its VMEM allocator; scripts/probe_stage_tiles).
    """
    for th in range(min(target, h), 7, -1):
        if h % th == 0 and th % 8 == 0:
            return th
    return h


@partial(jax.jit, static_argnames=("zp_in", "zp_mid", "zp_out", "tile_h",
                                   "interpret"))
def fused_double_conv_int8(xq, w0q, m0, b0, w1q, m1, b1, *, zp_in: int,
                           zp_mid: int, zp_out: int | None,
                           tile_h: int = 8, interpret: bool = False):
    """int8 stage pair: xq [N,H,W,Cin] int8 -> [N,H,W,Cout].

    w*q: int8 HWIO kernels; m*/b* per-channel f32 requantize multiplier
    and offset (see module docstring for the algebra — b1 must already
    include zp_out when zp_out is not None). zp_out=None -> f32 output
    with plain relu (for pairs feeding fp transpose convs).
    """
    n, h, w, cin = xq.shape
    cmid = w0q.shape[-1]
    cout = w1q.shape[-1]
    th = tile_h
    if h % th:
        raise ValueError(f"H={h} not divisible by tile_h={th}")
    if th % 8 and th != h:
        raise ValueError(f"tile_h={th} must be a multiple of 8 (or == H)")

    # tile-aligned width geometry (see _stage_kernel docstring):
    # out_w = 32-multiple >= w; mid ring covers [−left, mid_w−left) with
    # conv2 reading mid columns [left−1, left+1+out_w)
    out_w = -(-w // 32) * 32
    mid_w = out_w + 32
    left = (mid_w - (w + 2)) // 2 + 1
    pad_l = left + 1
    pad_r = mid_w - left + 1 - w

    # rows padded so every strip's halo window is covered by whole 8-row
    # blocks: strip j needs padded rows [j*th, j*th + th + 4)
    n_blocks = (th + 4 + 7) // 8
    rows_needed = (h - th) + n_blocks * 8
    xpad = jnp.pad(xq, ((0, 0), (2, rows_needed - h - 2),
                        (pad_l, pad_r), (0, 0)),
                   constant_values=np.int8(zp_in))
    op_w = w + pad_l + pad_r  # == mid_w + 2

    out_int8 = zp_out is not None
    out_dtype = jnp.int8 if out_int8 else jnp.float32
    kernel = partial(_stage_kernel, tile_h=th, width=w, h_total=h,
                     mid_w=mid_w, left=left, out_w=out_w,
                     cin=cin, cmid=cmid, cout=cout, zp_mid=zp_mid,
                     zp_out=zp_out if out_int8 else 0, out_int8=out_int8)
    # the same padded buffer passed n_blocks times as aligned 8-row
    # blocks — block k of strip j starts at padded row j*th + 8*k; no
    # copies are materialized
    row_specs = [
        pl.BlockSpec((1, 8, op_w, cin),
                     partial(lambda k, i, j: (i, (j * th) // 8 + k, 0, 0), k))
        for k in range(n_blocks)
    ]
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=row_specs + [
            full((9 * cin, cmid)), full((1, cmid)), full((1, cmid)),
            full((9 * cmid, cout)), full((1, cout)), full((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), out_dtype),
        interpret=interpret,
    )(*([xpad] * n_blocks), w0q.reshape(9 * cin, cmid),
      m0.reshape(1, cmid).astype(jnp.float32),
      b0.reshape(1, cmid).astype(jnp.float32),
      w1q.reshape(9 * cmid, cout),
      m1.reshape(1, cout).astype(jnp.float32),
      b1.reshape(1, cout).astype(jnp.float32))


def stage_requant_params(s_in: float, zp_in: int, w_scale, w_sum, bias,
                         s_out: float | None, zp_out: int | None):
    """(M, B) for one conv of the fused pair.

    s_out=None -> f32-output variant (M = s_in*s_w, B excludes zp_out).
    """
    s_w = np.asarray(w_scale, np.float32).reshape(-1)
    wsum = np.asarray(w_sum, np.float32).reshape(-1)
    bias = np.asarray(bias, np.float32).reshape(-1)
    if s_out is None:
        m = s_in * s_w
        b = bias - zp_in * wsum * m
    else:
        m = s_in * s_w / s_out
        b = bias / s_out + zp_out - zp_in * wsum * m
    return m.astype(np.float32), b.astype(np.float32)
