"""Pallas TPU kernel: two-pass perspective warp with in-VMEM weight synthesis.

The einsum formulation (`kernels.resample.warp_perspective_mxu`) materializes
the pass weights in HBM (~137 MB + ~48 MB per call for the 480p -> 224 x 224
IPM warp). This kernel generates each pass's 2-tap bilinear weight tile
*inside* the kernel from the tiny per-pass coordinate tables (sxr [H, OW],
tv [OH, OW] — a few hundred KB) and feeds the MXU directly:

  pass 1, grid over source rows y:
      W1 = relu(1 - |iota_w - sxr[y, :, None]|)        [OW, W]  (VMEM)
      inter[y] = W1 @ src[y]                           [OW, B*C]
  pass 2, grid over output columns x':
      W2 = relu(1 - |iota_h - tv[:, x', None]|)        [OH, H]  (VMEM)
      out[x'] = W2 @ inter[:, x']                      [OH, B*C]

Batch and channel fold into the matmul N dimension, so MXU utilization grows
with batch size. Data layout transposes around the kernels are plain XLA
transposes (bandwidth-bound, cheap relative to the saved weight traffic).

Falls back to the einsum path off-TPU; tests run the kernel in interpreter
mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanetpu.kernels.resample import _twopass_coords


def _pass1_kernel(sxr_ref, src_ref, out_ref):
    # sxr_ref: [1, 1, OW] f32; src_ref: [1, W, NBC]; out_ref: [1, OW, NBC]
    # (leading singleton dims keep Mosaic's last-two-dims block constraints
    # satisfied: every block's trailing dims equal the array dims)
    w = src_ref.shape[1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(
        jnp.float32)  # [1, W] (Mosaic iota must be integer-typed)
    coords = sxr_ref[0, 0, :]                                  # [OW]
    w1 = jax.nn.relu(1.0 - jnp.abs(iota_w - coords[:, None]))  # [OW, W]
    out_ref[0] = jnp.dot(w1.astype(src_ref.dtype), src_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _pass2_kernel(tv_ref, inter_ref, out_ref):
    # tv_ref: [1, 1, OH] f32; inter_ref: [1, H, NBC]; out_ref: [1, OH, NBC]
    h = inter_ref.shape[1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1).astype(
        jnp.float32)  # [1, H]
    coords = tv_ref[0, 0, :]                                   # [OH]
    w2 = jax.nn.relu(1.0 - jnp.abs(iota_h - coords[:, None]))  # [OH, H]
    out_ref[0] = jnp.dot(w2.astype(inter_ref.dtype), inter_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@partial(jax.jit,
         static_argnames=("out_wh", "in_hw", "compute_dtype", "interpret"))
def _warp_pallas_impl(x_hwnc, sxr, tv, out_wh, in_hw, compute_dtype,
                      interpret):
    """x_hwnc: [H, W, NBC] compute-dtype tensor. Returns [OW, OH, NBC]."""
    h, w = in_hw
    ow, oh = out_wh
    nbc = x_hwnc.shape[-1]

    # Coordinate tables carry a singleton middle axis so every BlockSpec's
    # last two dims equal the array's dims (Mosaic tiling constraint).
    sxr3 = sxr.reshape(h, 1, ow)
    inter = pl.pallas_call(
        _pass1_kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, 1, ow), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, nbc), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ow, nbc), lambda y: (y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, ow, nbc), compute_dtype),
        interpret=interpret,
    )(sxr3, x_hwnc)

    inter_t = jnp.transpose(inter, (1, 0, 2))  # [OW, H, NBC]
    tv3 = jnp.transpose(tv, (1, 0)).reshape(ow, 1, oh)
    out = pl.pallas_call(
        _pass2_kernel,
        grid=(ow,),
        in_specs=[
            pl.BlockSpec((1, 1, oh), lambda x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, nbc), lambda x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, nbc), lambda x: (x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ow, oh, nbc), compute_dtype),
        interpret=interpret,
    )(tv3, inter_t)
    return out  # [OW, OH, NBC]


def warp_perspective_pallas(img: jnp.ndarray, matrix, out_wh: tuple,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """Pallas two-pass warp of [N, H, W, C] (or [H, W, C]) uint8/float images.

    Semantics match `warp_perspective_mxu` (bilinear, BORDER_CONSTANT 0).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    ow, oh = out_wh
    sxr, tv = _twopass_coords(np.asarray(matrix), (h, w), out_wh)

    orig_dtype = img.dtype
    x = img.astype(compute_dtype)
    # [N, H, W, C] -> [H, W, N*C]
    x_hwnc = jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w, n * c)
    out = _warp_pallas_impl(x_hwnc, jnp.asarray(sxr), jnp.asarray(tv),
                            out_wh, (h, w), compute_dtype, interpret)
    # [OW, OH, N*C] -> [N, OH, OW, C]
    out = jnp.transpose(out.reshape(ow, oh, n, c), (2, 1, 0, 3))

    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out.astype(jnp.float32)), info.min, info.max)
        out = out.astype(orig_dtype)
    else:
        out = out.astype(orig_dtype)
    return out[0] if squeeze else out
