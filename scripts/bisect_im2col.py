"""Second-stage bisect: which part of the in-kernel im2col fails —
the lane concat width, the unaligned row slice, the reshape, or the dot.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, H, W, C = 2, 16, 32, 32
TH = 8


def run(name, kernel, wshape=None):
    in_block = pl.BlockSpec((1, TH, W + 4, C), lambda i, j: (i, j, 0, 0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N, H, W + 4, C)), jnp.float32)
    specs = [in_block]
    args = [x]
    if wshape:
        specs.append(pl.BlockSpec(wshape, lambda i, j: (0, 0)))
        args.append(jnp.asarray(
            np.random.default_rng(1).standard_normal(wshape) * 0.05,
            jnp.float32))
    try:
        out = pl.pallas_call(
            kernel, grid=(N, H // TH), in_specs=specs,
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.float32),
        )(*args)
        np.asarray(out[0, 0, 0, :2])
        print(f"PASS {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}:"
              f" {str(e).splitlines()[0][:120]}", flush=True)


# a. single dot, K=C, no concat/reshape games
def ka(x0, w, o):
    p = x0[0][:, 2:2 + W, :].reshape(TH * W, C)
    o[0] = jnp.dot(p, w[...],
                   preferred_element_type=jnp.float32).reshape(TH, W, C)
run("reshape + dot K=32", ka, (C, C))

# b. lane concat x3 (K=96) + dot
def kb(x0, w, o):
    p = jnp.concatenate([x0[0][:, dx:dx + W, :] for dx in range(3)],
                        axis=-1).reshape(TH * W, 3 * C)
    o[0] = jnp.dot(p, w[...],
                   preferred_element_type=jnp.float32).reshape(TH, W, C)
run("lane concat x3 + dot K=96", kb, (3 * C, C))

# c. lane concat x9 (K=288) + dot, row shifts from the raw block
def kc(x0, w, o):
    cols = [x0[0][:, dx:dx + W, :] for dx in range(3)] * 3
    p = jnp.concatenate(cols, axis=-1).reshape(TH * W, 9 * C)
    o[0] = jnp.dot(p, w[...],
                   preferred_element_type=jnp.float32).reshape(TH, W, C)
run("lane concat x9 + dot K=288", kc, (9 * C, C))

# d. unaligned ROW slices (dy=0..2 of a TH+2 concat) + single dot K=32
def kd(x0, w, o):
    rows = jnp.concatenate([x0[0], x0[0][TH - 2:]], axis=0)  # TH+2
    acc = jnp.zeros((TH * W, C), jnp.float32)
    for dy in range(3):
        p = rows[dy:dy + TH, 2:2 + W, :].reshape(TH * W, C)
        acc = acc + jnp.dot(p, w[...], preferred_element_type=jnp.float32)
    o[0] = acc.reshape(TH, W, C)
run("3 unaligned row slices + 3 dots K=32", kd, (C, C))

# e. 3 dots of K=96 accumulated (dy outer, dx lane concat)
def ke(x0, w, o):
    rows = jnp.concatenate([x0[0], x0[0][TH - 2:]], axis=0)
    acc = jnp.zeros((TH * W, C), jnp.float32)
    for dy in range(3):
        p = jnp.concatenate([rows[dy:dy + TH, dx:dx + W, :]
                             for dx in range(3)],
                            axis=-1).reshape(TH * W, 3 * C)
        acc = acc + jnp.dot(p, w[...], preferred_element_type=jnp.float32)
    o[0] = acc.reshape(TH, W, C)
run("3 accumulated dots K=96 over shifted rows", ke, (3 * C, C))

# f. K=288 dot but with ALIGNED row slices only
def kf(x0, w, o):
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(x0[0][:, dx:dx + W, :])
    p = jnp.concatenate(cols, axis=-1)
    p = p.reshape(TH * W, 9 * C)
    y = jnp.dot(p, w[...], preferred_element_type=jnp.float32)
    o[0] = y.reshape(TH, W, C)
run("9 aligned-row views K=288", kf, (9 * C, C))

# g. K=288 without reshape: dot_general on [TH, W, 9C] x [9C, C]
def kg(x0, w, o):
    cols = [x0[0][:, dx:dx + W, :] for dx in range(3)] * 3
    p = jnp.concatenate(cols, axis=-1)  # [TH, W, 9C]
    y = jax.lax.dot_general(p, w[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o[0] = y
run("dot_general 3d x K=288 (no reshape)", kg, (9 * C, C))

print("done", flush=True)
