"""Bisect which construct in the v2 fused stage kernel the axon Mosaic
toolchain rejects. Each step adds one pattern; first failure names the
culprit. Tiny shapes; one axon client for the whole run.
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl

N, H, W, C = 2, 16, 32, 32
TH = 8


def run(name, kernel, n_in=5, extra_specs=(), extra_args=()):
    in_block = pl.BlockSpec((1, TH, W + 4, C), lambda i, j: (i, j, 0, 0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N, H, W + 4, C)), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(N, H // TH),
            in_specs=[in_block] * n_in + list(extra_specs),
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.float32),
        )(*([x] * n_in), *extra_args)
        out.block_until_ready()
        np.asarray(out[0, 0, 0, :2])  # force fetch
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


# 1. five operands, copy one through
def k1(x0, x1, x2, x3, x4, o):
    o[0] = x0[0][:, 2:2 + W, :] + x4[0][:, 2:2 + W, :]
run("5-operands + static width slice", k1)

# 2. row concat: block + last-2-rows of another block
def k2(x0, x1, x2, x3, x4, o):
    rows = jnp.concatenate([x0[0], x2[0][TH - 2:]], axis=0)  # [TH+2,...]
    o[0] = rows[:TH, 2:2 + W, :]
run("row concat with tail slice", k2)

# 3. im2col concat over 9 shifted views + reshape + dot
W0 = jnp.asarray(np.random.default_rng(1).standard_normal(
    (9 * C, C)) * 0.05, jnp.float32)
full = pl.BlockSpec((9 * C, C), lambda i, j: (0, 0))
def k3(x0, x1, x2, x3, x4, w, o):
    cols = []
    for dy in range(3):
        rows = jnp.concatenate([x0[0], x2[0][TH - 2:]], axis=0)
        for dx in range(3):
            cols.append(rows[dy:dy + TH, dx:dx + W, :])
    p = jnp.concatenate(cols, axis=-1).reshape(TH * W, 9 * C)
    y = jnp.dot(p, w[...], preferred_element_type=jnp.float32)
    o[0] = y.reshape(TH, W, C)
run("im2col concat + dot", k3, extra_specs=[full], extra_args=[W0])

# 4. iota-based validity mask
def k4(x0, x1, x2, x3, x4, o):
    j = pl.program_id(1)
    mid = x0[0][:, 2:2 + W, :]
    row_g = jax.lax.broadcasted_iota(jnp.int32, (TH, W, 1), 0) + j * TH - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (TH, W, 1), 1) - 1
    valid = (row_g >= 0) & (row_g < H) & (col_g >= 0) & (col_g < W - 2)
    o[0] = jnp.where(valid, mid, 0.0)
run("3d-iota mask + where", k4)

# 5. (1, C) bias block
bias = jnp.asarray(np.random.default_rng(2).standard_normal((1, C)),
                   jnp.float32)
bspec = pl.BlockSpec((1, C), lambda i, j: (0, 0))
def k5(x0, x1, x2, x3, x4, b, o):
    o[0] = x0[0][:, 2:2 + W, :] + b[...]
run("(1,C) bias operand", k5, extra_specs=[bspec], extra_args=[bias])

# 6. two chained im2col dots (the full stage shape)
def k6(x0, x1, x2, x3, x4, w, o):
    cols = []
    for dy in range(3):
        rows = jnp.concatenate([(x0, x1, x2)[dy][0],
                                (x2, x3, x4)[dy][0][TH - 2:]], axis=0)
        for dx in range(3):
            cols.append(rows[:, dx:dx + W + 2, :])
    p = jnp.concatenate(cols, axis=-1).reshape((TH + 2) * (W + 2), 9 * C)
    mid = jnp.dot(p, jnp.concatenate([w[...]] * 1, 0)[:9 * C],
                  preferred_element_type=jnp.float32)
    mid = jax.nn.relu(mid).reshape(TH + 2, W + 2, C)
    cols2 = [mid[dy:dy + TH, dx:dx + W, :]
             for dy in range(3) for dx in range(3)]
    p2 = jnp.concatenate(cols2, axis=-1).reshape(TH * W, 9 * C)
    y = jnp.dot(p2, w[...], preferred_element_type=jnp.float32)
    o[0] = y.reshape(TH, W, C)
run("chained double im2col dot", k6, extra_specs=[full], extra_args=[W0])

print("done", flush=True)
