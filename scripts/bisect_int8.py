"""Probe int8 Pallas patterns on the axon toolchain: int8 operand blocks,
int8xint8->int32 dots, in-kernel requantization back to int8.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, H, W, C = 2, 16, 32, 32
TH = 8


def run(name, kernel, out_dtype=jnp.int8, wdtype=jnp.int8):
    in_block = pl.BlockSpec((1, TH, W + 4, C), lambda i, j: (i, j, 0, 0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (N, H, W + 4, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (C, C)), wdtype)
    m = jnp.asarray(rng.random((1, C)), jnp.float32) * 0.01
    try:
        out = pl.pallas_call(
            kernel, grid=(N, H // TH),
            in_specs=[in_block,
                      pl.BlockSpec((C, C), lambda i, j: (0, 0)),
                      pl.BlockSpec((1, C), lambda i, j: (0, 0))],
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W, C), out_dtype),
        )(x, w, m)
        np.asarray(out[0, 0, 0, :2])
        print(f"PASS {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}:"
              f" {str(e).splitlines()[0][:120]}", flush=True)


# a. int8 pass-through (block layout only)
def ka(x, w, m, o):
    o[0] = x[0][:, 2:2 + W, :]
run("int8 block passthrough", ka)

# b. int8 dot -> int32 -> requant -> int8
def kb(x, w, m, o):
    p = x[0][:, 2:2 + W, :].reshape(TH * W, C)
    acc = jax.lax.dot_general(p, w[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = jnp.round(acc.astype(jnp.float32) * m[...])
    y = jnp.clip(y + 3.0, -128, 127)
    o[0] = y.reshape(TH, W, C).astype(jnp.int8)
run("int8 dot + in-register requant", kb)

# c. per-tap accumulated int8 dots (the conv formulation)
def kc(x, w, m, o):
    rows = jnp.concatenate([x[0], x[0][TH - 2:]], axis=0)
    acc = jnp.zeros((TH * W, C), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            p = rows[dy:dy + TH, dx:dx + W, :].reshape(TH * W, C)
            acc = acc + jax.lax.dot_general(
                p, w[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = jnp.clip(jnp.round(acc.astype(jnp.float32) * m[...]), -128, 127)
    o[0] = y.reshape(TH, W, C).astype(jnp.int8)
run("9 per-tap int8 dots + requant", kc)

# d. int8 max (relu in q-domain)
def kd(x, w, m, o):
    o[0] = jnp.maximum(x[0][:, 2:2 + W, :], jnp.int8(-3))
run("int8 maximum (q-relu)", kd)

# e. upcast int8 -> bf16 dot (fallback path)
def ke(x, w, m, o):
    p = x[0][:, 2:2 + W, :].reshape(TH * W, C).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(p, w[...].astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o[0] = jnp.clip(jnp.round(acc * m[...]), -128,
                    127).reshape(TH, W, C).astype(jnp.int8)
run("int8->bf16 dot fallback", ke)

print("done", flush=True)
