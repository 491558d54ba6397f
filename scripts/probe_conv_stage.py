"""Device probe for the v2 fused stage kernel (kernels/conv_stage.py).

Compiles the kernel on the real TPU for the U-Net's HBM-bound stage
shapes, checks parity against the XLA double-conv, and measures the
marginal cost of each variant pipelined (K dispatches, one sync) so the
~25 ms tunnel RTT cancels. Prints one JSON line per shape.

Run alone (one axon client at a time):  python scripts/probe_conv_stage.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.kernels.conv_stage import (
    fused_double_conv,
    reference_double_conv,
)
from lanetpu.utils.timing import device_sync


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, args, k=30):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    for o in outs:
        pass
    device_sync(outs[-1])
    return (time.perf_counter() - t0) / k * 1e3


def probe(name, n, h, w, cin, cmid, cout, tile_h, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)),
                    dtype).block_until_ready()
    w0 = jnp.asarray(rng.standard_normal((3, 3, cin, cmid)) * 0.1,
                     jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cmid, cout)) * 0.1,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(cout), jnp.float32)

    ref_fn = jax.jit(lambda *a: reference_double_conv(*a,
                                                      compute_dtype=dtype))
    rec = {"shape": name, "n": n, "hw": [h, w],
           "c": [cin, cmid, cout], "tile_h": tile_h}
    try:
        t0 = time.perf_counter()
        got = fused_double_conv(x, w0, b0, w1, b1, tile_h=tile_h,
                                compute_dtype=dtype)
        device_sync(got)
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {str(e)[:400]}"
        print(json.dumps(rec), flush=True)
        return
    ref = ref_fn(x, w0, b0, w1, b1)
    device_sync(ref)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    rec["max_abs_err"] = err
    rec["rel_err"] = err / scale
    fused = lambda *a: fused_double_conv(*a, tile_h=tile_h,
                                         compute_dtype=dtype)
    rec["fused_ms"] = round(timed(fused, (x, w0, b0, w1, b1)), 3)
    rec["xla_ms"] = round(timed(ref_fn, (x, w0, b0, w1, b1)), 3)
    rec["speedup"] = round(rec["xla_ms"] / rec["fused_ms"], 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log(f"device: {jax.devices()[0]}  batch {bs}")
    # the three HBM-bound stage shapes from docs/performance.md
    probe("enc0", bs, 224, 224, 3, 32, 32, tile_h=8)
    probe("dec2", bs, 224, 224, 64, 32, 32, tile_h=8)
    probe("enc1", bs, 112, 112, 32, 64, 64, tile_h=8)
