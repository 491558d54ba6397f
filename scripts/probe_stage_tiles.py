"""Find the compile envelope + best tile_h for the int8 fused stage on
the real toolchain: try th in {8, 16, 32, 56} on the two heavy stage
shapes, report compile ok + pipelined marginal ms.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.kernels.conv_stage_int8 import (
    fused_double_conv_int8,
    stage_requant_params,
)
from lanetpu.utils.timing import device_sync


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(name, n, h, w, cin, cmid, cout, th):
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-100, 100, (n, h, w, cin)), jnp.int8)
    w0 = jnp.asarray(rng.integers(-100, 100, (3, 3, cin, cmid)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-100, 100, (3, 3, cmid, cout)), jnp.int8)
    m0 = np.full(cmid, 1e-4, np.float32)
    b0 = np.full(cmid, -10.0, np.float32)
    m1 = np.full(cout, 1e-4, np.float32)
    b1 = np.full(cout, -10.0, np.float32)
    rec = {"shape": name, "th": th}
    try:
        t0 = time.perf_counter()
        out = fused_double_conv_int8(xq, w0, m0, b0, w1, m1, b1,
                                     zp_in=-10, zp_mid=-10, zp_out=-10,
                                     tile_h=th)
        device_sync(out)
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        k = 20
        outs = [fused_double_conv_int8(xq, w0, m0, b0, w1, m1, b1,
                                       zp_in=-10, zp_mid=-10, zp_out=-10,
                                       tile_h=th) for _ in range(k)]
        device_sync(outs[-1])
        t0 = time.perf_counter()
        outs = [fused_double_conv_int8(xq, w0, m0, b0, w1, m1, b1,
                                       zp_in=-10, zp_mid=-10, zp_out=-10,
                                       tile_h=th) for _ in range(k)]
        device_sync(outs[-1])
        rec["ms"] = round((time.perf_counter() - t0) / k * 1e3, 2)
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log(f"device: {jax.devices()[0]}  batch {bs}")
    for th in (8, 16, 32, 56):
        probe("dec2_64_32_32_224", bs, 224, 224, 64, 32, 32, th)
    for th in (8, 16, 32):
        probe("enc1_32_64_64_112", bs, 112, 112, 32, 64, 64, th)
