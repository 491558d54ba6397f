"""Device race: int8-resident fused forward vs unfused int8 vs bf16.

Loads the shipped int8 U-Net artifact and measures the FULL warped
pipeline (raw BGR frame -> bird's-eye mask) in three configurations at
batch `bs`, pipelined K-deep with a single device_sync so the tunnel RTT
amortizes. Prints one JSON line per mode.

Run alone (one axon client at a time).
"""

import json
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.utils.timing import device_sync

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    log(f"device: {jax.devices()[0]}  bs={bs} K={k}")

    with open("artifacts/lane_unet/model_int8.pkl", "rb") as f:
        q = pickle.load(f)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (bs, 480, 640, 3), np.uint8)

    def bench(name, seg):
        fn = seg._get_jitted("warped")
        variables = seg.variables
        thr = np.float32(0.5)
        x = jax.device_put(frames)
        t0 = time.perf_counter()
        out = fn(variables, x, thr)
        device_sync(out)
        compile_s = time.perf_counter() - t0
        for _ in range(2):  # warm
            out = fn(variables, x, thr)
        device_sync(out)
        t0 = time.perf_counter()
        outs = [fn(variables, x, thr) for _ in range(k)]
        device_sync(outs[-1])
        dt = (time.perf_counter() - t0) / k
        print(json.dumps({
            "mode": name, "bs": bs, "k": k,
            "compile_s": round(compile_s, 1),
            "ms_per_batch": round(dt * 1e3, 2),
            "fps": round(bs / dt, 1),
        }), flush=True)

    cfg = PipelineConfig(compute_dtype="float32", use_mxu_resample=True)
    try:
        bench("int8_fused",
              LaneSegmenter.from_quantized(q, cfg, mode="int8_fused"))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"mode": "int8_fused",
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
    bench("int8", LaneSegmenter.from_quantized(q, cfg, mode="int8"))

    cfg_bf = PipelineConfig(compute_dtype="bfloat16", use_mxu_resample=True)
    seg_bf = LaneSegmenter(module=UNet(config=UNetConfig.deployed()),
                           config=cfg_bf)
    bench("bf16_random_weights", seg_bf)


if __name__ == "__main__":
    main()
