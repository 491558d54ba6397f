"""Headline benchmark: sustained 224x224 frame->mask->IPM throughput per chip.

Reference baseline: 122 FPS for the INT8 U-Net on the RK3588 NPU
(reference README.md:4224); the end-to-end ROS pipeline runs ~53 FPS
(README.md:4233-4255). BASELINE.json north star: >2000 fps/chip.

This bench feeds raw 480x640 BGR camera frames through the FULL fused device
pipeline (IPM warp -> BGR->RGB -> resize 224 -> normalize -> U-Net ->
sigmoid -> threshold -> resize to bird's-eye mask) — i.e. it times strictly
more work per frame than the reference's 8.2 ms NPU-only number.

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter

    dev = jax.devices()[0]
    log(f"device: {dev}")

    import jax.numpy as jnp

    cfg = PipelineConfig(compute_dtype="bfloat16")
    module = UNet(config=UNetConfig.deployed(), dtype=jnp.bfloat16)
    seg = LaneSegmenter(module=module, config=cfg)

    rng = np.random.default_rng(0)
    best = None
    for bs in (64, 256):
        frames = rng.integers(0, 256, size=(bs, 480, 640, 3), dtype=np.uint8)
        import jax.numpy as jnp

        from lanetpu.utils.timing import device_sync, time_fn

        x = jax.device_put(jnp.asarray(frames), seg.device)
        fn = seg._get_jitted("warped")
        thr = jnp.float32(0.5)
        t0 = time.perf_counter()
        device_sync(fn(x, thr))
        log(f"bs={bs}: first call (compile) {time.perf_counter() - t0:.1f}s")
        stats = time_fn(fn, x, thr, warmup=3, runs=20)
        times = [stats["avg_ms"] / 1e3]
        fps = bs / float(np.mean(times))
        log(f"bs={bs}: {np.mean(times)*1e3:.2f} ms/batch -> {fps:.0f} fps")
        if best is None or fps > best["fps"]:
            best = {"fps": fps, "batch_size": bs,
                    "ms_per_batch": float(np.mean(times) * 1e3)}

    baseline_fps = 122.0  # RK3588 NPU INT8 (README.md:4224)
    result = {
        "metric": "224x224 frames/sec/chip (frame->mask->IPM)",
        "value": round(best["fps"], 1),
        "unit": "fps",
        "vs_baseline": round(best["fps"] / baseline_fps, 2),
        "batch_size": best["batch_size"],
        "ms_per_batch": round(best["ms_per_batch"], 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
