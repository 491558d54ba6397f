"""Headline benchmark: sustained 224x224 frame->mask->IPM throughput per chip.

Reference baseline: 122 FPS for the INT8 U-Net alone on the RK3588 NPU
(reference README.md:4224); its full per-frame pipeline (capture->publish)
runs ~53 FPS (README.md:4233-4255). BASELINE.json north star: >2000 fps/chip.

This bench feeds raw 480x640 BGR camera frames through the FULL fused device
pipeline (IPM warp -> BGR->RGB -> 224x224 -> normalize -> U-Net -> sigmoid
-> threshold -> upscale to the 1055x685 bird's-eye mask) — strictly more
work per frame than the reference's NPU-only number. The pipeline is the
MXU fast path: all resampling as matmuls, no gathers.

Throughput is measured pipelined (K batches in flight, one sync), the way
the streaming runner executes; single-batch latency is also reported.
NOTE: on this environment `block_until_ready` does not actually block
(tunneled axon backend) — sync is a 1-element host fetch (utils.timing).

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _enable_compilation_cache():
    """Persist XLA compilations across runs — remote compiles can take
    minutes; the cache makes repeated bench invocations start instantly."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "LANETPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "lanetpu", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def main():
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.utils.timing import device_sync

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = PipelineConfig(compute_dtype="bfloat16", use_mxu_resample=True)
    module = UNet(config=UNetConfig.deployed(), dtype=jnp.bfloat16)
    seg = LaneSegmenter(module=module, config=cfg)
    fn = seg._get_jitted("warped")
    thr = jnp.float32(0.5)

    rng = np.random.default_rng(0)
    best = None
    # batch 256 is the measured sweet spot (docs/performance.md); a single
    # configuration keeps the run to one (cached) compile
    for bs in (256,):
        frames = jax.device_put(jnp.asarray(
            rng.integers(0, 256, size=(bs, 480, 640, 3), dtype=np.uint8)),
            seg.device)
        t0 = time.perf_counter()
        device_sync(fn(seg.variables, frames, thr))
        log(f"bs={bs}: first call (compile) {time.perf_counter() - t0:.1f}s")
        # single-batch latency
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            device_sync(fn(seg.variables, frames, thr))
            lat.append(time.perf_counter() - t0)
        # pipelined throughput (K batches in flight, one sync)
        k = 10
        t0 = time.perf_counter()
        outs = [fn(seg.variables, frames, thr) for _ in range(k)]
        device_sync(outs[-1])
        per_batch = (time.perf_counter() - t0) / k
        fps = bs / per_batch
        log(f"bs={bs}: latency {min(lat)*1e3:.1f} ms | pipelined "
            f"{per_batch*1e3:.2f} ms/batch -> {fps:.0f} fps")
        if best is None or fps > best["fps"]:
            best = {"fps": fps, "batch_size": bs,
                    "ms_per_batch": per_batch * 1e3,
                    "latency_ms": min(lat) * 1e3}

    baseline_fps = 122.0  # RK3588 NPU INT8, model-only (README.md:4224)
    result = {
        "metric": "224x224 frames/sec/chip (frame->mask->IPM)",
        "value": round(best["fps"], 1),
        "unit": "fps",
        "vs_baseline": round(best["fps"] / baseline_fps, 2),
        "batch_size": best["batch_size"],
        "ms_per_batch": round(best["ms_per_batch"], 3),
        "single_batch_latency_ms": round(best["latency_ms"], 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
