"""Batch-size sweep for the headline pipeline (real TPU).

Measures pipelined throughput (K batches in flight, one sync) for the
fused frame->mask->IPM program at several batch sizes, reusing the
persistent XLA compilation cache so repeated runs skip the long remote
compiles. Prints one line per batch size + a WINNER line.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "lanetpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.utils.timing import device_sync

    log(f"device: {jax.devices()[0]}")
    cfg = PipelineConfig(compute_dtype="bfloat16", use_mxu_resample=True)
    module = UNet(config=UNetConfig.deployed(), dtype=jnp.bfloat16)
    seg = LaneSegmenter(module=module, config=cfg)
    fn = seg._get_jitted("warped")
    thr = jnp.float32(0.5)

    rng = np.random.default_rng(0)
    results = {}
    for bs in (128, 192, 256, 384, 512):
        frames = jax.device_put(jnp.asarray(
            rng.integers(0, 256, size=(bs, 480, 640, 3), dtype=np.uint8)),
            seg.device)
        t0 = time.perf_counter()
        device_sync(fn(seg.variables, frames, thr))
        log(f"bs={bs}: first call {time.perf_counter() - t0:.1f}s")
        k = 60
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                # keep only the newest output ref: finished batches free
                # their HBM immediately instead of accumulating K buffers
                out = fn(seg.variables, frames, thr)
            device_sync(out)
            per_batch = (time.perf_counter() - t0) / k
            if best is None or per_batch < best:
                best = per_batch
        fps = bs / best
        results[bs] = fps
        log(f"bs={bs}: {best*1e3:.2f} ms/batch -> {fps:.0f} fps")
    win = max(results, key=results.get)
    log(f"WINNER bs={win}: {results[win]:.0f} fps")
    print({str(k): round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
