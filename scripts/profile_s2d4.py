"""On-chip per-stage profile of the s2d4-wide program vs its roofline
bounds (VERDICT r3 item 4: s2d4 measures 86% of its lane-capped roofline
while parity beats its cap — WHICH stage misses its bound?).

Technique (same as the parity table in docs/performance.md "Where the
time goes"): build PREFIX programs — the U-Net run only up to stage k —
time each pipelined (K batches, one sync, floors cancel), and take
marginal differences. XLA fuses across stage boundaries, so a marginal is
the cost of the added stage under the real schedule, not in isolation.

Run on the TPU (single client): python scripts/profile_s2d4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from lanetpu.core.config import UNetConfig
    from lanetpu.models.unet import ConvBlock
    from lanetpu.ops.space2depth import depth_to_space, space_to_depth
    from lanetpu.runtime.engine import load_engine
    from lanetpu.utils.timing import device_sync

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _, variables, meta = load_engine("artifacts/lane_unet_s2d4/best_model.ltpu")
    cfg = UNetConfig(features=tuple(meta["features"]), s2d=meta["s2d"])
    DT = jnp.bfloat16

    # Stage schedule: prefix stops, in execution order. Names align with
    # scripts/roofline.py's stage groups for the bound comparison.
    STOPS = ["s2d", "enc0", "pool0", "enc1", "pool1", "enc2", "pool2",
             "bottleneck", "up0", "dec0", "up1", "dec1", "up2", "dec2",
             "head"]

    class PrefixUNet(nn.Module):
        """UNet prefix: same submodule names as models.unet.UNet, so the
        shipped variables apply directly; returns after `stop`."""

        stop: str

        @nn.compact
        def __call__(self, x):
            def done(name, val):
                return name == self.stop

            if cfg.s2d > 1:
                x = space_to_depth(x, cfg.s2d)
            if done("s2d", x):
                return x
            skips = []
            for i, f in enumerate(cfg.features):
                x = ConvBlock(f, cfg.use_batchnorm, DT, name=f"enc{i}")(x)
                if done(f"enc{i}", x):
                    return x
                skips.append(x)
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                if done(f"pool{i}", x):
                    return x
            x = ConvBlock(cfg.features[-1] * 2, cfg.use_batchnorm, DT,
                          name="bottleneck")(x)
            if done("bottleneck", x):
                return x
            for i, f in enumerate(reversed(cfg.features)):
                x = nn.ConvTranspose(f, kernel_size=(2, 2), strides=(2, 2),
                                     dtype=DT, name=f"up{i}")(x)
                if done(f"up{i}", x):
                    return x
                x = jnp.concatenate([skips[-(i + 1)], x], axis=-1)
                x = ConvBlock(f, cfg.use_batchnorm, DT, name=f"dec{i}")(x)
                if done(f"dec{i}", x):
                    return x
            x = nn.Conv(cfg.out_channels * cfg.s2d * cfg.s2d,
                        kernel_size=(1, 1), dtype=DT, name="head")(x)
            x = depth_to_space(x, cfg.s2d)
            return x

    B, K, REPS = 256, 30, 3
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(B, 224, 224, 3)).astype(np.float32)))

    def timed(fn):
        out = fn(x)
        device_sync(out)
        best = np.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            o = None
            for _ in range(K):
                o = fn(x)
            device_sync(o)
            best = min(best, (time.perf_counter() - t0) / K)
        return best * 1e3  # ms/batch

    results = {}
    prev = 0.0
    for stop in STOPS:
        mod = PrefixUNet(stop=stop)
        fn = jax.jit(lambda xx, m=mod: m.apply(variables, xx))
        t0 = time.time()
        ms = timed(fn)
        results[stop] = {"prefix_ms": round(ms, 3),
                         "marginal_ms": round(ms - prev, 3)}
        print(f"[{time.strftime('%H:%M:%S')}] {stop:11s} prefix "
              f"{ms:7.3f} ms  marginal {ms - prev:7.3f} ms  "
              f"(compile+run {time.time() - t0:.0f}s)", flush=True)
        prev = ms
        with open("artifacts/s2d4_profile.json", "w") as f:
            json.dump(results, f, indent=1)  # survive a timeout/kill

    # Roofline bounds per stage group (lane-capped), from scripts/roofline.py.
    # roofline names stages enc0a/enc0b/bota/... and numbers decoder levels
    # by ENCODER depth (its dec2 = deepest = the model's first decoder loop
    # iteration dec0) — the GROUPS map aligns the two conventions.
    try:
        sys.path.insert(0, "scripts")
        import roofline

        side = 224 // cfg.s2d
        stages = dict(roofline.unet_stages(
            side, tuple(meta["features"]), 3 * cfg.s2d * cfg.s2d,
            cfg.out_channels * cfg.s2d * cfg.s2d))
        groups = {
            "s2d": [], "enc0": ["enc0a", "enc0b"], "pool0": ["pool0"],
            "enc1": ["enc1a", "enc1b"], "pool1": ["pool1"],
            "enc2": ["enc2a", "enc2b"], "pool2": ["pool2"],
            "bottleneck": ["bota", "botb"],
            "up0": ["up2"], "dec0": ["dec2a", "dec2b"],
            "up1": ["up1"], "dec1": ["dec1a", "dec1b"],
            "up2": ["up0"], "dec2": ["dec0a", "dec0b"],
            "head": ["head"],
        }
        bounds = {}
        for gname, members in groups.items():
            t = 0.0
            for m in members:
                flops, bytes_, lane = stages[m]
                t += max(flops / (roofline.PEAK_TFLOPS * lane),
                         bytes_ / roofline.PEAK_HBM)
            bounds[gname] = round(t * 1e3, 3)
        results["_lane_capped_bounds_ms"] = bounds
        for gname in bounds:
            if gname in results and bounds[gname] > 0:
                results[gname]["vs_bound"] = round(
                    results[gname]["marginal_ms"] / bounds[gname], 2)
    except Exception as exc:  # noqa: BLE001
        results["_bounds_error"] = str(exc)[:200]

    with open("artifacts/s2d4_profile.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not k.startswith("_")}, indent=1))


if __name__ == "__main__":
    main()
