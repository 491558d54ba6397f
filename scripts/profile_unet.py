"""On-chip per-stage profile of ANY shipped U-Net artifact vs its
lane-capped roofline bounds (generalizes scripts/profile_s2d4.py to N
levels — VERDICT r4 weak #8: the readme 4-level preset's 61.6% MFU vs its
90% analytic ceiling had no stage decomposition).

Technique: build PREFIX programs — the U-Net run only up to stage k — time
each pipelined (K batches, one sync, floors cancel), and take marginal
differences. XLA fuses across stage boundaries, so a marginal is the cost
of the added stage under the real schedule, not in isolation.

Run on the TPU (single client):
    python scripts/profile_unet.py artifacts/lane_unet_readme/best_model.ltpu \
        --batch 64 --out artifacts/readme_profile.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import numpy as np


def profile_artifact(path: str, batch: int = 256, out_path: str | None = None,
                     k: int = 30, reps: int = 3) -> dict:
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

    _, variables, meta = load_engine(path)
    cfg = UNetConfig(features=tuple(meta["features"]),
                     s2d=int(meta.get("s2d", 1)))
    DT = jnp.bfloat16
    L = len(cfg.features)

    stops = ["s2d"] if cfg.s2d > 1 else []
    for i in range(L):
        stops += [f"enc{i}", f"pool{i}"]
    stops.append("bottleneck")
    for i in range(L):
        stops += [f"up{i}", f"dec{i}"]
    stops.append("head")

    class PrefixUNet(nn.Module):
        """UNet prefix: same submodule names as models.unet.UNet, so the
        shipped variables apply directly; returns after `stop`."""

        stop: str

        @nn.compact
        def __call__(self, x):
            def done(name):
                return name == self.stop

            if cfg.s2d > 1:
                x = space_to_depth(x, cfg.s2d)
            if done("s2d"):
                return x
            skips = []
            for i, f in enumerate(cfg.features):
                x = ConvBlock(f, cfg.use_batchnorm, DT, name=f"enc{i}")(x)
                if done(f"enc{i}"):
                    return x
                skips.append(x)
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                if done(f"pool{i}"):
                    return x
            x = ConvBlock(cfg.features[-1] * 2, cfg.use_batchnorm, DT,
                          name="bottleneck")(x)
            if done("bottleneck"):
                return x
            for i, f in enumerate(reversed(cfg.features)):
                x = nn.ConvTranspose(f, kernel_size=(2, 2), strides=(2, 2),
                                     dtype=DT, name=f"up{i}")(x)
                if done(f"up{i}"):
                    return x
                x = jnp.concatenate([skips[-(i + 1)], x], axis=-1)
                x = ConvBlock(f, cfg.use_batchnorm, DT, name=f"dec{i}")(x)
                if done(f"dec{i}"):
                    return x
            x = nn.Conv(cfg.out_channels * cfg.s2d * cfg.s2d,
                        kernel_size=(1, 1), dtype=DT, name="head")(x)
            x = depth_to_space(x, cfg.s2d)
            return x

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, 224, 224, 3)).astype(np.float32)))

    def reduced(mod):
        """Prefix program with a scalar-sum epilogue: forces the whole
        prefix to execute but avoids materializing the (potentially
        enormous) intermediate to HBM — which the REAL program also never
        does at fusion boundaries. Without this, wide full-res prefixes
        (readme preset: 224²x64 bf16 = 6.4 MB/frame at enc0) spend more
        time writing their return value than computing, and marginals go
        negative (observed: pool0 −6.7 ms, head −22.9 ms at batch 64)."""
        return jax.jit(lambda xx, m=mod: jnp.sum(
            m.apply(variables, xx).astype(jnp.float32)))

    def timed(fn):
        out = fn(x)
        device_sync(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(x)
            device_sync(o)
            best = min(best, (time.perf_counter() - t0) / k)
        return best * 1e3  # ms/batch

    results = {"_artifact": path, "_batch": batch}
    prev = 0.0
    for stop in stops:
        fn = reduced(PrefixUNet(stop=stop))
        t0 = time.time()
        ms = timed(fn)
        results[stop] = {"prefix_ms": round(ms, 3),
                         "marginal_ms": round(ms - prev, 3)}
        print(f"[{time.strftime('%H:%M:%S')}] {stop:11s} prefix "
              f"{ms:7.3f} ms  marginal {ms - prev:7.3f} ms  "
              f"(compile+run {time.time() - t0:.0f}s)", flush=True)
        prev = ms
        if out_path:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)  # survive a timeout/kill

    # Lane-capped roofline bounds per stage group. roofline.py numbers
    # decoder levels by ENCODER depth (its dec{L-1} = the model's first
    # decoder iteration dec0) — the groups map aligns the conventions.
    try:
        sys.path.insert(0, "scripts")
        import roofline

        side = 224 // cfg.s2d
        stages = dict(roofline.unet_stages(
            side, tuple(cfg.features), 3 * cfg.s2d * cfg.s2d,
            cfg.out_channels * cfg.s2d * cfg.s2d))
        groups = {"s2d": []}
        for i in range(L):
            groups[f"enc{i}"] = [f"enc{i}a", f"enc{i}b"]
            groups[f"pool{i}"] = [f"pool{i}"]
        groups["bottleneck"] = ["bota", "botb"]
        for i in range(L):
            j = L - 1 - i
            groups[f"up{i}"] = [f"up{j}"]
            groups[f"dec{i}"] = [f"dec{j}a", f"dec{j}b"]
        groups["head"] = ["head"]
        bounds = {}
        scale = batch / roofline.B  # roofline stages bake in B=256
        for gname, members in groups.items():
            t = 0.0
            for m in members:
                flops, bytes_, lane = stages[m]
                t += max(flops * scale / (roofline.PEAK_TFLOPS * lane),
                         bytes_ * scale / roofline.PEAK_HBM)
            bounds[gname] = round(t * 1e3, 3)
        results["_lane_capped_bounds_ms"] = bounds
        for gname in bounds:
            if gname in results and bounds[gname] > 0:
                results[gname]["vs_bound"] = round(
                    results[gname]["marginal_ms"] / bounds[gname], 2)
    except Exception as exc:  # noqa: BLE001
        results["_bounds_error"] = str(exc)[:200]

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = profile_artifact(args.artifact, args.batch, args.out)
    print(json.dumps({kk: vv for kk, vv in res.items()
                      if not kk.startswith("_")}, indent=1))
