"""Analytic per-stage roofline for the lane U-Net programs on TPU v5e.

Answers VERDICT r2 'weak #4': is the measured ~52 % MFU a real XLA
ceiling or just the best configuration found? For every stage of each
topology this computes the FLOPs and the minimum HBM traffic, takes the
v5e roofline bounds (197 TFLOP/s bf16, 819 GB/s HBM), and prints the
per-stage bound, the program's roofline-limit time, and the ceiling MFU —
the number an IDEAL schedule (perfect fusion, no re-reads beyond the
algorithmic minimum) could reach. Pure host arithmetic: no jax, runs
anywhere, deterministic.

Model: UNet (models/unet.py) — 3-level encoder/decoder, double convs,
2x2 maxpools, 2x2-stride-2 transposed convs, skip concats. Measured
end-to-end ms/batch from docs/performance.md anchor the comparison.
"""

import json
import sys

PEAK_TFLOPS = 197e12    # v5e bf16
PEAK_HBM = 819e9        # v5e bytes/s
B = 256                 # production batch
BYTES = 2               # bf16


def conv(h, w, cin, cout, k=3):
    """(flops, min_bytes, lane_occupancy) for one conv (SAME, stride 1).

    lane_occupancy = min(cout,128)/128: the MXU is a 128x128 systolic
    array; a conv writing cout<128 output channels can fill at most
    cout/128 of its columns per pass (XLA's generic conv does not batch
    multiple spatial positions into the lane axis). This is the
    hardware's granularity penalty for narrow convnets, independent of
    scheduling quality."""
    flops = 2.0 * h * w * k * k * cin * cout * B
    bytes_ = (h * w * cin + h * w * cout) * B * BYTES + k * k * cin * cout * BYTES
    return flops, bytes_, min(cout, 128) / 128.0


def pool(h, w, c):
    return 0.0, (h * w * c + (h // 2) * (w // 2) * c) * B * BYTES, 1.0


def convt(h, w, cin, cout):
    """2x2 s2 transposed conv from HxW -> 2Hx2W."""
    flops = 2.0 * (2 * h) * (2 * w) * cin * cout * B  # one tap per output
    bytes_ = (h * w * cin + 4 * h * w * cout) * B * BYTES + 4 * cin * cout * BYTES
    return flops, bytes_, min(cout, 128) / 128.0


def unet_stages(side, features, in_ch, unpack):
    """Stage list for the shipped UNet (models/unet.py): N encoder levels
    with widths `features` (3 for the deployed tiers, 4 for the README
    preset), a bottleneck at 2x the deepest width, N pools, N transposed
    convs, double convs + 1x1 head. Stage names follow encoder-level
    numbering (decN = the full-resolution decoder level)."""
    n = len(features)
    fb = 2 * features[-1]
    sides = [side // (2 ** i) for i in range(n + 1)]
    st = []
    prev = in_ch
    for i, f in enumerate(features):
        s = sides[i]
        st += [(f"enc{i}a", conv(s, s, prev, f)),
               (f"enc{i}b", conv(s, s, f, f)),
               (f"pool{i}", pool(s, s, f))]
        prev = f
    sb = sides[n]
    st += [("bota", conv(sb, sb, features[-1], fb)),
           ("botb", conv(sb, sb, fb, fb))]
    prev = fb
    for i in reversed(range(n)):
        f = features[i]
        s_in, s_out = sides[i + 1], sides[i]
        st += [(f"up{i}", convt(s_in, s_in, prev, f)),
               (f"dec{i}a", conv(s_out, s_out, f + f, f)),
               (f"dec{i}b", conv(s_out, s_out, f, f))]
        prev = f
    st.append(("head", conv(side, side, features[0], unpack, k=1)))
    return st


TOPOLOGIES = {
    # name: (stages, measured ms/batch-256 end-to-end from docs; None =
    # bound-only, not yet measured at bs=256)
    "parity": (unet_stages(224, (32, 64, 128), 3, 1), 35.8),
    "s2d2": (unet_stages(112, (32, 64, 128), 12, 4), 12.0),
    "s2d4-wide": (unet_stages(56, (48, 96, 192), 48, 16), 7.2),
    # the reference's documented 4-level model (README.md:1417-1503):
    # >=128-wide in 3 of 4 levels — the wide-MFU datapoint
    "readme-4L": (unet_stages(224, (64, 128, 256, 512), 3, 1), None),
}

# Non-UNet pipeline stages (MXU-matmul resampling, kernels/resample.py):
# camera->224^2 composed warp = two matmul passes, mask 224^2 -> 685x1055
# upscale = two matmul passes. FLOPs are real MXU work here, not just IO.
PIPE_FLOPS = (2 * 224 * 480 * 640 * 3      # warp pass 1 (H)
              + 2 * 224 * 224 * 640 * 3    # warp pass 2 (W)
              + 2 * 685 * 224 * 224        # upscale pass 1
              + 2 * 685 * 1055 * 224) * B
PIPE_BYTES = (480 * 640 * 3 * 1        # camera frame read (u8)
              + 224 * 224 * 3 * BYTES * 2   # warp out + normalize out
              + 224 * 224 * 1 * 1      # final mask (u8)
              + 685 * 1055 * 1 * 1) * B  # upscaled bird's-eye mask (u8)


def main():
    out = {}
    for name, (stages, measured_ms) in TOPOLOGIES.items():
        rows, tot_f, tot_b, tot_t, tot_tc = [], 0.0, 0.0, 0.0, 0.0
        for sname, (f, by, occ) in stages:
            tf = f / PEAK_TFLOPS
            tfc = f / (PEAK_TFLOPS * occ)  # lane-occupancy-capped
            tm = by / PEAK_HBM
            rows.append((sname, f, by, tf, tfc, tm,
                         "flops" if tf >= tm else "hbm"))
            tot_f += f
            tot_b += by
            tot_t += max(tf, tm)
            tot_tc += max(tfc, tm)
        pipe_t = max(PIPE_BYTES / PEAK_HBM, PIPE_FLOPS / PEAK_TFLOPS)
        tot_f += PIPE_FLOPS
        tot_t += pipe_t
        tot_tc += pipe_t
        ceiling_ms = tot_t * 1e3
        capped_ms = tot_tc * 1e3
        ceiling_mfu = (tot_f / PEAK_TFLOPS) / tot_t
        achieved_mfu = ((tot_f / PEAK_TFLOPS) / (measured_ms / 1e3)
                        if measured_ms else None)
        print(f"\n== {name}: {tot_f/B/1e9:.2f} GFLOP/frame, "
              f"{tot_b/B/1e6:.2f} MB/frame min traffic ==")
        print(f"{'stage':8s} {'GFLOP':>8s} {'MB':>8s} {'t_flops':>9s} "
              f"{'t_cap':>9s} {'t_hbm':>9s} bound")
        for sname, f, by, tf, tfc, tm, bound in rows:
            print(f"{sname:8s} {f/1e9:8.1f} {by/1e6:8.1f} "
                  f"{tf*1e3:8.3f}m {tfc*1e3:8.3f}m {tm*1e3:8.3f}m {bound}")
        print(f"pipeline overhead (warp/resize/mask IO): {pipe_t*1e3:.2f} ms")
        meas = (f"measured {measured_ms:.1f} ms" if measured_ms
                else "not yet measured at bs=256")
        print(f"ideal roofline: {ceiling_ms:.2f} ms | lane-capped "
              f"roofline: {capped_ms:.2f} ms | {meas}")
        if achieved_mfu is not None:
            print(f"ceiling MFU {ceiling_mfu*100:.0f} % | achieved "
                  f"{achieved_mfu*100:.0f} % | vs lane-capped "
                  f"{capped_ms/measured_ms*100:.0f} %")
        else:
            print(f"ceiling MFU {ceiling_mfu*100:.0f} %")
        out[name] = {"gflop_frame": round(tot_f / B / 1e9, 2),
                     "min_mb_frame": round(tot_b / B / 1e6, 2),
                     "roofline_ms": round(ceiling_ms, 2),
                     "lane_capped_ms": round(capped_ms, 2),
                     "measured_ms": measured_ms,
                     "ceiling_mfu": round(ceiling_mfu, 3)}
        if achieved_mfu is not None:
            out[name]["achieved_mfu"] = round(achieved_mfu, 3)
            out[name]["vs_lane_capped"] = round(capped_ms / measured_ms, 3)
    print("\n" + json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
