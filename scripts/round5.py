"""Round-5 stages (VERDICT r4 docket): convention-matched real-pool
retrain (golden-gap closure), s2d distillation recovery, painted-line
xcoords retrain, hard-v2 detector tier, camera-path threshold
recalibration, resolution-scaling sweep, readme-preset per-stage profile.

Run on the TPU (single client!):  python scripts/round5.py [stage...]
Writes artifacts/* and appends per-stage results to
artifacts/round5_report.json. Stages are resumable where they are long.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

REPORT = "artifacts/round5_report.json"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def record(stage, payload):
    rep = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            rep = json.load(f)
    rep[stage] = payload
    with open(REPORT, "w") as f:
        json.dump(rep, f, indent=1, sort_keys=True)
    log(f"stage {stage}: {json.dumps(payload)[:400]}")


def _cache():
    import jax

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _quick_golden(art_dir, threshold=None):
    """Fast golden-frame readout at the production operating point."""
    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    module, variables, _ = load_engine(f"{art_dir}/best_model.ltpu")
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="float32"))
    s = real.golden_warped_score(seg, threshold=threshold)
    return {"iou": round(s["iou"], 4),
            "near_iou": round(s["near_field"]["iou"], 4),
            "near_precision": round(s["near_field"]["precision"], 4),
            "centerline_recall": round(s["centerline_recall"], 4)}


def _train_unet(stage, save_dir, s2d=1, features=(32, 64, 128),
                epochs=120, real_pool=192, distill="", tb=False):
    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    _cache()
    cfg = TrainConfig(epochs=epochs, num_train=512, num_val=64, s2d=s2d,
                      features=tuple(features), save_dir=save_dir,
                      real_pool=real_pool, distill_checkpoint=distill,
                      tensorboard_dir=(f"artifacts/_tb/{stage}" if tb
                                       else ""))
    t0 = time.time()
    result = Trainer(cfg).fit()
    out = {"best_dice": result["best_dice"],
           "best_epoch": result["best_epoch"],
           "epochs_run": len(result["history"]),
           "pool_thr": cfg.real_pool_thr,
           "distill": bool(distill),
           "wall_s": round(time.time() - t0, 1)}
    try:
        out["golden"] = _quick_golden(save_dir)
    except Exception as exc:  # noqa: BLE001
        out["golden_error"] = str(exc)[:200]
    record(stage, out)


def stage_unet():
    """Parity tier on the CONVENTION-MATCHED pool (pseudo-labels at the
    scoring threshold 140 — VERDICT r4 item 1)."""
    _train_unet("unet", "artifacts/lane_unet", tb=True)


def stage_unet_s2d2():
    """s2d2 tier DISTILLED from the parity teacher (VERDICT r4 item 2:
    the one recovery lever both failed schedules skipped)."""
    _train_unet("unet_s2d2", "artifacts/lane_unet_s2d", s2d=2,
                distill="artifacts/lane_unet/best_model.ltpu")


def stage_unet_s2d4():
    _train_unet("unet_s2d4", "artifacts/lane_unet_s2d4", s2d=4,
                features=(48, 96, 192),
                distill="artifacts/lane_unet/best_model.ltpu")


def stage_s2d4_capacity():
    """Width-capacity probe for the s2d4 plateau (VERDICT r4 item 2's
    alternative branch): four independent schedules put the SHIPPED
    48/96/192 s2d4 tier at 0.974-0.978 (120ep r4 0.9780; 40ep warm-start
    no-beat; 150ep/768 0.9743; 120ep distill-from-0.9812 r5 0.9775),
    while the identical distill recipe lifts s2d2 past 0.98 (0.9805). If
    ONE wider s2d4 variant (64/128/256, ~1.77x the FLOPs) clears 0.98
    under the same recipe, the plateau is demonstrated to be width
    capacity at 4x packing, not training budget. Study artifact only
    (artifacts/_s2d4_capacity, gitignored) — the shipped tier keeps its
    speed point."""
    _train_unet("s2d4_capacity", "artifacts/_s2d4_capacity", s2d=4,
                features=(64, 128, 256), epochs=120,
                distill="artifacts/lane_unet/best_model.ltpu")


def stage_thr_calib():
    """Camera-path operating point, recalibrated on the round-5 pool
    convention: sweep the decision threshold over the POOL frames
    (normal_raw + IPM.jpg, clean + capture-degraded variants — NEVER the
    golden eval frame), score vs each variant's own photometric truth at
    the scoring convention (140), and pick the IoU-maximizing threshold
    subject to precision >= 0.95."""
    import numpy as np

    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.train.synthetic import _lowres_degrade

    _cache()
    module, variables, _ = load_engine("artifacts/lane_unet/best_model.ltpu")
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="float32"))
    frames = real.demo_frames()
    variants = []
    for name in ("normal_raw", "ipm"):
        img = frames[name]
        variants.append((f"{name}/clean", img))
        deg = np.clip(_lowres_degrade(img.astype(np.float32), 3),
                      0, 255).astype(np.uint8)
        variants.append((f"{name}/lowres3", deg))
        # anisotropic horizontal smear (the golden far-field stretch)
        f = 4
        c = img.astype(np.float32).copy()
        wc = c.shape[1] - c.shape[1] % f
        small = c[:, :wc].reshape(c.shape[0], wc // f, f, 3).mean(axis=2)
        c[:, :wc] = np.repeat(small, f, axis=1)
        variants.append((f"{name}/smear4",
                         np.clip(c, 0, 255).astype(np.uint8)))
    sweep = {}
    for thr in (0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50):
        ious, precs = [], []
        for _, img in variants:
            truth = real.photometric_lane_truth(img, white_thr=140)
            valid = real.valid_region(img)
            pred = seg.predict_batch(img[None], threshold=thr)[0] > 127
            s = real.mask_iou_dice(pred & valid, truth)
            ious.append(s["iou"])
            precs.append(s["precision"])
        sweep[f"{thr:.2f}"] = {"mean_iou": round(float(np.mean(ious)), 4),
                               "min_precision": round(float(np.min(precs)), 4)}
        log(f"thr {thr:.2f}: iou {np.mean(ious):.4f} "
            f"minprec {np.min(precs):.4f}")
    ok = {t: v for t, v in sweep.items() if v["min_precision"] >= 0.95}
    best = max(ok or sweep, key=lambda t: sweep[t]["mean_iou"])
    out = {"sweep": sweep, "best_thr": float(best),
           "golden_at_best": None}
    try:
        out["golden_at_best"] = _quick_golden("artifacts/lane_unet",
                                              threshold=float(best))
    except Exception as exc:  # noqa: BLE001
        out["golden_error"] = str(exc)[:200]
    record("thr_calib", out)


def stage_quant_unet():
    """Folded .pkl (parity topology) + generic int8 .ltpu + deploy twin
    for all three U-Net tiers (same recipe as rounds 3/4)."""
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lanetpu.quant import (calibrate_unet, fold_unet_batchnorm,
                               parity_report, quantize_unet,
                               unet_forward_folded)
    from lanetpu.quant.pipeline import lane_batches, quantize_checkpoint
    from lanetpu.runtime.engine import load_engine, make_deploy_artifact

    _cache()
    model = "artifacts/lane_unet/best_model.ltpu"
    _, variables, meta = load_engine(model)
    features = tuple(meta["features"])
    folded = fold_unet_batchnorm(variables, features)
    batches = lane_batches(100, seed=123)
    ranges = calibrate_unet(folded, features, batches)
    q = quantize_unet(folded, features, ranges,
                      final_sigmoid=meta.get("final_sigmoid", False))
    x = jnp.asarray(batches[0])
    fp_fn = jax.jit(lambda v: jax.nn.sigmoid(
        unet_forward_folded(folded, v, features)))
    i8_fn = jax.jit(lambda v: jax.nn.sigmoid(q.forward(v, mode="int8")))
    rep_folded = parity_report(np.asarray(fp_fn(x)), np.asarray(i8_fn(x)))
    with open("artifacts/lane_unet/model_int8.pkl", "wb") as f:
        pickle.dump(q, f)
    out = {"folded": rep_folded}
    for d in ("lane_unet", "lane_unet_s2d", "lane_unet_s2d4"):
        rep = quantize_checkpoint(f"artifacts/{d}/best_model.ltpu",
                                  f"artifacts/{d}/model_int8.ltpu",
                                  calib_images=100)
        dep = f"artifacts/{d}/model_int8_deploy.ltpu"
        if os.path.exists(dep):
            os.remove(dep)
        make_deploy_artifact(f"artifacts/{d}/model_int8.ltpu", dep)
        rep["deploy_bytes"] = os.path.getsize(dep)
        out[d] = rep
        record("quant_unet_progress", out)
    record("quant_unet", out)


def stage_scenes():
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.eval.scenes import evaluate_by_scene
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    _cache()
    _, variables, meta = load_engine("artifacts/lane_unet/best_model.ltpu")
    module = UNet(config=UNetConfig(features=tuple(meta["features"])),
                  dtype=jnp.bfloat16)
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="bfloat16"))
    rep = evaluate_by_scene(seg.predict_batch, num_samples=140,
                            offset=2048, batch_size=28)
    out = {k: {m: round(v, 4) for m, v in d.items()} for k, d in rep.items()}
    with open("artifacts/lane_unet/scenes.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    record("scenes", out)


def _lane_tiers():
    tiers = []
    for d in ("lane_unet", "lane_unet_s2d", "lane_unet_s2d4"):
        tiers.append((d, f"artifacts/{d}/best_model.ltpu", None))
        tiers.append((f"{d}_int8", f"artifacts/{d}/model_int8.ltpu", "int8"))
    return tiers


def stage_real_eval():
    """Score every lane tier on the reference's real frames. Round-5
    targets (VERDICT r4 item 1): golden centerline recall >= 0.86
    (ceiling 0.875), whole-warp IoU >= 0.65, near precision >= 0.95."""
    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.runtime.engine import build_apply_fn, load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    _cache()
    assert real.assets_present(), "reference demo assets not mounted"
    out = {"ipm_warp": real.ipm_warp_score()}
    for name, path, quant in _lane_tiers():
        module, variables, meta = load_engine(path)
        if quant:
            seg = LaneSegmenter(
                module=module, variables=variables,
                config=PipelineConfig(compute_dtype="float32"),
                forward_fn=build_apply_fn(module, meta))
        else:
            seg = LaneSegmenter(module=module, variables=variables,
                                config=PipelineConfig(
                                    compute_dtype="float32"))
        entry = real.reference_demo_score(seg)
        entry["birdseye"] = real.birdseye_frame_scores(seg)
        entry["golden_warped"] = real.golden_warped_score(seg)
        if name == "lane_unet":
            entry["conditions"] = real.condition_stability_score(seg)
        out[name] = entry
        log(name, json.dumps(entry)[:240])
        record("real_eval_progress", {name: entry})
    record("real_eval", out)


def stage_points():
    """xcoords tiers on the painted-line-center label convention
    (VERDICT r4 item 3: restore the 0.05 gate). Centerline tiers keep
    their round-4 artifacts (convention unchanged, gate already 0.05)."""
    from lanetpu.train.points_task import train_points

    _cache()
    out = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            out = json.load(f).get("points_progress", {})
    for mode, depth, epochs, path in (
            ("xcoords", 50, 60, "artifacts/points_xcoords.ltpu"),
            ("xcoords", 18, 30, "artifacts/points_xcoords_r18.ltpu")):
        key = f"{mode}_r{depth}"
        if key in out and out[key].get("round") == 5:
            log(f"points {key}: already done, skipping")
            continue
        t0 = time.time()
        result = train_points(mode=mode, depth=depth, epochs=epochs,
                              num_train=512, num_val=64, batch_size=16,
                              save_path=path)
        out[key] = {"val_mae": result["final_val_mae"], "round": 5,
                    "wall_s": round(time.time() - t0, 1)}
        record("points_progress", out)
    record("points", out)


def stage_quant_points():
    from lanetpu.quant.pipeline import quantize_checkpoint
    from lanetpu.runtime.engine import make_deploy_artifact

    _cache()
    out = {}
    for base in ("points_xcoords", "points_xcoords_r18"):
        rep = quantize_checkpoint(f"artifacts/{base}.ltpu",
                                  f"artifacts/{base}_int8.ltpu",
                                  calib_images=100)
        dep = f"artifacts/{base}_int8_deploy.ltpu"
        if os.path.exists(dep):
            os.remove(dep)
        make_deploy_artifact(f"artifacts/{base}_int8.ltpu", dep)
        rep["deploy_bytes"] = os.path.getsize(dep)
        out[base] = rep
        record("quant_points_progress", out)
    record("quant_points", out)


def stage_yolo_v2():
    """Detector tier trained against hard-v2's failure modes (same-class
    occlusion, sub-16px, exposure — VERDICT r4 item 4). Success: v2-trained
    mAP50 >= 0.85 on v2 while the v1 flagship still scores ~0.75 there
    (the benchmark keeps ranking)."""
    from lanetpu.eval.detect_eval import evaluate_detector
    from lanetpu.runtime.detector import YoloEngine
    from lanetpu.train.detect_task import train_yolo

    _cache()
    t0 = time.time()
    train_yolo(num_classes=11, img_size=(256, 256), epochs=90,
               num_train=768, batch_size=16, assigner="tal", hard="v2",
               save_path="artifacts/yolo_hard_v2.ltpu")
    out = {"wall_train_s": round(time.time() - t0, 1)}
    eng = YoloEngine.from_checkpoint("artifacts/yolo_hard_v2.ltpu")
    out["v2_trained_on_v2"] = evaluate_detector(eng, num_samples=64,
                                                hard="v2")
    record("yolo_v2_progress", out)
    out["v2_trained_on_hard"] = evaluate_detector(eng, num_samples=64,
                                                  hard=True)
    eng_v1 = YoloEngine.from_checkpoint("artifacts/yolo_hard.ltpu")
    out["v1_flagship_on_v2"] = evaluate_detector(eng_v1, num_samples=64,
                                                 hard="v2")
    record("yolo_v2", out)


def stage_quant_yolo_v2():
    from lanetpu.quant.pipeline import quantize_checkpoint
    from lanetpu.runtime.engine import make_deploy_artifact

    _cache()
    rep = quantize_checkpoint("artifacts/yolo_hard_v2.ltpu",
                              "artifacts/yolo_hard_v2_int8.ltpu")
    dep = "artifacts/yolo_hard_v2_int8_deploy.ltpu"
    if os.path.exists(dep):
        os.remove(dep)
    make_deploy_artifact("artifacts/yolo_hard_v2_int8.ltpu", dep)
    rep["deploy_bytes"] = os.path.getsize(dep)
    record("quant_yolo_v2", rep)


def stage_res_sweep():
    """Resolution-scaling table (VERDICT r4 missing #1; reference
    README.md:4260-4265 publishes 128/224/320/480 latencies): the full
    camera->mask pipeline at four model input sizes, parity + s2d4 tiers,
    fps + ms/frame + measured MFU each."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lanetpu.core.config import PipelineConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.utils.timing import device_sync

    _cache()
    out = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            out = json.load(f).get("res_sweep_progress", {})
    rng = np.random.default_rng(0)
    for tier, path in (("parity", "artifacts/lane_unet/best_model.ltpu"),
                       ("s2d4", "artifacts/lane_unet_s2d4/best_model.ltpu")):
        for res, bs in ((128, 256), (224, 256), (320, 128), (480, 64)):
            key = f"{tier}_{res}"
            if key in out:
                log(f"res_sweep {key}: already done, skipping")
                continue
            module, variables, meta = load_engine(path)
            module = UNet(config=module.config, dtype=jnp.bfloat16)
            seg = LaneSegmenter(
                module=module, variables=variables,
                config=PipelineConfig(compute_dtype="bfloat16",
                                      input_size=(res, res)))
            fn = seg._get_jitted("warped")
            thr = jnp.float32(0.25)
            frames = jax.device_put(jnp.asarray(rng.integers(
                0, 256, size=(bs, 480, 640, 3), dtype=np.uint8)), seg.device)
            t0 = time.time()
            device_sync(fn(seg.variables, frames, thr))
            log(f"{key}: first call {time.time() - t0:.1f}s")
            k = 30
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for _ in range(k):
                    o = fn(seg.variables, frames, thr)
                device_sync(o)
                best = min(best, (time.perf_counter() - t0) / k)
            entry = {"fps": round(bs / best, 1),
                     "ms_per_frame": round(best * 1e3 / bs, 4),
                     "batch_size": bs}
            try:
                fl = jax.jit(seg._predict_warped_fn).lower(
                    seg.variables, frames, thr).compile(
                    ).cost_analysis()["flops"]
                entry["gflop_per_frame"] = round(fl / bs / 1e9, 2)
                entry["mfu_vs_197tflops"] = round(
                    fl / bs * (bs / best) / 197e12, 4)
            except Exception as exc:  # noqa: BLE001
                entry["cost_analysis_error"] = str(exc)[:120]
            out[key] = entry
            log(key, json.dumps(entry))
            record("res_sweep_progress", out)
    with open("artifacts/res_sweep.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    record("res_sweep", out)


def stage_profile_readme():
    """Per-stage on-chip profile of the readme 4-level preset vs roofline
    bounds (VERDICT r4 weak #8)."""
    sys.path.insert(0, "scripts")
    from profile_unet import profile_artifact

    res = profile_artifact("artifacts/lane_unet_readme/best_model.ltpu",
                           batch=64, out_path="artifacts/readme_profile.json")
    record("profile_readme", {k: v for k, v in res.items()
                              if not k.startswith("_")})


STAGES = {
    "unet": stage_unet,
    "thr_calib": stage_thr_calib,
    "unet_s2d2": stage_unet_s2d2,
    "unet_s2d4": stage_unet_s2d4,
    "s2d4_capacity": stage_s2d4_capacity,
    "quant_unet": stage_quant_unet,
    "scenes": stage_scenes,
    "real_eval": stage_real_eval,
    "points": stage_points,
    "quant_points": stage_quant_points,
    "yolo_v2": stage_yolo_v2,
    "quant_yolo_v2": stage_quant_yolo_v2,
    "res_sweep": stage_res_sweep,
    "profile_readme": stage_profile_readme,
}


def main():
    todo = sys.argv[1:] or list(STAGES)
    for name in todo:
        try:
            log(f"=== stage {name} ===")
            STAGES[name]()
        except Exception:
            traceback.print_exc()
            record(name, {"error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
