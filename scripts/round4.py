"""Round-4 stages: real-frame quality retrain (wide/halo distribution +
real-crop pool), classical baselines, COCO-ingest certification, hard-v2
detector benchmark, README 4-level preset.

Run on the TPU (single client!):  python scripts/round4.py [stage...]
Writes artifacts/* and appends per-stage results to
artifacts/round4_report.json. Stages are resumable where they are long.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

REPORT = "artifacts/round4_report.json"


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


def _quick_golden(art_dir):
    """Fast parity-tier golden-frame readout for early feedback."""
    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    module, variables, _ = load_engine(f"{art_dir}/best_model.ltpu")
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="float32"))
    s = real.golden_warped_score(seg)
    return {"iou": round(s["iou"], 4),
            "near_iou": round(s["near_field"]["iou"], 4),
            "near_precision": round(s["near_field"]["precision"], 4),
            "centerline_recall": round(s["centerline_recall"], 4)}


def _train_unet(stage, save_dir, s2d=1, features=(32, 64, 128),
                epochs=120, real_pool=128):
    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    _cache()
    cfg = TrainConfig(epochs=epochs, num_train=512, num_val=64, s2d=s2d,
                      features=tuple(features), save_dir=save_dir,
                      real_pool=real_pool)
    t0 = time.time()
    result = Trainer(cfg).fit()
    out = {"best_dice": result["best_dice"],
           "best_epoch": result["best_epoch"],
           "epochs_run": len(result["history"]),
           "wall_s": round(time.time() - t0, 1)}
    try:
        out["golden"] = _quick_golden(save_dir)
    except Exception as exc:  # noqa: BLE001
        out["golden_error"] = str(exc)[:200]
    record(stage, out)


def stage_unet():
    """Parity topology on the round-4 distribution (wide soft stripes,
    photometric halo labels, lowres degradation) + 128 real crops."""
    _train_unet("unet", "artifacts/lane_unet")


def stage_unet_s2d2():
    _train_unet("unet_s2d2", "artifacts/lane_unet_s2d", s2d=2)


def stage_unet_s2d4():
    _train_unet("unet_s2d4", "artifacts/lane_unet_s2d4", s2d=4,
                features=(48, 96, 192))


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


def stage_quant_unet():
    """Folded .pkl (parity topology) + generic int8 .ltpu + deploy twin
    for all three U-Net tiers (same recipe as round 3)."""
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
    record("quant_unet", out)


def _lane_tiers():
    tiers = []
    for d in ("lane_unet", "lane_unet_s2d", "lane_unet_s2d4"):
        tiers.append((d, f"artifacts/{d}/best_model.ltpu", None))
        tiers.append((f"{d}_int8", f"artifacts/{d}/model_int8.ltpu", "int8"))
    return tiers


def stage_real_eval():
    """Score every lane tier on the reference's real frames (the round-4
    quality target: golden centerline recall >= 0.90, near IoU >= 0.60,
    wb_blue >= 0.85 — VERDICT r3 item 1)."""
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
    record("real_eval", out)


def stage_baselines():
    """Classical HSV / adaptive-HSV / Canny baselines on the same real
    frames and scene buckets the U-Net tiers report (reference
    README.md:4210-4215's comparison table, reproduced). A "unet" row is
    scored with the IDENTICAL convention (condition variants vs the clean
    frame's photometric truth) so the margin table compares like with
    like."""
    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.eval.baselines import (score_baselines_real,
                                        score_baselines_scenes)
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    real_scores = score_baselines_real()
    scene_scores = score_baselines_scenes(num_samples=70, offset=2048,
                                          seed=43)
    slim = {}
    for name, rep in scene_scores.items():
        slim[name] = {k: round(v["iou"], 4) for k, v in rep.items()}

    _cache()
    module, variables, _ = load_engine("artifacts/lane_unet/best_model.ltpu")
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="float32"))
    raw = real.demo_frames()["normal_raw"]
    truth = real.photometric_lane_truth(raw)
    valid = real.valid_region(raw)
    conds = real.photometric_conditions(raw)
    unet_entry = {"conditions": {}}
    for cname, cimg in conds.items():
        pred = seg.predict_batch(cimg[None])[0] > 127
        score = real.mask_iou_dice(pred & valid, truth)
        if cname == "normal":
            unet_entry["birdseye_normal_raw"] = score
        else:
            unet_entry["conditions"][cname] = score
    real_scores["unet"] = unet_entry
    record("baselines_real", real_scores)
    record("baselines_scenes", slim)


def stage_points():
    from lanetpu.train.points_task import train_points

    _cache()
    out = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            out = json.load(f).get("points_progress", {})
    for mode, depth, epochs, path in (
            ("xcoords", 50, 60, "artifacts/points_xcoords.ltpu"),
            ("xcoords", 18, 30, "artifacts/points_xcoords_r18.ltpu"),
            ("centerline", 50, 60, "artifacts/points_centerline.ltpu"),
            ("centerline", 18, 30, "artifacts/points_centerline_r18.ltpu")):
        key = f"{mode}_r{depth}"
        if key in out and out[key].get("round") == 4:
            log(f"points {key}: already done, skipping")
            continue
        t0 = time.time()
        result = train_points(mode=mode, depth=depth, epochs=epochs,
                              num_train=512, num_val=64, batch_size=16,
                              save_path=path)
        out[key] = {"val_mae": result["final_val_mae"], "round": 4,
                    "wall_s": round(time.time() - t0, 1)}
        record("points_progress", out)
    record("points", out)


def stage_quant_points():
    from lanetpu.quant.pipeline import quantize_checkpoint
    from lanetpu.runtime.engine import make_deploy_artifact

    _cache()
    out = {}
    for base in ("points_xcoords", "points_xcoords_r18",
                 "points_centerline", "points_centerline_r18"):
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


def stage_coco_cert():
    """COCO-JSON ingest, CERTIFIED: 80 images on disk, 64/16 train/val
    split by annotation file, train to convergence, held-out mAP through
    the self-contained evaluator (closes VERDICT r3 missing #3 — the
    round-3 run trained but was never evaluated). Mirrors the reference's
    eval helper role (src/py_utils/coco_utils.py:18-37)."""
    import numpy as np
    from PIL import Image

    from lanetpu.eval.cocoeval import DetectionRecorder
    from lanetpu.runtime.detector import YoloEngine
    from lanetpu.train.detect_task import render_detection_sample, train_yolo
    from lanetpu.train.ingest import CocoDetectionDataset

    _cache()
    root = "artifacts/coco_e2e"
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    classes = ["banana", "cake", "cola", "apple", "lajiao"]
    n_total, n_train = 80, 64

    def build_split(lo, hi, path):
        images, annotations, ann_id = [], [], 1
        for i in range(lo, hi):
            img, boxes, cls = render_detection_sample(
                20_000 + i, seed=9, image_size=(256, 256),
                num_classes=len(classes), hard=True)
            name = f"im_{i:03d}.jpg"
            fp = os.path.join(img_dir, name)
            if not os.path.exists(fp):
                Image.fromarray(img).save(fp, quality=92)
            images.append({"id": i, "file_name": name,
                           "height": 256, "width": 256})
            for b, c in zip(boxes, cls):
                x1, y1, x2, y2 = (float(v) for v in b)
                annotations.append({
                    "id": ann_id + lo * 100, "image_id": i,
                    "category_id": 10 + int(c) * 3,  # sparse ids on purpose
                    "bbox": [x1, y1, x2 - x1, y2 - y1], "iscrowd": 0})
                ann_id += 1
        coco = {"images": images,
                "categories": [{"id": 10 + k * 3, "name": n}
                               for k, n in enumerate(classes)],
                "annotations": annotations}
        with open(path, "w") as f:
            json.dump(coco, f)

    train_json = os.path.join(root, "annotations_train.json")
    val_json = os.path.join(root, "annotations_val.json")
    build_split(0, n_train, train_json)
    build_split(n_train, n_total, val_json)

    ds = CocoDetectionDataset(train_json, img_dir, img_size=(256, 256),
                              max_objects=8)
    t0 = time.time()
    result = train_yolo(epochs=300, batch_size=16, data=ds, verbose=False,
                        save_path=os.path.join(root, "yolo_coco.ltpu"))
    wall_train = round(time.time() - t0, 1)

    eng = YoloEngine.from_checkpoint(os.path.join(root, "yolo_coco.ltpu"))
    ds_val = CocoDetectionDataset(val_json, img_dir, img_size=(256, 256),
                                  max_objects=8)
    rec = DetectionRecorder()
    for image_id in ds_val.image_ids:
        canvas, boxes, cls = ds_val._load_sample(image_id)
        res = eng.detect_batch(canvas[None][..., ::-1], score_thresh=0.05)
        for gb, gc in zip(boxes, cls):
            rec.add_ground_truth(image_id, int(gc), gb)
        b, c, s = res[0]
        if b is not None:
            for bb, cc, ss in zip(b, c, s):
                rec.add_detection(image_id, int(cc), bb, float(ss))
    rep = rec.evaluate()
    record("coco_cert", {
        "train_images": len(ds), "val_images": len(ds_val),
        "classes": classes,
        "first_loss": result["history"][0]["loss"],
        "final_loss": result["history"][-1]["loss"],
        "map50": rep["map50"], "map": rep["map"],
        "wall_train_s": wall_train})


def stage_hard_v2():
    """The re-hardened detector benchmark (same-class occlusion, sub-16px
    instances, lighting variation): the round-3 flagship must score
    mAP50 <= ~0.95 here, making the benchmark rankable again
    (VERDICT r3: hard saturated at mAP50 0.995)."""
    from lanetpu.eval.detect_eval import evaluate_detector
    from lanetpu.runtime.detector import YoloEngine

    _cache()
    out = {}
    eng = YoloEngine.from_checkpoint("artifacts/yolo_hard.ltpu")
    out["hard_trained_on_v2"] = evaluate_detector(eng, num_samples=64,
                                                  hard="v2")
    eng_easy = YoloEngine.from_checkpoint("artifacts/yolo_synthetic.ltpu")
    out["easy_trained_on_v2"] = evaluate_detector(eng_easy, num_samples=64,
                                                  hard="v2")
    record("hard_v2", out)


def stage_readme_preset():
    """Train the reference's DOCUMENTED 4-level model (README.md:1417-1503,
    features 64/128/256/512, ~31M params) — capability parity with the
    documented variant AND the wide-MFU datapoint the roofline predicts
    (>=128-wide stages lift MFU above the lane-granularity bound)."""
    _train_unet("readme_preset", "artifacts/lane_unet_readme",
                features=(64, 128, 256, 512), epochs=60)


def stage_readme_bench():
    """fps + measured MFU of the readme preset (bs=64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter
    from lanetpu.utils.timing import device_sync

    _cache()
    _, variables, meta = load_engine(
        "artifacts/lane_unet_readme/best_model.ltpu")
    module = UNet(config=UNetConfig(features=tuple(meta["features"])),
                  dtype=jnp.bfloat16)
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(compute_dtype="bfloat16"))
    fn = seg._get_jitted("warped")
    thr = jnp.float32(0.5)
    rng = np.random.default_rng(0)
    bs = 64
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 256, size=(bs, 480, 640, 3), dtype=np.uint8)),
        seg.device)
    t0 = time.time()
    device_sync(fn(seg.variables, frames, thr))
    log(f"readme preset: first call {time.time() - t0:.1f}s")
    k = 30
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(seg.variables, frames, thr)
    device_sync(out)
    per_batch = (time.perf_counter() - t0) / k
    fps = bs / per_batch
    out = {"fps": round(fps, 1), "ms_per_batch": round(per_batch * 1e3, 2),
           "batch_size": bs}
    try:
        flops = jax.jit(seg._predict_warped_fn).lower(
            seg.variables, frames, thr).compile().cost_analysis()["flops"]
        out["gflop_per_frame"] = round(flops / bs / 1e9, 2)
        out["mfu_vs_197tflops"] = round(flops / bs * fps / 197e12, 4)
    except Exception as exc:  # noqa: BLE001 — remote backends may not
        out["cost_analysis_error"] = str(exc)[:200]  # expose cost analysis
    record("readme_bench", out)


STAGES = {
    "unet": stage_unet,
    "unet_s2d2": stage_unet_s2d2,
    "unet_s2d4": stage_unet_s2d4,
    "quant_unet": stage_quant_unet,
    "scenes": stage_scenes,
    "real_eval": stage_real_eval,
    "baselines": stage_baselines,
    "points": stage_points,
    "quant_points": stage_quant_points,
    "coco_cert": stage_coco_cert,
    "hard_v2": stage_hard_v2,
    "readme_preset": stage_readme_preset,
    "readme_bench": stage_readme_bench,
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
