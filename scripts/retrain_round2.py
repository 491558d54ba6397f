"""Round-2 artifact regeneration: retrain every model family on the new
7-scene synthetic distribution (shadow/rain/curve added), quantize ALL
families to int8, and record quality reports.

Run on the TPU (single client!):  python scripts/retrain_round2.py [stage...]
Stages: unet scenes quant_unet points_x points_c yolo quant_points quant_yolo
Writes artifacts/* and appends per-stage results to artifacts/round2_report.json.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

REPORT = "artifacts/round2_report.json"


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
    log(f"stage {stage}: {json.dumps(payload)[:300]}")


def _cache():
    import jax

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stage_unet():
    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    cfg = TrainConfig(epochs=60, num_train=512, num_val=64,
                      save_dir="artifacts/lane_unet")
    t0 = time.time()
    result = Trainer(cfg).fit()
    record("unet", {"best_dice": result["best_dice"],
                    "best_epoch": result["best_epoch"],
                    "epochs_run": len(result["history"]),
                    "wall_s": round(time.time() - t0, 1)})


def _load_segmenter():
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    _, variables, meta = load_engine("artifacts/lane_unet/best_model.ltpu")
    module = UNet(config=UNetConfig(features=tuple(meta["features"])),
                  dtype=jnp.bfloat16)
    return LaneSegmenter(module=module, variables=variables,
                         config=PipelineConfig(compute_dtype="bfloat16"))


def stage_scenes():
    from lanetpu.eval.scenes import evaluate_by_scene

    seg = _load_segmenter()
    rep = evaluate_by_scene(seg.predict_batch, num_samples=140,
                            offset=2048, batch_size=28)
    out = {k: {m: round(v, 4) for m, v in d.items()} for k, d in rep.items()}
    with open("artifacts/lane_unet/scenes.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    record("scenes", out)


def stage_quant_unet():
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lanetpu.quant import (
        calibrate_unet, fold_unet_batchnorm, parity_report, quantize_unet,
        unet_forward_folded)
    from lanetpu.quant.pipeline import lane_batches, quantize_checkpoint
    from lanetpu.runtime.engine import load_engine

    model = "artifacts/lane_unet/best_model.ltpu"
    _, variables, meta = load_engine(model)
    features = tuple(meta["features"])
    folded = fold_unet_batchnorm(variables, features)
    # same calibration set as cli quantize / the generic path
    batches = lane_batches(100, seed=123)
    ranges = calibrate_unet(folded, features, batches)
    q = quantize_unet(folded, features, ranges,
                      final_sigmoid=meta.get("final_sigmoid", False))
    x = jnp.asarray(batches[0])
    fp_fn = jax.jit(lambda v: jax.nn.sigmoid(
        unet_forward_folded(folded, v, features)))
    i8_fn = jax.jit(lambda v: jax.nn.sigmoid(q.forward(v, mode="int8")))
    rep = parity_report(np.asarray(fp_fn(x)), np.asarray(i8_fn(x)))
    with open("artifacts/lane_unet/model_int8.pkl", "wb") as f:
        pickle.dump(q, f)
    # also ship the generic-path int8 container for a uniform artifact story
    rep_gen = quantize_checkpoint(model, "artifacts/lane_unet/model_int8.ltpu",
                                  calib_images=100)
    record("quant_unet", {"folded": rep, "generic": rep_gen})


def stage_points(mode, depth, out):
    from lanetpu.train.points_task import train_points

    t0 = time.time()
    result = train_points(mode=mode, depth=depth, epochs=30, num_train=512,
                          num_val=64, batch_size=16, save_path=out)
    record(f"points_{mode}", {"val_mae": result["final_val_mae"],
                              "wall_s": round(time.time() - t0, 1)})


def stage_yolo():
    from lanetpu.eval.detect_eval import evaluate_detector
    from lanetpu.runtime.detector import YoloEngine
    from lanetpu.train.detect_task import train_yolo

    t0 = time.time()
    train_yolo(num_classes=11, img_size=(256, 256), epochs=40,
               num_train=512, batch_size=16, assigner="tal",
               save_path="artifacts/yolo_synthetic.ltpu")
    eng = YoloEngine.from_checkpoint("artifacts/yolo_synthetic.ltpu")
    rep = evaluate_detector(eng, num_samples=64)
    rep["wall_s"] = round(time.time() - t0, 1)
    record("yolo", rep)


def stage_quant_points():
    from lanetpu.quant.pipeline import quantize_checkpoint

    reps = {}
    for name in ("points_xcoords", "points_centerline"):
        reps[name] = quantize_checkpoint(
            f"artifacts/{name}.ltpu", f"artifacts/{name}_int8.ltpu",
            calib_images=64)
    record("quant_points", reps)


def stage_quant_yolo():
    from lanetpu.eval.detect_eval import evaluate_detector
    from lanetpu.quant.pipeline import quantize_checkpoint
    from lanetpu.runtime.detector import YoloEngine

    rep = quantize_checkpoint("artifacts/yolo_synthetic.ltpu",
                              "artifacts/yolo_synthetic_int8.ltpu",
                              calib_images=64)
    eng = YoloEngine.from_checkpoint("artifacts/yolo_synthetic_int8.ltpu")
    map_rep = evaluate_detector(eng, num_samples=64)
    record("quant_yolo", {"parity": rep, "int8_map": map_rep})


STAGES = {
    "unet": stage_unet,
    "scenes": stage_scenes,
    "quant_unet": stage_quant_unet,
    "points_x": lambda: stage_points("xcoords", 50,
                                     "artifacts/points_xcoords.ltpu"),
    "points_c": lambda: stage_points("centerline", 18,
                                     "artifacts/points_centerline.ltpu"),
    "yolo": stage_yolo,
    "quant_points": stage_quant_points,
    "quant_yolo": stage_quant_yolo,
}

if __name__ == "__main__":
    _cache()
    todo = sys.argv[1:] or list(STAGES)
    for name in todo:
        log(f"=== stage {name} ===")
        try:
            STAGES[name]()
        except Exception as e:  # noqa: BLE001 — isolate stage failures
            traceback.print_exc()
            record(name, {"error": str(e)})
    log("ALL DONE")
