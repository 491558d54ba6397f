"""lanetpu command-line interface.

Replaces the reference's mixed entry points (ROS launch files, argparse
nodes, hardcoded `__main__` menus — src/unet.py:226-275,
src/yolo_detector.py:348-362, launch/*.launch) with one CLI:

  lanetpu infer     — single-image lane segmentation (image -> mask file)
  lanetpu video     — video lane segmentation with overlay output
  lanetpu stream    — streaming benchmark of the fused pipeline
  lanetpu train     — train the U-Net (synthetic or on-disk dataset)
  lanetpu quantize  — calibrate + quantize a checkpoint to int8
  lanetpu bench     — throughput benchmark (JSON result)
  lanetpu eval      — mask quality metrics vs ground truth
  lanetpu detect    — one-shot multi-frame YOLO detection on image files

All commands accept `--set key=value` config overrides (the ROS
`_param:=value` analogue).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_segmenter(args):
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig, UNetConfig, load_config
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.engine import load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    cfg = load_config(PipelineConfig, getattr(args, "config", None),
                      getattr(args, "set", []) or [])
    if getattr(args, "model", None):
        # the arch registry rebuilds the module from the self-describing
        # meta (features, final_sigmoid, s2d, ...); re-instantiate at the
        # pipeline compute dtype
        loaded, variables, meta = load_engine(args.model)
        module = UNet(config=loaded.config, dtype=jnp.dtype(cfg.compute_dtype))
        return LaneSegmenter(module=module, variables=variables, config=cfg)
    module = UNet(config=UNetConfig.deployed(),
                  dtype=jnp.dtype(cfg.compute_dtype))
    return LaneSegmenter(module=module, config=cfg)


def cmd_infer(args):
    from lanetpu.runtime.lane import _imread_rgb

    seg = _load_segmenter(args)
    image = _imread_rgb(args.image)
    if args.warped:
        mask, dt = seg.predict_warped(image[..., ::-1], args.threshold)
    else:
        mask, dt = seg.predict(image, args.threshold)
    from PIL import Image

    Image.fromarray(mask).save(args.output)
    print(f"mask -> {args.output}  ({mask.shape[1]}x{mask.shape[0]}, "
          f"{dt * 1e3:.1f} ms)")


def cmd_video(args):
    seg = _load_segmenter(args)
    fps = seg.predict_video(args.video, args.output, args.threshold,
                            batch_size=args.batch_size)
    print(f"avg fps: {fps:.1f}")


def cmd_bench(args):
    seg = _load_segmenter(args)
    stats = seg.benchmark(batch_size=args.batch_size, num_runs=args.runs,
                          warped=not args.no_warp)
    print(json.dumps(stats))


def cmd_train(args):
    from lanetpu.core.config import TrainConfig, load_config
    from lanetpu.train.trainer import Trainer

    cfg = load_config(TrainConfig, getattr(args, "config", None),
                      getattr(args, "set", []) or [])
    if args.epochs:
        cfg.epochs = args.epochs
    trainer = Trainer(cfg)
    result = trainer.fit()
    print(json.dumps({"best_dice": result["best_dice"],
                      "best_epoch": result["best_epoch"],
                      "epochs_run": len(result["history"])}))


def cmd_train_points(args):
    from lanetpu.train.points_task import train_points

    result = train_points(mode=args.mode, depth=args.depth,
                          epochs=args.epochs, save_path=args.output)
    print(json.dumps({"final_val_mae": result["final_val_mae"],
                      "output": args.output}))


def cmd_train_detect(args):
    from lanetpu.train.detect_task import train_yolo

    data = None
    if getattr(args, "coco_json", None):
        from lanetpu.train.ingest import CocoDetectionDataset

        data = CocoDetectionDataset(
            annotation_file=args.coco_json,
            image_dir=args.image_dir or os.path.dirname(args.coco_json),
            img_size=(args.img_size, args.img_size),
            max_objects=args.max_objects)
        print(f"COCO dataset: {len(data)} images, "
              f"{data.num_classes} classes {data.class_names}")
    result = train_yolo(num_classes=args.num_classes,
                        img_size=(args.img_size, args.img_size),
                        epochs=args.epochs, save_path=args.output,
                        data=data, hard=getattr(args, "hard", False))
    print(json.dumps({"final_loss": result["history"][-1]["loss"],
                      "output": args.output}))


def cmd_convert_labelme(args):
    from lanetpu.train.ingest import convert_labelme_dir

    labels = tuple(args.labels.split(",")) if args.labels else None
    summary = convert_labelme_dir(args.json_dir, args.output,
                                  labels=labels,
                                  val_fraction=args.val_fraction)
    print(json.dumps(summary))


def cmd_extract_frames(args):
    from lanetpu.train.ingest import extract_frames

    n = extract_frames(args.video, args.output, stride=args.stride,
                       limit=args.limit)
    print(json.dumps({"frames_written": n, "out_dir": args.output}))


def cmd_eval_real(args):
    """Real-frame validation against the reference's published outputs
    (eval.real): demo-mask IoU, photometric-condition stability, IPM check."""
    from lanetpu.core.config import PipelineConfig
    from lanetpu.eval import real
    from lanetpu.runtime.engine import build_apply_fn, load_engine
    from lanetpu.runtime.lane import LaneSegmenter

    if not real.assets_present():
        raise SystemExit("reference demo assets not mounted")
    module, variables, meta = load_engine(args.model, backend=args.backend)
    kwargs = {}
    if "quant" in meta:
        kwargs["forward_fn"] = build_apply_fn(module, meta)
    seg = LaneSegmenter(module=module, variables=variables,
                        config=PipelineConfig(backend=args.backend,
                                              compute_dtype="float32"),
                        **kwargs)
    out = {"demo": real.reference_demo_score(seg),
           "birdseye": real.birdseye_frame_scores(seg),
           "golden_warped": real.golden_warped_score(seg),
           "ipm_warp": real.ipm_warp_score()}
    if args.conditions:
        out["conditions"] = real.condition_stability_score(seg)
    print(json.dumps(out))


def cmd_baseline(args):
    """Classical lane baselines (eval.baselines): run HSV / adaptive-HSV /
    Canny on an image (the reference's follow_line.py threshold path and
    its README comparison table, README.md:205-226, :4210-4215), or score
    all baselines on the bundled real frames with --score."""
    import numpy as np

    from lanetpu.eval.baselines import BASELINES, score_baselines_real

    if args.score:
        print(json.dumps(score_baselines_real()))
        return
    if not args.image:
        raise SystemExit("lanetpu baseline: --image is required "
                         "(or use --score for the bundled real frames)")
    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"))
    mask = BASELINES[args.method](img)
    out = args.output or (args.image.rsplit(".", 1)[0]
                          + f"_{args.method}.png")
    Image.fromarray(mask.astype(np.uint8) * 255).save(out)
    print(json.dumps({"output": out, "method": args.method,
                      "lane_frac": round(float(mask.mean()), 4)}))


def cmd_deploy(args):
    import os

    from lanetpu.runtime.engine import make_deploy_artifact

    out = args.output or args.model.replace(".ltpu", "") + "_deploy.ltpu"
    meta = make_deploy_artifact(args.model, out)
    print(json.dumps({
        "output": out,
        "src_bytes": os.path.getsize(args.model),
        "deploy_bytes": os.path.getsize(out),
        "parity": meta.get("quant", {}).get("parity"),
    }))


def cmd_quantize(args):
    from lanetpu.runtime.engine import load_meta

    meta = load_meta(args.model)
    method = args.method
    if method == "auto":
        # folded (BN-fold + layer plan) is the specialized U-Net path for
        # the parity topology; s2d topologies and every other arch go
        # through the generic interception substrate.
        method = ("folded" if meta.get("arch") == "unet"
                  and meta.get("s2d", 1) == 1 else "generic")

    if method == "generic":
        from lanetpu.quant.pipeline import quantize_checkpoint

        out = args.output
        if out == "model_int8.pkl":  # legacy default name is unet-specific
            suffix = "_int8_deploy" if args.deploy else "_int8"
            out = args.model.replace(".ltpu", "") + suffix + ".ltpu"
        rep = quantize_checkpoint(args.model, out,
                                  calib_images=args.calib_images,
                                  deploy=args.deploy,
                                  calib_method=args.calib_method)
        print(json.dumps(rep))
        print(f"quantized model -> {out}")
        return

    if args.deploy:
        raise SystemExit("--deploy requires the generic method "
                         "(the folded path writes a .pkl, not a .ltpu)")

    if meta.get("s2d", 1) != 1:
        raise SystemExit(
            "--method folded supports only the parity topology (s2d=1); "
            "use --method generic for s2d artifacts")

    import jax
    import jax.numpy as jnp

    from lanetpu.quant import (
        calibrate_unet,
        fold_unet_batchnorm,
        parity_report,
        quantize_unet,
        unet_forward_folded,
    )
    from lanetpu.quant.pipeline import lane_batches
    from lanetpu.runtime.engine import load_engine

    module, variables, meta = load_engine(args.model)
    features = tuple(meta["features"])
    folded = fold_unet_batchnorm(variables, features)

    # scene-quota-stratified calibration set (README.md:3313-3336 parity)
    # + the bundled real frames — the SAME set the generic path calibrates
    # on (quant/pipeline.lane_batches), so folded and generic artifacts
    # never drift apart on calibration data
    batches = lane_batches(args.calib_images, seed=123)
    ranges = calibrate_unet(folded, features, batches,
                            method=args.calib_method)
    q = quantize_unet(folded, features, ranges,
                      final_sigmoid=meta.get("final_sigmoid", False))

    # parity gate (README.md:3503-3571 analogue) — jitted single programs
    # (eager per-op execution is pathological on tunneled backends)
    x = jnp.asarray(batches[0])
    fp_fn = jax.jit(lambda v: jax.nn.sigmoid(
        unet_forward_folded(folded, v, features)))
    i8_fn = jax.jit(lambda v: jax.nn.sigmoid(q.forward(v, mode="int8")))
    prob_fp = np.asarray(fp_fn(x))
    prob_i8 = np.asarray(i8_fn(x))
    rep = parity_report(prob_fp, prob_i8)
    print(json.dumps(rep))

    import pickle

    with open(args.output, "wb") as f:
        pickle.dump(q, f)
    print(f"quantized model -> {args.output}")


def cmd_eval_scenes(args):
    from lanetpu.eval.scenes import evaluate_by_scene

    seg = _load_segmenter(args)
    report = evaluate_by_scene(seg.predict_batch,
                               num_samples=args.num_samples,
                               offset=args.offset)
    print(json.dumps({k: {m: round(v, 4) if isinstance(v, float) else v
                          for m, v in d.items()}
                      for k, d in report.items()}, indent=2))


def cmd_eval(args):
    from PIL import Image

    from lanetpu.eval.metrics import mask_metrics

    pred = np.asarray(Image.open(args.pred).convert("L")) > 127
    target = np.asarray(Image.open(args.target).convert("L")) > 127
    print(json.dumps(mask_metrics(pred, target)))


def cmd_detect(args):
    from lanetpu.runtime.detector import YoloEngine
    from lanetpu.runtime.lane import _imread_rgb

    engine = (YoloEngine.from_checkpoint(args.model)
              if getattr(args, "model", None) else YoloEngine())
    results = []
    for path in args.images:
        frame_bgr = _imread_rgb(path)[..., ::-1]
        (boxes, classes, scores), dt = engine.detect(frame_bgr)
        dets = []
        if boxes is not None:
            for b, c, s in zip(boxes, classes, scores):
                dets.append({"box": [round(float(v), 1) for v in b],
                             "class": engine.classes[int(c)],
                             "score": round(float(s), 3)})
        results.append({"image": path, "detections": dets,
                        "time_ms": round(dt * 1e3, 1)})
    print(json.dumps(results, indent=2))


def cmd_serve(args):
    from lanetpu.pipeline.server import PerceptionServer

    seg = _load_segmenter(args)
    detector = None
    if args.yolo_model:
        from lanetpu.core.config import YoloConfig
        from lanetpu.models.yolo import CLASSES_11, CLASSES_12
        from lanetpu.runtime.detector import YoloEngine
        from lanetpu.runtime.engine import load_engine

        _, variables, meta = load_engine(args.yolo_model)
        nc = meta["num_classes"]
        classes = (CLASSES_11 if nc == 11 else CLASSES_12 if nc == 12
                   else tuple(str(i) for i in range(nc)))
        from lanetpu.models.yolo import YoloDetector

        ycfg = YoloConfig(num_classes=nc,
                          img_size=tuple(meta.get("img_size", (640, 640))))
        detector = YoloEngine(module=YoloDetector(config=ycfg),
                              variables=variables, config=ycfg,
                              classes=classes)
    server = PerceptionServer(segmenter=seg, detector=detector,
                              host=args.host, port=args.port).start()
    print(f"serving on http://{args.host}:{server.port} "
          f"(/healthz /segment /detect)", flush=True)
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


def cmd_stream(args):
    import jax.numpy as jnp

    from lanetpu.pipeline.streaming import StreamingRunner

    seg = _load_segmenter(args)
    fn = seg._get_jitted("warped")
    thr = jnp.float32(seg.cfg.threshold)
    runner = StreamingRunner(lambda batch: fn(seg.variables, batch, thr),
                             batch_size=args.batch_size, device=seg.device)
    rng = np.random.default_rng(0)
    frames = (rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
              for _ in range(args.frames))
    stats = runner.run(frames)
    print(json.dumps(stats))


def cmd_camera(args):
    """Live webcam -> lane masks (reference src/unet.py:190-224 demo)."""
    import time

    from lanetpu.pipeline.camera import CameraSource
    from lanetpu.pipeline.channels import Bus
    from lanetpu.pipeline.streaming import LaneStreamNode

    seg = _load_segmenter(args)
    bus = Bus()
    cam = CameraSource(bus=bus, topic=seg.cfg.input_topic,
                       device=args.device, fps_limit=args.fps)
    node = LaneStreamNode(seg, bus=bus, input_topic=seg.cfg.input_topic,
                          output_topic=seg.cfg.output_topic)
    if not cam.start():
        print(json.dumps({"error": "no camera available",
                          "device": args.device}))
        return
    deadline = time.time() + args.seconds
    try:
        while time.time() < deadline:
            time.sleep(0.1)
    except KeyboardInterrupt:
        pass
    cam.stop()
    node.shutdown()
    print(json.dumps({"frames": node.frame_count, **cam.stats}))


def build_parser():
    p = argparse.ArgumentParser(prog="lanetpu",
                                description="TPU-native lane detection framework")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--model", help="model checkpoint (.ltpu)")
        sp.add_argument("--config", help="config file (yaml/json)")
        sp.add_argument("--set", action="append", metavar="KEY=VALUE",
                        help="config override")

    sp = sub.add_parser("infer", help="single-image lane segmentation")
    common(sp)
    sp.add_argument("image")
    sp.add_argument("-o", "--output", default="mask.png")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--warped", action="store_true",
                    help="input is a raw BGR camera frame; apply IPM")
    sp.set_defaults(fn=cmd_infer)

    sp = sub.add_parser("video", help="video lane segmentation")
    common(sp)
    sp.add_argument("video")
    sp.add_argument("-o", "--output", default="out.mp4")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.set_defaults(fn=cmd_video)

    sp = sub.add_parser("bench", help="throughput benchmark")
    common(sp)
    sp.add_argument("--batch-size", type=int, default=128)
    sp.add_argument("--runs", type=int, default=20)
    sp.add_argument("--no-warp", action="store_true")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("train", help="train the lane U-Net")
    common(sp)
    sp.add_argument("--epochs", type=int)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("train-points", help="train a lane-point regressor")
    sp.add_argument("--mode", choices=["xcoords", "centerline"],
                    default="xcoords")
    sp.add_argument("--depth", type=int, default=50)
    sp.add_argument("--epochs", type=int, default=10)
    sp.add_argument("-o", "--output", default="points_model.ltpu")
    sp.set_defaults(fn=cmd_train_points)

    sp = sub.add_parser("train-detect", help="train the YOLO detector")
    sp.add_argument("--num-classes", type=int, default=11)
    sp.add_argument("--img-size", type=int, default=256)
    sp.add_argument("--epochs", type=int, default=10)
    sp.add_argument("--coco-json", default=None,
                    help="COCO annotation JSON — train on real data "
                         "instead of the synthetic generator")
    sp.add_argument("--image-dir", default=None,
                    help="image directory for --coco-json "
                         "(default: next to the JSON)")
    sp.add_argument("--max-objects", type=int, default=8)
    sp.add_argument("--hard", action="store_true",
                    help="train on the de-saturated scene distribution "
                         "(clutter, distractors, truncation, 3x scale)")
    sp.add_argument("-o", "--output", default="yolo_model.ltpu")
    sp.set_defaults(fn=cmd_train_detect)

    sp = sub.add_parser("convert-labelme",
                        help="LabelMe polygon JSONs -> images/ + masks/ "
                             "lane dataset")
    sp.add_argument("json_dir")
    sp.add_argument("-o", "--output", default="./dataset")
    sp.add_argument("--labels", default="lane",
                    help="comma-separated labels to rasterize "
                         "('' = all shapes)")
    sp.add_argument("--val-fraction", type=float, default=0.2)
    sp.set_defaults(fn=cmd_convert_labelme)

    sp = sub.add_parser("extract-frames",
                        help="video -> strided JPEG frames for annotation")
    sp.add_argument("video")
    sp.add_argument("-o", "--output", default="./frames")
    sp.add_argument("--stride", type=int, default=5)
    sp.add_argument("--limit", type=int, default=None)
    sp.set_defaults(fn=cmd_extract_frames)

    sp = sub.add_parser("quantize",
                        help="calibrate + int8-quantize any .ltpu model")
    common(sp)
    sp.add_argument("--calib-images", type=int, default=100)
    sp.add_argument("--method", choices=["auto", "folded", "generic"],
                    default="auto",
                    help="folded = BN-fold U-Net path (pkl); generic = "
                         "interception substrate, any arch (int8 .ltpu)")
    sp.add_argument("-o", "--output", default="model_int8.pkl")
    sp.add_argument("--deploy", action="store_true",
                    help="write the deploy tier: strip fp weights of "
                         "quantized layers + compress (generic method only)")
    sp.add_argument("--calib-method", choices=["percentile", "mmse"],
                    default="percentile",
                    help="activation range search: percentile clipping or "
                         "quantize-dequantize MSE minimization (the "
                         "reference's quantized_algorithm normal/mmse)")
    sp.set_defaults(fn=cmd_quantize)

    sp = sub.add_parser("eval-real",
                        help="score a lane model on the reference's own "
                             "published real frame + mask")
    sp.add_argument("model")
    sp.add_argument("--backend", default="tpu")
    sp.add_argument("--conditions", action="store_true",
                    help="also run the photometric-condition stability table")
    sp.set_defaults(fn=cmd_eval_real)

    sp = sub.add_parser("baseline",
                        help="classical HSV/adaptive-HSV/Canny lane "
                             "baselines (compare against the U-Net)")
    sp.add_argument("--image", help="input image (omit with --score)")
    sp.add_argument("--method", default="hsv",
                    choices=["hsv", "adaptive_hsv", "canny"])
    sp.add_argument("--output", help="output mask path")
    sp.add_argument("--score", action="store_true",
                    help="score all baselines on the bundled real frames")
    sp.set_defaults(fn=cmd_baseline)

    sp = sub.add_parser("deploy",
                        help="strip+compress an existing int8 .ltpu into "
                             "its deploy tier (no recalibration)")
    sp.add_argument("model")
    sp.add_argument("-o", "--output", default=None,
                    help="default: <model>_deploy.ltpu")
    sp.set_defaults(fn=cmd_deploy)

    sp = sub.add_parser("eval", help="mask quality metrics")
    sp.add_argument("pred")
    sp.add_argument("target")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("eval-scenes",
                        help="per-scene IoU/Dice on the synthetic val set")
    common(sp)
    sp.add_argument("--num-samples", type=int, default=64)
    sp.add_argument("--offset", type=int, default=512)
    sp.set_defaults(fn=cmd_eval_scenes)

    sp = sub.add_parser("detect", help="YOLO detection on images")
    common(sp)
    sp.add_argument("images", nargs="+")
    sp.set_defaults(fn=cmd_detect)

    sp = sub.add_parser("serve", help="HTTP perception server")
    common(sp)
    sp.add_argument("--yolo-model", help="detector checkpoint (.ltpu)")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8080)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("stream", help="streaming pipeline benchmark")
    common(sp)
    sp.add_argument("--frames", type=int, default=512)
    sp.add_argument("--batch-size", type=int, default=64)
    sp.set_defaults(fn=cmd_stream)

    sp = sub.add_parser("camera", help="live webcam lane-mask demo")
    common(sp)
    sp.add_argument("--device", type=int, default=0)
    sp.add_argument("--fps", type=float, default=None)
    sp.add_argument("--seconds", type=float, default=10.0)
    sp.set_defaults(fn=cmd_camera)

    return p


def _enable_compilation_cache():
    """Persist XLA compilations across CLI invocations. One-shot commands
    (infer on a single image) otherwise pay a full pipeline compile — which
    on a remote/tunneled TPU can dominate wall-clock by minutes."""
    try:
        import jax

        cache_dir = os.environ.get(
            "LANETPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "lanetpu", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
