"""s2d4 quality recovery: longer schedule + more data on the round-3
distribution. The shipped 120-epoch run landed val Dice 0.9865 (the
round-2 distribution scored 0.9927 with the same recipe); at quarter
resolution the binding constraint is capacity + training budget
(docs/performance.md), so spend more budget: 180 epochs, 768 samples/ep.

Trains into a scratch dir and only replaces the shipped artifact (plus
its int8 + deploy twins) if val Dice improves.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

REPORT = "artifacts/round3_report.json"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    scratch = "artifacts/_s2d4_recovery"
    cfg = TrainConfig(epochs=180, num_train=768, num_val=64, s2d=4,
                      features=(48, 96, 192), save_dir=scratch)
    t0 = time.time()
    result = Trainer(cfg).fit()
    wall = round(time.time() - t0, 1)
    new_dice = result["best_dice"]

    full = json.load(open(REPORT))
    old_dice = full["unet_s2d4"]["best_dice"]
    log(f"recovery run: Dice {new_dice:.4f} (shipped {old_dice:.4f}), "
        f"{wall}s")

    entry = {"best_dice": new_dice, "best_epoch": result["best_epoch"],
             "epochs_run": len(result["history"]), "wall_s": wall,
             "recipe": "180ep/768"}
    if new_dice > old_dice:
        shutil.copy2(os.path.join(scratch, "best_model.ltpu"),
                     "artifacts/lane_unet_s2d4/best_model.ltpu")
        log("replaced shipped artifact; requantizing...")
        from lanetpu.quant.pipeline import quantize_checkpoint
        from lanetpu.runtime.engine import make_deploy_artifact

        rep = quantize_checkpoint("artifacts/lane_unet_s2d4/best_model.ltpu",
                                  "artifacts/lane_unet_s2d4/model_int8.ltpu",
                                  calib_images=100)
        dep = "artifacts/lane_unet_s2d4/model_int8_deploy.ltpu"
        if os.path.exists(dep):
            os.remove(dep)
        make_deploy_artifact("artifacts/lane_unet_s2d4/model_int8.ltpu", dep)
        rep["deploy_bytes"] = os.path.getsize(dep)
        full["quant_unet"]["lane_unet_s2d4"] = rep
        full["unet_s2d4"] = entry
        log(f"int8 parity: {json.dumps(rep)[:200]}")
    else:
        entry["kept_shipped"] = True
        full["unet_s2d4_recovery_attempt"] = entry
        log("no improvement; shipped artifact kept")

    with open(REPORT, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    log("done")


if __name__ == "__main__":
    main()
