"""Train the TPU-optimized space-to-depth U-Net (UNetConfig.tpu_s2d).

Same recipe as the parity artifact (60 epochs, 7-scene synthetic, 512
train / 64 val), written to artifacts/lane_unet_s2d/. Appends the result
to artifacts/round2_report.json under "unet_s2d". Run on the TPU (single
client!): python scripts/train_s2d.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

REPORT = "artifacts/round2_report.json"


def record(stage, payload):
    rep = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            rep = json.load(f)
    rep[stage] = payload
    with open(REPORT, "w") as f:
        json.dump(rep, f, indent=1, sort_keys=True)
    print(f"stage {stage}: {json.dumps(payload)[:300]}", flush=True)


def main():
    import jax

    d = os.path.expanduser("~/.cache/lanetpu/xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    s2d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    save_dir = sys.argv[2] if len(sys.argv) > 2 else f"artifacts/lane_unet_s2d"
    cfg = TrainConfig(epochs=60, num_train=512, num_val=64, s2d=s2d,
                      save_dir=save_dir)
    t0 = time.time()
    result = Trainer(cfg).fit()
    record(f"unet_s2d{s2d}", {"best_dice": result["best_dice"],
                              "best_epoch": result["best_epoch"],
                              "epochs_run": len(result["history"]),
                              "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
