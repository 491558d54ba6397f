"""CLI surface tests (parser wiring + light end-to-end commands on CPU)."""

import json
import os
import sys

import numpy as np
import pytest

from lanetpu.cli.main import build_parser, main


def test_parser_has_all_commands():
    p = build_parser()
    subs = p._subparsers._group_actions[0].choices
    assert set(subs) >= {"infer", "video", "bench", "train", "quantize",
                         "eval", "detect", "stream"}


def test_cli_requires_command(capsys):
    with pytest.raises(SystemExit):
        main([])


def test_cli_infer_roundtrip(tmp_path, rng):
    from PIL import Image

    img_path = tmp_path / "frame.png"
    out_path = tmp_path / "mask.png"
    Image.fromarray(rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)).save(
        img_path)
    main(["infer", str(img_path), "-o", str(out_path),
          "--set", "compute_dtype=float32",
          "--set", "use_mxu_resample=false"])
    mask = np.asarray(Image.open(out_path))
    assert mask.shape == (60, 80)


def test_cli_eval(tmp_path, capsys):
    from PIL import Image

    a = np.zeros((20, 20), np.uint8)
    a[5:15, 5:15] = 255
    pa = tmp_path / "a.png"
    pb = tmp_path / "b.png"
    Image.fromarray(a).save(pa)
    Image.fromarray(a).save(pb)
    main(["eval", str(pa), str(pb)])
    out = json.loads(capsys.readouterr().out)
    assert out["iou"] == 1.0 and out["dice"] == 1.0


def test_cli_train_smoke(tmp_path, capsys):
    main(["train", "--epochs", "1",
          "--set", "features=[4]",
          "--set", "image_size=[32,32]",
          "--set", "num_train=8", "--set", "num_val=4",
          "--set", "batch_size=4",
          "--set", "compute_dtype=float32",
          "--set", f"save_dir={tmp_path}/ckpt"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_run"] == 1
    assert os.path.exists(tmp_path / "ckpt" / "last_model.ltpu")


def test_cli_camera_graceful_without_hardware(tmp_path, capsys):
    """The webcam demo command reports cleanly on headless machines."""
    import json as _json

    from lanetpu.cli.main import main

    main(["camera", "--device", "99", "--seconds", "0.1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out)["error"] == "no camera available"


def test_cli_baseline(tmp_path, capsys):
    """`baseline` runs the classical HSV threshold path on an image
    (the reference's follow_line.py role) and writes a mask."""
    from PIL import Image

    img = np.zeros((64, 64, 3), np.uint8)
    img[...] = (90, 110, 170)
    img[:, 28:36] = (235, 235, 235)
    img_path = tmp_path / "frame.png"
    Image.fromarray(img).save(img_path)
    out_path = tmp_path / "mask.png"
    main(["baseline", "--image", str(img_path), "--method", "hsv",
          "--output", str(out_path)])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["method"] == "hsv" and rep["lane_frac"] > 0.05
    mask = np.asarray(Image.open(out_path))
    assert mask[:, 30].all() and not mask[:, 5].any()
