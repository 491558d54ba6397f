"""Video pipeline test (reference src/unet.py:99-146 predict_video parity)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lanetpu.core.config import PipelineConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.runtime.lane import LaneSegmenter


def _write_video(path, n_frames=10, size=(64, 48)):
    w, h = size
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        out.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    out.release()


def test_predict_video_roundtrip(tmp_path):
    src = str(tmp_path / "in.mp4")
    dst = str(tmp_path / "out.mp4")
    _write_video(src, n_frames=10)
    seg = LaneSegmenter(module=UNet(config=UNetConfig(features=(4,))),
                        config=PipelineConfig(compute_dtype="float32",
                                              batch_size=4))
    fps = seg.predict_video(src, dst, batch_size=4)
    assert fps > 0
    assert os.path.exists(dst)
    cap = cv2.VideoCapture(dst)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    ret, frame = cap.read()
    assert ret and frame.shape == (48, 64, 3)
    cap.release()
