"""Failure-detection / recovery tests (SURVEY.md §5: the reference degrades
to zero outputs on inference errors and rejects concurrent missions)."""

import numpy as np
import pytest

from lanetpu.core.config import PipelineConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.runtime.lane import LaneSegmenter


def _segmenter():
    return LaneSegmenter(module=UNet(config=UNetConfig(features=(4,))),
                         config=PipelineConfig(compute_dtype="float32",
                                               use_mxu_resample=False))


def test_safe_mode_returns_zero_mask_on_failure(rng):
    seg = _segmenter()
    seg.variables = None  # inject an engine fault
    frame = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    mask, dt = seg.predict(frame, safe=True)
    assert mask.shape == (32, 48)
    assert (mask == 0).all()
    assert dt >= 0


def test_unsafe_mode_raises(rng):
    seg = _segmenter()
    seg.variables = None
    with pytest.raises(Exception):
        seg.predict(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8))


def test_nan_inputs_do_not_crash_pipeline(rng):
    """Garbage (all-zero / extreme) frames must produce valid masks, never
    exceptions — the streaming loop can't afford to die on a bad frame."""
    seg = _segmenter()
    for frame in (np.zeros((32, 48, 3), np.uint8),
                  np.full((32, 48, 3), 255, np.uint8)):
        mask, _ = seg.predict(frame)
        assert mask.dtype == np.uint8
        assert set(np.unique(mask)).issubset(set(range(256)))


def test_server_inference_error_returns_500_not_crash(rng):
    import http.client
    import io

    from PIL import Image

    from lanetpu.pipeline.server import PerceptionServer

    class BrokenSegmenter:
        def predict(self, frame, threshold=0.5):
            raise RuntimeError("device lost")

    srv = PerceptionServer(segmenter=BrokenSegmenter(), port=0).start()
    try:
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                        ).save(buf, format="PNG")
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("POST", "/segment", body=buf.getvalue())
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 500
        assert b"device lost" in body
        # server still alive afterwards
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        srv.stop()
