"""HTTP perception-server tests (the rosservice-RPC analogue)."""

import http.client
import io
import json

import numpy as np
import pytest

from lanetpu.pipeline.server import PerceptionServer


class FakeSegmenter:
    def predict(self, frame, threshold=0.5):
        mask = np.zeros(frame.shape[:2], np.uint8)
        mask[frame[..., 0] > 128] = 255
        return mask, 0.001

    def predict_warped(self, frame_bgr, threshold=0.5):
        return np.full((685, 1055), 255, np.uint8), 0.001


class FakeDetector:
    classes = ("a", "b")

    def detect(self, frame, map_to_original=True):
        return ((np.array([[1.0, 2, 3, 4]]), np.array([1]),
                 np.array([0.8], np.float32)), 0.002)


@pytest.fixture(scope="module")
def server():
    srv = PerceptionServer(segmenter=FakeSegmenter(),
                           detector=FakeDetector(), port=0).start()
    yield srv
    srv.stop()


def _png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_healthz(server):
    status, _, data = _request(server, "GET", "/healthz")
    assert status == 200 and json.loads(data)["ok"]


def test_segment_endpoint(server, rng):
    frame = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    status, ctype, data = _request(server, "POST", "/segment", _png(frame))
    assert status == 200 and ctype == "image/png"
    from PIL import Image

    mask = np.asarray(Image.open(io.BytesIO(data)))
    assert mask.shape == (40, 60)


def test_segment_warped_endpoint(server, rng):
    frame = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    status, _, data = _request(server, "POST", "/segment?warped=1",
                               _png(frame))
    from PIL import Image

    mask = np.asarray(Image.open(io.BytesIO(data)))
    assert status == 200 and mask.shape == (685, 1055)


def test_detect_endpoint(server, rng):
    frame = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    status, _, data = _request(server, "POST", "/detect", _png(frame))
    out = json.loads(data)
    assert status == 200
    assert out["detections"][0]["class"] == "b"
    assert out["detections"][0]["score"] == pytest.approx(0.8)


def test_unknown_route(server):
    status, _, _ = _request(server, "POST", "/nope", b"")
    assert status == 404


def test_detect_target_unloaded(server):
    status, _, data = _request(server, "POST", "/detect_target",
                               json.dumps({"aim_type": "fruit"}).encode())
    assert status == 503
