"""HTTP serving endpoint for the perception pipelines.

The reference exposes its perception over ROS RPC (`yolo_detect` Trigger
service, `detect_target`/`yolo_tracker` services — src/yolo_detector.py:217,
src/py_utils/srv.py:95, src/test_code/main.py:455). This module is the
framework's network-facing equivalent: a small threaded HTTP server over the
same engines, suitable for production serving in front of the batched TPU
pipelines.

Endpoints:
  GET  /healthz           -> {"ok": true}
  POST /segment           -> image bytes (png/jpg) in, PNG mask out
                             (query: ?warped=1 applies the IPM path,
                              ?threshold=0.5)
  POST /detect            -> image bytes in, JSON detections out
  POST /detect_target     -> JSON {aim_type, if_parking} in, mission result
                             out (runs the find/track/park service)

Stdlib-only (http.server + PIL); one inference lock serializes device work
per server (batching across connections is the StreamingRunner's job).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _read_image(body: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))


def _png_bytes(mask: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(mask).save(buf, format="PNG")
    return buf.getvalue()


class PerceptionServer:
    def __init__(self, segmenter=None, detector=None, target_service=None,
                 host: str = "127.0.0.1", port: int = 8080):
        self.segmenter = segmenter
        self.detector = detector
        self.target_service = target_service
        self._infer_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                if urlparse(self.path).path == "/healthz":
                    self._json(200, {"ok": True})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                parsed = urlparse(self.path)
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    if parsed.path == "/segment":
                        self._segment(parsed, body)
                    elif parsed.path == "/detect":
                        self._detect(body)
                    elif parsed.path == "/detect_target":
                        self._detect_target(body)
                    else:
                        self._json(404, {"error": "not found"})
                except Exception as e:  # noqa: BLE001 — RPC boundary
                    self._json(500, {"error": str(e)})

            def _segment(self, parsed, body):
                if outer.segmenter is None:
                    return self._json(503, {"error": "no segmenter loaded"})
                q = parse_qs(parsed.query)
                threshold = float(q.get("threshold", ["0.5"])[0])
                warped = q.get("warped", ["0"])[0] in ("1", "true")
                frame = _read_image(body)
                with outer._infer_lock:
                    if warped:
                        mask, _ = outer.segmenter.predict_warped(
                            frame[..., ::-1], threshold)
                    else:
                        mask, _ = outer.segmenter.predict(frame, threshold)
                self._send(200, _png_bytes(mask), "image/png")

            def _detect(self, body):
                if outer.detector is None:
                    return self._json(503, {"error": "no detector loaded"})
                frame = _read_image(body)[..., ::-1]  # engine expects BGR
                with outer._infer_lock:
                    (boxes, classes, scores), dt = outer.detector.detect(frame)
                dets = []
                if boxes is not None:
                    for b, c, s in zip(boxes, classes, scores):
                        dets.append({
                            "box": [float(v) for v in b],
                            "class": outer.detector.classes[int(c)],
                            "score": float(s),
                        })
                self._json(200, {"detections": dets,
                                 "time_ms": round(dt * 1e3, 2)})

            def _detect_target(self, body):
                if outer.target_service is None:
                    return self._json(503,
                                      {"error": "no target service loaded"})
                from lanetpu.pipeline.service import DetectTargetRequest

                req = json.loads(body or b"{}")
                resp = outer.target_service(DetectTargetRequest(
                    aim_type=req.get("aim_type", "fruit"),
                    if_parking=bool(req.get("if_parking", True))))
                self._json(200, {
                    "if_success": resp.if_success,
                    "obj_name": resp.obj_name,
                    "final_distance": resp.final_distance,
                    "message": resp.message,
                })

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self):
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=2)
