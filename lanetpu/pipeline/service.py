"""Service endpoints: one-shot multi-frame detection + find/track/park RPC.

Capability parity with the reference's three service-shaped components:
  * `MultiFrameDetectService` — the `yolo_detect` Trigger service
    (reference src/yolo_detector.py:251-312): grab 8 frames at 100 ms
    spacing from the camera channel, detect, per-class max confidence,
    keep > 0.7, JSON result. TPU-first difference: all 8 frames run as ONE
    batched device launch instead of 8 sequential NPU calls.
  * `DetectTargetService` — the threaded find/track/park service
    (reference src/py_utils/srv.py:95-195 and src/test_code/main.py:413-437):
    a worker thread drives the VisualServoController until success/fail,
    BUSY rejection while a task is live, response {if_success, obj_name}.
    This fixes the reference's srv-schema skew (SURVEY.md §2.1 #13) by
    using one schema: request (aim_type, if_parking), response
    (if_success, obj_name, final_distance).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

import numpy as np

from lanetpu.control.servo import ServoConfig, VisualServoController
from lanetpu.pipeline.channels import Bus

CONFIDENCE_THRESHOLD = 0.7  # reference src/yolo_detector.py:64
FRAMES_TO_CAPTURE = 8       # reference src/yolo_detector.py:65


class MultiFrameDetectService:
    def __init__(self, engine, bus: Bus | None = None,
                 image_topic: str = "/usb_cam/image_raw",
                 frames_to_capture: int = FRAMES_TO_CAPTURE,
                 frame_interval_s: float = 0.1,
                 confidence_threshold: float = CONFIDENCE_THRESHOLD,
                 exclude: tuple = ("Traffic_light_no", "traffic_light_no"),
                 stale_retry_s: float = 0.2):
        self.engine = engine
        self.bus = bus or Bus()
        self.image_ch = self.bus.channel(image_topic, queue_size=1)
        self.frames_to_capture = frames_to_capture
        self.frame_interval_s = frame_interval_s
        self.confidence_threshold = confidence_threshold
        self.exclude = set(exclude)
        self.stale_retry_s = stale_retry_s

    def _fresh_or_duplicate(self, last_seq: int):
        """Wait up to stale_retry_s for a frame newer than last_seq; then
        accept the duplicate. The reference sleeps 100 ms and takes whatever
        the callback cached — duplicates included (src/yolo_detector.py:
        263-272); we match that guarantee (exactly frames_to_capture frames
        whenever the camera ever produced one) but prefer fresh frames."""
        deadline = time.time() + self.stale_retry_s
        while True:
            frame, seq = self.image_ch.latest_with_seq()
            if frame is not None and seq != last_seq:
                return frame, seq
            if time.time() >= deadline:
                return frame, seq  # duplicate (or None if never any frame)
            time.sleep(0.005)

    def __call__(self) -> dict:
        """Trigger: returns {success, results: [{type, confidence}, ...]}."""
        frames = []
        last_seq = -1
        for _ in range(self.frames_to_capture):
            if self.frame_interval_s > 0:
                time.sleep(self.frame_interval_s)
            frame, last_seq = self._fresh_or_duplicate(last_seq)
            if frame is not None:
                frames.append(frame)
        if not frames:
            return {"success": False, "message": "no frames available"}

        # One batched device launch for all captured frames.
        batch = np.stack(frames)
        results = self.engine.detect_batch(batch, map_to_original=False)

        best: dict[str, float] = {}
        for boxes, classes, scores in results:
            if boxes is None:
                continue
            for class_id, score in zip(classes, scores):
                name = self.engine.classes[int(class_id)]
                best[name] = max(best.get(name, 0.0), float(score))

        final = [{"type": name, "confidence": f"{conf:.3f}"}
                 for name, conf in sorted(best.items())
                 if conf > self.confidence_threshold
                 and name not in self.exclude]
        return {"success": True, "results": final,
                "frames_processed": len(frames)}


@dataclass
class DetectTargetRequest:
    aim_type: str = "fruit"
    if_parking: bool = True


@dataclass
class DetectTargetResponse:
    if_success: bool = False
    obj_name: str | None = None
    final_distance: float = 0.0
    message: str = ""


class DetectTargetService:
    """Find/track/park as an RPC: spawns a worker loop per request."""

    VALID_TYPES = ("fruit", "vegetable", "dessert")

    def __init__(self, engine, bus: Bus | None = None,
                 image_topic: str = "/image_rect_color",
                 scan_topic: str = "/scan", pose_topic: str = "/mag_pose_2d",
                 cmd_vel_topic: str = "/cmd_vel",
                 config: ServoConfig | None = None,
                 rate_hz: float = 50.0, timeout_s: float = 60.0):
        self.engine = engine
        self.bus = bus or Bus()
        self.image_ch = self.bus.channel(image_topic, queue_size=1)
        self.scan_ch = self.bus.channel(scan_topic, queue_size=1)
        self.pose_ch = self.bus.channel(pose_topic, queue_size=1)
        self.cmd_ch = self.bus.channel(cmd_vel_topic, queue_size=10)
        self.config = config or ServoConfig.service_preset()
        self.rate_hz = rate_hz
        self.timeout_s = timeout_s
        self._busy = threading.Lock()

    def __call__(self, req: DetectTargetRequest) -> DetectTargetResponse:
        if req.aim_type not in self.VALID_TYPES:
            return DetectTargetResponse(
                message=f"INVALID_TYPE: {req.aim_type}")
        if not self._busy.acquire(blocking=False):
            # reference srv.py:113-115 BUSY rejection
            return DetectTargetResponse(message="BUSY")
        try:
            return self._run_mission(req)
        finally:
            self._busy.release()

    def _run_mission(self, req: DetectTargetRequest) -> DetectTargetResponse:
        ctl = VisualServoController(aim_type=req.aim_type, config=self.config)
        period = 1.0 / self.rate_hz
        deadline = time.time() + self.timeout_s
        last_t = time.time()
        while time.time() < deadline:
            frame = self.image_ch.latest()
            detections = None
            if frame is not None:
                detections, _ = self.engine.detect(frame,
                                                   map_to_original=False)
            scan = self.scan_ch.latest()
            theta = self.pose_ch.latest() or 0.0
            now = time.time()
            cmd = ctl.step(detections, scan, theta=float(theta),
                           dt=now - last_t)
            last_t = now
            self.cmd_ch.publish(cmd)
            if cmd.state == "success" or (
                    not req.if_parking and cmd.state == "tracking"):
                name = (self.engine.classes[ctl.detected_name]
                        if ctl.detected_name is not None else None)
                return DetectTargetResponse(
                    if_success=True, obj_name=name,
                    final_distance=ctl.final_distance)
            if cmd.state == "fail":
                return DetectTargetResponse(message="target not found")
            time.sleep(max(0.0, period - (time.time() - now)))
        return DetectTargetResponse(message="timeout")
