"""Channel-driven perception/control nodes.

These are the framework's equivalents of the reference's remaining ROS
nodes, wired over `pipeline.channels` instead of TCPROS:

  * `PointsStreamNode` — the ResNet lane-point node (reference
    src/resnet50_node.py:38-92): subscribes to a warped-image channel,
    publishes the flat [x1, y1, ...] points array and (optionally) an
    annotated result image.
  * `ContinuousServoNode` — the continuous visual-servo node (reference
    src/yolo_debug.py:92-551): every incoming frame runs detection + one
    controller tick, publishing /cmd_vel commands and annotated frames;
    unlike the service variant it starts on construction and free-runs.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

import numpy as np

from lanetpu.control.servo import ServoConfig, VisualServoController
from lanetpu.pipeline.channels import Bus


class PointsStreamNode:
    def __init__(self, regressor, bus: Bus | None = None,
                 input_topic: str = "/camera/warped_image",
                 points_topic: str = "/lane_detection/points",
                 image_topic: str = "/lane_detection/result_image",
                 annotate: bool = False,
                 log_fn: Callable = print):
        self.regressor = regressor
        self.bus = bus or Bus()
        self.points_ch = self.bus.channel(points_topic, queue_size=1)
        self.image_ch = self.bus.channel(image_topic, queue_size=1)
        self.annotate = annotate
        self.log_fn = log_fn
        self._stop = threading.Event()
        self.bus.channel(input_topic, queue_size=1).subscribe(self._on_frame)

    def _on_frame(self, frame_bgr: np.ndarray) -> None:
        if self._stop.is_set():
            return
        points, dt = self.regressor.inference(frame_bgr[..., ::-1])
        # flat [x1, y1, x2, y2, ...] float list, matching the reference's
        # Float32MultiArray payload (src/resnet50_node.py:76-86)
        self.points_ch.publish([float(v) for p in points for v in p])
        if self.annotate:
            img = frame_bgr.copy()
            for x, y in points.astype(int):
                yy = np.clip(y, 2, img.shape[0] - 3)
                xx = np.clip(x, 2, img.shape[1] - 3)
                img[yy - 2:yy + 3, xx - 2:xx + 3] = (0, 255, 0)
            self.image_ch.publish(img)

    def shutdown(self):
        self._stop.set()
        self.regressor.release()


class ContinuousServoNode:
    def __init__(self, engine, aim_type: str = "dessert",
                 bus: Bus | None = None,
                 image_topic: str = "/image_rect_color",
                 scan_topic: str = "/scan", pose_topic: str = "/mag_pose_2d",
                 cmd_vel_topic: str = "/cmd_vel",
                 annotated_topic: str = "/yolo_detection/annotated_image",
                 config: ServoConfig | None = None,
                 on_terminal: Callable | None = None):
        self.engine = engine
        self.bus = bus or Bus()
        self.controller = VisualServoController(aim_type=aim_type,
                                                config=config)
        self.scan_ch = self.bus.channel(scan_topic, queue_size=1)
        self.pose_ch = self.bus.channel(pose_topic, queue_size=1)
        self.cmd_ch = self.bus.channel(cmd_vel_topic, queue_size=10)
        self.annotated_ch = self.bus.channel(annotated_topic, queue_size=1)
        self.on_terminal = on_terminal
        self._processing = threading.Lock()  # reentrancy guard, non-blocking
        self._last_t = time.monotonic()
        self.bus.channel(image_topic, queue_size=1).subscribe(self._on_frame)

    def _on_frame(self, frame_bgr: np.ndarray) -> None:
        # Skip frames while one is in flight (the reference's `processing`
        # flag, src/yolo_debug.py:224-241 — here race-free via trylock).
        if not self._processing.acquire(blocking=False):
            return
        try:
            if self.controller.state in ("success", "fail"):
                return
            detections, _ = self.engine.detect(frame_bgr,
                                               map_to_original=False)
            now = time.monotonic()
            cmd = self.controller.step(
                detections,
                self.scan_ch.latest(),
                theta=float(self.pose_ch.latest() or 0.0),
                dt=now - self._last_t)
            self._last_t = now
            self.cmd_ch.publish(cmd)
            self.annotated_ch.publish(frame_bgr)
            if cmd.state in ("success", "fail") and self.on_terminal:
                self.on_terminal(cmd.state)
        finally:
            self._processing.release()
