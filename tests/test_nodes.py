"""Channel-driven node tests (points stream + continuous servo)."""

import math

import numpy as np
import pytest

from lanetpu.control.servo import ServoConfig
from lanetpu.pipeline.channels import Bus
from lanetpu.pipeline.nodes import ContinuousServoNode, PointsStreamNode


class FakeRegressor:
    def inference(self, frame_rgb):
        h, w = frame_rgb.shape[:2]
        return np.array([[w * 0.25, h * 0.5], [w * 0.75, h * 0.5]]), 0.001

    def release(self):
        pass


class FakeEngine:
    classes = ("banana", "cake", "cola")

    def detect(self, frame, map_to_original=False):
        if frame[0, 0, 0] > 100:
            return ((np.array([[300.0, 200, 340, 280]]), np.array([1]),
                     np.array([0.9], np.float32)), 0.001)
        return ((None, None, None), 0.001)


def test_points_stream_node_publishes_flat_points():
    bus = Bus()
    node = PointsStreamNode(FakeRegressor(), bus=bus, annotate=True)
    frame = np.zeros((100, 200, 3), np.uint8)
    bus.publish("/camera/warped_image", frame)
    pts = bus.channel("/lane_detection/points").latest()
    assert pts == [50.0, 50.0, 150.0, 50.0]
    annotated = bus.channel("/lane_detection/result_image").latest()
    assert annotated is not None and annotated.shape == frame.shape
    node.shutdown()
    bus.publish("/camera/warped_image", frame)  # ignored after shutdown


def test_continuous_servo_node_mission():
    bus = Bus()
    outcomes = []
    node = ContinuousServoNode(FakeEngine(), aim_type="dessert", bus=bus,
                               on_terminal=outcomes.append)
    bright = np.full((480, 640, 3), 200, np.uint8)
    bus.publish("/scan", np.full(100, 0.2))
    bus.publish("/mag_pose_2d", 0.0)
    for _ in range(5):
        bus.publish("/image_rect_color", bright)
        if outcomes:
            break
    assert outcomes == ["success"]
    cmd = bus.channel("/cmd_vel").latest()
    assert cmd.state == "success"


def test_continuous_servo_node_searches_when_blind():
    bus = Bus()
    node = ContinuousServoNode(FakeEngine(), aim_type="dessert", bus=bus)
    dark = np.zeros((480, 640, 3), np.uint8)
    bus.publish("/mag_pose_2d", 0.0)
    bus.publish("/image_rect_color", dark)
    cmd = bus.channel("/cmd_vel").latest()
    assert cmd.state == "finding" and cmd.wz != 0.0


def test_heading_alignment_state():
    """With use_heading_alignment, a skewed wall triggers rotation before
    the linear approach (reference test_code/main.py 'roat' state)."""
    from lanetpu.control.servo import VisualServoController

    n = 760
    inc = 2 * math.pi / n
    cfg = ServoConfig(use_heading_alignment=True, lidar_angle_increment=inc)
    ctl = VisualServoController(aim_type="dessert", config=cfg)
    ctl.state = "parking"
    ctl.last_theta = 0.0

    # skewed wall: distance varies linearly across the front window
    idx = np.arange(n)
    angles = (idx - n / 2) * inc
    ranges = 0.2 + 0.5 * np.sin(angles)  # strong skew at center
    det = (np.array([[300.0, 200, 340, 280]]), np.array([1]),
           np.array([0.9], np.float32))
    cmd = ctl.step(det, ranges, theta=0.0)
    assert cmd.state == "parking"
    assert cmd.wz != 0.0 and cmd.vx == 0.0  # rotating, not approaching

    # square wall at target distance -> success path unaffected
    ctl2 = VisualServoController(aim_type="dessert", config=cfg)
    ctl2.state = "parking"
    ctl2.last_theta = 0.0
    flat = np.full(n, 99.0)
    with np.errstate(all="ignore"):
        flat = np.where(np.abs(np.cos(angles)) > 0.5,
                        0.2 / np.maximum(np.abs(np.cos(angles)), 1e-6), 99.0)
    cmd = ctl2.step(det, flat, theta=0.0)
    assert cmd.state == "success"
