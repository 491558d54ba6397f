"""Host-side control tests: PID, IMU yaw, LiDAR windows, servo state machine."""

import math

import numpy as np
import pytest

from lanetpu.control import (
    PID,
    ServoConfig,
    VisualServoController,
    front_distance,
    front_line_heading,
    quaternion_to_yaw,
    yaw_to_degrees,
)
from lanetpu.control.servo import TARGET_GROUPS, check_obj


def test_pid_proportional():
    pid = PID(kp=2.0, output_limit=10.0)
    assert pid.update(1.0, 0.1) == pytest.approx(2.0)


def test_pid_integral_clamps():
    pid = PID(kp=0.0, ki=1.0, integral_limit=0.5, output_limit=10.0)
    for _ in range(100):
        out = pid.update(1.0, 1.0)
    assert out == pytest.approx(0.5)


def test_pid_output_clamps():
    pid = PID(kp=100.0, output_limit=1.0)
    assert pid.update(5.0, 0.1) == 1.0
    assert pid.update(-5.0, 0.1) == -1.0


def test_quaternion_yaw_identity():
    assert quaternion_to_yaw(0, 0, 0, 1) == pytest.approx(0.0)
    # 90 degrees about z
    q = (0, 0, math.sin(math.pi / 4), math.cos(math.pi / 4))
    assert quaternion_to_yaw(*q) == pytest.approx(math.pi / 2)


def test_yaw_to_degrees_range():
    assert yaw_to_degrees(-math.pi / 2) == pytest.approx(270.0)
    assert yaw_to_degrees(math.pi) == pytest.approx(180.0)


def test_front_distance_filters_invalid():
    ranges = np.full(100, 0.001)  # all invalid (too close)
    assert front_distance(ranges) == 10.0
    ranges[45:55] = 1.5
    assert front_distance(ranges) == pytest.approx(1.5)


def test_front_line_heading_flat_wall():
    # wall parallel to robot's lateral axis, 1m ahead, 760-beam scan
    n = 760
    inc = 2 * math.pi / n
    idx = np.arange(n)
    angles = (idx - n / 2) * inc
    with np.errstate(divide="ignore"):
        ranges = np.where(np.abs(np.cos(angles)) > 0.2,
                          1.0 / np.abs(np.cos(angles)), 99.0)
    heading, dist = front_line_heading(ranges, inc, center_index=n // 2)
    assert heading == pytest.approx(0.0, abs=1e-6)
    assert dist == pytest.approx(1.0, abs=0.01)


def test_check_obj_groups():
    assert check_obj(0, "fruit") and check_obj(10, "fruit")
    assert check_obj(4, "vegetable") and not check_obj(4, "fruit")
    assert check_obj(2, "dessert")
    assert set(TARGET_GROUPS) == {"fruit", "vegetable", "dessert", "greenlight"}


def _detection(class_id, score=0.9, cx=320.0):
    half = 20.0
    boxes = np.array([[cx - half, 100, cx + half, 200]], np.float32)
    return boxes, np.array([class_id]), np.array([score], np.float32)


def test_servo_full_mission():
    """sleep -> finding (rotate) -> tracking -> parking -> success."""
    ctl = VisualServoController(aim_type="dessert")
    # no detection: enters finding, rotates
    cmd = ctl.step(None, None, theta=0.0)
    assert cmd.state == "finding" and cmd.wz != 0.0

    # dessert object appears centered; far away -> drive forward
    far = np.full(100, 2.0)
    cmd = ctl.step(_detection(1), far, theta=0.0)
    assert cmd.state == "tracking" and cmd.vx > 0.0

    # at target distance and aligned -> parking
    near = np.full(100, 0.2)
    cmd = ctl.step(_detection(1), near, theta=0.0)
    assert cmd.state == "parking"

    # parked within tolerance -> success
    cmd = ctl.step(_detection(1), near, theta=0.0)
    assert cmd.state == "success"
    assert ctl.final_distance == pytest.approx(0.2)


def test_servo_ignores_wrong_group():
    ctl = VisualServoController(aim_type="fruit")
    ctl.step(None, None, theta=0.0)
    # dessert object (cake=1) should not trigger tracking for 'fruit'
    cmd = ctl.step(_detection(1), np.full(100, 1.0), theta=0.0)
    assert cmd.state == "finding"


def test_servo_search_gives_up():
    ctl = VisualServoController(aim_type="fruit")
    theta = 0.0
    state = None
    for i in range(40):
        theta += math.pi / 7  # > rotation step each tick
        cmd = ctl.step(None, None, theta=theta)
        state = cmd.state
        if state == "fail":
            break
    assert state == "fail"


def test_servo_offcenter_steers_toward_target():
    ctl = VisualServoController(aim_type="dessert")
    ctl.step(None, None, theta=0.0)
    # target to the right of center
    cmd = ctl.step(_detection(2, cx=480.0), np.full(100, 2.0), theta=0.0)
    assert cmd.wz > 0.0  # positive error -> positive angular command


def test_service_preset_gains():
    cfg = ServoConfig.service_preset()
    assert cfg.kp_angular == 3.5 and cfg.kp_lateral == 1.8
    assert cfg.align_tol == 0.015 and cfg.park_distance_tol == 0.03
