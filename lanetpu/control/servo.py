"""Find/track/park visual-servoing state machine (host-side, ROS-free).

Capability parity with the reference's three servo controllers:
  * continuous node src/yolo_debug.py:92-551 (states sleep -> finding ->
    tracking -> parking -> success/fail, 16 x 22.5-degree search rotation,
    PID on the normalized image-x offset, LiDAR distance gating);
  * threaded service src/py_utils/srv.py:40-515 (stricter gains
    Kp_angular=3.5 / Kp_lateral=1.8, parking success needs distance error
    < 3 cm and visual/angular error < 0.015);
  * sensor-fusion tracker src/test_code/main.py:61-458 (gives up after 450
    degrees of cumulative search rotation).

The controller is a pure step function over a sensor snapshot — perception
(detection) happens on the TPU via `lanetpu.runtime.detector.YoloEngine`,
everything here is a few host flops. No ROS: the pipeline layer
(`lanetpu.pipeline`) wires it to channels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from lanetpu.control.lidar import front_distance
from lanetpu.control.pid import PID

# Target groups over the 11-class list (reference src/yolo_debug.py:55-70).
TARGET_GROUPS = {
    "fruit": (0, 3, 10),       # banana, apple, watermelon
    "vegetable": (4, 6, 7),    # lajiao, potato, tomato
    "dessert": (1, 2, 5),      # cake, cola, milk
    "greenlight": (8,),        # reference src/test_code/main.py:58
}


def check_obj(class_id: int, aim_type: str) -> bool:
    """Is `class_id` part of the aim group? (reference yolo_debug.py:55-70)"""
    return int(class_id) in TARGET_GROUPS.get(aim_type, ())


@dataclass
class ServoConfig:
    # Angular PID (reference yolo_debug.py:148-153; srv.py:79 uses 3.5)
    kp_angular: float = 0.5
    ki_angular: float = 0.01
    kd_angular: float = 0.0
    max_angular_vel: float = 1.0
    # Linear PID (yolo_debug.py:156-162)
    kp_linear: float = 0.6
    ki_linear: float = 0.005
    kd_linear: float = 0.0
    target_distance: float = 0.2
    max_linear_vel: float = 0.3
    # Lateral PID (yolo_debug.py:165-170; srv.py:89 uses 1.8)
    kp_lateral: float = 1.0
    ki_lateral: float = 0.0
    kd_lateral: float = 0.0
    max_lateral_vel: float = 0.1
    # Search (yolo_debug.py:288-305)
    rotation_step_rad: float = math.pi / 8  # 22.5 degrees
    max_search_rotations: int = 16          # one full turn
    search_angular_vel: float = 0.5
    # Success gates
    park_distance_tol: float = 0.1      # yolo_debug.py:349
    align_tol: float = 0.02             # yolo_debug.py:485
    confidence_threshold: float = 0.5   # yolo_debug.py:44
    # srv.py variant: stricter alignment + cumulative-rotation give-up
    max_cumulative_rotation_deg: float = 450.0  # test_code/main.py:315-318
    # Sensor-fusion tracker refinement (test_code/main.py 'roat' state +
    # tool.py:183-226 line fit): square up against the obstacle face using
    # the LiDAR line-fit heading before the final approach.
    use_heading_alignment: bool = False
    heading_tol_rad: float = 0.05
    lidar_angle_increment: float = 0.00827  # ~760-beam scan default

    @staticmethod
    def service_preset() -> "ServoConfig":
        """The stricter service-node gains (reference srv.py:77-91, :424-436)."""
        return ServoConfig(kp_angular=3.5, kp_lateral=1.8,
                           park_distance_tol=0.03, align_tol=0.015)


@dataclass
class Command:
    vx: float = 0.0
    vy: float = 0.0
    wz: float = 0.0
    state: str = "sleep"
    target: tuple | None = None  # (class_id, score, obj_pos)


class VisualServoController:
    """States: sleep -> finding -> tracking -> parking -> success | fail."""

    def __init__(self, aim_type: str = "dessert",
                 config: ServoConfig | None = None, img_width: int = 640):
        self.cfg = config or ServoConfig()
        self.aim_type = aim_type
        self.img_width = img_width
        self.state = "sleep"
        self.counter = 0
        self.rotation_direction = 1
        self.begin_angle: float | None = None
        self.cumulative_rotation = 0.0
        self.last_theta: float | None = None
        self.final_distance = 0.0
        self.detected_name: str | None = None
        c = self.cfg
        self.pid_angular = PID(c.kp_angular, c.ki_angular, c.kd_angular,
                               integral_limit=0.5,
                               output_limit=c.max_angular_vel)
        self.pid_linear = PID(c.kp_linear, c.ki_linear, c.kd_linear,
                              integral_limit=0.5,
                              output_limit=c.max_linear_vel)
        self.pid_lateral = PID(c.kp_lateral, c.ki_lateral, c.kd_lateral,
                               integral_limit=0.2,
                               output_limit=c.max_lateral_vel)

    # ------------------------------------------------------------------

    def _select_target(self, detections):
        """First target-group detection above confidence (yolo_debug.py:372-403).

        detections: (boxes_xyxy, classes, scores) in letterbox coords or None.
        Returns (class_id, score, obj_pos in [-0.5, 0.5]) or None.
        """
        if detections is None:
            return None
        boxes, classes, scores = detections
        if boxes is None:
            return None
        for box, class_id, score in zip(boxes, classes, scores):
            if score < self.cfg.confidence_threshold:
                continue
            if check_obj(class_id, self.aim_type):
                obj_pos = (box[0] + box[2]) / 2.0 / self.img_width - 0.5
                return int(class_id), float(score), float(obj_pos)
        return None

    def step(self, detections, lidar_ranges=None, theta: float = 0.0,
             dt: float = 0.05) -> Command:
        """One control tick: sensor snapshot -> velocity command + state."""
        cfg = self.cfg

        # Cumulative-rotation accounting (test_code/main.py:315-318)
        if self.last_theta is not None:
            d = abs(theta - self.last_theta)
            self.cumulative_rotation += math.degrees(min(d, 2 * math.pi - d))
        self.last_theta = theta

        if self.state in ("success", "fail"):
            return Command(state=self.state)

        if self.state == "sleep":
            self.state = "finding"
            self.begin_angle = theta
            self.counter = 0
            self.rotation_direction = 1

        target = self._select_target(detections)

        if target is None:
            # finding / lost-target search rotation (yolo_debug.py:288-311,
            # :500-507)
            if self.state != "parking":
                self.state = "finding"
            if self.begin_angle is None:
                self.begin_angle = theta
            diff = (theta - self.begin_angle + 2 * math.pi) % (2 * math.pi)
            if abs(diff) > cfg.rotation_step_rad:
                self.counter += 1
                self.begin_angle = theta
            if (self.counter >= cfg.max_search_rotations
                    or self.cumulative_rotation
                    >= cfg.max_cumulative_rotation_deg):
                self.state = "fail"
                return Command(state="fail")
            return Command(wz=cfg.search_angular_vel * self.rotation_direction,
                           state=self.state)

        class_id, score, obj_pos = target
        self.detected_name = class_id

        distance = front_distance(lidar_ranges) if lidar_ranges is not None else 10.0

        if self.state == "parking":
            # Optional heading square-up against the obstacle face
            # (test_code/main.py 'roat' state) before the linear approach.
            if cfg.use_heading_alignment and lidar_ranges is not None:
                from lanetpu.control.lidar import front_line_heading

                heading, _ = front_line_heading(
                    lidar_ranges, cfg.lidar_angle_increment,
                    center_index=len(lidar_ranges) // 2)
                if heading is not None and abs(heading) > cfg.heading_tol_rad:
                    wz = self.pid_angular.update(heading, dt)
                    return Command(wz=wz, state="parking",
                                   target=(class_id, score, obj_pos))
            # Pure linear PID to target distance (yolo_debug.py:313-361)
            err = distance - cfg.target_distance
            if abs(err) < cfg.park_distance_tol:
                self.state = "success"
                self.final_distance = distance
                return Command(state="success",
                               target=(class_id, score, obj_pos))
            v = self.pid_linear.update(err, dt)
            return Command(vx=v, state="parking",
                           target=(class_id, score, obj_pos))

        # tracking (yolo_debug.py:429-498)
        self.state = "tracking"
        wz = self.pid_angular.update(obj_pos, dt)
        vy = self.pid_lateral.update(obj_pos, dt)
        vx = 0.0
        if distance > cfg.target_distance + 0.1:
            vx = cfg.max_linear_vel
        elif distance < cfg.target_distance - 0.05:
            vx = -0.05
        else:
            if (abs(obj_pos) < cfg.align_tol
                    and abs(distance - cfg.target_distance) < 0.05):
                self.state = "parking"
        return Command(vx=vx, vy=vy, wz=wz, state=self.state,
                       target=(class_id, score, obj_pos))
