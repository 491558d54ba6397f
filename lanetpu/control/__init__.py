from lanetpu.control.pid import PID
from lanetpu.control.imu import quaternion_to_yaw, yaw_to_degrees
from lanetpu.control.lidar import front_distance, front_line_heading
from lanetpu.control.servo import ServoConfig, VisualServoController, TARGET_GROUPS

__all__ = [
    "PID",
    "quaternion_to_yaw",
    "yaw_to_degrees",
    "front_distance",
    "front_line_heading",
    "ServoConfig",
    "VisualServoController",
    "TARGET_GROUPS",
]
