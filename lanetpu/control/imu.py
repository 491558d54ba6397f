"""IMU quaternion -> yaw math.

Parity with reference src/yolo_task.py:8-26 (and the inline copy in
src/test_code/main.py:153-189): yaw from quaternion via atan2, then radians
-> [0, 360) degrees.
"""

import math


def quaternion_to_yaw(x: float, y: float, z: float, w: float) -> float:
    """Quaternion -> yaw (radians, [-pi, pi])."""
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    return math.atan2(siny_cosp, cosy_cosp)


def yaw_to_degrees(yaw_rad: float) -> float:
    """Radians -> degrees in [0, 360) (reference src/yolo_task.py:20-26)."""
    deg = math.degrees(yaw_rad)
    return deg % 360.0
