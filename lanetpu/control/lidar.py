"""LiDAR front-window processing.

Parity with the reference's two LiDAR consumers:
  * mean distance over a centered window with validity filtering
    (0.01 m < d < 5 m), reference src/yolo_debug.py:313-330;
  * front line-fit heading over a fixed index window (377±12) used for the
    final parking alignment, reference src/test_code/main.py:192-225 +
    src/test_code/tool.py:183-226 (least-squares line through the polar ->
    cartesian points, heading from the fitted slope).
"""

from __future__ import annotations

import math

import numpy as np


def front_distance(ranges, center_index: int | None = None,
                   half_window: int = 15, min_range: float = 0.01,
                   max_range: float = 5.0, default: float = 10.0) -> float:
    """Mean of valid ranges in a centered window (yolo_debug.py:313-330)."""
    ranges = np.asarray(ranges, dtype=np.float64)
    if center_index is None:
        center_index = len(ranges) // 2
    lo = max(0, center_index - half_window)
    hi = min(len(ranges), center_index + half_window)
    window = ranges[lo:hi]
    valid = window[(window > min_range) & (window < max_range)]
    return float(valid.mean()) if valid.size else default


def front_line_heading(ranges, angle_increment: float,
                       center_index: int = 377, half_window: int = 12,
                       min_range: float = 0.01, max_range: float = 5.0):
    """Fit a line to the front window's cartesian points; return
    (heading_error_rad, mean_distance) or (None, None) when too few points.

    The heading error is the angle between the fitted obstacle face and the
    robot's lateral axis — zero when the robot squarely faces it
    (reference src/test_code/main.py:192-225).
    """
    ranges = np.asarray(ranges, dtype=np.float64)
    lo = max(0, center_index - half_window)
    hi = min(len(ranges), center_index + half_window + 1)
    idx = np.arange(lo, hi)
    r = ranges[idx]
    ok = (r > min_range) & (r < max_range)
    if ok.sum() < 3:
        return None, None
    idx, r = idx[ok], r[ok]
    angles = (idx - len(ranges) / 2) * angle_increment
    xs = r * np.sin(angles)
    ys = r * np.cos(angles)
    # least-squares y = a*x + b
    a, b = np.polyfit(xs, ys, 1)
    heading_err = math.atan(a)
    return heading_err, float(r.mean())
