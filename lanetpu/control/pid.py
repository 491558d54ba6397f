"""PID controller — host-side control math (pure numpy/python; not TPU work).

Parity with the three hand-rolled PID loops in the reference visual-servo
nodes (src/yolo_debug.py:146-172 gains, :334-347 and :437-456 update logic;
stricter gains in src/py_utils/srv.py:79-91): P + clipped-I + D with output
clamping.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PID:
    kp: float
    ki: float = 0.0
    kd: float = 0.0
    integral_limit: float = 0.5
    output_limit: float = 1.0
    integral: float = field(default=0.0, init=False)
    last_error: float = field(default=0.0, init=False)

    def update(self, error: float, dt: float) -> float:
        self.integral += error * dt
        self.integral = max(-self.integral_limit,
                            min(self.integral_limit, self.integral))
        derivative = (error - self.last_error) / dt if dt > 0 else 0.0
        self.last_error = error
        out = self.kp * error + self.ki * self.integral + self.kd * derivative
        return max(-self.output_limit, min(self.output_limit, out))

    def reset(self) -> None:
        self.integral = 0.0
        self.last_error = 0.0
