"""Observability utilities.

Parity with the reference's logging surface: rospy-style leveled logging
with throttled variants (reference src/py_utils/srv.py:300, :438
loginfo_throttle), the 5-second FPS counter (src/unet_ros_node.py:328-335),
and a `jax.profiler` trace context replacing the RKNN `perf_debug` flag
(README.md:4389-4393).
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("lanetpu")

_last_emit: dict[str, float] = {}


def log_throttle(period_s: float, message: str, level: int = logging.INFO,
                 key: str | None = None) -> bool:
    """Emit at most once per `period_s` per call-site key. Returns whether
    the message was emitted."""
    k = key or message
    now = time.monotonic()
    last = _last_emit.get(k, -1e18)
    if now - last >= period_s:
        _last_emit[k] = now
        logger.log(level, message)
        return True
    return False


class FpsCounter:
    """Rolling FPS accounting with periodic emission (the reference's
    5-second FPS log)."""

    def __init__(self, period_s: float = 5.0):
        self.period_s = period_s
        self.frames = 0
        self.total_time = 0.0
        self._last_log = time.monotonic()

    def tick(self, dt: float) -> float | None:
        """Record one frame taking `dt` seconds; returns avg fps when the
        logging period elapses, else None."""
        self.frames += 1
        self.total_time += dt
        now = time.monotonic()
        if now - self._last_log >= self.period_s:
            self._last_log = now
            return self.frames / self.total_time if self.total_time else 0.0
        return None


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/lanetpu_trace"):
    """jax.profiler trace context: `with profile_trace(): run_hot_loop()`
    then inspect with TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
