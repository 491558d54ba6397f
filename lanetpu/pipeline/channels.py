"""In-process named channels: the framework's replacement for ROS topics.

The reference's inter-component fabric is TCPROS pub/sub with per-topic
queue_size=1 latest-frame semantics (reference src/unet_ros_node.py:280-281,
src/yolo_detector.py:240-249 where the callback caches the latest frame
under a lock). Channels here keep the same named-topic vocabulary
("/image_rect_color", "/mask", "/cmd_vel", ...) but are in-process and
lock-based: a bounded ring per subscriber plus a latest-value cache, so both
the callback style and the poll-latest style of the reference map directly.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Any, Callable


class Channel:
    def __init__(self, name: str, queue_size: int = 1):
        self.name = name
        self.queue_size = queue_size
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._latest: Any = None
        self._seq = 0
        self._callbacks: list[Callable] = []
        self._queues: list[deque] = []

    # -- publish side ---------------------------------------------------

    def publish(self, msg: Any) -> None:
        with self._cond:
            self._latest = msg
            self._seq += 1
            for q in self._queues:
                q.append(msg)  # deque(maxlen) drops oldest: queue_size=1 ROS
            callbacks = list(self._callbacks)
            self._cond.notify_all()
        for cb in callbacks:
            cb(msg)

    # -- subscribe side -------------------------------------------------

    def subscribe(self, callback: Callable) -> None:
        """Callback-style subscription (runs on the publisher's thread,
        like rospy single-threaded spinners)."""
        with self._lock:
            self._callbacks.append(callback)

    def unsubscribe(self, callback: Callable) -> None:
        """Remove a callback added with subscribe (no-op if absent)."""
        with self._lock:
            try:
                self._callbacks.remove(callback)
            except ValueError:
                pass

    def make_queue(self, maxlen: int | None = None) -> deque:
        """Pull-style subscription: returns a bounded deque fed by publish."""
        q: deque = deque(maxlen=maxlen or self.queue_size)
        with self._lock:
            self._queues.append(q)
        return q

    def latest(self) -> Any:
        with self._lock:
            return self._latest

    def latest_with_seq(self) -> tuple:
        """(latest, seq) read under ONE lock acquisition — consistent pair
        for freshness checks (separate latest()/.seq reads can interleave
        with a publish)."""
        with self._lock:
            return self._latest, self._seq

    def wait_for_message(self, timeout: float | None = None,
                         min_seq: int | None = None) -> Any:
        """Block until a (new) message arrives (rospy.wait_for_message)."""
        with self._cond:
            target = self._seq + 1 if min_seq is None else min_seq
            while self._seq < target:
                if not self._cond.wait(timeout):
                    return None
            return self._latest

    @property
    def seq(self) -> int:
        with self._lock:
            return self._seq


class Bus:
    """Topic registry: bus.channel('/mask') creates-or-returns by name."""

    def __init__(self):
        self._lock = threading.Lock()
        self._channels: dict[str, Channel] = {}

    def channel(self, name: str, queue_size: int = 1) -> Channel:
        with self._lock:
            ch = self._channels.get(name)
            if ch is None:
                ch = Channel(name, queue_size)
                self._channels[name] = ch
            return ch

    def publish(self, name: str, msg: Any) -> None:
        self.channel(name).publish(msg)

    def topics(self) -> list:
        with self._lock:
            return sorted(self._channels)
