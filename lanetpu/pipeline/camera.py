"""Live camera capture source feeding the node graph.

Completes the reference's webcam demo path (reference src/unet.py:190-224:
cv2.VideoCapture loop -> predict -> imshow) as a framework node: a capture
thread reads camera frames into the lock-free C++ SPSC frame ring
(`lanetpu.native.hostops.FrameRing` — the native layer in its production
position), and a publisher thread drains the ring onto a named channel that
`LaneStreamNode` / `MultiFrameDetectService` already subscribe to.

Hardware-free by construction: `capture_factory` injects any object with
the cv2.VideoCapture protocol (isOpened/read/release), and `start()`
returns False — no exception — when no camera is reachable, so nodes and
tests degrade gracefully on headless machines.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Callable

import numpy as np

from lanetpu.pipeline.channels import Bus


class _PyRing:
    """Pure-python stand-in for the native SPSC ring (same drop-oldest
    contract) used when libltpuhost.so is unavailable."""

    def __init__(self, capacity: int):
        self._dq = deque(maxlen=capacity)
        self.dropped = 0
        self._lock = threading.Lock()

    def push(self, frame) -> bool:
        with self._lock:
            dropped = len(self._dq) == self._dq.maxlen
            self._dq.append(frame)
            self.dropped += int(dropped)
            return dropped

    def pop(self):
        with self._lock:
            return self._dq.popleft() if self._dq else None

    def __len__(self):
        return len(self._dq)

    def close(self):
        self._dq.clear()


def _default_capture(device):
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(device)
    if not cap.isOpened():
        cap.release()
        return None
    return cap


class CameraSource:
    """Camera -> SPSC ring -> channel publisher.

    Publishes BGR uint8 frames (the cv2 convention the downstream nodes
    expect, matching the reference's image_callback payloads).
    """

    def __init__(self, bus: Bus | None = None,
                 topic: str = "/usb_cam/image_raw", device: int | str = 0,
                 frame_shape: tuple | None = None, ring_capacity: int = 8,
                 capture_factory: Callable | None = None,
                 use_native_ring: bool = True, fps_limit: float | None = None,
                 pixel_format: str = "bgr"):
        """pixel_format "bgr": the capture yields [H, W, 3] BGR frames
        (cv2 convention, default shape 480x640x3). "nv12": the capture
        yields packed [3H/2, W] 4:2:0 buffers (camera-native layout,
        default shape 720x640) — half the ring/channel bytes per frame;
        pair with LaneStreamNode(pixel_format="nv12")."""
        assert pixel_format in ("bgr", "nv12")
        if frame_shape is None:
            frame_shape = (720, 640) if pixel_format == "nv12" \
                else (480, 640, 3)
        self.pixel_format = pixel_format
        self.bus = bus or Bus()
        self.channel = self.bus.channel(topic, queue_size=1)
        self.device = device
        self.frame_shape = tuple(frame_shape)
        self.ring_capacity = ring_capacity
        self.capture_factory = capture_factory
        self.use_native_ring = use_native_ring
        self.fps_limit = fps_limit
        self.stats = {"captured": 0, "published": 0, "dropped": 0}
        self._cap = None
        self._ring = None
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> bool:
        """Open the camera and start the capture/publish threads.

        Returns False (without raising) if no camera is reachable."""
        factory = self.capture_factory or (lambda: _default_capture(self.device))
        self._cap = factory()
        if self._cap is None or not self._cap.isOpened():
            if self._cap is not None:
                self._cap.release()
            self._cap = None
            return False
        self._ring = self._make_ring()
        self._stop.clear()
        # threads capture their cap/ring as locals and the capture thread
        # owns the cv2 release: stop() must never release a capture that a
        # blocked read() may still be using (cv2 is not thread-safe)
        self._threads = [
            threading.Thread(target=self._capture_loop,
                             args=(self._cap, self._ring), daemon=True,
                             name="camera-capture"),
            threading.Thread(target=self._publish_loop, args=(self._ring,),
                             daemon=True, name="camera-publish"),
        ]
        for t in self._threads:
            t.start()
        return True

    def _make_ring(self):
        if self.use_native_ring:
            try:
                from lanetpu.native.hostops import FrameRing, available

                if available():
                    return FrameRing(self.frame_shape, self.ring_capacity)
            except Exception:  # noqa: BLE001 — native layer is optional
                pass
        return _PyRing(self.ring_capacity)

    def stop(self):
        self._stop.set()
        alive = False
        for t in self._threads:
            t.join(timeout=2.0)
            alive = alive or t.is_alive()
        self._threads = []
        self._cap = None  # released by the capture thread on its way out
        if self._ring is not None:
            self.stats["dropped"] = int(getattr(self._ring, "dropped", 0))
            if not alive:
                # a thread stuck in a hung cv2 read() may still touch the
                # ring: only destroy it once both threads have exited
                # (daemon threads; leaked ring is reclaimed at process exit)
                self._ring.close()
            self._ring = None

    # -- threads -----------------------------------------------------------

    def _capture_loop(self, cap, ring):
        period = 1.0 / self.fps_limit if self.fps_limit else 0.0
        try:
            while not self._stop.is_set():
                t0 = time.perf_counter()
                ok, frame = cap.read()
                if not ok or frame is None:
                    time.sleep(0.01)
                    continue
                frame = np.ascontiguousarray(frame, dtype=np.uint8)
                if frame.shape != self.frame_shape:
                    # keep the ring layout static: center-crop/pad to shape
                    frame = _fit_frame(frame, self.frame_shape)
                ring.push(frame)
                self.stats["captured"] += 1
                if period:
                    dt = time.perf_counter() - t0
                    if dt < period:
                        time.sleep(period - dt)
        finally:
            cap.release()

    def _publish_loop(self, ring):
        while not self._stop.is_set() or len(ring) > 0:
            frame = ring.pop()
            if frame is None:
                time.sleep(0.002)
                continue
            self.channel.publish(frame)
            self.stats["published"] += 1


def _fit_frame(frame: np.ndarray, shape: tuple) -> np.ndarray:
    """Center-crop / zero-pad a frame to the ring's static shape (2-D NV12
    planes or 3-D BGR frames)."""
    out = np.zeros(shape, np.uint8)
    h = min(frame.shape[0], shape[0])
    w = min(frame.shape[1], shape[1])
    fy, fx = (frame.shape[0] - h) // 2, (frame.shape[1] - w) // 2
    oy, ox = (shape[0] - h) // 2, (shape[1] - w) // 2
    if len(shape) == 2 or frame.ndim == 2:
        out[oy:oy + h, ox:ox + w] = frame[fy:fy + h, fx:fx + w]
        return out
    c = min(frame.shape[2], shape[2])
    out[oy:oy + h, ox:ox + w, :c] = frame[fy:fy + h, fx:fx + w, :c]
    return out
