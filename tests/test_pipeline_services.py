"""Channel bus, streaming runner, and service endpoint tests.

These are the automated versions of the reference's manual service
smoke-tests (src/test_yolo.py, src/test_code/test.py — SURVEY.md §4), using
a fake detection engine so no model weights are needed.
"""

import threading
import time

import numpy as np
import pytest

from lanetpu.pipeline.channels import Bus, Channel
from lanetpu.pipeline.service import (
    DetectTargetRequest,
    DetectTargetService,
    MultiFrameDetectService,
)
from lanetpu.pipeline.streaming import StreamingRunner


# ---------------------------------------------------------------------------
# Channels
# ---------------------------------------------------------------------------


def test_channel_latest_and_seq():
    ch = Channel("/x")
    assert ch.latest() is None
    ch.publish(1)
    ch.publish(2)
    assert ch.latest() == 2 and ch.seq == 2


def test_channel_callback():
    ch = Channel("/x")
    got = []
    ch.subscribe(got.append)
    ch.publish("a")
    assert got == ["a"]


def test_channel_queue_drops_oldest():
    ch = Channel("/x", queue_size=2)
    q = ch.make_queue()
    for i in range(5):
        ch.publish(i)
    assert list(q) == [3, 4]


def test_channel_wait_for_message():
    ch = Channel("/x")

    def later():
        time.sleep(0.05)
        ch.publish(42)

    t = threading.Thread(target=later)
    t.start()
    assert ch.wait_for_message(timeout=2.0) == 42
    t.join()


def test_channel_wait_timeout():
    ch = Channel("/x")
    assert ch.wait_for_message(timeout=0.05) is None


def test_bus_registry():
    bus = Bus()
    a = bus.channel("/mask")
    b = bus.channel("/mask")
    assert a is b
    bus.publish("/cmd_vel", 7)
    assert bus.channel("/cmd_vel").latest() == 7
    assert bus.topics() == ["/cmd_vel", "/mask"]


# ---------------------------------------------------------------------------
# Streaming runner
# ---------------------------------------------------------------------------


def test_streaming_runner_processes_all_frames():
    import jax

    def device_fn(batch):
        return batch.astype("float32") * 2.0

    runner = StreamingRunner(jax.jit(device_fn), batch_size=4)
    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(10)]
    outs = []
    stats = runner.run(iter(frames), sink=outs.append)
    assert stats["frames"] == 10
    assert stats["batches"] == 3  # 4 + 4 + 2
    collected = np.concatenate(outs)
    np.testing.assert_allclose(collected[:, 0, 0, 0],
                               np.arange(10, dtype=np.float32) * 2)


# ---------------------------------------------------------------------------
# Fake detection engine for services
# ---------------------------------------------------------------------------


class FakeEngine:
    """Deterministic engine: 'sees' class 1 ('cake') centered with score
    0.9 whenever the frame's first pixel is bright."""

    classes = ("banana", "cake", "cola", "apple", "lajiao", "milk",
               "potato", "tomato", "greenlight", "redlight", "watermelon")

    def detect_batch(self, frames, map_to_original=True):
        out = []
        for f in frames:
            if f[0, 0, 0] > 100:
                boxes = np.array([[300.0, 200.0, 340.0, 280.0]], np.float32)
                out.append((boxes, np.array([1]), np.array([0.9], np.float32)))
            else:
                out.append((None, None, None))
        return out

    def detect(self, frame, map_to_original=True):
        return self.detect_batch(frame[None], map_to_original)[0], 0.001


def test_multi_frame_detect_service():
    bus = Bus()
    svc = MultiFrameDetectService(FakeEngine(), bus=bus,
                                  frame_interval_s=0.0)
    # publish a bright frame (detectable)
    bus.publish("/usb_cam/image_raw", np.full((480, 640, 3), 200, np.uint8))
    result = svc()
    assert result["success"]
    assert result["results"] == [{"type": "cake", "confidence": "0.900"}]


def test_multi_frame_detect_service_no_frames():
    svc = MultiFrameDetectService(FakeEngine(), frame_interval_s=0.0)
    result = svc()
    assert not result["success"]


def test_multi_frame_detect_below_threshold():
    class WeakEngine(FakeEngine):
        def detect_batch(self, frames, map_to_original=True):
            return [(np.array([[0, 0, 10, 10.0]]), np.array([2]),
                     np.array([0.4], np.float32)) for _ in frames]

    bus = Bus()
    svc = MultiFrameDetectService(WeakEngine(), bus=bus, frame_interval_s=0.0)
    bus.publish("/usb_cam/image_raw", np.full((480, 640, 3), 200, np.uint8))
    result = svc()
    assert result["success"] and result["results"] == []  # 0.4 < 0.7 gate


# ---------------------------------------------------------------------------
# DetectTarget service (find/track/park mission)
# ---------------------------------------------------------------------------


def _run_mission_bus():
    bus = Bus()
    bus.publish("/image_rect_color", np.full((480, 640, 3), 200, np.uint8))
    bus.publish("/scan", np.full(100, 0.2))      # at target distance
    bus.publish("/mag_pose_2d", 0.0)
    return bus


def test_detect_target_service_success():
    bus = _run_mission_bus()
    svc = DetectTargetService(FakeEngine(), bus=bus, rate_hz=200.0,
                              timeout_s=5.0)
    resp = svc(DetectTargetRequest(aim_type="dessert", if_parking=True))
    assert resp.if_success
    assert resp.obj_name == "cake"
    assert resp.final_distance == pytest.approx(0.2)


def test_detect_target_service_invalid_type():
    svc = DetectTargetService(FakeEngine(), bus=Bus(), timeout_s=1.0)
    resp = svc(DetectTargetRequest(aim_type="nonsense"))
    assert not resp.if_success and "INVALID_TYPE" in resp.message


def test_detect_target_service_busy_rejection():
    bus = Bus()  # no frames: mission will spin in finding
    bus.publish("/mag_pose_2d", 0.0)
    svc = DetectTargetService(FakeEngine(), bus=bus, rate_hz=100.0,
                              timeout_s=1.0)
    results = []

    def call():
        results.append(svc(DetectTargetRequest(aim_type="fruit")))

    t1 = threading.Thread(target=call)
    t1.start()
    time.sleep(0.1)
    resp2 = svc(DetectTargetRequest(aim_type="fruit"))
    t1.join()
    assert resp2.message == "BUSY"  # reference srv.py:113-115 semantics


def test_multiframe_service_accepts_duplicates_on_stalled_camera():
    """A stalled camera must not shrink the batch: the service waits
    briefly for fresh frames, then accepts duplicates — exactly
    frames_to_capture frames whenever the camera produced at least one
    (reference src/yolo_detector.py:263-272 waits and accepts duplicates)."""
    bus = Bus()
    svc = MultiFrameDetectService(FakeEngine(), bus=bus,
                                  frame_interval_s=0.0, stale_retry_s=0.01)
    bus.channel("/usb_cam/image_raw").publish(
        np.full((480, 640, 3), 200, np.uint8))  # ONE frame, then stall
    res = svc()
    assert res["success"]
    assert res["frames_processed"] == 8
    assert res["results"][0]["type"] == "cake"


def test_multiframe_service_prefers_fresh_frames():
    bus = Bus()
    svc = MultiFrameDetectService(FakeEngine(), bus=bus,
                                  frame_interval_s=0.0, stale_retry_s=0.5)
    ch = bus.channel("/usb_cam/image_raw")

    def feed():
        for _ in range(8):
            ch.publish(np.full((480, 640, 3), 200, np.uint8))
            time.sleep(0.01)

    t = threading.Thread(target=feed)
    t.start()
    res = svc()
    t.join()
    assert res["frames_processed"] == 8


# ---------------------------------------------------------------------------
# Camera capture source
# ---------------------------------------------------------------------------


class FakeCapture:
    def __init__(self, n_frames=20, shape=(480, 640, 3)):
        self.n = n_frames
        self.i = 0
        self.shape = shape

    def isOpened(self):
        return True

    def read(self):
        if self.i < self.n:
            self.i += 1
            return True, np.full(self.shape, self.i % 256, np.uint8)
        time.sleep(0.002)
        return False, None

    def release(self):
        pass


def test_camera_source_publishes_frames():
    from lanetpu.pipeline.camera import CameraSource

    bus = Bus()
    got = []
    bus.channel("/usb_cam/image_raw").subscribe(got.append)
    cam = CameraSource(bus=bus, capture_factory=lambda: FakeCapture(12))
    assert cam.start()
    deadline = time.time() + 5.0
    while time.time() < deadline and cam.stats["published"] < 5:
        time.sleep(0.01)
    cam.stop()
    assert cam.stats["captured"] >= 5
    assert cam.stats["published"] >= 5
    assert len(got) >= 5
    assert got[0].shape == (480, 640, 3) and got[0].dtype == np.uint8


def test_camera_source_graceful_without_hardware():
    from lanetpu.pipeline.camera import CameraSource

    cam = CameraSource(capture_factory=lambda: None)
    assert cam.start() is False  # no camera: no exception, no threads
    cam.stop()


def test_camera_source_feeds_multiframe_service():
    """Camera -> ring -> channel -> 8-frame detect service, end to end."""
    from lanetpu.pipeline.camera import CameraSource

    bus = Bus()
    cam = CameraSource(bus=bus,
                       capture_factory=lambda: FakeCapture(500, (480, 640, 3)))
    svc = MultiFrameDetectService(FakeEngine(), bus=bus,
                                  frame_interval_s=0.005, stale_retry_s=0.05)
    assert cam.start()
    try:
        res = svc()
    finally:
        cam.stop()
    assert res["success"] and res["frames_processed"] == 8


def test_camera_source_odd_frame_shape_fits_ring():
    from lanetpu.pipeline.camera import CameraSource

    bus = Bus()
    got = []
    bus.channel("/usb_cam/image_raw").subscribe(got.append)
    cam = CameraSource(bus=bus, frame_shape=(480, 640, 3),
                       capture_factory=lambda: FakeCapture(8, (360, 480, 3)))
    assert cam.start()
    deadline = time.time() + 5.0
    while time.time() < deadline and not got:
        time.sleep(0.01)
    cam.stop()
    assert got and got[0].shape == (480, 640, 3)


def test_streaming_runner_staging_rotation_no_aliasing():
    """K-deep staging with rotating host buffers: every output must match
    its own input (catches buffer-reuse races/aliasing), in order."""
    import jax

    fn = jax.jit(lambda x: x.astype(np.int32) + 1)
    runner = StreamingRunner(fn, batch_size=4, inflight=3)
    frames = [np.full((6, 6), i, np.uint8) for i in range(40)]
    got = []
    stats = runner.run(iter(frames), sink=lambda b: got.append(np.asarray(b)))
    flat = np.concatenate([g.reshape(-1, 36) for g in got])
    assert stats["frames"] == 40 and stats["batches"] == 10
    assert stats["h2d_bytes"] == 40 * 36
    assert stats["h2d_gbps"] > 0
    np.testing.assert_array_equal(flat[:, 0], np.arange(40) + 1)


def test_streaming_runner_partial_last_batch():
    import jax

    fn = jax.jit(lambda x: x)
    runner = StreamingRunner(fn, batch_size=8, inflight=2)
    stats = runner.run(iter(np.zeros((11, 4, 4), np.uint8)))
    assert stats["frames"] == 11 and stats["batches"] == 2
