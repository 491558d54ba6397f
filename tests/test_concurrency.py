"""Concurrency stress tests.

The reference's concurrency safety is hand-rolled locks with a known benign
TOCTOU race (SURVEY.md §5 'race detection: none'). These tests hammer the
framework's concurrency primitives from multiple threads to catch
lost-update/ordering bugs.
"""

import threading
import time

import numpy as np
import pytest

from lanetpu.pipeline.channels import Bus, Channel


def test_channel_concurrent_publishers_consistent_seq():
    ch = Channel("/x")
    n_threads, n_msgs = 8, 200

    def publisher(tid):
        for i in range(n_msgs):
            ch.publish((tid, i))

    threads = [threading.Thread(target=publisher, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert ch.seq == n_threads * n_msgs  # no lost updates
    assert ch.latest() is not None


def test_channel_queue_sees_every_message_single_producer():
    ch = Channel("/x")
    q = ch.make_queue(maxlen=10_000)
    for i in range(1000):
        ch.publish(i)
    assert list(q) == list(range(1000))


def test_channel_callback_exceptions_do_not_break_channel():
    ch = Channel("/x")
    hits = []

    def bad(msg):
        raise RuntimeError("subscriber bug")

    ch.subscribe(hits.append)
    ch.subscribe(bad)
    with pytest.raises(RuntimeError):
        ch.publish(1)
    # channel state stays consistent despite the raising subscriber
    assert ch.latest() == 1 and ch.seq == 1 and hits == [1]


def test_wait_for_message_many_waiters():
    ch = Channel("/x")
    results = []

    def waiter():
        results.append(ch.wait_for_message(timeout=5.0))

    threads = [threading.Thread(target=waiter) for _ in range(6)]
    for t in threads:
        t.start()
    time.sleep(0.1)
    ch.publish("go")
    for t in threads:
        t.join()
    assert results == ["go"] * 6


def test_bus_concurrent_channel_creation_is_singleton():
    bus = Bus()
    got = []

    def getter():
        got.append(bus.channel("/same"))

    threads = [threading.Thread(target=getter) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(c is got[0] for c in got)


def test_streaming_node_drops_frames_under_pressure():
    """ContinuousServoNode's trylock must skip frames rather than queue them
    (the reference's reentrancy-guard intent, race-free here)."""
    from lanetpu.pipeline.nodes import ContinuousServoNode

    processed = []

    class SlowEngine:
        classes = ("a",)

        def detect(self, frame, map_to_original=False):
            processed.append(1)
            time.sleep(0.05)
            return ((None, None, None), 0.05)

    bus = Bus()
    ContinuousServoNode(SlowEngine(), aim_type="fruit", bus=bus)
    bus.publish("/mag_pose_2d", 0.0)
    frame = np.zeros((10, 10, 3), np.uint8)

    def spam():
        for _ in range(20):
            bus.publish("/image_rect_color", frame)

    threads = [threading.Thread(target=spam) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # far fewer processed than published: frames were skipped, not queued
    assert 1 <= len(processed) < 80
