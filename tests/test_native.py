"""Native host-ops library tests (built on demand; skipped if g++ absent)."""

import threading

import numpy as np
import pytest

from lanetpu.native import hostops

if not hostops.available():
    pytest.skip("native hostops library unavailable", allow_module_level=True)

from lanetpu.native import (
    FrameRing,
    nms_native,
    resize_bilinear_native,
    warp_perspective_native,
)


def test_native_resize_matches_jnp(rng):
    from lanetpu.ops.resize import resize_bilinear

    img = rng.integers(0, 256, size=(97, 143, 3), dtype=np.uint8)
    a = resize_bilinear_native(img, (224, 224))
    b = np.asarray(resize_bilinear(img, (224, 224)))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_native_warp_matches_jnp(rng):
    from lanetpu.ops.warp import get_perspective_transform, warp_perspective

    img = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    src = np.float32([[10, 100], [150, 110], [50, 40], [120, 45]])
    dst = np.float32([[30, 110], [140, 110], [30, 20], [140, 20]])
    m = get_perspective_transform(src, dst)
    a = warp_perspective_native(img, m, (160, 120))
    b = np.asarray(warp_perspective(img, m, (160, 120)))
    diff = np.abs(a.astype(int) - b.astype(int))
    assert np.median(diff) <= 1
    assert (diff <= 2).mean() > 0.99


def test_native_nms_matches_numpy(rng):
    from lanetpu.ops.nms import nms

    boxes = rng.uniform(0, 100, size=(50, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 30, (50, 2))],
                           axis=1).astype(np.float32)
    scores = rng.random(50).astype(np.float32)
    a = nms_native(boxes, scores, 0.45)
    b = nms(boxes, scores, 0.45)
    np.testing.assert_array_equal(a, b)


def test_frame_ring_fifo():
    ring = FrameRing((4, 4, 3), capacity=4)
    for i in range(3):
        dropped = ring.push(np.full((4, 4, 3), i, np.uint8))
        assert not dropped
    assert len(ring) == 3
    assert ring.pop()[0, 0, 0] == 0
    assert ring.pop()[0, 0, 0] == 1
    ring.close()


def test_frame_ring_overwrites_oldest():
    ring = FrameRing((2, 2, 1), capacity=2)
    ring.push(np.full((2, 2, 1), 1, np.uint8))
    ring.push(np.full((2, 2, 1), 2, np.uint8))
    dropped = ring.push(np.full((2, 2, 1), 3, np.uint8))  # full -> drop oldest
    assert dropped
    assert ring.dropped == 1
    assert ring.pop()[0, 0, 0] == 2  # frame 1 was dropped
    assert ring.pop()[0, 0, 0] == 3
    assert ring.pop() is None
    ring.close()


def test_frame_ring_threaded():
    ring = FrameRing((8, 8, 3), capacity=16)
    n = 200
    received = []

    def producer():
        for i in range(n):
            ring.push(np.full((8, 8, 3), i % 251, np.uint8))

    done = threading.Event()

    def consumer():
        while not (done.is_set() and len(ring) == 0):
            f = ring.pop()
            if f is not None:
                received.append(int(f[0, 0, 0]))

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t2.start(); t1.start(); t1.join(); done.set(); t2.join()
    assert len(received) + ring.dropped >= n - 1
    # frames arrive in push order (n=200 < 251: strictly increasing)
    assert all(received[i] < received[i + 1]
               for i in range(len(received) - 1))
    ring.close()
