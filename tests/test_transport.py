"""Cross-process channel transport (TCPROS analogue) tests.

Server and client run in one test process but communicate strictly over
the TCP socket — the same path a separate process would use.
"""

import time

import numpy as np
import pytest

from lanetpu.pipeline.channels import Bus
from lanetpu.pipeline.transport import BusServer, RemoteBus


@pytest.fixture()
def server():
    srv = BusServer(Bus()).start()
    yield srv
    srv.stop()


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_remote_publish_reaches_server_bus(server):
    rb = RemoteBus(port=server.port)
    frame = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    rb.publish("/image_rect_color", frame)
    ch = server.bus.channel("/image_rect_color")
    assert _wait(lambda: ch.latest() is not None)
    np.testing.assert_array_equal(ch.latest(), frame)
    rb.publish("/cmd_vel", {"linear": 0.1, "angular": -0.2})
    cv = server.bus.channel("/cmd_vel")
    assert _wait(lambda: cv.latest() is not None)
    assert cv.latest() == {"linear": 0.1, "angular": -0.2}
    rb.close()


def test_remote_subscribe_receives_server_publishes(server):
    rb = RemoteBus(port=server.port)
    got = []
    rb.subscribe("/mask", got.append)
    time.sleep(0.05)  # let the sub register server-side
    mask = (np.eye(8) * 255).astype(np.uint8)
    server.bus.channel("/mask").publish(mask)
    assert _wait(lambda: len(got) == 1)
    np.testing.assert_array_equal(got[0], mask)
    assert rb.channel("/mask").latest() is not None
    rb.close()


def test_two_clients_pub_sub_roundtrip(server):
    """Camera process -> bus -> perception process, both remote."""
    cam = RemoteBus(port=server.port)
    percep = RemoteBus(port=server.port)
    got = []
    percep.subscribe("/usb_cam/image_raw", got.append)
    time.sleep(0.05)
    for i in range(3):
        cam.publish("/usb_cam/image_raw",
                    np.full((4, 4, 3), i, np.uint8))
    assert _wait(lambda: len(got) >= 3)
    assert got[-1][0, 0, 0] in (0, 1, 2)
    cam.close()
    percep.close()


def test_float_and_empty_shapes(server):
    rb = RemoteBus(port=server.port)
    rb.publish("/scan", np.linspace(0, 1, 720).astype(np.float32))
    ch = server.bus.channel("/scan")
    assert _wait(lambda: ch.latest() is not None)
    assert ch.latest().dtype == np.float32 and ch.latest().shape == (720,)
    rb.close()


def test_server_survives_client_disconnect(server):
    rb = RemoteBus(port=server.port)
    rb.subscribe("/mask")
    time.sleep(0.05)
    rb.close()
    time.sleep(0.05)
    # publishing after the subscriber vanished must not raise
    server.bus.channel("/mask").publish(np.zeros((2, 2), np.uint8))
    rb2 = RemoteBus(port=server.port)
    rb2.publish("/mask", np.ones((2, 2), np.uint8))
    assert _wait(lambda: server.bus.channel("/mask").seq >= 2)
    rb2.close()


def test_disconnect_removes_subscriptions(server):
    """A disconnected client's forward callbacks must be unsubscribed —
    crash-looping subscribers must not accumulate dead-socket callbacks
    on hot topics (and the client-thread list must not grow forever)."""
    ch = server.bus.channel("/hot")
    for _ in range(3):
        rb = RemoteBus(port=server.port)
        rb.subscribe("/hot")
        assert _wait(lambda: len(ch._callbacks) >= 1)
        rb.close()
        assert _wait(lambda: len(ch._callbacks) == 0), ch._callbacks
    server._threads_prune()
    assert sum(t.is_alive() for t in server._threads) <= 1  # accept loop
