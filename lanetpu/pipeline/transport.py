"""Cross-process channel transport: the TCPROS analogue.

The reference's node graph is multi-process over TCPROS (topic graph,
reference README.md:3801-3832). lanetpu's channels are in-process by
design (one fused device program per pipeline wants one process), but
multi-process deployments — a camera daemon, a rosbridge-style shim, a
viewer — still need the topic bus across process boundaries. This module
bridges a `pipeline.channels.Bus` over TCP with the same named-topic
vocabulary and latest-frame (queue_size=1) semantics:

  server process:  BusServer(bus).start()          # exposes the bus
  client process:  rb = RemoteBus(addr)            # connects
                   rb.subscribe("/mask", cb)        # remote -> local
                   rb.publish("/image_rect_color", frame)  # local -> remote

Wire format (length-prefixed frames over a single socket per client,
pure stdlib — no pickle, so a hostile peer can't execute code):
  frame  := u32 payload_len | u8 kind | payload
  kind J := UTF-8 JSON (control + plain data messages)
  kind N := u16 topic_len | topic | u8 dtype_len | dtype | u8 ndim |
            ndim * u32 dims | raw array bytes (C-order)
Control messages (kind J): {"op": "sub", "topic": ...},
{"op": "pub", "topic": ..., "data": ...} for JSON-representable payloads.

Like TCPROS, the transport assumes a trusted robot-local network.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Callable

import numpy as np

from lanetpu.pipeline.channels import Bus

_MAX_FRAME = 256 * 1024 * 1024


def _send_frame(sock: socket.socket, kind: bytes, payload: bytes,
                lock: threading.Lock) -> None:
    with lock:
        sock.sendall(struct.pack("<I", len(payload) + 1) + kind + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _recv_frame(sock: socket.socket):
    head = _recv_exact(sock, 4)
    if head is None:
        return None, None
    (length,) = struct.unpack("<I", head)
    if not 1 <= length <= _MAX_FRAME:
        return None, None
    body = _recv_exact(sock, length)
    if body is None:
        return None, None
    return body[:1], body[1:]


def _encode_ndarray(topic: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    t = topic.encode()
    d = str(arr.dtype).encode()
    out = [struct.pack("<H", len(t)), t, struct.pack("<B", len(d)), d,
           struct.pack("<B", arr.ndim)]
    out += [struct.pack("<I", s) for s in arr.shape]
    out.append(arr.tobytes())
    return b"".join(out)


def _decode_ndarray(payload: bytes):
    (tlen,) = struct.unpack_from("<H", payload, 0)
    off = 2
    topic = payload[off:off + tlen].decode()
    off += tlen
    (dlen,) = struct.unpack_from("<B", payload, off)
    off += 1
    dtype = np.dtype(payload[off:off + dlen].decode())
    off += dlen
    (ndim,) = struct.unpack_from("<B", payload, off)
    off += 1
    shape = struct.unpack_from(f"<{ndim}I", payload, off) if ndim else ()
    off += 4 * ndim
    arr = np.frombuffer(payload[off:], dtype=dtype).reshape(shape)
    return topic, arr


def _publish_obj(sock, lock, topic: str, msg) -> None:
    if isinstance(msg, np.ndarray):
        _send_frame(sock, b"N", _encode_ndarray(topic, msg), lock)
    else:
        _send_frame(sock, b"J", json.dumps(
            {"op": "pub", "topic": topic, "data": msg}).encode(), lock)


class BusServer:
    """Expose a local Bus to remote processes."""

    def __init__(self, bus: Bus | None = None, host: str = "127.0.0.1",
                 port: int = 0):
        self.bus = bus or Bus()
        self.host = host
        self.port = port
        self._srv: socket.socket | None = None
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._threads_lock = threading.Lock()

    def start(self) -> "BusServer":
        self._srv = socket.create_server((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        t = threading.Thread(target=self._accept_loop, daemon=True,
                             name="bus-server")
        t.start()
        self._threads.append(t)
        return self

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            t = threading.Thread(target=self._client_loop, args=(conn,),
                                 daemon=True)
            t.start()
            with self._threads_lock:
                self._threads.append(t)

    def _client_loop(self, conn: socket.socket):
        send_lock = threading.Lock()
        subscriptions: dict[str, Callable] = {}
        try:
            while not self._stop.is_set():
                kind, payload = _recv_frame(conn)
                if kind is None:
                    return
                if kind == b"N":
                    topic, arr = _decode_ndarray(payload)
                    self.bus.channel(topic).publish(arr.copy())
                elif kind == b"J":
                    msg = json.loads(payload.decode())
                    op = msg.get("op")
                    if op == "sub" and msg["topic"] not in subscriptions:
                        topic = msg["topic"]
                        cb = lambda m, t=topic: self._forward(  # noqa: E731
                            conn, send_lock, t, m)
                        subscriptions[topic] = cb
                        self.bus.channel(topic).subscribe(cb)
                    elif op == "pub":
                        self.bus.channel(msg["topic"]).publish(msg["data"])
        except (OSError, ValueError):
            return
        finally:
            # tear down this client's forwards: a crash-looping subscriber
            # must not leave dead-socket callbacks on hot topics
            for topic, cb in subscriptions.items():
                self.bus.channel(topic).unsubscribe(cb)
            conn.close()
            self._threads_prune()

    def _forward(self, conn, lock, topic, msg):
        try:
            _publish_obj(conn, lock, topic, msg)
        except OSError:
            pass  # client gone; its reader loop will clean up

    def _threads_prune(self):
        """Drop finished client threads so long-lived servers with
        reconnecting clients don't grow the thread list unboundedly."""
        with self._threads_lock:
            self._threads = [t for t in self._threads if t.is_alive()]

    def stop(self):
        self._stop.set()
        if self._srv is not None:
            self._srv.close()
        with self._threads_lock:
            threads = list(self._threads)
        for t in threads:
            t.join(timeout=1.0)


class RemoteBus:
    """Client-side mirror of a remote BusServer.

    subscribe(topic, cb): messages published on the remote bus arrive at cb
    (and on the local mirror Bus, so `.channel(topic).latest()` works too).
    publish(topic, msg): sends to the remote bus.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 bus: Bus | None = None):
        self.bus = bus or Bus()
        self._sock = socket.create_connection((host, port), timeout=10.0)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._reader = threading.Thread(target=self._read_loop, daemon=True,
                                        name="remote-bus-reader")
        self._reader.start()

    def subscribe(self, topic: str, callback: Callable | None = None):
        if callback is not None:
            self.bus.channel(topic).subscribe(callback)
        _send_frame(self._sock, b"J",
                    json.dumps({"op": "sub", "topic": topic}).encode(),
                    self._lock)

    def publish(self, topic: str, msg) -> None:
        _publish_obj(self._sock, self._lock, topic, msg)

    def channel(self, topic: str):
        return self.bus.channel(topic)

    def _read_loop(self):
        try:
            while not self._stop.is_set():
                kind, payload = _recv_frame(self._sock)
                if kind is None:
                    return
                if kind == b"N":
                    topic, arr = _decode_ndarray(payload)
                    self.bus.channel(topic).publish(arr.copy())
                elif kind == b"J":
                    msg = json.loads(payload.decode())
                    if msg.get("op") == "pub":
                        self.bus.channel(msg["topic"]).publish(msg["data"])
        except (OSError, ValueError):
            return

    def close(self):
        self._stop.set()
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()
        self._reader.join(timeout=1.0)
