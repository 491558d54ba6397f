"""Dependency-free TensorBoard scalar export.

The reference documents optional TensorBoard scalar logging in its training
loop (reference README.md:2304-2320: per-epoch loss/dice curves). This
environment ships neither tensorflow nor tensorboard, so the event-file
format is encoded directly: a TFRecord stream (length + masked-CRC32C
framing) of hand-encoded `Event` protobufs carrying
`Summary.Value{tag, simple_value}` messages — exactly the bytes
`tf.summary.scalar` produces, readable by any stock TensorBoard.

`read_scalars` is the matching decoder (used by tests to round-trip
verify, and handy for quick scripting without TensorBoard).
"""

from __future__ import annotations

import os
import socket
import struct
import time

# CRC32C (Castagnoli), reflected polynomial — the TFRecord checksum.
_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_POLY if _c & 1 else 0)
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = _crc32c(data)
    return ((((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (header + struct.pack("<I", _masked_crc(header))
            + data + struct.pack("<I", _masked_crc(data)))


def _encode_event(wall_time: float, step: int, file_version: str = "",
                  scalars: dict | None = None) -> bytes:
    ev = bytearray()
    ev += b"\x09" + struct.pack("<d", wall_time)     # Event.wall_time (1)
    ev += b"\x10" + _varint(step)                    # Event.step (2)
    if file_version:
        fv = file_version.encode()
        ev += b"\x1a" + _varint(len(fv)) + fv        # Event.file_version (3)
    if scalars:
        summary = bytearray()
        for tag, value in scalars.items():
            t = tag.encode()
            val = (b"\x0a" + _varint(len(t)) + t     # Value.tag (1)
                   + b"\x15" + struct.pack("<f", float(value)))  # (2) float
            summary += b"\x0a" + _varint(len(val)) + val  # Summary.value (1)
        ev += b"\x2a" + _varint(len(summary)) + bytes(summary)  # Event.summary
    return bytes(ev)


class TBWriter:
    """Minimal SummaryWriter: `add_scalar(tag, value, step)` into a standard
    `events.out.tfevents.*` file under `logdir`."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}.{os.getpid()}")
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._f.write(_record(_encode_event(time.time(), 0,
                                            file_version="brain.Event:2")))

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(_record(_encode_event(time.time(), step,
                                            scalars={tag: value})))

    def add_scalars(self, scalars: dict, step: int):
        """One event carrying several tags (a whole epoch's metrics)."""
        self._f.write(_record(_encode_event(time.time(), step,
                                            scalars=scalars)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.flush()
        self._f.close()


# ---------------------------------------------------------------------------
# Decoder (round-trip verification / scripting)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int):
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _walk(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        elif wire == 2:
            n, i = _read_varint(buf, i)
            v = buf[i:i + n]
            i += n
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # groups unused in Event
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def read_scalars(path: str) -> list:
    """Event file -> [(step, tag, value)], verifying record CRCs."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (n,) = struct.unpack("<Q", data[i:i + 8])
        (hcrc,) = struct.unpack("<I", data[i + 8:i + 12])
        assert hcrc == _masked_crc(data[i:i + 8]), "header CRC mismatch"
        rec = data[i + 12:i + 12 + n]
        (dcrc,) = struct.unpack("<I", data[i + 12 + n:i + 16 + n])
        assert dcrc == _masked_crc(rec), "data CRC mismatch"
        i += 16 + n
        step, scalars = 0, []
        for field, wire, v in _walk(rec):
            if field == 2 and wire == 0:
                step = v
            elif field == 5 and wire == 2:  # summary
                for f2, w2, val in _walk(v):
                    if f2 == 1 and w2 == 2:  # Summary.value
                        tag, num = None, None
                        for f3, w3, v3 in _walk(val):
                            if f3 == 1 and w3 == 2:
                                tag = v3.decode()
                            elif f3 == 2 and w3 == 5:
                                (num,) = struct.unpack("<f", v3)
                        if tag is not None and num is not None:
                            scalars.append((tag, num))
        for tag, num in scalars:
            out.append((step, tag, num))
    return out
