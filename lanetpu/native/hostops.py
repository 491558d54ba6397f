"""ctypes bindings for the native host-ops library (libltpuhost.so).

Builds on demand (`build()`, plain `make`), falls back gracefully: every
entry point raises a clear error if the library is absent, and callers in
the framework use the numpy/jnp implementations unless the native path is
explicitly requested. See src/hostops.cc for role parity notes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libltpuhost.so")
_lib = None
_lock = threading.Lock()


def build(quiet: bool = True) -> bool:
    """Compile the native library with make. Returns True on success."""
    try:
        subprocess.run(["make", "-C", _DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if not build():
                raise RuntimeError(
                    "native hostops library not built; run "
                    "`make -C lanetpu/native` (needs g++)")
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ltpu_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int]
        lib.ltpu_warp_perspective_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), u8p, ctypes.c_int, ctypes.c_int]
        lib.ltpu_nms.restype = ctypes.c_int
        lib.ltpu_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.ltpu_ring_create.restype = ctypes.c_void_p
        lib.ltpu_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.ltpu_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ltpu_ring_push.restype = ctypes.c_int
        lib.ltpu_ring_push.argtypes = [ctypes.c_void_p, u8p]
        lib.ltpu_ring_pop.restype = ctypes.c_int
        lib.ltpu_ring_pop.argtypes = [ctypes.c_void_p, u8p]
        lib.ltpu_ring_size.restype = ctypes.c_uint64
        lib.ltpu_ring_size.argtypes = [ctypes.c_void_p]
        lib.ltpu_ring_dropped.restype = ctypes.c_uint64
        lib.ltpu_ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_native(img: np.ndarray, out_hw: tuple) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    oh, ow = out_hw
    out = np.empty((oh, ow, c) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.ltpu_resize_bilinear_u8(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def warp_perspective_native(img: np.ndarray, matrix: np.ndarray,
                            out_wh: tuple) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    ow, oh = out_wh
    minv = np.ascontiguousarray(np.linalg.inv(np.asarray(matrix, np.float64)))
    out = np.empty((oh, ow, c) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.ltpu_warp_perspective_u8(
        _u8p(img), h, w, c,
        minv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _u8p(out), oh, ow)
    return out


def nms_native(boxes: np.ndarray, scores: np.ndarray,
               iou_thresh: float = 0.45) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = len(boxes)
    keep = np.empty(n, dtype=np.int32)
    kept = lib.ltpu_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_thresh, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n)
    return keep[:kept].astype(np.int64)


class FrameRing:
    """Lock-free SPSC frame ring with latest-frame overwrite semantics
    (the native replacement for the reference's locked latest-frame cache,
    src/yolo_detector.py:240-249)."""

    def __init__(self, frame_shape: tuple, capacity: int = 8):
        self._lib = _load()
        self.frame_shape = tuple(frame_shape)
        self.frame_bytes = int(np.prod(frame_shape))
        self.capacity = capacity
        self._handle = ctypes.c_void_p(
            self._lib.ltpu_ring_create(self.frame_bytes, capacity))

    def push(self, frame: np.ndarray) -> bool:
        """Returns True if an old frame was dropped to make room."""
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.shape == self.frame_shape
        return bool(self._lib.ltpu_ring_push(self._handle, _u8p(frame)))

    def pop(self):
        out = np.empty(self.frame_shape, np.uint8)
        if self._lib.ltpu_ring_pop(self._handle, _u8p(out)):
            return out
        return None

    def __len__(self):
        return int(self._lib.ltpu_ring_size(self._handle))

    @property
    def dropped(self) -> int:
        return int(self._lib.ltpu_ring_dropped(self._handle))

    def close(self):
        if self._handle:
            self._lib.ltpu_ring_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
