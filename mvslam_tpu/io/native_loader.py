"""ctypes bindings for the native (C++/libjpeg) data loader.

Native equivalent of the reference's C++ image layer: JPEG decode in
``native/loader.cpp`` plus a threaded prefetch queue so frame t+1 decodes
while frame t computes on device. Builds the shared library on demand
(g++, cached next to the source); falls back cleanly when the toolchain or
libjpeg is unavailable — callers use :func:`available` to pick PIL instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "loader.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libmvslam_loader.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _get_lib() -> ctypes.CDLL | None:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.mvslam_decode_jpeg_gray.restype = ctypes.c_int
        lib.mvslam_decode_jpeg_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mvslam_loader_create.restype = ctypes.c_void_p
        lib.mvslam_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mvslam_loader_next.restype = ctypes.c_int
        lib.mvslam_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mvslam_loader_destroy.restype = None
        lib.mvslam_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


_MAX_PIXELS = 64 * 1024 * 1024


def decode_jpeg_gray(path: str) -> np.ndarray:
    """(H, W) float32 grayscale in [0, 1] via the native decoder."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = np.empty(_MAX_PIXELS, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.mvslam_decode_jpeg_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _MAX_PIXELS, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native jpeg decode failed ({rc}): {path}")
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Iterate decoded frames with background decode-ahead.

    with PrefetchLoader(paths, queue_depth=4, threads=2) as it:
        for index, image in it: ...
    """

    def __init__(self, paths: Sequence[str], queue_depth: int = 4,
                 threads: int = 2) -> None:
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.mvslam_loader_create(
            arr, len(self._paths), queue_depth, threads
        )
        self._buf = np.empty(_MAX_PIXELS, np.float32)

    def __enter__(self) -> "PrefetchLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if self._handle:
            self._lib.mvslam_loader_destroy(self._handle)
            self._handle = None

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        h = ctypes.c_int()
        w = ctypes.c_int()
        idx = ctypes.c_int()
        while True:
            rc = self._lib.mvslam_loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                _MAX_PIXELS, ctypes.byref(h), ctypes.byref(w),
                ctypes.byref(idx),
            )
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"decode failed ({rc}) for frame {idx.value}")
            yield idx.value, (
                self._buf[: h.value * w.value]
                .reshape(h.value, w.value)
                .copy()
            )
