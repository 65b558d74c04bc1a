"""Native host runtime bindings (ctypes over libmvo_runtime.so).

C++ PNG decode + multi-threaded prefetching frame loader (see loader.cpp).
Builds the shared library on first use via ``make``; falls back to a
pure-Python (PIL) implementation when the native build is unavailable so
the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import queue as _queue
from typing import Iterator, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmvo_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _load_native():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
            lib.mvo_decode_png.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int]
            lib.mvo_decode_png.restype = ctypes.c_int
            lib.mvo_loader_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.mvo_loader_open.restype = ctypes.c_void_p
            lib.mvo_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
            lib.mvo_loader_next.restype = ctypes.c_int
            lib.mvo_loader_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = False
        return _lib


def native_available() -> bool:
    return bool(_load_native())


def decode_png(path: str, height: int, width: int) -> np.ndarray:
    """Decode one PNG to float32 grayscale [H, W] via the native decoder
    (PIL fallback)."""
    lib = _load_native()
    if lib:
        out = np.empty((height, width), dtype=np.float32)
        rc = lib.mvo_decode_png(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            height, width)
        if rc == 0:
            return out
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


class FrameLoader:
    """Ordered prefetching loader over a frame path list.

    Native: C++ worker pool decoding ``depth`` frames ahead. Fallback: a
    Python thread with the same bounded-queue semantics.
    """

    def __init__(self, paths: Sequence[str], height: int, width: int,
                 depth: int = 4, n_threads: int = 2):
        self.paths = list(paths)
        self.height = height
        self.width = width
        self._native = None
        self._queue = None
        lib = _load_native()
        if lib:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._keepalive = arr
            self._native = lib.mvo_loader_open(
                arr, len(self.paths), height, width, depth, n_threads)
            self._lib = lib
        else:
            self._queue = _queue.Queue(maxsize=depth)

            def _producer():
                from PIL import Image

                for p in self.paths:
                    img = np.asarray(Image.open(p).convert("L"), dtype=np.float32)
                    self._queue.put(img)
                self._queue.put(None)

            self._thread = threading.Thread(target=_producer, daemon=True)
            self._thread.start()

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._native:
            out = np.empty((self.height, self.width), dtype=np.float32)
            for _ in range(len(self.paths)):
                rc = self._lib.mvo_loader_next(
                    self._native,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
                if rc != 0:
                    raise IOError(f"native decode failed rc={rc}")
                yield out.copy()
        else:
            while True:
                item = self._queue.get()
                if item is None:
                    return
                yield item

    def close(self) -> None:
        if self._native:
            self._lib.mvo_loader_close(self._native)
            self._native = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
