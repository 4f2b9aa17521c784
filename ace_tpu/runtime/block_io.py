"""Async block reader over the native io_uring loader.

TPU-native analog of the reference runtime's block IO subsystem
(rtlib common/src/block_io_linux.c:10-22 — io_uring reads that stage
pre-encoded plaintext blobs ahead of the generated program's op
stream). Here the compiled graph's plaintext fetch order is known at
compile time, so `PtManager` can submit reads for upcoming entries and
only block when the op actually needs the bytes.

The native engine is `ace_tpu/native/block_io.cc` (raw io_uring
syscalls; falls back to a pread thread pool when io_uring is
unavailable, e.g. under seccomp). Loaded via ctypes like the other
native kernels — no pybind11 in the image.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    os.pardir, "native")
_SO = os.path.join(_DIR, "libblock_io.so")
_SRC = os.path.join(_DIR, "block_io.cc")
_lib = None
_lock = threading.Lock()


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", "-o", _SO, _SRC], check=True)
            lib = ctypes.CDLL(_SO)
            lib.bio_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.bio_open.restype = ctypes.c_int
            lib.bio_engine.argtypes = [ctypes.c_int]
            lib.bio_engine.restype = ctypes.c_int
            lib.bio_submit.argtypes = [ctypes.c_int, ctypes.c_uint64,
                                       ctypes.c_uint64, ctypes.c_void_p]
            lib.bio_submit.restype = ctypes.c_int64
            lib.bio_wait.argtypes = [ctypes.c_int, ctypes.c_uint64]
            lib.bio_wait.restype = ctypes.c_int64
            lib.bio_close.argtypes = [ctypes.c_int]
            lib.bio_close.restype = None
            _lib = lib
    return _lib


class AsyncBlockLoader:
    """Token-based async reads of (offset, nbytes) extents of one file."""

    def __init__(self, path: str, queue_depth: int = 32):
        self._lib = get_lib()
        self._h = self._lib.bio_open(path.encode(), queue_depth)
        if self._h < 0:
            raise OSError(f"bio_open failed for {path!r}")
        self._bufs: dict[int, np.ndarray] = {}

    @property
    def engine(self) -> str:
        return "io_uring" if self._lib.bio_engine(self._h) == 1 \
            else "threadpool"

    def submit(self, offset: int, nbytes: int) -> int:
        """Start reading [offset, offset+nbytes); returns a wait token."""
        buf = np.empty(nbytes, dtype=np.uint8)
        tok = self._lib.bio_submit(self._h, offset, nbytes,
                                   buf.ctypes.data_as(ctypes.c_void_p))
        if tok < 0:
            raise OSError("bio_submit failed")
        self._bufs[tok] = buf
        return int(tok)

    def wait(self, token: int) -> np.ndarray:
        """Block until the read for `token` completes; returns the bytes."""
        buf = self._bufs.pop(token)
        got = self._lib.bio_wait(self._h, token)
        if got != buf.size:
            raise OSError(f"short read: {got} of {buf.size} bytes")
        return buf

    def close(self):
        if self._h >= 0:
            self._lib.bio_close(self._h)
            self._h = -1

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
