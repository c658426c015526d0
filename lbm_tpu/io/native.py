"""ctypes binding to the native async snapshot writer (native/snapshot_writer.cc).

The writer thread runs in C++ with the GIL released, so disk serialisation
of snapshot frames overlaps device compute — unlike the reference, whose
C++ drivers accumulate everything in RAM and serialise at exit
(SURVEY.md section 5.4).  Falls back cleanly when the library has not been
built (``make -C native``); io.snapshots.SnapshotWriter picks the backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "build", "libsnapshot.so")

_lib = None


def _load(auto_build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build:
        native_dir = os.path.dirname(os.path.dirname(_LIB_PATH))
        try:
            subprocess.run(["make", "-C", native_dir, "all"],
                           capture_output=True, check=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sw_open.restype = ctypes.c_void_p
    lib.sw_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                            ctypes.POINTER(ctypes.c_int64)]
    lib.sw_append.restype = ctypes.c_int
    lib.sw_append.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.sw_pending.restype = ctypes.c_int
    lib.sw_pending.argtypes = [ctypes.c_void_p]
    lib.sw_close.restype = ctypes.c_int64
    lib.sw_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeStream:
    """One .npy output stream backed by the C++ writer thread."""

    def __init__(self, path: str, frame_shape: tuple[int, ...], dtype):
        lib = _load()
        if lib is None:
            raise RuntimeError("native snapshot writer not built")
        self._lib = lib
        self.frame_shape = tuple(int(s) for s in frame_shape)
        self.dtype = np.dtype(dtype)
        shape_arr = (ctypes.c_int64 * len(self.frame_shape))(*self.frame_shape)
        descr = np.lib.format.dtype_to_descr(self.dtype).encode()
        self._h = lib.sw_open(path.encode(), descr,
                              len(self.frame_shape), shape_arr)
        if not self._h:
            raise OSError(f"cannot open {path}")

    def append(self, array) -> None:
        arr = np.ascontiguousarray(np.asarray(array), dtype=self.dtype)
        if arr.shape != self.frame_shape:
            raise ValueError(f"frame shape {arr.shape} != {self.frame_shape}")
        rc = self._lib.sw_append(
            self._h, arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
        if rc != 0:
            raise OSError("native snapshot append failed")

    def pending(self) -> int:
        return self._lib.sw_pending(self._h)

    def close(self) -> int:
        if self._h is None:
            return 0
        frames = self._lib.sw_close(self._h)
        self._h = None
        if frames < 0:
            raise OSError("native snapshot writer reported a write error")
        return int(frames)
