"""Snapshot writing.

The reference accumulates full time-stacked tensors in RAM and writes them
once at the end via torch::save (e.g. mrtcg_rayleigh_taylor.cpp:480-487,
horizontal_poiseuille_test.cpp:157-160) — O(T) host memory and no output
until the run finishes.  Here snapshots append to an on-disk .npy stream
incrementally (constant memory, valid file after every append), with an
optional torch .pt export for interop with the reference's tooling.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SnapshotWriter:
    """Appends (time, field) snapshots as raw .npy streams under a prefix.

    Files: {prefix}-{name}.npy (stacked along axis 0) + {prefix}-meta.json.

    ``backend='native'`` routes frames through the C++ writer thread
    (io.native / native/snapshot_writer.cc) so disk IO overlaps device
    compute; 'python' writes synchronously; 'auto' prefers native when the
    shared library is built.
    """

    prefix: str
    backend: str = "auto"
    _files: dict = field(default_factory=dict)
    _shapes: dict = field(default_factory=dict)
    _counts: dict = field(default_factory=dict)
    _native: dict = field(default_factory=dict)

    def _use_native(self) -> bool:
        if self.backend == "python":
            return False
        from . import native

        ok = native.available()
        if self.backend == "native" and not ok:
            raise RuntimeError("native writer requested but not built "
                               "(run: make -C native)")
        return ok

    def append(self, name: str, array) -> None:
        arr = np.ascontiguousarray(np.asarray(array))
        path = f"{self.prefix}-{name}.npy"
        if name not in self._files and name not in self._native:
            if self._use_native():
                from .native import NativeStream

                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                self._native[name] = NativeStream(path, arr.shape, arr.dtype)
                self._shapes[name] = (arr.shape, arr.dtype)
                self._counts[name] = 0
        if name in self._native:
            shape, dtype = self._shapes[name]
            if arr.shape != shape or arr.dtype != dtype:
                raise ValueError(f"snapshot {name}: shape/dtype changed")
            self._native[name].append(arr)
            self._counts[name] += 1
            return
        if name not in self._files:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            fh = open(path, "wb")
            # placeholder header rewritten on close with the true count
            np.lib.format.write_array_header_2_0(
                fh, {"descr": np.lib.format.dtype_to_descr(arr.dtype),
                     "fortran_order": False,
                     "shape": (0,) + arr.shape})
            self._files[name] = fh
            self._shapes[name] = (arr.shape, arr.dtype)
            self._counts[name] = 0
        shape, dtype = self._shapes[name]
        if arr.shape != shape or arr.dtype != dtype:
            raise ValueError(f"snapshot {name}: shape/dtype changed")
        arr.tofile(self._files[name])
        self._files[name].flush()
        self._counts[name] += 1

    def close(self) -> None:
        for name, stream in self._native.items():
            frames = stream.close()
            assert frames == self._counts[name], (frames, self._counts[name])
        self._native.clear()
        for name, fh in self._files.items():
            shape, dtype = self._shapes[name]
            fh.seek(0)
            np.lib.format.write_array_header_2_0(
                fh, {"descr": np.lib.format.dtype_to_descr(dtype),
                     "fortran_order": False,
                     "shape": (self._counts[name],) + shape})
            fh.close()
        with open(f"{self.prefix}-meta.json", "w") as fh:
            json.dump({k: {"count": self._counts[k],
                           "shape": list(self._shapes[k][0]),
                           "dtype": str(self._shapes[k][1])}
                       for k in self._counts}, fh, indent=1)
        self._files.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_torch(path: str, array) -> None:
    """Optional torch-format export for parity with the reference's .pt
    dumps (torch is CPU-only in this environment)."""
    import torch

    torch.save(torch.from_numpy(np.asarray(array)), path)


def load_stream(prefix: str, name: str) -> np.ndarray:
    return np.load(f"{prefix}-{name}.npy")
