"""Reference-output comparison tool.

The reference dumps results with ``torch::save`` (e.g.
horizontal_poiseuille_test.cpp:157-160: ``torch::save(fs, "hpt-fs.pt")``)
in its native {R,C,9} / time-stacked {T,R,C,9} layout.  This module loads
such dumps (both the C++ ``torch::save`` jit-archive format and plain
Python ``torch.save``), transposes them to this repo's planes layout
((9,R,C), k outermost), and reports per-field errors against a scene
result — so the day someone runs the C++ code, parity is one command:

    python -m lbm_tpu.io.compare ref/hpt-fs.pt out/run-f.npy --atol 1e-6

Accepted file types: .pt (torch, either save flavour), .npy, .npz
(first array or --key).  Layout is auto-detected by default: an array
whose LAST axis is a known direction count (2/5/9/19) while the first is
not is treated as reference layout and rolled to planes.

The C++ ``torch::save`` branch is verified against a GENUINE libtorch
artifact: ``tests/fixtures/cpp_torch_save_fixture.pt`` was produced by a
C++ program (native/torch_save_fixture.cc, ``make -C native
torch-fixture``) calling the exact API of the reference drivers
(horizontal_poiseuille_test.cpp:157-160) through the libtorch bundled in
the installed torch wheel;
tests/test_compare.py::test_load_genuine_cpp_torch_save pins the loader
to it bit-for-bit.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

#: axis sizes that identify a "directions/components last" reference array
_DIRECTION_SIZES = (2, 5, 9, 19)


def load_torch(path: str) -> np.ndarray:
    """Load a tensor from either Python ``torch.save`` or C++
    ``torch::save`` (which writes a TorchScript archive whose tensors are
    recoverable as module parameters/attributes)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        return _first_tensor(obj)
    except Exception:
        pass
    mod = torch.jit.load(path, map_location="cpu")
    tensors = list(mod.parameters()) + list(mod.buffers())
    if not tensors:  # torch::save stores the tensor as attribute "0"
        tensors = [getattr(mod, name) for name, _ in
                   sorted(mod.named_modules())
                   if hasattr(mod, name)]
        tensors = [t for t in tensors if hasattr(t, "numpy")]
    if not tensors:
        for name in ("0", "tensor", "data"):
            if hasattr(mod, name):
                tensors = [getattr(mod, name)]
                break
    if not tensors:
        raise ValueError(f"{path}: no tensor found in torchscript archive")
    return tensors[0].detach().cpu().numpy()


def _first_tensor(obj) -> np.ndarray:
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, np.ndarray):
        return obj
    if isinstance(obj, dict):
        for v in obj.values():
            try:
                return _first_tensor(v)
            except TypeError:
                continue
    if isinstance(obj, (list, tuple)) and obj:
        return _first_tensor(obj[0])
    raise TypeError(f"no tensor in {type(obj)!r}")


def load_any(path: str, key: str | None = None) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        z = np.load(path)
        return z[key] if key else z[list(z.files)[0]]
    return load_torch(path)


def to_planes(arr: np.ndarray, layout: str = "auto") -> np.ndarray:
    """Return ``arr`` in planes layout (components outermost, after any
    leading time axis).

    'ref'    — components on the LAST axis ({R,C,9} or {T,R,C,9}): roll
               last→front (after the time axis for 4-D time stacks).
    'planes' — already (9,R,C)/(T,9,R,C): returned unchanged.
    'auto'   — detect: last axis in _DIRECTION_SIZES and the would-be
               planes axis is not → reference layout.
    """
    if layout == "planes" or arr.ndim < 3:
        return arr
    last = arr.shape[-1]
    if layout == "auto":
        planes_axis = arr.shape[0] if arr.ndim == 3 else arr.shape[1]
        is_ref = last in _DIRECTION_SIZES and planes_axis not in _DIRECTION_SIZES
        if not is_ref:
            return arr
    elif layout != "ref":
        raise ValueError(f"layout must be auto|ref|planes, got {layout!r}")
    if arr.ndim == 3:  # (R,C,K) -> (K,R,C)
        return np.moveaxis(arr, -1, 0)
    return np.moveaxis(arr, -1, -3)  # (...,T,R,C,K) -> (...,T,K,R,C)


def field_errors(ref: np.ndarray, ours: np.ndarray) -> dict:
    """Per-field error report between two same-shape arrays."""
    if ref.shape != ours.shape:
        raise ValueError(f"shape mismatch: ref {ref.shape} vs ours {ours.shape}")
    ref64 = np.asarray(ref, np.float64)
    our64 = np.asarray(ours, np.float64)
    diff = our64 - ref64
    l2_ref = float(np.sqrt(np.sum(ref64 ** 2)))
    l2_abs = float(np.sqrt(np.sum(diff ** 2)))
    linf = float(np.max(np.abs(diff))) if diff.size else 0.0
    where = np.unravel_index(int(np.argmax(np.abs(diff))), diff.shape) \
        if diff.size else ()
    return {
        "shape": list(ref.shape),
        "l2_abs": l2_abs,
        "l2_rel": l2_abs / l2_ref if l2_ref > 0 else l2_abs,
        "linf": linf,
        "linf_at": [int(i) for i in where],
        "ref_l2": l2_ref,
    }


def compare_files(ref_path: str, ours_path: str, *,
                  ref_layout: str = "auto", ours_layout: str = "planes",
                  frame: int | None = None, key: str | None = None) -> dict:
    """Load, align layouts, optionally select a time frame, and report."""
    ref = to_planes(load_any(ref_path, key), ref_layout)
    ours = to_planes(load_any(ours_path, key), ours_layout)
    if frame is not None:
        if ref.ndim == ours.ndim + 1:
            ref = ref[frame]
        elif ours.ndim == ref.ndim + 1:
            ours = ours[frame]
        elif ref.ndim == ours.ndim and ref.ndim >= 3:
            ref, ours = ref[frame], ours[frame]
    report = field_errors(ref, ours)
    report["ref"] = ref_path
    report["ours"] = ours_path
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m lbm_tpu.io.compare",
        description="Diff a reference torch dump against a scene result.")
    ap.add_argument("ref", help="reference dump (.pt/.npy/.npz), {R,C,9} ok")
    ap.add_argument("ours", help="scene result (.npy/.npz/.pt), planes layout")
    ap.add_argument("--ref-layout", default="auto",
                    choices=["auto", "ref", "planes"])
    ap.add_argument("--ours-layout", default="auto",
                    choices=["auto", "ref", "planes"])
    ap.add_argument("--frame", type=int, default=None,
                    help="time index to select when one side is time-stacked")
    ap.add_argument("--key", default=None, help=".npz array key")
    ap.add_argument("--atol", type=float, default=None,
                    help="fail (exit 1) if linf exceeds this")
    ap.add_argument("--rtol", type=float, default=None,
                    help="fail (exit 1) if relative L2 exceeds this")
    args = ap.parse_args(argv)
    rep = compare_files(args.ref, args.ours, ref_layout=args.ref_layout,
                        ours_layout=args.ours_layout, frame=args.frame,
                        key=args.key)
    print(json.dumps(rep, indent=1))
    ok = ((args.atol is None or rep["linf"] <= args.atol)
          and (args.rtol is None or rep["l2_rel"] <= args.rtol))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
