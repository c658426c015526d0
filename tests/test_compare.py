"""Reference .pt interop / diff tool (io/compare.py).

The reference saves results as torch dumps in {R,C,9} / {T,R,C} layout
(horizontal_poiseuille_test.cpp:157-160); compare.py must load them,
transpose to planes, and report per-field errors in one command.
"""

import json

import numpy as np
import pytest

from lbm_tpu.io import compare, snapshots


def _rand(*shape):
    rng = np.random.default_rng(7)
    return rng.standard_normal(shape)


def test_roundtrip_save_torch(tmp_path):
    """Python torch.save -> load_torch round-trips exactly."""
    arr = _rand(4, 6, 9)
    p = str(tmp_path / "a.pt")
    snapshots.save_torch(p, arr)
    out = compare.load_torch(p)
    np.testing.assert_array_equal(out, arr)


def test_load_cpp_style_jit_archive(tmp_path):
    """C++ torch::save writes a TorchScript archive whose tensor is
    recoverable as a parameter; emulate that flavour and load it."""
    torch = pytest.importorskip("torch")
    arr = _rand(5, 7)

    class Box(torch.nn.Module):
        def __init__(self, t):
            super().__init__()
            self.register_parameter("0", torch.nn.Parameter(t))

    p = str(tmp_path / "cpp.pt")
    torch.jit.save(torch.jit.script(Box(torch.from_numpy(arr))), p)
    out = compare.load_torch(p)
    np.testing.assert_array_equal(out, arr)


def test_load_genuine_cpp_torch_save():
    """The committed fixture was written by a real C++ ``torch::save``
    call (native/torch_save_fixture.cc compiled against the torch wheel's
    bundled libtorch — the exact API of
    horizontal_poiseuille_test.cpp:157-160).  The loader must recover the
    {R,C,9} double tensor bit-for-bit and auto-roll it to planes."""
    pytest.importorskip("torch")
    import os
    p = os.path.join(os.path.dirname(__file__), "fixtures",
                     "cpp_torch_save_fixture.pt")
    out = compare.load_torch(p)
    r, c, k = np.meshgrid(np.arange(6), np.arange(5), np.arange(9),
                          indexing="ij")
    exp = (100 * r + 10 * c + k).astype(np.float64) / 7.0
    assert out.shape == (6, 5, 9) and out.dtype == np.float64
    np.testing.assert_array_equal(out, exp)
    planes = compare.to_planes(out)
    assert planes.shape == (9, 6, 5)
    np.testing.assert_array_equal(planes[4], exp[:, :, 4])


def test_to_planes_detects_reference_layout():
    ref = _rand(12, 8, 9)            # {R,C,9}
    planes = compare.to_planes(ref)
    assert planes.shape == (9, 12, 8)
    np.testing.assert_array_equal(planes[3], ref[:, :, 3])
    # already-planes input is untouched
    ours = _rand(9, 12, 8)
    np.testing.assert_array_equal(compare.to_planes(ours), ours)
    # time-stacked {T,R,C,9} -> (T,9,R,C)
    tref = _rand(3, 12, 8, 9)
    tp = compare.to_planes(tref)
    assert tp.shape == (3, 9, 12, 8)
    np.testing.assert_array_equal(tp[1, 4], tref[1, :, :, 4])
    # velocity {R,C,2} -> (2,R,C)
    assert compare.to_planes(_rand(12, 8, 2)).shape == (2, 12, 8)


def test_to_planes_ambiguous_square_uses_explicit_layout():
    """A (9,9,9) cube is ambiguous: auto leaves it, 'ref' rolls it."""
    cube = _rand(9, 9, 9)
    np.testing.assert_array_equal(compare.to_planes(cube), cube)
    rolled = compare.to_planes(cube, "ref")
    np.testing.assert_array_equal(rolled[2], cube[:, :, 2])


def test_field_errors_report():
    ref = np.zeros((3, 4))
    ours = np.zeros((3, 4))
    ours[1, 2] = 3e-7
    rep = compare.field_errors(ref, ours)
    assert rep["linf"] == pytest.approx(3e-7)
    assert rep["linf_at"] == [1, 2]
    assert rep["l2_abs"] == pytest.approx(3e-7)


def test_compare_files_cross_format_and_frame(tmp_path):
    """Reference {T,R,C,9} .pt vs our planes .npy, per-frame."""
    T, R, C = 3, 6, 5
    ref = _rand(T, R, C, 9)
    ours = np.moveaxis(ref, -1, 1).copy()          # (T,9,R,C)
    ours[2] += 1e-8
    pref = str(tmp_path / "ref.pt")
    pours = str(tmp_path / "ours.npy")
    snapshots.save_torch(pref, ref)
    np.save(pours, ours)
    rep0 = compare.compare_files(pref, pours, frame=0)
    assert rep0["linf"] == 0.0
    rep2 = compare.compare_files(pref, pours, frame=2)
    assert rep2["linf"] == pytest.approx(1e-8)
    # whole stack at once
    rep = compare.compare_files(pref, pours)
    assert rep["shape"] == [T, 9, R, C]


def test_cli_exit_codes(tmp_path, capsys):
    a = _rand(4, 4, 9)
    b = np.moveaxis(a, -1, 0) + 1e-9
    pa, pb = str(tmp_path / "a.pt"), str(tmp_path / "b.npy")
    snapshots.save_torch(pa, a)
    np.save(pb, b)
    assert compare.main([pa, pb, "--atol", "1e-6"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["linf"] == pytest.approx(1e-9)
    assert compare.main([pa, pb, "--atol", "1e-12"]) == 1
    capsys.readouterr()
    assert compare.main([pa, pb, "--rtol", "1e-15"]) == 1
