"""IO, checkpoint, params, observability and CLI runner tests."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import params
from lbm_tpu.io import checkpoint, snapshots
from lbm_tpu.models.mrt_cg import ColourFields, TwoPhaseState
from lbm_tpu.utils.observe import StepMeter, confirm


def test_snapshot_writer_roundtrip(tmp_path):
    prefix = str(tmp_path / "run")
    with snapshots.SnapshotWriter(prefix) as w:
        for t in range(5):
            w.append("rho", np.full((4, 6), float(t)))
            w.append("ux", np.full((4,), float(t) * 2))
    rho = snapshots.load_stream(prefix, "rho")
    assert rho.shape == (5, 4, 6)
    np.testing.assert_allclose(rho[3], 3.0)
    meta = json.load(open(prefix + "-meta.json"))
    assert meta["ux"]["count"] == 5


def test_snapshot_writer_rejects_shape_change(tmp_path):
    with snapshots.SnapshotWriter(str(tmp_path / "x")) as w:
        w.append("a", np.zeros((2, 2)))
        with pytest.raises(ValueError):
            w.append("a", np.zeros((3, 2)))


def test_checkpoint_roundtrip(tmp_path):
    state = TwoPhaseState(
        ColourFields(jnp.ones((9, 4, 4)), jnp.full((4, 4), 3.0)),
        ColourFields(jnp.zeros((9, 4, 4)), jnp.ones((4, 4))),
        jnp.zeros((2, 4, 4)),
    )
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state, step=42)
    like = TwoPhaseState(
        ColourFields(jnp.zeros((9, 4, 4)), jnp.zeros((4, 4))),
        ColourFields(jnp.zeros((9, 4, 4)), jnp.zeros((4, 4))),
        jnp.zeros((2, 4, 4)),
    )
    restored, step = checkpoint.load(path, like)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(restored.red.rho), 3.0)


def test_checkpointer_prunes(tmp_path):
    ck = checkpoint.Checkpointer(str(tmp_path), every=10, keep=2)
    state = {"f": jnp.ones((3,))}
    for step in (10, 20, 30, 35, 40):
        ck.maybe_save(step, state)
    files = sorted(os.listdir(tmp_path))
    assert files == ["ckpt-30.npz", "ckpt-40.npz"]
    restored, step = ck.restore_latest(state)
    assert step == 40


def test_params_derivations_match_reference():
    """Check the unit-conversion chain on the shipped parameter values
    (src/params.cpp:31-66 semantics)."""
    tbl = params.load_toml("configs/channel.toml")
    fp = params.FlowParams.from_toml(tbl)
    lp = params.LatticeParams.from_toml(tbl, fp)
    assert fp.Re == pytest.approx(0.5 * 6e-3 / 1.0533e-6)
    assert lp.l == 300  # ceil(6e-3/2e-5)=300 even -> floor -> 300
    assert lp.nu == pytest.approx((0.55 - 0.5) / 3.0)
    assert lp.X == 2700 and lp.Y == 2100
    assert lp.dt == pytest.approx(lp.nu * (2e-5) ** 2 / 1.0533e-6)
    sp = params.SimulationParams.from_toml(tbl, lp)
    assert sp.total_steps == int(np.ceil(0.01 * lp.T))
    assert sp.snapshot(0) and not sp.snapshot(sp.snapshot_steps - 1)


def test_step_meter():
    m = StepMeter(cells=1000, total_steps=100, log_every_s=1e9)
    m.update(50)
    assert m.steps == 50
    assert m.mlups() > 0
    assert "step 50/100" in m.summary()


def test_confirm_auto_yes():
    assert confirm(auto_yes=True)


def test_cli_runner_end_to_end(tmp_path):
    """Drive the CLI surface: a tiny Poiseuille run writing .npy outputs."""
    out = str(tmp_path / "hp")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "lbm_tpu.run", "horizontal_poiseuille",
         "--x64", "--set", "T=50", "--set", "H=11", "--set", "W=11",
         "--out", out],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    u = np.load(out + "-u.npy")
    assert u.shape == (2, 11, 11)
    assert np.isfinite(u).all()


def test_cli_from_foreign_cwd(tmp_path):
    """Packaging gate: the installed package (pip install -e .) must run
    from ANY working directory — `python -m lbm_tpu.run` and, when on
    PATH, the `lbm-tpu` console script (pyproject [project.scripts])."""
    import shutil

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = str(tmp_path / "hp")
    argv = ["horizontal_poiseuille", "--x64", "--set", "T=20",
            "--set", "H=9", "--set", "W=9", "--out", out]
    r = subprocess.run([sys.executable, "-m", "lbm_tpu.run"] + argv,
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path))
    # no skip: conftest.py self-installs the package in fresh environments
    assert r.returncode == 0, r.stderr[-2000:]
    assert np.isfinite(np.load(out + "-u.npy")).all()
    script = shutil.which("lbm-tpu")
    if script:
        r = subprocess.run([script] + argv, capture_output=True, text=True,
                           env=env, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]


def test_ibm_from_toml():
    from lbm_tpu.ops.ibm import IBM

    ib = IBM.from_toml("configs/cylinder-markers.toml", "cylinder-a")
    assert ib.weights.shape[0] == 64
    np.testing.assert_allclose(np.asarray(ib.weights).sum(axis=1), 1.0, atol=1e-12)


def test_native_snapshot_backend(tmp_path):
    """C++ async writer (native/snapshot_writer.cc) matches the python
    backend's on-disk format exactly."""
    from lbm_tpu.io.native import available

    if not available():
        pytest.skip("native writer not built")
    prefix = str(tmp_path / "nat")
    with snapshots.SnapshotWriter(prefix, backend="native") as w:
        for t in range(20):
            w.append("psi", np.full((8, 16), float(t), dtype=np.float32))
    a = snapshots.load_stream(prefix, "psi")
    assert a.shape == (20, 8, 16) and a.dtype == np.float32
    np.testing.assert_allclose(a[13], 13.0)


def test_orbax_checkpointer_roundtrip(tmp_path):
    from lbm_tpu.io.checkpoint import OrbaxCheckpointer

    ck = OrbaxCheckpointer(str(tmp_path / "orb"), every=5, keep=2)
    state = {"f": jnp.full((4, 4), 7.0), "rho": jnp.ones((4,))}
    assert ck.maybe_save(5, state)
    assert not ck.maybe_save(7, state)
    assert ck.maybe_save(10, state)
    ck.wait()
    restored, step = ck.restore_latest(
        {"f": jnp.zeros((4, 4)), "rho": jnp.zeros((4,))})
    assert step == 10
    np.testing.assert_allclose(np.asarray(restored["f"]), 7.0)


def test_check_finite_watchdog():
    """Failure detection: non-finite fields raise a diagnosable error
    naming the step (SURVEY.md section 5.3 — absent in the reference)."""
    import jax.numpy as jnp
    import pytest

    from lbm_tpu.utils import observe

    observe.check_finite({"f": jnp.ones((4, 4))}, 100)  # fine
    with pytest.raises(FloatingPointError, match="step 2000"):
        observe.check_finite(
            {"f": jnp.full((4, 4), jnp.nan)}, 2000)


def test_checkpoint_roundtrip_sharded(tmp_path):
    """Checkpoint/resume works with a SHARDED state: save gathers the
    global array (np.asarray), resume re-commits the restored leaves to
    the mesh sharding and the sharded step continues bit-identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lbm_tpu.io import checkpoint
    from lbm_tpu.ops import d2q9
    from lbm_tpu.parallel import mesh as meshmod, sharded

    m = meshmod.make_mesh(shape=(8, 1))
    f = d2q9.equilibrium(
        jnp.zeros((2, 32, 16), jnp.float64).at[0].set(0.01),
        jnp.ones((32, 16), jnp.float64))
    fs = meshmod.shard_state(m, f)
    step = jax.jit(sharded.make_periodic_bgk_step(m, omega=1.0))
    fs = step(fs)

    path = str(tmp_path / "ckpt-1.npz")
    checkpoint.save(path, fs, step=1)
    restored, step_no = checkpoint.load(path, fs)
    assert step_no == 1
    rs = jax.device_put(
        jnp.asarray(restored), NamedSharding(m, P(None, "x", None)))
    np.testing.assert_array_equal(np.asarray(step(rs)),
                                  np.asarray(step(fs)))


# ---------------------------------------------------------------------------
# Physical-units config -> scene wiring (VERDICT item 1)
# ---------------------------------------------------------------------------

_TINY_PHYS_TOML = """
[flow]
initial_density = 1e3
kinematic_viscosity = 1e-6
characteristic_length = 1e-3
characteristic_velocity = 0.05

[lattice]
relaxation_time = 0.55
lattice_spacing = 1e-4
x_multiplier = 2.4
y_multiplier = 1.6

[simulation]
stop_time = 0.005
snapshot_period = 0.00167
file_prefix = "tiny"
"""


def _tiny_config(tmp_path, simulation=True):
    text = _TINY_PHYS_TOML
    if not simulation:
        text = text[:text.index("[simulation]")]
    path = tmp_path / "tiny.toml"
    path.write_text(text)
    return str(path)


def test_free_stream_config_drives_grid_steps_snapshots(tmp_path):
    """--config runs the workload the TOML describes, exactly as the
    reference driver derives it (free_stream_test.cpp:23-36 +
    src/params.cpp:95-120): grid (X, Y), T=total_steps, and ux/uy/ps
    snapshots whenever t % snapshot_steps == 0 (t=0 included)."""
    from lbm_tpu.scenes import channel

    cfg = _tiny_config(tmp_path)
    pc = params.PhysicalConfig.load(cfg)
    assert (pc.lattice.X, pc.lattice.Y) == (24, 16)
    res = channel.free_stream(config_path=cfg, dtype=jnp.float64)
    assert res.f.shape == (9, pc.lattice.X, pc.lattice.Y)
    assert res.steps == pc.simulation.total_steps
    n_snap = pc.simulation.total_snapshots
    assert n_snap >= 2
    assert set(res.snapshots) == {"ux", "uy", "ps"}
    for k in ("ux", "uy", "ps"):
        assert res.snapshots[k].shape == (n_snap, pc.lattice.X, pc.lattice.Y)
    # t=0 snapshot is the exact initial stream; later frames drift only at
    # the edges (the reference's corner-inconsistent BC stack, see
    # test_channel.test_free_stream_preserved)
    np.testing.assert_allclose(res.snapshots["ux"][0], 0.1, atol=1e-12)
    np.testing.assert_allclose(res.snapshots["ps"][0], 1.0 / 3.0, atol=1e-12)
    bulk = res.snapshots["ux"][-1][6:-6, 6:-6]
    assert np.isfinite(res.snapshots["ux"]).all()
    assert 0.08 < bulk.mean() < 0.14


def test_free_stream_config_without_simulation_table(tmp_path):
    """The reference's own shipped parameters.toml lacks [simulation]
    (SURVEY.md 5.6); scenes then keep their keyword T and record nothing."""
    from lbm_tpu.scenes import channel

    cfg = _tiny_config(tmp_path, simulation=False)
    res = channel.free_stream(config_path=cfg, T=7, dtype=jnp.float64)
    assert res.steps == 7 and res.snapshots is None
    assert res.f.shape == (9, 24, 16)


def test_cylinder_config_and_markers_toml(tmp_path):
    """cylinder_flow --config + --markers mirrors the reference's two argv
    TOMLs (cylinder_test.cpp:24-38): u_stream = lattice.u, markers from the
    [name].x/.y schema, surface-force + ROI-force snapshot series."""
    from lbm_tpu.scenes import obstacles

    cfg = _tiny_config(tmp_path)
    pc = params.PhysicalConfig.load(cfg)
    th = np.linspace(0.0, 2.0 * np.pi, 12, endpoint=False)
    xs = [float(x) for x in 12.0 + 3.0 * np.cos(th)]
    ys = [float(y) for y in 8.0 + 3.0 * np.sin(th)]
    markers = tmp_path / "markers.toml"
    markers.write_text("[cyl]\nx = %r\ny = %r\n" % (xs, ys))

    res = obstacles.cylinder_flow(config_path=cfg, markers_path=str(markers),
                                  marker_name="cyl", dtype=jnp.float64)
    assert res.f.shape == (9, pc.lattice.X, pc.lattice.Y)
    assert res.steps == pc.simulation.total_steps
    n_snap = pc.simulation.total_snapshots
    assert res.snapshots["ux"].shape == (n_snap, pc.lattice.X, pc.lattice.Y)
    assert res.snapshots["surface_force"].shape == (n_snap, 2)
    assert res.snapshots["forces"].shape[:2] == (n_snap, 2)
    # the inflow really is the derived lattice velocity
    np.testing.assert_allclose(float(res.snapshots["ux"][0, 0, 0]),
                               pc.lattice.u, atol=1e-12)
    assert np.isfinite(np.asarray(res.u)).all()


def test_sedimentation_config(tmp_path):
    """rectangle_sedimentation --config (rectangle_sedimentation_test.cpp
    parses the same physical schema): grid/u_in/omega/T from the TOML,
    ux/uy/ps/cs snapshots."""
    from lbm_tpu.scenes import obstacles

    cfg = _tiny_config(tmp_path)
    pc = params.PhysicalConfig.load(cfg)
    res = obstacles.rectangle_sedimentation(
        config_path=cfg, R23=20, C28=6, C38=9, inlet_rows=8,
        dtype=jnp.float64)
    assert res.f.shape == (9, pc.lattice.X, pc.lattice.Y)
    assert res.steps == pc.simulation.total_steps
    assert set(res.snapshots) == {"ux", "uy", "ps", "cs"}
    assert res.snapshots["cs"].shape == (pc.simulation.total_snapshots,
                                         pc.lattice.X, pc.lattice.Y)
    assert np.isfinite(np.asarray(res.u)).all()


def test_cli_config_run_writes_snapshots(tmp_path):
    """End-to-end CLI parity check: `python -m lbm_tpu.run free_stream
    --config tiny.toml --out prefix` writes the snap-* arrays."""
    cfg = _tiny_config(tmp_path)
    out = str(tmp_path / "fs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "lbm_tpu.run", "free_stream",
         "--x64", "--config", cfg, "--out", out],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    ux = np.load(out + "-snap-ux.npy")
    assert ux.shape[1:] == (24, 16) and ux.shape[0] >= 2
    np.testing.assert_allclose(ux[0], 0.1, atol=1e-12)
    assert np.isfinite(ux).all()
