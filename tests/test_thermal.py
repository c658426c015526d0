"""Rayleigh-Benard thermal convection gates (scenes.thermal — beyond
the reference, which has no thermal model).

Quantitative anchors:
- pure conduction reaches the exact halfway-wall linear profile,
- the convective instability onsets within a few % of Chandrasekhar's
  rigid-rigid critical Rayleigh number Ra_c = 1707.76,
- the saturated Nusselt number at Ra = 1e4, Pr = 0.71 matches
  Clever & Busse (1974): Nu = 2.661,
- the fused Pallas kernel equals the jnp oracle at machine precision.
"""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.scenes import thermal


def _mode_amp(res):
    """RMS of the column-varying part of theta — the convection-roll
    amplitude, insensitive to the y-independent hydrostatic residual."""
    th = np.asarray(res.theta)
    dev = th - th.mean(axis=1, keepdims=True)
    return float(np.sqrt((dev ** 2).mean()))


def test_conduction_profile_exact():
    """With no perturbation the scheme settles on the exact linear
    profile through the +-1/2 halfway walls, with zero velocity."""
    r = thermal.rayleigh_benard(H=16, W=32, T=5000, Ra=0.0, amp=0.0,
                                fused=False, dtype=jnp.float64)
    prof = np.asarray(r.theta).mean(axis=1)
    exact = thermal.conduction_profile(16)
    assert np.sqrt(((prof - exact) ** 2).mean()) < 1e-12
    assert float(np.abs(np.asarray(r.u)).max()) == 0.0
    assert abs(r.nusselt - 1.0) < 1e-12


def test_onset_brackets_critical_rayleigh():
    """The roll-mode amplitude decays at Ra = 1300 and grows at
    Ra = 2300 (measured onset on this 16x32 grid: 1700 < Ra_c < 1750,
    within ~2% of the theoretical 1707.76)."""
    kw = dict(H=16, W=32, amp=1e-4, fused=False, dtype=jnp.float64)
    early = {Ra: _mode_amp(thermal.rayleigh_benard(T=500, Ra=Ra, **kw))
             for Ra in (1300.0, 2300.0)}
    late = {Ra: _mode_amp(thermal.rayleigh_benard(T=4000, Ra=Ra, **kw))
            for Ra in (1300.0, 2300.0)}
    assert late[1300.0] / early[1300.0] < 0.1      # subcritical: decays
    assert late[2300.0] / early[2300.0] > 10.0     # supercritical: grows


def test_nusselt_matches_clever_busse():
    """Saturated heat transport at Ra = 1e4, Pr = 0.71 on a 32x64 box:
    Nu = 2.661 (Clever & Busse 1974) within 1%."""
    r = thermal.rayleigh_benard(H=32, W=64, T=20000, Ra=1e4, Pr=0.71,
                                amp=1e-2, record_every=5000,
                                fused=False, dtype=jnp.float64)
    assert abs(r.nusselt - 2.661) < 0.027
    # saturation: the last two recorded Nu values agree to 1e-3
    assert abs(r.series[-1, 0] - r.series[-2, 0]) < 1e-3


def test_fused_matches_jnp():
    """The one-launch Pallas kernel reproduces the jnp oracle at
    machine precision in f64 (interpret mode on CPU)."""
    kw = dict(H=32, W=128, T=60, Ra=3000.0, amp=1e-3,
              dtype=jnp.float64)
    ref = thermal.rayleigh_benard(fused=False, **kw)
    got = thermal.rayleigh_benard(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=1e-13)


def test_record_series_shape():
    r = thermal.rayleigh_benard(H=16, W=32, T=600, Ra=2300.0, amp=1e-3,
                                record_every=200, fused=False,
                                dtype=jnp.float64)
    assert r.series.shape == (3, 3)
    assert np.isfinite(r.series).all()
    # series rows are (Nu, u_rms, theta_max)
    assert abs(float(r.series[0, 0]) - 1.0) < 0.1
    assert float(r.series[-1, 2]) <= 0.52


def test_heated_cavity_de_vahl_davis():
    """Differentially heated square cavity at Ra = 1e4, Pr = 0.71:
    mean Nu = 2.243 (de Vahl Davis 1983) within 1% on a 64x64 grid."""
    r = thermal.heated_cavity(H=64, W=64, T=40000, Ra=1e4, Pr=0.71,
                              record_every=10000, fused=False,
                              dtype=jnp.float64)
    assert abs(r.nusselt - 2.243) < 0.023
    assert abs(r.series[-1, 0] - r.series[-2, 0]) < 1e-3  # saturated


def test_heated_cavity_fused_matches_jnp():
    kw = dict(H=64, W=128, T=60, Ra=1e4, dtype=jnp.float64)
    ref = thermal.heated_cavity(fused=False, **kw)
    got = thermal.heated_cavity(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g),
                               rtol=0, atol=1e-13)


def test_fused_substeps_equivalence():
    """Temporal blocking: substeps=4 per launch equals 4 plain steps at
    machine precision (RB), including the all-masks path (n_blocks <= 2
    via explicit block_rows = R/2)."""
    kw = dict(H=32, W=128, T=24, Ra=3000.0, amp=1e-3,
              dtype=jnp.float64, fused=True, interpret=True)
    a = thermal.rayleigh_benard(substeps=1, **kw)
    b = thermal.rayleigh_benard(substeps=4, **kw)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(a.g),
                               rtol=0, atol=1e-13)

    from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
    from lbm_tpu.ops import d2q9
    from lbm_tpu.scenes.thermal import CS2, conduction_profile

    R, C = 32, 128
    kap = CS2 * 0.3
    kk = dict(omega_f=1.4, omega_g=1.25,
              g_beta=3e3 * 0.71 * kap * kap / R ** 3,
              dtype=jnp.float64, interpret=True)
    s1 = make_thermal_fused_step(R, C, **kk)
    s4e = make_thermal_fused_step(R, C, substeps=4, block_rows=16, **kk)
    th0 = jnp.asarray(np.broadcast_to(conduction_profile(R)[:, None],
                                      (R, C)))
    u0 = jnp.zeros((2, R, C))
    S = jnp.concatenate([d2q9.equilibrium(u0, jnp.ones((R, C))),
                         d2q9.equilibrium(u0, 0.9 * th0)], axis=0)
    ref = S
    for _ in range(4):
        ref = s1(ref)
    np.testing.assert_allclose(np.asarray(s4e(S)), np.asarray(ref),
                               rtol=0, atol=1e-13)


def test_cavity_fused_substeps_equivalence():
    kw = dict(H=32, W=128, T=24, Ra=1e4, dtype=jnp.float64, fused=True,
              interpret=True)
    a = thermal.heated_cavity(substeps=1, **kw)
    b = thermal.heated_cavity(substeps=4, **kw)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(a.g),
                               rtol=0, atol=1e-13)


def test_fused_substeps_interior_fast_path():
    """substeps>1 with n_blocks >= 3: the mask-free interior-block cond
    fast path runs WITH multi-sweep bodies (explicit block_rows=16 on
    R=64 gives 4 blocks) and still equals plain steps — guards the
    `substeps < block_rows` edge condition for both thermal kernels."""
    from lbm_tpu.kernels.thermal_pallas import (
        make_heated_cavity_fused_step, make_thermal_fused_step)
    from lbm_tpu.ops import d2q9
    from lbm_tpu.scenes.thermal import CS2, conduction_profile

    R, C = 64, 128
    kap = CS2 * 0.3
    kw = dict(omega_f=1.4, omega_g=1.25,
              g_beta=3e3 * 0.71 * kap * kap / R ** 3,
              dtype=jnp.float64, interpret=True)
    th0 = jnp.asarray(np.broadcast_to(conduction_profile(R)[:, None],
                                      (R, C)))
    u0 = jnp.zeros((2, R, C))
    S0 = jnp.concatenate([d2q9.equilibrium(u0, jnp.ones((R, C))),
                          d2q9.equilibrium(u0, 0.9 * th0)], axis=0)
    for mk in (make_thermal_fused_step, make_heated_cavity_fused_step):
        s1 = mk(R, C, **kw)
        s2 = mk(R, C, substeps=2, block_rows=16, **kw)
        ref = S0
        for _ in range(4):
            ref = s1(ref)
        np.testing.assert_allclose(np.asarray(s2(s2(S0))),
                                   np.asarray(ref), rtol=0, atol=1e-13)


def test_rayleigh_benard_sharded_equals_single():
    """rayleigh_benard(mesh_shape=(8, 1)) — GSPMD over the virtual mesh
    — equals the single-device jnp run at 1e-13 in f64."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(H=32, W=64, T=200, Ra=3000.0, amp=1e-3, fused=False,
              dtype=jnp.float64)
    a = thermal.rayleigh_benard(**kw)
    b = thermal.rayleigh_benard(mesh_shape=(8, 1), **kw)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.theta), np.asarray(a.theta),
                               rtol=0, atol=1e-13)


def test_snapshot_streams():
    """snapshot_every records (ux, uy, theta) at the cadence instants
    (t=0 included), for both thermal scenes."""
    r = thermal.rayleigh_benard(H=16, W=32, T=400, Ra=2300.0, amp=1e-3,
                                snapshot_every=100, fused=False,
                                dtype=jnp.float64)
    assert set(r.snapshots) == {"ux", "uy", "theta"}
    assert np.asarray(r.snapshots["theta"]).shape == (4, 16, 32)
    c = thermal.heated_cavity(H=16, W=16, T=300, Ra=1e3,
                              snapshot_every=100, fused=False,
                              dtype=jnp.float64)
    assert np.asarray(c.snapshots["ux"]).shape == (3, 16, 16)


def test_checkpoint_resume_roundtrip(tmp_path):
    """A run interrupted at T=400 and resumed to T=600 from its
    checkpoint is bit-identical to a straight T=600 run."""
    d = str(tmp_path / "ck")
    kw = dict(H=16, W=32, Ra=2300.0, amp=1e-3, fused=False,
              dtype=jnp.float64)
    ref = thermal.rayleigh_benard(T=600, **kw)
    thermal.rayleigh_benard(T=400, checkpoint_dir=d,
                            checkpoint_every=200, **kw)
    res = thermal.rayleigh_benard(T=600, checkpoint_dir=d,
                                  checkpoint_every=200, **kw)
    np.testing.assert_array_equal(np.asarray(res.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(res.g), np.asarray(ref.g))


def test_d2q5_scalar_lattice():
    """The D2Q5 temperature lattice (14-plane coupled state): exact
    conduction, machine-precision fused parity incl. substeps, and the
    same Nu accuracy class as D2Q9 (2.6657 vs Clever-Busse 2.661)."""
    r = thermal.rayleigh_benard(H=16, W=32, T=5000, Ra=0.0, amp=0.0,
                                scalar_lattice="d2q5", fused=False,
                                dtype=jnp.float64)
    prof = np.asarray(r.theta).mean(axis=1)
    assert np.sqrt(((prof - thermal.conduction_profile(16))**2).mean()) \
        < 1e-12

    kw = dict(H=32, W=128, T=24, Ra=3000.0, amp=1e-3,
              scalar_lattice="d2q5", dtype=jnp.float64)
    j = thermal.rayleigh_benard(fused=False, **kw)
    b = thermal.rayleigh_benard(fused=True, interpret=True, substeps=4,
                                **kw)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(j.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(j.g),
                               rtol=0, atol=1e-13)
    assert b.g.shape[0] == 5


def test_d2q5_nusselt():
    r = thermal.rayleigh_benard(H=32, W=64, T=20000, Ra=1e4, Pr=0.71,
                                amp=1e-2, scalar_lattice="d2q5",
                                fused=False, dtype=jnp.float64)
    assert abs(r.nusselt - 2.661) < 0.03


def test_heated_cavity_d2q5():
    """The D2Q5 temperature lattice on the cavity: same Nu accuracy
    (2.2428 vs d2q9's 2.2423 vs the canonical 2.243 at Ra=1e4) and
    machine-precision fused parity incl. substeps."""
    kw = dict(H=32, W=128, T=24, Ra=1e4, scalar_lattice="d2q5",
              dtype=jnp.float64)
    j = thermal.heated_cavity(fused=False, **kw)
    b = thermal.heated_cavity(fused=True, interpret=True, substeps=2,
                              **kw)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(j.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(j.g),
                               rtol=0, atol=1e-13)
    assert b.g.shape[0] == 5
    r = thermal.heated_cavity(H=48, W=48, T=25000, Ra=1e3, Pr=0.71,
                              scalar_lattice="d2q5", fused=False,
                              dtype=jnp.float64)
    assert abs(r.nusselt - 1.118) < 0.012
