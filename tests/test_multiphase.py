"""Multiphase model tests: conservation, Laplace law, RT sanity.

The reference has no hard multiphase asserts (physics was checked offline
from snapshot dumps, SURVEY.md section 4); these tests encode the checks the
snapshots were evidently used for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.models import mrt_cg, rk_cg
from lbm_tpu.scenes import multiphase as mp


def test_cg_equilibrium_moments():
    red = mp.DEFAULT_RED
    rho = jnp.ones((8, 8)) * 2.0
    u = jnp.zeros((2, 8, 8)).at[0].set(0.01)
    feq = mrt_cg.cg_equilibrium(rho, red.phi(), red.eta(), u)
    # zeroth moment: sum(phi) + W-weighted terms must give rho
    np.testing.assert_allclose(np.asarray(feq.sum(0)), 2.0, rtol=1e-12)


def test_colour_params_derivations():
    red = mp.DEFAULT_RED
    # cs2 = 3(1-alpha)/5  [colour.cpp:37]
    assert red.cs2 == pytest.approx(3.0 * 0.3 / 5.0)
    # rlx = 1/(0.5 + nu/cs2)  [colour.cpp:38-39]
    assert red.rlx == pytest.approx(1.0 / (0.5 + 0.04 / red.cs2))
    assert red.phi().sum() + 0 == pytest.approx(red.alpha + 4 * 0.2 * 0.3 + 4 * 0.05 * 0.3)


def test_relaxation_function_piecewise():
    rf = mrt_cg.RelaxationFunction.from_omegas(mp.DEFAULT_RED, mp.DEFAULT_BLUE, 0.1)
    psi = jnp.asarray([1.0, 0.05, 0.0, -0.05, -1.0])
    s = np.asarray(rf(psi))
    assert s[0] == pytest.approx(mp.DEFAULT_RED.rlx)
    assert s[-1] == pytest.approx(mp.DEFAULT_BLUE.rlx)
    # continuity at the knots
    eps = 1e-9
    s_hi = np.asarray(rf(jnp.asarray([0.1 + eps, 0.1 - eps])))
    assert s_hi[0] == pytest.approx(s_hi[1], rel=1e-6)
    s_lo = np.asarray(rf(jnp.asarray([eps, -eps])))
    assert s_lo[0] == pytest.approx(s_lo[1], rel=1e-6)


def test_mrtcg_droplet_mass_conservation_and_bounds():
    res = mp.mrtcg_static_droplet(R=48, C=48, T=30, radius=12.0)
    st = res.state
    r0 = mp.init_rho_droplet(48, 48, mp.DEFAULT_RED.rho_0, True, 12.0)
    b0 = mp.init_rho_droplet(48, 48, mp.DEFAULT_BLUE.rho_0, False, 12.0)
    # The interior (red) phase conserves mass exactly; the wall-touching
    # (blue) phase leaks slightly because the reference's periodic edge
    # copies drop the diagonal row-offset (mrtcg_rayleigh_taylor.cpp:517-523)
    # — reproduced faithfully, so only a small drift bound applies.
    assert float(st.red.rho.sum()) == pytest.approx(float(r0.sum()), rel=1e-10)
    assert float(st.blue.rho.sum()) == pytest.approx(float(b0.sum()), rel=1e-4)
    # phase field stays in [-1, 1]
    psi = np.asarray(mrt_cg.phase_field(st.red.rho, 3.0, st.blue.rho, 1.0))
    assert psi.min() >= -1.0 - 1e-9 and psi.max() <= 1.0 + 1e-9
    # no NaNs, bounded velocity
    assert np.isfinite(np.asarray(st.u)).all()
    assert np.abs(np.asarray(st.u)).max() < 0.2


def test_mrtcg_droplet_laplace_law():
    # After relaxation the pressure jump across the interface must match
    # sigma/R (2-D Laplace law).  Pressure p_k = rho_k cs2_k summed.
    R = 64
    radius = 16.0
    res = mp.mrtcg_static_droplet(R=R, C=R, T=600, radius=radius, sigma=0.1)
    st = res.state
    red, blue = mp.DEFAULT_RED, mp.DEFAULT_BLUE
    p = np.asarray(st.red.rho * red.cs2 + st.blue.rho * blue.cs2)
    p_in = p[R // 2 - 3:R // 2 + 3, R // 2 - 3:R // 2 + 3].mean()
    p_out = np.concatenate([p[:4, :].ravel(), p[-4:, :].ravel()]).mean()
    dp = p_in - p_out
    expected = 0.1 / radius
    # The diffuse-interface droplet relaxes toward sigma/R slowly (measured:
    # dp = 3.0x at t=500, 2.2x at t=2000, still decreasing); gate on sign
    # and order of magnitude at this short horizon.
    assert 0.5 * expected < dp < 4.0 * expected, (dp, expected)


def test_csf_rt_runs_and_conserves():
    res = mp.mrt_csf_rayleigh_taylor(R=48, C=24, T=25)
    st = res.state
    assert np.isfinite(np.asarray(st.u)).all()
    r0 = mp.init_rho_cosine(48, 24, 3.0, True, 1.0)
    assert float(st.red.rho.sum()) == pytest.approx(float(r0.sum()), rel=1e-9)


def test_mrtcg_rt_interface_falls():
    # heavy fluid on top accelerates downward: the interface mean position
    # of the heavy phase must move toward larger row indices (gravity +x).
    res = mp.mrtcg_rayleigh_taylor(R=64, C=32, T=400, sigma=1e-4,
                                   gravity_magnitude=5e-5)
    st = res.state
    psi = np.asarray(mrt_cg.phase_field(st.red.rho, 3.0, st.blue.rho, 1.0))
    assert np.isfinite(psi).all()
    # spike forms: interface has deformed from the initial cosine
    heavy = psi > 0
    col_heights = heavy.sum(axis=0)
    assert col_heights.std() > 0.5


def test_rk_droplet_mass_and_stability():
    r0 = mp.init_rho_droplet(41, 41, 1.2, True, 10.0, sharpness=2.0)
    # The faithful default reproduces the driver's full-edge wrap-copy BC,
    # which exchanges colour mass slowly (measured via the torch oracle in
    # test_rk_transcription: red 380.09 -> 366.91 over 100 steps) — bound
    # the drift rather than assert conservation.
    res = mp.rk_static_droplet(L=41, T=100, radius=10.0)
    st = res.state
    assert np.isfinite(np.asarray(st.red.f)).all()
    assert float(st.red.rho.sum()) == pytest.approx(
        float(np.asarray(r0).sum()), rel=0.05)
    assert np.abs(np.asarray(st.u)).max() < 0.1
    # exact_periodic=True restores exact per-colour mass conservation
    res_p = mp.rk_static_droplet(L=41, T=100, radius=10.0,
                                 exact_periodic=True)
    assert float(res_p.state.red.rho.sum()) == pytest.approx(
        float(np.asarray(r0).sum()), rel=1e-8)


def test_rk_mixture_step_conserves_mass():
    model = rk_cg.RKMixtureModel(
        r_alpha=11.0 / 15.0, r_rho_0=3.0, r_nu=0.04,
        b_alpha=0.2, b_rho_0=1.0, b_nu=0.04,
        sigma=0.1, beta=0.7, gravity=(0.0, 0.0),
        boundary=mp.mrtcg_boundary,
    )
    r0 = mp.init_rho_cosine(32, 16, 3.0, False, 1.0)
    b0 = mp.init_rho_cosine(32, 16, 1.0, True, 1.0)
    st = model.init_state(r0, b0)
    total0 = float(st.r_rho.sum() + st.b_rho.sum())
    step = jax.jit(model.step)
    for _ in range(10):
        st = step(st)
    total = float(st.r_rho.sum() + st.b_rho.sum())
    assert total == pytest.approx(total0, rel=1e-10)
    assert np.isfinite(np.asarray(st.f)).all()


def test_csf_static_droplet_conservation():
    """Moment-space MRT+CSF droplet (static_droplet_test.cpp formulation).

    This reference driver is exploratory WIP (scrambled-basis matmuls,
    outward recolouring, TODO sign comments; never validated) — its
    un-normalised recolour flux redistributes colour within tens of steps.
    The preserved invariants are per-colour mass, total momentum symmetry
    and finiteness; droplet coherence is NOT a property of this
    formulation as shipped (use mrtcg_static_droplet for Laplace physics)."""
    res = mp.csf_static_droplet(L=41, T=80, radius=10.0)
    st = res.state
    assert np.isfinite(np.asarray(st.red.f)).all()
    r0 = float(mp.init_rho_droplet(41, 41, 1.0, True, 10.0, 2.0).sum())
    b0 = float(mp.init_rho_droplet(41, 41, 1.0, False, 10.0, 2.0).sum())
    assert float(st.red.rho.sum()) == pytest.approx(r0, rel=1e-10)
    assert float(st.blue.rho.sum()) == pytest.approx(b0, rel=1e-10)
    # psi bounded; mixture density stays near 1
    psi = np.asarray((st.red.rho - st.blue.rho) / (st.red.rho + st.blue.rho))
    assert np.abs(psi).max() <= 1.0 + 1e-9
    rho = np.asarray(st.red.rho + st.blue.rho)
    assert 0.5 < rho.min() and rho.max() < 1.5


def test_mrtcg_multimode_rt():
    """Multi-mode interface init has the requested spectral content and the
    scene runs stably (the reference's declared-but-unshipped
    mrtcg_multiple_mode_rayleigh_taylor study)."""
    modes = ((1, -0.05), (3, 0.02))
    r0 = mp.init_rho_modes(64, 32, 3.0, fill_below=True, modes=modes)
    # interface height per column = number of heavy rows; its FFT must show
    # exactly the seeded modes
    h = (r0 > 0).sum(axis=0).astype(float)
    spec = np.abs(np.fft.rfft(h - h.mean()))
    assert spec[1] > 5.0 and spec[3] > 2.0        # seeded modes present
    assert spec[2] < 0.6 * spec[3]                # unseeded mode absent
    res = mp.mrtcg_multimode_rayleigh_taylor(
        modes=modes, R=64, C=32, T=200, sigma=1e-4, gravity_magnitude=5e-5)
    st = res.state
    psi = np.asarray(mrt_cg.phase_field(st.red.rho, 3.0, st.blue.rho, 1.0))
    assert np.isfinite(psi).all()
    # total mass drifts only by the reference's faithful no-diagonal
    # periodic-edge leak (~1e-7/step for the wall-touching phase)
    total = np.asarray(st.red.rho + st.blue.rho)
    assert abs(total.sum() / (r0.sum() + mp.init_rho_modes(
        64, 32, 1.0, fill_below=False, modes=modes).sum()) - 1) < 1e-4


def test_mrtcg_droplet_df64_matches_f64_model():
    """The on-chip df64 MRT-CG droplet reproduces the f64 jnp model
    (itself pinned to the literal reference transcription) at df64
    accuracy (~2^-48 per op) over several steps.

    Runs under disable_jit: the df64 step unrolls to ~10k HLO ops and
    XLA:CPU takes >10 min to optimise that graph on this 1-core box,
    while eager dispatch finishes in seconds (the jitted path is
    exercised on real hardware by validate_tpu.py laplace_df64).

    Two comparisons: beta=0 pins every operator except recolouring at
    1e-12; the full-parameter run gets a looser bound because kappa's
    unit direction grad/|grad| is ill-conditioned where the phase
    gradient ~ 0 (deep inside either phase) — there f64 and df64 round
    the near-zero gradient differently and the direction flips, with
    amplitude bounded by rho_r rho_b/rho^2 ~ 1e-3 (measured max 8e-5
    over 2 steps).  The reference's own f64 kappa has the same
    indeterminacy at those cells."""
    import jax.numpy as jnp
    from dataclasses import replace

    R = C = 24
    T = 2
    r0 = mp.init_rho_droplet(R, C, mp.DEFAULT_RED.rho_0, True, 7.0)
    b0 = mp.init_rho_droplet(R, C, mp.DEFAULT_BLUE.rho_0, False, 7.0)

    for red, blue, atol in (
            (replace(mp.DEFAULT_RED, beta=0.0),
             replace(mp.DEFAULT_BLUE, beta=0.0), 1e-12),
            (mp.DEFAULT_RED, mp.DEFAULT_BLUE, 3e-4)):
        with jax.disable_jit():
            res = mp.mrtcg_static_droplet_df64(R, C, T, red=red, blue=blue,
                                               radius=7.0)
        model = mrt_cg.MRTCGModel(
            red=red, blue=blue, sigma=0.1,
            gravity=(0.0, -6.25e-6), apply_gravity_source=False,
            boundary=mp.mrtcg_boundary)
        st = model.init_state(r0, b0, dtype=jnp.float64,
                              u_init_gravity_shift=True)
        for _ in range(T):
            st = model.step(st)
        np.testing.assert_allclose(np.asarray(res.state.red.f),
                                   np.asarray(st.red.f), rtol=0, atol=atol)
        np.testing.assert_allclose(np.asarray(res.state.blue.f),
                                   np.asarray(st.blue.f), rtol=0, atol=atol)
        np.testing.assert_allclose(np.asarray(res.state.u),
                                   np.asarray(st.u), rtol=0, atol=atol)
