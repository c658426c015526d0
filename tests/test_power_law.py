"""Truncated power-law generalized-Newtonian family (models.power_law,
kernels.power_law_pallas, scenes.channel.power_law_channel — beyond the
reference, whose every operator is Newtonian, src/solver.cpp:65-74)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels.power_law_pallas import (make_power_law_fused_step,
                                              power_law_collide_fn)
from lbm_tpu.models.power_law import (_SQ32, apparent_tau,
                                      nonequilibrium_stress_norm,
                                      power_law_collide)
from lbm_tpu.ops import d2q9
from lbm_tpu.scenes.channel import (bingham_analytic_profile,
                                    power_law_analytic_profile,
                                    power_law_channel)
from lbm_tpu.scenes.ulbm import double_shear_init


def _sheared_state(R=32, C=32, u_max=0.08):
    """A few BGK steps from a double-shear init: a state with real
    non-equilibrium stress everywhere."""
    m0, u = double_shear_init(R, C, u_max, dtype=jnp.float64)
    f = d2q9.equilibrium(u, m0)
    for _ in range(3):
        rho = d2q9.calc_rho(f)
        uu = d2q9.calc_u(f, rho)
        f = d2q9.stream(d2q9.bgk_collision(
            f, d2q9.equilibrium(uu, rho), 1.0 / 0.8))
    rho = d2q9.calc_rho(f)
    return f, d2q9.calc_u(f, rho), rho


def test_n1_is_exact_bgk():
    """n = 1 reduces EXACTLY to BGK with nu = K (tau = 1/2 + 3K)."""
    f, u, rho = _sheared_state()
    feq = d2q9.equilibrium(u, rho)
    ours = power_law_collide(f, u, rho, cons_K=0.02, n=1.0)
    bgk = d2q9.bgk_collision(f, feq, 1.0 / (0.5 + 3.0 * 0.02))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(bgk))


@pytest.mark.parametrize("n,sigma_y", [(0.5, 0.0), (1.5, 0.0),
                                       (0.8, 5e-4), (1.0, 5e-4)])
def test_tau_solves_the_implicit_relation(n, sigma_y):
    """The Steffensen result satisfies tau = 1/2 + 3 clip(nu(gdot))
    with gdot = sqrt(2)*3|Q|/(2 rho tau) to near machine precision on a
    genuinely sheared state (f64) — for the pure power law and the
    Papanastasiou Herschel-Bulkley/Bingham variants."""
    f, u, rho = _sheared_state()
    feq = d2q9.equilibrium(u, rho)
    K, tmin, tmax, m = 0.01, 0.52, 50.0, 2e4
    tau = apparent_tau(f, feq, rho, K, n, tmin, tmax, iters=60,
                       sigma_y=sigma_y, m_pap=m)
    qn = nonequilibrium_stress_norm(f, feq)
    gdot = _SQ32 * np.asarray(qn) / (np.asarray(rho) * np.asarray(tau))
    nu = K * gdot ** (n - 1.0)
    if sigma_y > 0:
        nu = nu + sigma_y * -np.expm1(-m * gdot) / gdot
    nu = np.clip(nu, (tmin - 0.5) / 3, (tmax - 0.5) / 3)
    np.testing.assert_allclose(np.asarray(tau), 0.5 + 3 * nu,
                               rtol=1e-12, atol=0)
    # the default 8 sweeps land within 1e-9 of the converged point
    tau8 = apparent_tau(f, feq, rho, K, n, tmin, tmax, iters=8,
                        sigma_y=sigma_y, m_pap=m)
    np.testing.assert_allclose(np.asarray(tau8), np.asarray(tau),
                               rtol=1e-9, atol=0)


def test_tau_monotone_with_shear_thinning():
    """Shear-thinning (n<1): tau is largest where the state is closest
    to equilibrium; at exact equilibrium it clips to tau_max."""
    f, u, rho = _sheared_state()
    feq = d2q9.equilibrium(u, rho)
    tau = apparent_tau(feq, feq, rho, 0.01, 0.5, 0.52, 50.0)
    np.testing.assert_allclose(np.asarray(tau), 50.0, rtol=0, atol=1e-14)
    tau_sheared = apparent_tau(f, feq, rho, 0.01, 0.5, 0.52, 50.0)
    assert float(tau_sheared.min()) < 50.0


def _channel_params(n, cons_K, u_max, W):
    """Force G for a target centerline u_max (via the wall shear rate)."""
    h = W / 2.0
    gdot_w = (n + 1.0) / n * u_max / h
    return cons_K * gdot_w ** n / h


@pytest.mark.parametrize("n,cons_K,u_max,tol,shape_min", [
    (0.5, 0.01, 0.05, 0.02, 0.10),
    (1.5, 0.716, 0.06, 0.02, 0.05),
])
def test_power_law_poiseuille_profile(n, cons_K, u_max, tol, shape_min):
    """The steady force-driven profile matches the analytic power-law
    Poiseuille solution (shear-thinning blunted / shear-thickening
    sharpened parabola) to ~2% relative L2."""
    W = 41
    g = _channel_params(n, cons_K, u_max, W)
    res = power_law_channel(H=4, W=W, T=120000, n=n, cons_K=cons_K,
                            fg=g, dtype=jnp.float64)
    ux = np.asarray(res.u[0])[0]          # row-invariant
    y = np.arange(W) - (W - 1) / 2.0
    ref = power_law_analytic_profile(y, W / 2.0, cons_K, n, g)
    err = np.linalg.norm(ux - ref) / np.linalg.norm(ref)
    assert err < tol, (err, res.steps)
    # the profile shape is genuinely non-parabolic: compare against the
    # Newtonian parabola with the same centerline velocity
    para = ref.max() * (1.0 - (y / (W / 2.0)) ** 2)
    shape_gap = np.linalg.norm(ref - para) / np.linalg.norm(ref)
    assert shape_gap > shape_min


def test_bingham_plug_profile():
    """Bingham plastic (n=1, sigma_y>0): a rigid plug of half-width
    y_p = sigma_y/G rides a shifted parabola.  Analytic match to ~3%
    relative L2 (the residual is the plug creep every regularised
    Bingham scheme shows — larger m_pap sharpens nu at the yield
    surface but worsens the creep through the tau discontinuity;
    m_pap = 1e4 measured best at this resolution) and the plug core is
    flat to ~1.5% of u_max."""
    W, K = 41, 0.05
    h = W / 2.0
    y_p = h / 2.0
    g = 2.0 * K * 0.05 / (h - y_p) ** 2
    sigma_y = g * y_p
    res = power_law_channel(H=4, W=W, T=120000, n=1.0, cons_K=K, fg=g,
                            sigma_y=sigma_y, dtype=jnp.float64)
    ux = np.asarray(res.u[0])[0]
    y = np.arange(W) - (W - 1) / 2.0
    ref = bingham_analytic_profile(y, h, K, sigma_y, g)
    err = np.linalg.norm(ux - ref) / np.linalg.norm(ref)
    assert err < 0.035, (err, res.steps)
    core = ux[np.abs(y) <= 0.5 * y_p]
    assert (core.max() - core.min()) < 0.015 * ux.max()
    # the unyielded core really sits at the high-viscosity end
    tau = res.snapshots["tau"][0]
    assert tau[np.abs(y) <= 0.5 * y_p].min() > 5.0
    assert tau[0] < 1.0 and tau[-1] < 1.0     # yielded wall layers


def test_fused_matches_jnp_and_substeps():
    """One-launch kernel == jnp oracle at machine precision in f64;
    substeps=4 == 4 plain launches."""
    H, W = 64, 128
    K, n = 0.01, 0.5
    m0, u = double_shear_init(H, W, 0.08, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)

    def jstep(f):
        rho = d2q9.calc_rho(f)
        uu = d2q9.calc_u(f, rho)
        return d2q9.stream(power_law_collide(f, uu, rho, K, n))

    k1 = make_power_law_fused_step(H, W, cons_K=K, n=n,
                                   dtype=jnp.float64, interpret=True)
    k4 = make_power_law_fused_step(H, W, cons_K=K, n=n, substeps=4,
                                   dtype=jnp.float64, interpret=True)
    S, g = f0, f0
    for _ in range(8):
        S = jstep(S)
        g = k1(g)
    np.testing.assert_allclose(np.asarray(g), np.asarray(S), rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(k4(k4(f0))), np.asarray(S),
                               rtol=0, atol=1e-13)


def test_fused_matches_jnp_with_yield_stress():
    """The Herschel-Bulkley kernel path (sigma_y > 0) == jnp oracle at
    1e-13 in f64."""
    H, W = 32, 128
    K, n, sy = 0.01, 0.8, 5e-4
    m0, u = double_shear_init(H, W, 0.08, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)

    def jstep(f):
        rho = d2q9.calc_rho(f)
        uu = d2q9.calc_u(f, rho)
        return d2q9.stream(power_law_collide(f, uu, rho, K, n,
                                             sigma_y=sy))

    from lbm_tpu.kernels.collide_stream import make_fused_step
    step = make_fused_step(
        H, W, power_law_collide_fn(K, n, 0.52, 50.0, 8, jnp.float64,
                                   sigma_y=sy),
        dtype=jnp.float64, interpret=True)
    S, g = f0, f0
    for _ in range(4):
        S = jstep(S)
        g = step(g)
    np.testing.assert_allclose(np.asarray(g), np.asarray(S), rtol=0,
                               atol=1e-13)


def test_power_law_collide_fn_rides_sharded_wrapper():
    """power_law_collide_fn through the 1-D sharded factory == the
    single-chip kernel at 1e-13 in f64 on 8 ranks (substeps=4: one
    ppermute exchange per 4 steps)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.sharded_pallas import make_sharded_fused_step
    from lbm_tpu.parallel import mesh as meshmod

    R, C = 192, 128
    K, n = 0.01, 0.5
    m0, u = double_shear_init(R, C, 0.08, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)
    single = make_power_law_fused_step(R, C, cons_K=K, n=n,
                                       dtype=jnp.float64, interpret=True)
    m = meshmod.make_mesh(shape=(8, 1))
    shard = make_sharded_fused_step(
        m, R, C, power_law_collide_fn(K, n, 0.52, 50.0, 15, jnp.float64),
        dtype=jnp.float64, substeps=4, interpret=True)
    fs = meshmod.shard_state(m, f0)
    fs = shard(fs)
    S = f0
    for _ in range(4):
        S = single(S)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(S), rtol=0,
                               atol=1e-13)
