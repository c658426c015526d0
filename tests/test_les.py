"""Smagorinsky-BGK subgrid model (models.les, kernels.les_pallas —
beyond the reference, which stabilises under-resolved flows only via
the entropic KBC operator)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.kernels.les_pallas import make_les_fused_step
from lbm_tpu.models.les import les_collide, smagorinsky_tau
from lbm_tpu.ops import d2q9
from lbm_tpu.scenes.ulbm import double_shear_init, les_double_shear

TAU0 = 0.5 + 3.0 * 1.7e-4


def _jstep(tau0, cs):
    def step(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        return d2q9.stream(les_collide(f, u, rho, tau0, cs))
    return step


def test_cs_zero_is_exact_bgk():
    """cs_smag = 0 reduces EXACTLY to plain BGK."""
    m0, u = double_shear_init(32, 32, 0.05, dtype=jnp.float64)
    f = d2q9.equilibrium(u, m0)
    for _ in range(5):
        rho = d2q9.calc_rho(f)
        uu = d2q9.calc_u(f, rho)
        bgk = d2q9.stream(d2q9.bgk_collision(
            f, d2q9.equilibrium(uu, rho), 1.0 / TAU0))
        f = _jstep(TAU0, 0.0)(f)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(bgk))


def test_tau_eff_floor_and_growth():
    """tau_eff >= tau0 everywhere, equality exactly at equilibrium, and
    it grows with the strain (sheared state > rest state)."""
    m0, u = double_shear_init(32, 32, 0.1, dtype=jnp.float64)
    f_eq = d2q9.equilibrium(u, m0)
    tau = smagorinsky_tau(f_eq, f_eq, m0, TAU0, 0.17)
    np.testing.assert_allclose(np.asarray(tau), TAU0, rtol=0, atol=1e-15)
    f = _jstep(TAU0, 0.17)(f_eq)           # one step creates non-eq stress
    rho = d2q9.calc_rho(f)
    uu = d2q9.calc_u(f, rho)
    tau2 = smagorinsky_tau(f, d2q9.equilibrium(uu, rho), rho, TAU0, 0.17)
    assert float(tau2.min()) >= TAU0 - 1e-15
    # sheared layers add an eddy viscosity well above the molecular one
    # (measured ~33 nu0 at these parameters)
    assert float(tau2.max()) > TAU0 + 10.0 * 3.0 * 1.7e-4


def test_les_stabilises_unresolved_shear():
    """The A/B that motivates the model: at 64x64, u_max = 0.1,
    nu = 1.7e-4 (under-resolved Re ~ 4e4), plain BGK blows up by
    t = 4000 while cs_smag = 0.17 stays bounded."""
    import jax

    m0, u = double_shear_init(64, 64, 0.1, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)

    def run(cs, T):
        step = _jstep(TAU0, cs)
        chunk = jax.jit(lambda f, n: jax.lax.fori_loop(
            0, n, lambda _, x: step(x), f), static_argnums=1)
        return np.asarray(chunk(f0, T))

    bgk = run(0.0, 4000)
    les = run(0.17, 4000)
    assert (~np.isfinite(bgk)).any() or np.abs(bgk).max() > 1e3
    assert np.isfinite(les).all() and np.abs(les).max() < 1.0


def test_fused_matches_jnp_and_substeps():
    """One-launch kernel == jnp oracle at machine precision in f64;
    substeps=4 == 4 plain launches."""
    H, W = 64, 128
    cs = 0.17
    m0, u = double_shear_init(H, W, 0.1, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)
    step = _jstep(TAU0, cs)
    k1 = make_les_fused_step(H, W, tau0=TAU0, cs_smag=cs,
                             dtype=jnp.float64, interpret=True)
    k4 = make_les_fused_step(H, W, tau0=TAU0, cs_smag=cs, substeps=4,
                             dtype=jnp.float64, interpret=True)
    S, g = f0, f0
    for _ in range(8):
        S = step(S)
        g = k1(g)
    np.testing.assert_allclose(np.asarray(g), np.asarray(S), rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(k4(k4(f0))), np.asarray(S),
                               rtol=0, atol=1e-13)


def test_les_scene_runs():
    res = les_double_shear(H=64, W=64, T=2000, u_max=0.1, nu=1.7e-4,
                           fused=False, dtype=jnp.float64)
    f = np.asarray(res.f)
    assert np.isfinite(f).all() and np.abs(f).max() < 1.0
    assert res.steps == 2000


def test_les_sharded_matches_single_chip():
    """les_collide_fn rides the generic sharded BGK factory: 8 ranks
    with substeps=4 (one ppermute exchange per 4 steps) equals the
    single-chip kernel at 1e-13 in f64."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.les_pallas import les_collide_fn
    from lbm_tpu.kernels.sharded_pallas import make_sharded_fused_step
    from lbm_tpu.parallel import mesh as meshmod

    R, C = 192, 128
    cs = 0.17
    m0, u = double_shear_init(R, C, 0.1, dtype=jnp.float64)
    f0 = d2q9.equilibrium(u, m0)
    single = make_les_fused_step(R, C, tau0=TAU0, cs_smag=cs,
                                 dtype=jnp.float64, interpret=True)
    m = meshmod.make_mesh(shape=(8, 1))
    shard = make_sharded_fused_step(
        m, R, C, les_collide_fn(TAU0, cs, jnp.float64),
        dtype=jnp.float64, substeps=4, interpret=True)
    fs = meshmod.shard_state(m, f0)
    fs = shard(fs)
    S = f0
    for _ in range(4):
        S = single(S)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(S), rtol=0,
                               atol=1e-13)
