"""KBC/ULBM collision tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.models import kbc
from lbm_tpu.ops import d2q9


def test_kbc_equilibrium_moments():
    m0 = jnp.ones((6, 6)) * 1.3
    u = jnp.zeros((2, 6, 6)).at[0].set(0.03).at[1].set(-0.02)
    feq = kbc.equilibrium(m0, u)
    np.testing.assert_allclose(np.asarray(feq.sum(0)), 1.3, rtol=1e-12)
    mom = np.asarray(d2q9.calc_momentum(feq))
    np.testing.assert_allclose(mom[0], 1.3 * 0.03, rtol=1e-12)
    np.testing.assert_allclose(mom[1], -1.3 * 0.02, rtol=1e-12)


def test_kbc_collide_conserves_and_fixes_equilibrium():
    m0 = jnp.ones((5, 5)) * 1.1
    u = jnp.zeros((2, 5, 5)).at[0].set(0.01)
    feq = kbc.equilibrium(m0, u)
    out = kbc.collide(feq, m0, u, s2=1.2)
    # equilibrium is invariant under collision
    np.testing.assert_allclose(np.asarray(out), np.asarray(feq), atol=1e-12)

    # a perturbed state conserves mass and momentum through collision
    f = feq + 1e-3 * jnp.asarray(
        np.random.default_rng(0).standard_normal(feq.shape))
    m0p = d2q9.calc_rho(f)
    up = d2q9.calc_u(f, m0p)
    out = kbc.collide(f, m0p, up, s2=1.2)
    np.testing.assert_allclose(np.asarray(d2q9.calc_rho(out)), np.asarray(m0p), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(d2q9.calc_momentum(out)), np.asarray(d2q9.calc_momentum(f)), atol=1e-13
    )


def test_kbc_central_moments_zeroth():
    f = jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.0, (9, 4, 4)))
    u = d2q9.calc_u(f, d2q9.calc_rho(f))
    cT = kbc.central_moments(f, u)
    np.testing.assert_allclose(np.asarray(cT[0]), np.asarray(f.sum(0)), rtol=1e-12)
    # first central moments vanish by construction of u
    np.testing.assert_allclose(np.asarray(cT[1]), 0.0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(cT[2]), 0.0, atol=1e-13)


def test_double_shear_short_run_stable():
    from lbm_tpu.scenes import ulbm

    res = ulbm.ulbm_double_shear(H=32, W=32, T=50, u_max=0.02)
    assert np.isfinite(np.asarray(res.f)).all()
    # mass conserved under pure periodic streaming + KBC collide
    assert float(res.m0.sum()) == pytest.approx(32 * 32, rel=1e-10)
    # velocity magnitude stays bounded by the initial max
    assert np.abs(np.asarray(res.m1)).max() < 0.05
