"""Moving-marker IBM: dense factors vs the static operator, the
momentum-exchange identity, and the falling-cylinder coupling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops.ibm import IBM
from lbm_tpu.ops.moving_ibm import (circle_markers, forcing_window,
                                    peskin4j, window_factors)


def _random_markers(rng, n, lo=12.0, hi=28.0):
    return (rng.uniform(lo, hi, n), rng.uniform(lo, hi, n))


def test_dense_factors_match_static_operator():
    # the dense evaluation X[i,j] = phi(row_i - x_j) must reproduce the
    # scatter-built static factors exactly (phi vanishes outside the
    # 4-point support, so the extra evaluations contribute zeros)
    rng = np.random.default_rng(7)
    xs, ys = _random_markers(rng, 17)
    ib = IBM.from_markers(xs, ys)
    ra0, ra1 = ib.roi_rows
    ca0, ca1 = ib.roi_cols
    Xs, Ys = ib.window_operators(ra0, ra1, ca0, ca1, m_pad=len(xs))
    Xd, Yd = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                            float(ra0), float(ca0),
                            ra1 - ra0, ca1 - ca0)
    np.testing.assert_allclose(np.asarray(Xd), Xs, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(Yd), Ys, rtol=0, atol=1e-14)


def test_partition_of_unity_dense():
    # each marker's dense factor column sums to 1 along each axis
    rng = np.random.default_rng(3)
    xs, ys = _random_markers(rng, 11)
    X, Y = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                          8.0, 8.0, 24, 24)
    np.testing.assert_allclose(np.asarray(X).sum(0), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Y).sum(0), 1.0, atol=1e-12)


def test_zero_target_matches_static_forcing():
    # with U_b = 0 the moving-marker forcing is the reference's static
    # multi-direct forcing (ibm.cpp:158-190) — compare against
    # ops.ibm.force_density_roi on the same window
    rng = np.random.default_rng(11)
    xs, ys = _random_markers(rng, 19)
    ib = IBM.from_markers(xs, ys, m_max=5)
    H = W = 40
    key = jax.random.PRNGKey(0)
    u = 0.05 * jax.random.normal(key, (2, H, W), jnp.float64)
    rho = 1.0 + 0.01 * jax.random.normal(key, (H, W), jnp.float64)
    F_static = ib.eulerian_force_density(u, rho)

    ra0, ra1 = ib.roi_rows
    ca0, ca1 = ib.roi_cols
    X, Y = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                          float(ra0), float(ca0), ra1 - ra0, ca1 - ca0)
    F_dyn, f_sum = forcing_window(
        u[:, ra0:ra1, ca0:ca1], rho[ra0:ra1, ca0:ca1], X, Y,
        jnp.zeros(2, jnp.float64), m_max=5)
    np.testing.assert_allclose(np.asarray(F_dyn), np.asarray(F_static),
                               rtol=0, atol=1e-13)
    # momentum-exchange identity: partition of unity makes the window sum
    # of the spread force equal the Lagrangian force sum
    np.testing.assert_allclose(np.asarray(F_dyn.sum(axis=(1, 2))),
                               np.asarray(f_sum), rtol=0, atol=1e-13)


def test_drag_sign_and_slip_toward_target():
    # uniform stream past held markers: the fluid loses +x momentum
    # (f_sum_x < 0 => body reaction -f_sum is downstream drag), and the
    # corrected velocity at markers approaches the body target
    xs, ys = circle_markers(jnp.asarray([16.0, 16.0]), 6.0, 24)
    X, Y = window_factors(xs, ys, 6.0, 6.0, 20, 20)
    u = jnp.zeros((2, 20, 20), jnp.float64).at[0].set(0.08)
    rho = jnp.ones((20, 20), jnp.float64)
    ub = jnp.asarray([0.02, 0.0], jnp.float64)
    F, f_sum = forcing_window(u, rho, X, Y, ub, m_max=5)
    assert float(f_sum[0]) < 0.0          # fluid decelerated toward ub
    u_corr = u + 0.5 * F / rho[None]

    def interp(g):
        return np.asarray(jnp.sum((g @ Y) * X, axis=0))

    slip0 = np.abs(interp(u[0]) - 0.02).max()
    slip1 = np.abs(interp(u_corr[0]) - 0.02).max()
    assert slip1 < 0.5 * slip0
    # and more forcing iterations tighten it monotonically
    F2, _ = forcing_window(u, rho, X, Y, ub, m_max=2)
    slip2 = np.abs(interp((u + 0.5 * F2 / rho[None])[0]) - 0.02).max()
    assert slip1 < slip2 < slip0


def test_peskin4j_matches_numpy():
    from lbm_tpu.ops.ibm import peskin4

    r = np.linspace(-2.5, 2.5, 101)
    np.testing.assert_allclose(np.asarray(peskin4j(jnp.asarray(r))),
                               peskin4(r), rtol=0, atol=1e-15)


def test_falling_cylinder_falls():
    from lbm_tpu.scenes.obstacles import falling_cylinder

    res = falling_cylinder(H=96, W=64, T=120, center=(30.0, 32.0),
                           radius=6.0, rho_s=1.5, gravity=1e-4,
                           record_every=20, dtype=jnp.float64)
    assert np.isfinite(np.asarray(res.f)).all()
    cen = np.asarray(res.center)
    vel = np.asarray(res.velocity)
    assert cen[0] > 30.0 and vel[0] > 0.0       # falls along +rows
    assert abs(cen[1] - 32.0) < 0.2             # symmetric fall
    tr = res.trajectory
    assert tr.shape == (6, 6)
    assert (np.diff(tr[:, 0]) > 0).all()        # monotone descent
    # hydrodynamic reaction opposes the motion once falling
    assert tr[-1, 4] < 0.0
