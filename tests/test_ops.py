"""Unit tests for the core D2Q9 operators against hand/NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import lattice as lat
from lbm_tpu.ops import d2q9, gradients


def rng(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0.5, 1.5, shape))


def test_lattice_invariants():
    assert lat.W.sum() == pytest.approx(1.0)
    # opposite pairs (1,3),(2,4),(5,7),(6,8)  [solver.cpp:18-21]
    for k in range(9):
        assert (lat.C[:, lat.OPP[k]] == -lat.C[:, k]).all()
    # specular permutations flip exactly one component
    for k in range(9):
        assert lat.C[0, lat.SPEC_Y[k]] == lat.C[0, k]
        assert lat.C[1, lat.SPEC_Y[k]] == -lat.C[1, k]
        assert lat.C[0, lat.SPEC_X[k]] == -lat.C[0, k]
        assert lat.C[1, lat.SPEC_X[k]] == lat.C[1, k]
    # MRT inverse is exact
    np.testing.assert_allclose(lat.M_MRT @ lat.MI_MRT, np.eye(9), atol=1e-15)


def test_moments_and_equilibrium_consistency():
    f = rng((9, 6, 7))
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    feq = d2q9.equilibrium(u, rho)
    # equilibrium preserves rho and momentum (exact moment identities)
    np.testing.assert_allclose(d2q9.calc_rho(feq), rho, rtol=1e-13)
    np.testing.assert_allclose(d2q9.calc_momentum(feq), rho * u, rtol=1e-12)


def test_incomp_equilibrium_values():
    # spot value: k=1, u=(0.1, 0), rho=2: (2 + 3*0.1)*1/9
    u = jnp.zeros((2, 1, 1)).at[0].set(0.1)
    rho = 2.0 * jnp.ones((1, 1))
    feq = d2q9.incomp_equilibrium(u, rho)
    assert float(feq[1, 0, 0]) == pytest.approx((2.0 + 0.3) / 9.0)
    assert float(feq[3, 0, 0]) == pytest.approx((2.0 - 0.3) / 9.0)


def test_stream_is_periodic_push():
    f = rng((9, 5, 8), seed=1)
    g = d2q9.stream(f)
    # direction 5 = (+1, +1): g[r, c] = f[r-1, c-1] with wrap
    np.testing.assert_array_equal(np.asarray(g[5]), np.roll(np.asarray(f[5]), (1, 1), (0, 1)))
    # direction 0 unchanged; mass conserved per-direction
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(f[0]))
    for k in range(9):
        assert float(g[k].sum()) == pytest.approx(float(f[k].sum()))


def test_stream_inverse_roundtrip():
    f = rng((9, 4, 4), seed=2)
    g = d2q9.stream(f)
    # stream then reverse-roll must reproduce f exactly
    for k in range(9):
        back = jnp.roll(g[k], (-int(lat.C[0, k]), -int(lat.C[1, k])), (0, 1))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(f[k]))


def test_bgk_fixed_point():
    f = rng((9, 6, 6), seed=3)
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    feq = d2q9.equilibrium(u, rho)
    # omega = 1 relaxes straight to equilibrium
    np.testing.assert_allclose(np.asarray(d2q9.bgk_collision(f, feq, 1.0)), np.asarray(feq))
    # equilibrium is a fixed point
    np.testing.assert_allclose(
        np.asarray(d2q9.bgk_collision(feq, feq, 0.7)), np.asarray(feq), rtol=1e-14
    )


def test_guo_source_zero_u_is_linear():
    # at u=0: S_k = (1-w/2) * 3 (F.c_k) W_k
    u = jnp.zeros((2, 3, 3))
    F = jnp.asarray([1e-3, 0.0])
    S = d2q9.guo_source(u, F, 1.0)
    expect = 0.5 * 3.0 * (lat.C[0] * 1e-3) * lat.W
    np.testing.assert_allclose(np.asarray(S[:, 0, 0]), expect, rtol=1e-13)


def test_gradient_linear_field_exact():
    # both stencils are exact on linear ramps away from edges
    R, C = 12, 13
    x = np.arange(R)[:, None] * np.ones((1, C))
    y = np.ones((R, 1)) * np.arange(C)[None, :]
    psi = jnp.asarray(2.0 * x + 3.0 * y)
    gx = np.asarray(gradients.dx5(psi))[3:-3, 3:-3]
    gy = np.asarray(gradients.dy5(psi))[3:-3, 3:-3]
    np.testing.assert_allclose(gx, 2.0, rtol=1e-12)
    np.testing.assert_allclose(gy, 3.0, rtol=1e-12)
    # 3x3 variant: reference-swapped axes (SURVEY.md quirk)
    gx3 = np.asarray(gradients.dx3(psi))[2:-2, 2:-2]
    gy3 = np.asarray(gradients.dy3(psi))[2:-2, 2:-2]
    np.testing.assert_allclose(gx3, 3.0, rtol=1e-12)  # cols derivative
    np.testing.assert_allclose(gy3, 2.0, rtol=1e-12)  # rows derivative
    # consistent orientation
    np.testing.assert_allclose(
        np.asarray(gradients.dx3(psi, reference_swapped=False))[2:-2, 2:-2], 2.0, rtol=1e-12
    )


def test_d2q9_pairs_identity():
    """The paired even/odd equilibrium split (kernels.collide_stream.
    d2q9_pairs) reproduces the direction-by-direction polynomial exactly
    in f64 — the identity every paired kernel relies on."""
    from lbm_tpu.core import lattice as lat
    from lbm_tpu.kernels.collide_stream import d2q9_pairs

    rng = np.random.default_rng(3)
    ux = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 16)))
    uy = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 16)))
    rho = jnp.asarray(rng.uniform(0.5, 2.0, (8, 16)))
    t0, pairs = d2q9_pairs(ux, uy)
    feq = [None] * 9
    feq[0] = float(lat.W[0]) * rho * t0
    seen = {0}
    for kp, km, w, cu, cc in pairs:
        even = (w * rho) * (t0 + 4.5 * cc)
        odd = (w * rho) * (3.0 * cu)
        feq[kp] = even + odd
        feq[km] = even - odd
        seen |= {kp, km}
        # cu really is c_kp . u and cc its square
        np.testing.assert_allclose(
            np.asarray(cu),
            np.asarray(float(lat.C[0, kp]) * ux + float(lat.C[1, kp]) * uy),
            rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(cc), np.asarray(cu * cu),
                                   rtol=1e-15)
    assert seen == set(range(9))
    uu = ux * ux + uy * uy
    for k in range(9):
        cu = lat.C[0, k] * ux + lat.C[1, k] * uy
        want = float(lat.W[k]) * rho * (
            1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu)
        np.testing.assert_allclose(np.asarray(feq[k]), np.asarray(want),
                                   rtol=5e-14)


def test_abb_coefficient():
    u = jnp.asarray([0.1, 0.0])
    coeff = d2q9.abb_coefficient(u)
    # k=1: (2 + 9*0.01 - 3*0.01) * 1/9
    assert float(coeff[1]) == pytest.approx((2.0 + 0.09 - 0.03) / 9.0)
    assert float(coeff[2]) == pytest.approx((2.0 - 0.03) / 9.0)


def test_resolve_fused_auto():
    """fused=None auto-selects the Pallas path only on non-CPU backends
    with f32 and kernel-legal geometry; explicit flags always win."""
    from lbm_tpu.utils.xmath import resolve_fused

    # tests force the CPU backend -> auto is always False here
    assert resolve_fused(None, jnp.float32, rows=256, cols=256) is False
    assert resolve_fused(True, jnp.float64, rows=7, cols=5) is True
    assert resolve_fused(False, jnp.float32, rows=256, cols=256) is False
