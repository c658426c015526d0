"""Collision-invariant property tests on RANDOM states.

Every existing oracle test drives structured (near-equilibrium) states;
these check the algebraic invariants each collision operator guarantees
for ARBITRARY admissible populations — the kind of check that catches a
mis-signed coefficient that happens to vanish on symmetric data.

Guarantees tested (all at 1e-13 in f64 on seeded random states):
  * BGK / Smagorinsky-LES: per-cell mass AND momentum conserved
    (both relax toward an equilibrium sharing rho and u; LES merely
    changes the rate per cell).
  * KBC: per-cell mass and momentum conserved (moment-space relaxation
    leaves m0, m1 untouched; ulbm.cpp:98-125).
  * MRT-CG omega1: per-colour mass conserved (S[0] = 0 row) and
    colour-blind momentum conserved when s1 = s2 rows act on energy
    moments only (S[3] = S[5] = 0, mrtcg_static_droplet.cpp:384-387).
  * MRT-CG perturbation xi: zero mass per cell by construction
    (B-vector sums to zero, mrtcg_static_droplet.cpp:158-163).
  * MRT-CG recolouring: exact per-colour mass (sums to rho_k) and
    colour-blind identity (red + blue recolour = total f).
  * RK Reis perturbation: zero per-cell mass.
  * Guo source: zero mass; momentum injection exactly
    (1 - omega/2) F.
"""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.core import lattice as lat
from lbm_tpu.ops import d2q9

KEYS = np.random.default_rng(20260818)


def _rand_f(H=16, W=24, amp=0.05):
    """Random positive populations near rho=1."""
    base = d2q9.equilibrium(
        jnp.asarray(KEYS.uniform(-0.05, 0.05, (2, H, W))),
        jnp.asarray(KEYS.uniform(0.9, 1.1, (H, W))))
    noise = jnp.asarray(KEYS.uniform(-amp, amp, (9, H, W)))
    return (base * (1.0 + noise)).astype(jnp.float64)


def _mass(f):
    return np.asarray(f.sum(axis=0))


def _mom(f):
    c = jnp.asarray(lat.C, jnp.float64)
    return np.asarray(jnp.einsum("ak,kij->aij", c, f))


def test_bgk_conserves_mass_momentum():
    f = _rand_f()
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    out = d2q9.bgk_collision(f, d2q9.equilibrium(u, rho), 1.7)
    np.testing.assert_allclose(_mass(out), _mass(f), rtol=0, atol=1e-13)
    np.testing.assert_allclose(_mom(out), _mom(f), rtol=0, atol=1e-13)


def test_les_conserves_mass_momentum():
    from lbm_tpu.models.les import les_collide

    f = _rand_f()
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    out = les_collide(f, u, rho, 0.53, 0.17)
    np.testing.assert_allclose(_mass(out), _mass(f), rtol=0, atol=1e-13)
    np.testing.assert_allclose(_mom(out), _mom(f), rtol=0, atol=1e-13)


def test_kbc_conserves_mass_momentum():
    from lbm_tpu.models import kbc

    f = _rand_f(amp=0.02)          # keep gamma's 1/f_eq well-behaved
    m0 = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, m0)
    out = kbc.collide(f, m0, u, s2=1.6)
    np.testing.assert_allclose(_mass(out), _mass(f), rtol=0, atol=1e-12)
    np.testing.assert_allclose(_mom(out), _mom(f), rtol=0, atol=1e-12)


def test_mrtcg_omega1_conserves_mass():
    from lbm_tpu.models.mrt_cg import cg_equilibrium, mrt_omega1

    f = _rand_f()
    rho_k = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho_k)
    phi = jnp.full((9,), 1.0 / 9.0, jnp.float64)
    eta = jnp.asarray(lat.W, jnp.float64)
    f_eq = cg_equilibrium(rho_k, phi, eta, u)
    s_nu = jnp.full(rho_k.shape, 1.4, jnp.float64)
    out = f + mrt_omega1(f, f_eq, jnp.zeros_like(f), s_nu)
    np.testing.assert_allclose(_mass(out), _mass(f), rtol=0, atol=1e-12)


def test_mrtcg_perturbation_masses_zero():
    from lbm_tpu.models.mrt_cg import xi_perturbation

    g = jnp.asarray(KEYS.uniform(-1.0, 1.0, (2, 16, 24)))
    gn = jnp.sqrt((g * g).sum(axis=0))   # exact norm: xi adds its own eps
    xi = xi_perturbation(g, gn)
    np.testing.assert_allclose(_mass(xi), 0.0, rtol=0, atol=1e-13)


def test_mrtcg_recolour_partitions_total():
    from lbm_tpu.models.mrt_cg import recolour

    f = _rand_f()
    rho = d2q9.calc_rho(f)
    r_rho = rho * jnp.asarray(KEYS.uniform(0.2, 0.8, rho.shape))
    b_rho = rho - r_rho
    kappa = jnp.asarray(KEYS.uniform(-0.1, 0.1, f.shape))
    kappa = kappa - kappa.mean(axis=0, keepdims=True)  # zero-sum direction
    red = recolour(f, r_rho, rho, 0.7, kappa)
    blue = recolour(f, b_rho, rho, -0.7, kappa)
    # colour-blind identity and exact per-colour masses
    np.testing.assert_allclose(np.asarray(red + blue), np.asarray(f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(_mass(red), np.asarray(r_rho), rtol=0,
                               atol=1e-12)


def test_rk_perturbation_mass_zero():
    from lbm_tpu.models.rk_cg import reis_perturbation

    F = jnp.asarray(KEYS.uniform(-1.0, 1.0, (2, 16, 24)))
    Fn = jnp.sqrt((F * F).sum(axis=0)) + 1e-12
    w = reis_perturbation(F, Fn, 1e-3)
    np.testing.assert_allclose(_mass(w), 0.0, rtol=0, atol=1e-13)


def test_guo_source_mass_zero_momentum_exact():
    f = _rand_f()
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    force = jnp.asarray(KEYS.uniform(-1e-3, 1e-3, u.shape))
    omega = 1.3
    S = d2q9.guo_source(u, force, omega)
    np.testing.assert_allclose(_mass(S), 0.0, rtol=0, atol=1e-16)
    np.testing.assert_allclose(_mom(S),
                               (1.0 - 0.5 * omega) * np.asarray(force),
                               rtol=0, atol=1e-16)
