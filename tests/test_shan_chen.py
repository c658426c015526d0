"""Shan-Chen pseudopotential family: physics gates (f64 oracle) and the
fused kernel pinned to the jnp model.

The reference has no pseudopotential model (its multiphase is
colour-gradient, src/colour.cpp) — gates here are the classical
single-component liquid-vapor validations: spinodal decomposition below
the critical coupling, exact conservation, mechanical equilibrium of a
flat interface, and the emergent-surface-tension Laplace law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.models import shan_chen as sc
from lbm_tpu.ops import d2q9

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_phase_separation_below_critical_only():
    """G = -5 < G_c = -4 separates noise into liquid/vapor; G = -3.5
    (above critical) decays back toward uniform."""
    from lbm_tpu.scenes.shan_chen import sc_phase_separation

    r = sc_phase_separation(H=48, W=128, T=3000, G=-5.0, fused=False,
                            dtype=jnp.float64)
    assert r.rho_l / r.rho_v > 4.0, (r.rho_l, r.rho_v)
    # emergent densities bracket the EOS spinodal, not the initial data
    assert r.rho_l > 1.5 and r.rho_v < 0.3

    r0 = sc_phase_separation(H=48, W=128, T=1500, G=-3.5, fused=False,
                             dtype=jnp.float64)
    assert r0.rho_l / r0.rho_v < 1.5, (r0.rho_l, r0.rho_v)


def test_mass_and_momentum_conserved():
    """The paired interaction force conserves global momentum exactly
    (each bond cancels between its endpoints); BGK + Guo conserve
    mass."""
    key = jax.random.PRNGKey(1)
    rho0 = 0.7 + 0.05 * jax.random.normal(key, (32, 128), jnp.float64)
    f = d2q9.equilibrium(jnp.zeros((2, 32, 128), jnp.float64), rho0)
    mass0 = float(d2q9.calc_rho(f).sum())
    step = jax.jit(lambda x: sc.step(x, 1.0, -5.0))
    f = jax.lax.fori_loop(0, 300, lambda _, x: step(x), f)
    mass = float(d2q9.calc_rho(f).sum())
    mom = d2q9.calc_momentum(f)
    assert abs(mass - mass0) / mass0 < 1e-12
    np.testing.assert_allclose(np.asarray(mom.sum(axis=(1, 2))), 0.0,
                               atol=1e-9)


def test_flat_interface_mechanical_equilibrium():
    """Coexisting bulk phases have equal EOS pressure (no curvature, no
    Laplace jump) and the profile is stationary (axis-aligned flat
    interfaces have no spurious currents by symmetry)."""
    from lbm_tpu.scenes.shan_chen import sc_flat_interface

    r = sc_flat_interface(H=128, W=128, T=6000, G=-5.0, fused=False,
                          dtype=jnp.float64)
    assert r.p_jump < 0.02, r.p_jump
    assert r.rho_l > 1.5 and r.rho_v < 0.3
    # interface-relaxation transient: max |u_phys| measured 5.5e-4 at
    # t=6000 decaying to 9.5e-8 by t=24000 (no steady spurious currents
    # on an axis-aligned flat interface); the test stops at 6000 for
    # runtime, gating the decayed-by-then level
    assert float(jnp.abs(r.u).max()) < 1e-3


def _droplet_dp(radius):
    from lbm_tpu.scenes.shan_chen import sc_static_droplet

    r = sc_static_droplet(H=128, W=128, T=6000, radius=radius, G=-5.0,
                          fused=False, dtype=jnp.float64)
    rho = np.asarray(r.rho)
    # effective radius from the liquid area (the droplet re-equilibrates
    # mass, so the final radius is what the Laplace law sees)
    cut = 0.5 * (r.rho_l + r.rho_v)
    area = float((rho > cut).sum())
    return r.dp, np.sqrt(area / np.pi)


def test_laplace_law_emergent_tension():
    """dP * R is the (emergent) surface tension — constant across droplet
    radii; the pseudopotential analog of the reference's imposed-sigma
    droplet gate (mrtcg_static_droplet.cpp:129-180)."""
    dp1, r1 = _droplet_dp(16.0)
    dp2, r2 = _droplet_dp(26.0)
    assert dp1 > 0.0 and dp2 > 0.0
    assert dp1 > dp2  # smaller droplet, larger jump
    sigma1, sigma2 = dp1 * r1, dp2 * r2
    assert abs(sigma1 / sigma2 - 1.0) < 0.15, (sigma1, sigma2)


def test_fused_matches_jnp():
    """The fused kernel (interpret mode) equals the jnp oracle at 1e-13
    in f64, including temporal blocking (substeps 2 and 4: each sweep
    consumes 2 halo rows — stencil + stream)."""
    from lbm_tpu.kernels.shan_chen_pallas import make_sc_fused_step

    R, C = 32, 128
    rng = np.random.default_rng(7)
    rho0 = jnp.asarray(0.7 + 0.1 * rng.standard_normal((R, C)))
    f0 = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), rho0)

    want = f0
    for _ in range(4):
        want = sc.step(want, 1.0, -5.0)

    for substeps in (1, 2, 4):
        step = make_sc_fused_step(R, C, omega=1.0, G=-5.0,
                                  substeps=substeps, dtype=jnp.float64,
                                  interpret=True)
        got = f0
        for _ in range(4 // substeps):
            got = step(got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-13)


@needs_8
def test_sharded_sc_matches_single_chip():
    """Row-sharded (8 ranks, ppermute halos) == single-chip fused kernel
    at 1e-13, substeps=4 (one exchange per 4 steps)."""
    from lbm_tpu.kernels.shan_chen_pallas import make_sc_body
    from lbm_tpu.kernels.sharded_pallas import make_sharded_body_step
    from lbm_tpu.parallel import mesh as meshmod

    R, C = 192, 128
    rng = np.random.default_rng(11)
    rho0 = jnp.asarray(0.7 + 0.1 * rng.standard_normal((R, C)))
    f0 = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), rho0)

    want = f0
    for _ in range(4):
        want = sc.step(want, 1.0, -5.0)

    m = meshmod.make_mesh(shape=(8, 1))
    run = make_sc_body(R, C, omega=1.0, G=-5.0, substeps=4)
    step = make_sharded_body_step(m, 9, R, C, run, dtype=jnp.float64,
                                  block_rows=8, interpret=True)
    got = step(meshmod.shard_state(m, f0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)


def test_maxwell_construction_matches_literature():
    """The equal-area construction on the CS EOS (a=1, b=4) reproduces
    the published coexistence densities (Yuan & Schaefer 2006 table)."""
    rv, rl = sc.maxwell_coexistence(0.7 * sc.CS_TC)
    assert abs(rv / 0.00929 - 1.0) < 0.02, rv
    assert abs(rl / 0.35812 - 1.0) < 0.02, rl
    rv5, rl5 = sc.maxwell_coexistence(0.5 * sc.CS_TC)
    assert abs(rl5 / 0.45407 - 1.0) < 0.02, rl5
    assert rl5 / rv5 > 500.0


def test_cs_high_density_ratio_coexistence():
    """The Carnahan-Starling pseudopotential (velocity-shift forcing)
    holds a density ratio ~65 at T/T_c = 0.7 — far beyond the
    exponential EOS's ~15 — with the liquid branch within 1% of the
    Maxwell construction (the vapor branch under-predicts: the classic
    scheme's thermodynamic inconsistency)."""
    from lbm_tpu.scenes.shan_chen import sc_cs_interface

    r = sc_cs_interface(H=128, W=64, T=12000, T_red=0.7, fused=False,
                        dtype=jnp.float64)
    _, rl = sc.maxwell_coexistence(0.7 * sc.CS_TC)
    assert np.isfinite(np.asarray(r.rho)).all()
    assert abs(r.rho_l / rl - 1.0) < 0.01, (r.rho_l, rl)
    assert r.rho_l / r.rho_v > 40.0, (r.rho_l, r.rho_v)
    assert r.p_jump < 0.02, r.p_jump


def test_cs_fused_matches_jnp():
    """The fused kernel's eos='cs' mode (in-kernel CS psi + velocity-
    shift forcing) equals the jnp oracle at 1e-13 in f64, substeps 1
    and 4."""
    from lbm_tpu.kernels.shan_chen_pallas import (
        make_sc_fused_step, resolve_eos)

    R, C = 32, 128
    T_eos = 0.7 * sc.CS_TC
    rv, rl = sc.maxwell_coexistence(T_eos)
    rng = np.random.default_rng(17)
    rho0 = jnp.asarray(0.5 * (rv + rl)
                       + 0.2 * (rl - rv) * rng.standard_normal((R, C)))
    f0 = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), rho0)

    psi_fn, G, forcing = resolve_eos("cs", None, T_eos, None)
    assert forcing == "shift" and G == -1.0
    want = f0
    for _ in range(4):
        want = sc.step(want, 1.0, G, psi_fn, forcing)

    for substeps in (1, 4):
        step = make_sc_fused_step(R, C, omega=1.0, eos="cs", T=T_eos,
                                  substeps=substeps, dtype=jnp.float64,
                                  interpret=True)
        got = f0
        for _ in range(4 // substeps):
            got = step(got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-13)
