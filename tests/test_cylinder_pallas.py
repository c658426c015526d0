"""Fused free-stream/cylinder kernel vs the jnp scene step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.boundary import bc
from lbm_tpu.kernels.cylinder_pallas import make_cylinder_fused_step
from lbm_tpu.ops import d2q9
from lbm_tpu.ops.ibm import IBM

W_GUO = (1.0 / 3.0, 1.0 / 9.0)


def _oracle_step(f, F_full, omega, u_w):
    """The cylinder_flow jnp step body with a precomputed full-grid force."""
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    f_coll = d2q9.bgk_collision(f, d2q9.equilibrium(u, rho), omega)
    S = d2q9.guo_source(u, F_full, omega, ics2=W_GUO[0], ics4=W_GUO[1])
    f_coll = f_coll + S
    f_new = d2q9.stream(f_coll)
    f_new = bc.anti_bounce_back(f_new, f_coll, "row0", u_w)
    f_new = bc.anti_bounce_back(f_new, f_coll, "rowN", u_w)
    f_new = bc.specular(f_new, f_coll, "colN")
    f_new = bc.specular(f_new, f_coll, "col0")
    return f_new


def test_cylinder_kernel_matches_oracle():
    R, C = 64, 128
    omega = 1.0 / 0.55
    u_stream = 0.05
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    F = jnp.zeros((2, R, C), jnp.float32)
    F = F.at[:, 20:36, 50:66].set(
        jnp.asarray(rng.normal(0, 1e-3, (2, 16, 16)), jnp.float32))
    u_w = jnp.asarray([u_stream, 0.0], jnp.float64)

    step = make_cylinder_fused_step(R, C, omega, u_wall=(u_stream, 0.0),
                                    block_rows=8, interpret=True)
    got = step(f, F)
    want = _oracle_step(f.astype(jnp.float64), F.astype(jnp.float64),
                        omega, u_w).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ibm_forcing_kernel_matches_oracle():
    """The fused multi-direct-forcing kernel (separable-weight matmuls,
    aliased F carry) equals ops.ibm.force_density_roi to f64 round-off,
    and preserves the zeros-outside-window carry invariant."""
    from lbm_tpu.kernels.ibm_pallas import make_ibm_forcing_step

    H, W = 64, 256
    ib = IBM.circle(30.0, 130.0, 9.0, 40)
    fn = make_ibm_forcing_step(H, W, ib, dtype=jnp.float64, interpret=True)
    assert fn is not None
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(0.05 * rng.standard_normal((2, H, W)))
    rho0 = jnp.asarray(1.0 + 0.01 * rng.standard_normal((H, W)))
    f = d2q9.equilibrium(u0, rho0)
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    want = np.zeros((2, H, W))
    r0, r1 = ib.roi_rows
    c0, c1 = ib.roi_cols
    want[:, r0:r1, c0:c1] = np.asarray(ib.eulerian_force_density(u, rho))
    got = np.asarray(fn(f, jnp.zeros((2, H, W))))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)
    # carry: rewriting only the window leaves the rest untouched
    np.testing.assert_allclose(np.asarray(fn(f, jnp.asarray(got))), got,
                               rtol=0, atol=0)


def test_cylinder_scene_fused_matches_jnp():
    """Short fused cylinder_flow run (both Pallas kernels, interpret mode)
    vs the plain jnp path (f32 both)."""
    from lbm_tpu.scenes import obstacles

    kwargs = dict(H=64, W=128, T=20, center=(30.0, 60.0), radius=10.0,
                  n_markers=24)
    rf = obstacles.cylinder_flow(fused=True, interpret=True, **kwargs)
    rj = obstacles.cylinder_flow(fused=False, dtype=jnp.float32, **kwargs)
    np.testing.assert_allclose(np.asarray(rf.u), np.asarray(rj.u),
                               rtol=5e-4, atol=5e-6)
    # Fy is ~0 by symmetry; 3e-6 absolute covers its f32 accumulation
    # noise (the separable-matmul forcing sums in a different order)
    np.testing.assert_allclose(np.asarray(rf.surface_force),
                               np.asarray(rj.surface_force),
                               rtol=5e-4, atol=3e-6)
