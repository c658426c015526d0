"""Taylor-Green vortex: analytic transient validation.

The reference validates only steady states (Poiseuille parabola) and
qualitative multiphase snapshots (SURVEY.md section 4).  The TGV adds a
time-DEPENDENT analytic gate: on a doubly periodic grid,

    u(x, t) = u0 * TG(x) * exp(-2 nu k^2 t)

so the measured decay rate checks collision + streaming dynamics (viscosity
calibration nu = cs2 (tau - 1/2)) to high accuracy, for both the jnp oracle
and the fused Pallas kernel.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d2q9


def tgv_fields(N: int, u0: float, dtype):
    x = (np.arange(N) + 0.5) * (2.0 * np.pi / N)
    X, Y = np.meshgrid(x, x, indexing="ij")
    ux = u0 * np.cos(X) * np.sin(Y)
    uy = -u0 * np.sin(X) * np.cos(Y)
    k = 2.0 * np.pi / N
    rho = 1.0 - 1.5 * u0 * u0 * 0.5 * (np.cos(2 * X) + np.cos(2 * Y))
    # (weak-compressibility pressure balance: rho = 1 - 3 u0^2/4 (cos2x+cos2y)/... )
    rho = 1.0 - (3.0 * u0 * u0 / 4.0) * (np.cos(2 * X) + np.cos(2 * Y))
    u = jnp.asarray(np.stack([ux, uy]), dtype)
    return jnp.asarray(rho, dtype), u


def run_tgv(N=64, tau=0.8, u0=0.02, steps=400, dtype=jnp.float64, step_fn=None):
    omega = 1.0 / tau
    rho, u = tgv_fields(N, u0, dtype)
    f = d2q9.equilibrium(u, rho)
    if step_fn is None:
        def step_fn(g):
            r = d2q9.calc_rho(g)
            v = d2q9.calc_u(g, r)
            return d2q9.stream(d2q9.bgk_collision(g, d2q9.equilibrium(v, r), omega))
    chunk = jax.jit(lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step_fn(x), g),
                    static_argnums=1)
    f = chunk(f, steps)
    r = d2q9.calc_rho(f)
    v = d2q9.calc_u(f, r)
    return np.asarray(v)


def test_tgv_decay_rate_matches_viscosity():
    N, tau, u0, steps = 64, 0.8, 0.02, 400
    nu = (tau - 0.5) / 3.0
    k = 2.0 * np.pi / N
    v = run_tgv(N, tau, u0, steps)
    amp = np.abs(v[0]).max()
    expected = u0 * math.exp(-2.0 * nu * k * k * steps)
    # nu_eff/nu = 1.0036 at k = 2pi/64 (standard O(k^2) lattice
    # discretisation correction); 1% gate catches real viscosity bugs
    assert amp == pytest.approx(expected, rel=1e-2), (amp, expected)
    # velocity field keeps the TG structure: ux(x, y) ~ cos x sin y
    x = (np.arange(N) + 0.5) * (2.0 * np.pi / N)
    X, Y = np.meshgrid(x, x, indexing="ij")
    shape = np.cos(X) * np.sin(Y)
    corr = (v[0] * shape).sum() / np.sqrt((v[0] ** 2).sum() * (shape ** 2).sum())
    assert corr > 0.9999


def test_tgv_fused_kernel_decay():
    """The fused Pallas kernel (interpret mode, f32) reproduces the same
    analytic decay."""
    from lbm_tpu.kernels.bgk_pallas import make_fused_step

    N, tau, u0, steps = 32, 0.8, 0.02, 100
    nu = (tau - 0.5) / 3.0
    k = 2.0 * np.pi / N
    # interpret mode is slow on 1 CPU core: step without the outer jit chunk
    step = make_fused_step(N, 128, 1.0 / tau, jnp.float32, block_rows=8,
                           interpret=True)
    # non-square: embed TG along rows (period N) in a 32x128 grid with
    # period 128 along cols -> use square-period fields on the cols too
    # index coordinates (half-cell offset); angles are kx*X / ky*Y below
    X, Y = np.meshgrid(np.arange(N) + 0.5, np.arange(128) + 0.5,
                       indexing="ij")
    kx, ky = 2.0 * np.pi / N, 2.0 * np.pi / 128
    # anisotropic Taylor vortex from streamfunction A cos(kx x) cos(ky y):
    # u = (A ky cos sin, -A kx sin cos), with the consistent pressure field
    # (an equilibrium init with rho=1 causes a one-time ~3% amplitude jump)
    U, V = u0 * ky / kx, u0
    ux = U * np.cos(kx * X) * np.sin(ky * Y)
    uy = -V * np.sin(kx * X) * np.cos(ky * Y)
    rho_np = 1.0 - (3.0 / 4.0) * (U * U * np.cos(2 * kx * X)
                                  + V * V * np.cos(2 * ky * Y))
    u = jnp.asarray(np.stack([ux, uy]), jnp.float32)
    rho = jnp.asarray(rho_np, jnp.float32)
    f = d2q9.equilibrium(u, rho)
    for _ in range(steps):
        f = step(f)
    v = np.asarray(d2q9.calc_u(f, d2q9.calc_rho(f)))
    decay = np.abs(v[1]).max() / np.abs(np.asarray(u)[1]).max()
    expected = math.exp(-nu * (kx * kx + ky * ky) * steps)
    assert decay == pytest.approx(expected, rel=0.02), (decay, expected)
