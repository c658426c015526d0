"""3-D scenes (D3Q19) — BEYOND THE REFERENCE (which is strictly 2-D).

Two analytically-gated scenes establish the 3-D extension at the same
quality bar as the 2-D families:

  * ``poiseuille_3d`` — body-forced plane Poiseuille between halfway
    no-slip walls (the 3-D analog of the reference's gravity channel,
    test/gravity_test.cpp, with the z-flow profile parabolic in x);
    validated against the exact discrete-wall parabola.
  * ``taylor_green_3d`` — the z-invariant Taylor-Green vortex, an EXACT
    3-D Navier-Stokes solution: u decays as exp(-2 nu k^2 t) uniformly,
    checking 3-D collision + streaming dynamics (viscosity
    calibration) to high accuracy.

``mesh_shape`` shards the (19, X, Y, Z) state over a device mesh along
(y, z) via GSPMD (XLA inserts the halo collectives for the streaming
rolls) — the 3-D version of the 2-D scenes' sharding story, equality-
tested against single-device runs at 1e-13.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import d3q19
from ..utils.xmath import default_float


@dataclass
class ThreeDResult:
    f: jnp.ndarray           # (19, X, Y, Z)
    rho: jnp.ndarray
    u: jnp.ndarray           # (3, X, Y, Z)
    steps: int
    l2: float | None = None  # analytic-profile error where defined


def _pack(f, X, Y, Z):
    """(19, X, Y, Z) -> the kernel's (19 X, Y, Z) depth-as-planes view."""
    return jnp.transpose(f, (1, 0, 2, 3)).reshape(19 * X, Y, Z)


def _unpack(S, X, Y, Z):
    return jnp.transpose(S.reshape(X, 19, Y, Z), (1, 0, 2, 3))


def _resolve_fused3(fused, dtype, X, Y, Z, substeps):
    """3-D variant of utils.xmath.resolve_fused: the depth-as-planes
    kernel allows row aliasing (no positional masks), so thin-Y grids
    run fused — but X bounds feasibility through VMEM (the 19 X-plane
    slab; d3q19_pallas docstring), so auto only fires when X Z fits."""
    if fused is None:
        import jax

        fits = 4864 * X * Z * (jnp.dtype(dtype).itemsize // 4) \
            <= 12 * 2 ** 20
        fused = (jax.devices()[0].platform != "cpu"
                 and jnp.dtype(dtype) == jnp.float32
                 and Z % 128 == 0 and Y % 8 == 0 and fits)
    if not fused and substeps != 1:
        raise ValueError("substeps requires the fused path")
    return fused


def _drive(step, f, T, n_cells, per_cell=1.2, mesh_shape=None,
           checkpoint_dir=None, checkpoint_every=10000):
    if mesh_shape is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as meshmod

        ny, nz = mesh_shape
        m = meshmod.make_mesh(shape=(ny, nz))
        f = jax.device_put(
            f, NamedSharding(m, P(None, None, "x", "y")))
    from ..utils.observe import drive_chunked

    f, _ = drive_chunked(step, f, T, 0, n_cells, per_cell, None,
                         checkpoint_dir=checkpoint_dir,
                         checkpoint_every=checkpoint_every)
    return f


def poiseuille_3d(X: int = 24, Y: int = 8, Z: int = 8, T: int = 20000,
                  tau: float | None = None, force: float = 1e-6,
                  mesh_shape: tuple[int, int] | None = None,
                  fused: bool | None = None, substeps: int = 1,
                  interpret: bool = False,
                  checkpoint_dir: str | None = None,
                  checkpoint_every: int = 10000,
                  dtype=None) -> ThreeDResult:
    """Body-forced plane Poiseuille: no-slip walls on the x faces,
    periodic y/z, Guo force along z.  Steady analytic profile between
    the halfway walls at -1/2 and X-1/2:

        uz(x) = F/(2 rho nu) (x + 1/2)(X - 1/2 - x)

    ``l2`` is the relative L2 error of the computed profile (the 3-D
    version of the reference's hard accuracy gate,
    horizontal_poiseuille_test.cpp:163-175).  The default tau is the
    magic sqrt(3/16) + 1/2 the reference's channels use, at which the
    halfway bounce-back slip vanishes: measured L2 = 1.4e-11 in f64
    (generic tau, e.g. 0.8, carries the scheme's intrinsic forced-flow
    slip, L2 ~ 1.2e-3 — identical to the 2-D control)."""
    dtype = default_float(dtype)
    tau = float(np.sqrt(3.0 / 16.0) + 0.5) if tau is None else tau
    omega = 1.0 / tau
    nu = (tau - 0.5) / 3.0
    fvec = jnp.asarray([0.0, 0.0, force], dtype)

    def step(f):
        rho = d3q19.calc_rho(f)
        u = d3q19.calc_u(f, rho)
        u = u + 0.5 * fvec[:, None, None, None] / rho[None]
        f_eq = d3q19.equilibrium(u, rho)
        f_coll = d3q19.bgk_collision(f, f_eq, omega) \
            + d3q19.guo_source(u, fvec[:, None, None, None]
                               * jnp.ones_like(rho)[None], omega)
        f_new = d3q19.stream(f_coll)
        f_new = d3q19.bounce_back_x(f_new, f_coll, "lo")
        f_new = d3q19.bounce_back_x(f_new, f_coll, "hi")
        return f_new

    u0 = jnp.zeros((3, X, Y, Z), dtype)
    f = d3q19.equilibrium(u0, jnp.ones((X, Y, Z), dtype))
    fused = _resolve_fused3(fused, dtype, X, Y, Z, substeps)
    if fused:
        from ..kernels.d3q19_pallas import make_d3q19_fused_step

        if mesh_shape is not None:
            raise ValueError("fused=True runs single-chip")
        if T % substeps:
            raise ValueError("T must be divisible by substeps")
        kstep = make_d3q19_fused_step(
            X, Y, Z, omega=omega, force_z=force, x_walls=True,
            substeps=substeps, dtype=dtype, interpret=interpret)
        S = _drive(kstep, _pack(f, X, Y, Z), T // substeps,
                   X * Y * Z, per_cell=0.3 * substeps,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=max(1, checkpoint_every // substeps))
        f = _unpack(S, X, Y, Z)
    else:
        f = _drive(step, f, T, X * Y * Z, mesh_shape=mesh_shape,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=checkpoint_every)

    rho = d3q19.calc_rho(f)
    u = d3q19.calc_u(f, rho)
    u = u + 0.5 * fvec[:, None, None, None] / rho[None]
    prof = np.asarray(u[2]).mean(axis=(1, 2))
    x = np.arange(X)
    exact = force / (2.0 * nu) * (x + 0.5) * (X - 0.5 - x)
    l2 = float(np.sqrt(((prof - exact) ** 2).sum() / (exact ** 2).sum()))
    return ThreeDResult(f=f, rho=rho, u=u, steps=T, l2=l2)


def taylor_green_3d(N: int = 32, T: int = 400, tau: float = 0.8,
                    u0: float = 0.02,
                    mesh_shape: tuple[int, int] | None = None,
                    fused: bool | None = None, substeps: int = 1,
                    interpret: bool = False,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 10000,
                    dtype=None) -> ThreeDResult:
    """z-invariant Taylor-Green vortex on a triply periodic N^3 box —
    an exact 3-D Navier-Stokes solution with uniform decay
    exp(-2 nu k^2 t), k = 2 pi / N.  ``l2`` is the relative error of
    the decayed velocity field vs the analytic solution at t = T."""
    dtype = default_float(dtype)
    omega = 1.0 / tau
    nu = (tau - 0.5) / 3.0
    k = 2.0 * np.pi / N

    x = (np.arange(N) + 0.5) * k
    Xg, Yg = np.meshgrid(x, x, indexing="ij")
    ux2 = u0 * np.cos(Xg) * np.sin(Yg)
    uy2 = -u0 * np.sin(Xg) * np.cos(Yg)
    rho2 = 1.0 - (3.0 * u0 * u0 / 4.0) * (np.cos(2 * Xg)
                                          + np.cos(2 * Yg))
    u_init = np.zeros((3, N, N, N))
    u_init[0] = ux2[:, :, None]
    u_init[1] = uy2[:, :, None]
    rho0 = np.broadcast_to(rho2[:, :, None], (N, N, N))

    def step(f):
        rho = d3q19.calc_rho(f)
        u = d3q19.calc_u(f, rho)
        return d3q19.stream(d3q19.bgk_collision(
            f, d3q19.equilibrium(u, rho), omega))

    f = d3q19.equilibrium(jnp.asarray(u_init, dtype),
                          jnp.asarray(rho0, dtype))
    fused = _resolve_fused3(fused, dtype, N, N, N, substeps)
    if fused:
        from ..kernels.d3q19_pallas import make_d3q19_fused_step

        if mesh_shape is not None:
            raise ValueError("fused=True runs single-chip")
        if T % substeps:
            raise ValueError("T must be divisible by substeps")
        kstep = make_d3q19_fused_step(
            N, N, N, omega=omega, substeps=substeps, dtype=dtype,
            interpret=interpret)
        S = _drive(kstep, _pack(f, N, N, N), T // substeps, N ** 3,
                   per_cell=0.3 * substeps,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=max(1, checkpoint_every // substeps))
        f = _unpack(S, N, N, N)
    else:
        f = _drive(step, f, T, N ** 3, mesh_shape=mesh_shape,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=checkpoint_every)

    rho = d3q19.calc_rho(f)
    u = d3q19.calc_u(f, rho)
    decay = np.exp(-2.0 * nu * k * k * T)
    exact = u_init * decay
    num = ((np.asarray(u) - exact) ** 2).sum()
    den = (exact ** 2).sum()
    return ThreeDResult(f=f, rho=rho, u=u, steps=T,
                        l2=float(np.sqrt(num / den)))


def lid_cavity_3d(X: int = 8, Y: int = 64, Z: int = 128, T: int = 20000,
                  Re: float = 100.0, u_lid: float = 0.05,
                  x_walls: bool = True,
                  mesh_shape: tuple[int, int] | None = None,
                  fused: bool | None = None, substeps: int = 1,
                  interpret: bool = False,
                  checkpoint_dir: str | None = None,
                  checkpoint_every: int = 10000,
                  dtype=None) -> ThreeDResult:
    """3-D lid-driven cavity: no-slip on every face except the
    y = Y - 1/2 lid sliding along +z at ``u_lid``; viscosity from
    ``Re = u_lid Z / nu``.  ``x_walls=False`` makes x periodic — the
    flow is then exactly x-invariant (the quasi-2-D degeneracy
    tests/test_d3q19.py gates at machine precision), the 3-D analog of
    the z-invariant Taylor-Green embedding.  With ``x_walls=True`` the
    end walls brake the core vortex — the genuinely 3-D benchmark
    geometry (Ku/Shankar class); the dynamics are mirror-symmetric in x
    (gated).

    BC write order (x wiring, then y faces, then z faces — z wins the
    shared edges) matches kernels.d3q19_pallas exactly; corners of the
    lid face belong to the side walls (the halfway-wall convention the
    2-D cavity kernels use)."""
    dtype = default_float(dtype)
    nu = u_lid * Z / Re
    tau = 3.0 * nu + 0.5
    omega = 1.0 / tau
    lid = (0.0, 0.0, u_lid)

    def step(f):
        rho = d3q19.calc_rho(f)
        u = d3q19.calc_u(f, rho)
        f_coll = d3q19.bgk_collision(f, d3q19.equilibrium(u, rho), omega)
        f_new = d3q19.stream(f_coll)
        if x_walls:
            f_new = d3q19.bounce_back(f_new, f_coll, 0, "lo")
            f_new = d3q19.bounce_back(f_new, f_coll, 0, "hi")
        f_new = d3q19.bounce_back(f_new, f_coll, 1, "lo")
        f_new = d3q19.bounce_back(f_new, f_coll, 1, "hi", u_wall=lid)
        f_new = d3q19.bounce_back(f_new, f_coll, 2, "lo")
        f_new = d3q19.bounce_back(f_new, f_coll, 2, "hi")
        return f_new

    u0 = jnp.zeros((3, X, Y, Z), dtype)
    f = d3q19.equilibrium(u0, jnp.ones((X, Y, Z), dtype))
    fused = _resolve_fused3(fused, dtype, X, Y, Z, substeps)
    if fused:
        from ..kernels.d3q19_pallas import make_d3q19_fused_step

        if mesh_shape is not None:
            raise ValueError("fused=True runs single-chip")
        if T % substeps:
            raise ValueError("T must be divisible by substeps")
        kstep = make_d3q19_fused_step(
            X, Y, Z, omega=omega, x_walls=x_walls, y_walls=True,
            z_walls=True, lid_u=u_lid, substeps=substeps, dtype=dtype,
            interpret=interpret)
        S = _drive(kstep, _pack(f, X, Y, Z), T // substeps,
                   X * Y * Z, per_cell=0.35 * substeps,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=max(1, checkpoint_every // substeps))
        f = _unpack(S, X, Y, Z)
    else:
        f = _drive(step, f, T, X * Y * Z, mesh_shape=mesh_shape,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=checkpoint_every)

    rho = d3q19.calc_rho(f)
    u = d3q19.calc_u(f, rho)
    return ThreeDResult(f=f, rho=rho, u=u, steps=T)
