"""Ring (square-annulus) forced cavity — the domain-decomposition showcase.

The reference's decompose_domain_loop.cpp splits a square annulus around a
solid 256x256 block into 4 manually-bound subdomains (A/B/C/D strips with
inline edge copies, :232-261) and drives a circulation with a Guo-forced
strip (:65-68,156-163).  TPU-native equivalent: ONE global grid with the
block as interior bounce-back walls, sharded over the device mesh — the
"binding" is what sharded streaming does automatically (XLA collective
permutes / parallel.halo).  Cut-equivalence (sharded == single-device) is
asserted bitwise in tests/test_parallel.py, replacing the reference's
A/B-vs-single-domain comparison (SURVEY.md section 4.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..boundary import bc
from ..ops import d2q9
from ..parallel import mesh as meshmod, sharded
from ..utils.xmath import default_float, launch_cap, resolve_fused


@dataclass
class CavityResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    steps: int


def _block_wall_assignments(L: int):
    """Interior bounce-back on the four faces of the central block
    [L/4, 3L/4) x [L/4, 3L/4).  Face lines sit on the first solid cells;
    outgoing-into-solid populations of the adjacent fluid get reflected,
    the same halfway rule the reference applies at its strip edges."""
    a, b = L // 4, 3 * L // 4
    rows = slice(a, b)
    cols = slice(a, b)
    out = []
    # left face (col a): fluid at cols < a; reflect (2,5,6) like a colN wall
    out += [(4, (rows, a), 2, 1.0), (7, (rows, a), 5, 1.0), (8, (rows, a), 6, 1.0)]
    # right face (col b-1): reflect (4,7,8) like a col0 wall
    out += [(2, (rows, b - 1), 4, 1.0), (5, (rows, b - 1), 7, 1.0), (6, (rows, b - 1), 8, 1.0)]
    # top face (row a): fluid above; reflect (1,5,8) like a rowN wall
    out += [(3, (a, cols), 1, 1.0), (7, (a, cols), 5, 1.0), (6, (a, cols), 8, 1.0)]
    # bottom face (row b-1): reflect (3,6,7) like a row0 wall
    out += [(1, (b - 1, cols), 3, 1.0), (5, (b - 1, cols), 7, 1.0), (8, (b - 1, cols), 6, 1.0)]
    return out


def ring_cavity(L: int = 512, T: int = 1000, force: float = 3e-3,
                tau: float | None = None, mesh_shape: tuple[int, int] | None = None,
                fused: bool | None = None, substeps: int = 1,
                interpret: bool = False,
                dtype=None) -> CavityResult:
    """Force-driven circulation in a square annulus of width L/4.

    Workload parity: L=512, tau=sqrt(3/16)+1/2, F=(3e-3, 0) applied on rows
    [L/4+5, L/4+55) of the left strip (decompose_domain_loop.cpp:41-78).
    Pass ``mesh_shape`` to run the same step sharded over a device mesh
    (GSPMD; XLA inserts the halo collectives).  ``fused=True`` (f32,
    L%128==0) runs the step as one Pallas launch (kernels.cavity_pallas).

    Stability envelope (measured): the reference's F=3e-3 is super-critical
    — continuous forcing accelerates the annulus past lattice validity
    (max|u| > 0.5 by t=500; NaN by t~2500 in f32 AND ~2000 in f64, so the
    reference's own 50k-step run cannot have produced finite fields).
    F=3e-5 gives a steady circulation over the full 50k steps
    (max|u| = 0.023, anti-symmetric arm flow +-1.07e-2).  Runs that
    outlive the measured envelope warn up front (the NaN watchdog will
    stop them); pass force=3e-5 for long runs."""
    dtype = default_float(dtype)
    if force >= 1e-3 and T > 1500:
        import warnings

        warnings.warn(
            f"ring_cavity: F={force:g} is super-critical (reference "
            "workload quirk, decompose_domain_loop.cpp:41-78) — fields go "
            "non-finite by t~2000-2500; use force=3e-5 for T > 1500",
            stacklevel=2)
    if fused is None and mesh_shape is not None:
        fused = False  # auto never overrides an explicit sharded request
    fused = resolve_fused(fused, dtype, rows=L, cols=L)
    import math

    tau = tau if tau is not None else math.sqrt(3.0 / 16.0) + 0.5
    omega = 1.0 / tau
    a = L // 4

    if fused:
        if mesh_shape is not None:
            raise ValueError("fused=True runs single-chip; for a sharded "
                             "run use mesh_shape without fused")
        from ..kernels.cavity_pallas import make_cavity_fused_step

        if T % substeps:
            raise ValueError("T must be divisible by substeps")
        kstep = make_cavity_fused_step(L, omega=omega, force=force,
                                       substeps=substeps, dtype=dtype,
                                       interpret=interpret)
        f = d2q9.equilibrium(jnp.zeros((2, L, L), dtype),
                             jnp.ones((L, L), dtype))
        chunk = jax.jit(
            lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: kstep(x), s),
            static_argnums=1)
        done = 0
        calls = T // substeps  # each kernel call advances substeps
        while done < calls:
            n = min(launch_cap(L * L, 0.12 * substeps), calls - done)
            f = chunk(f, n)
            done += n
        rho = d2q9.calc_rho(f)
        return CavityResult(f=f, rho=rho, u=d2q9.calc_u(f, rho), steps=T)
    if substeps != 1:
        raise ValueError("substeps requires the fused path")
    fg = jnp.asarray([force, 0.0], dtype)
    frows = slice(a + 5, a + 55)
    fcols = slice(0, a)
    block = _block_wall_assignments(L)

    def step(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        # force as a velocity shift on the strip (decompose_domain_loop:117)
        u = u.at[:, frows, fcols].add(fg[:, None, None])
        f_equi = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)
        # Guo source on the strip only (:156-163), standard coefficients
        src = d2q9.guo_source(u[:, frows, fcols], fg, omega)
        f_coll = f_coll.at[:, frows, fcols].add(src)
        f_new = d2q9.stream(f_coll)
        # outer walls no-slip
        f_new = bc.bounce_back(f_new, f_coll, "row0")
        f_new = bc.bounce_back(f_new, f_coll, "rowN")
        f_new = bc.bounce_back(f_new, f_coll, "col0")
        f_new = bc.bounce_back(f_new, f_coll, "colN")
        # block faces no-slip
        f_new = bc.obstacle_bounce_back(f_new, f_coll, block)
        return f_new

    f = d2q9.equilibrium(jnp.zeros((2, L, L), dtype), jnp.ones((L, L), dtype))
    if mesh_shape is not None:
        m = meshmod.make_mesh(shape=mesh_shape)
        f = meshmod.shard_state(m, f)
        chunk = sharded.auto_sharded(step, m)
    else:
        chunk = jax.jit(
            lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), s),
            static_argnums=1)
    done = 0
    while done < T:
        n = min(1000, T - done)
        f = chunk(f, n)
        done += n
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    return CavityResult(f=f, rho=rho, u=u, steps=T)
