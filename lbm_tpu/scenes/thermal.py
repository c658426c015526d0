"""Thermal convection: Rayleigh-Benard in a periodic slot.

BEYOND THE REFERENCE: cristian-jfv/lattice-boltzmann-method has no
thermal model at all.  This scene composes capabilities the framework
already ships for reference workloads — the coupled two-distribution
step of rectangle_sedimentation (test/rectangle_sedimentation_test.cpp:
57-60,123-145: fluid f + ADE scalar g), the ADE Dirichlet wall
(:204-218), the Guo body-force source with the ``u += F/(2 rho)``
velocity shift (mrtcg_rayleigh_taylor.cpp:460-477), and halfway
bounce-back walls (horizontal_poiseuille_test.cpp:146-152) — into the
standard double-distribution Boussinesq scheme:

  fluid  f: D2Q9 BGK, buoyancy force F = (g_beta * theta, 0) along rows
  scalar g: D2Q9 ADE for the temperature deviation theta, advected at
            the fluid velocity (Sc -> Pr coupling, two-way)

Geometry: rows = vertical (row 0 = hot bottom wall theta=+1/2, row H-1
= cold top wall theta=-1/2, both no-slip), columns periodic.  Control
parameters are the Rayleigh and Prandtl numbers,

  Ra = g_beta * dT * H^3 / (nu * kappa),   Pr = nu / kappa,

with kappa = cs2 (tau_g - 1/2) set by ``tau_g`` and nu = Pr * kappa.

f32 error budget (measured, 32x64 Ra=1e4 vs the f64 oracle): after
2000 steps |dtheta| = 1.3e-5, |du| = 5.3e-6; the saturated Nusselt
number agrees to 3e-5 (2.47583 vs 2.47580) — the production f32 path
carries the thermal physics at full fidelity.

Linear-stability onset for rigid-rigid walls is Ra_c = 1707.76 at
wavenumber k_c = 3.117/H (Chandrasekhar), i.e. critical wavelength
2.016 H — a periodic box of W = 2 H quantises the first admissible
mode to k = pi/H = 3.1416/H, within 1% of k_c, which makes the onset
sharp and testable (tests/test_thermal.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary import bc
from ..core import lattice as lat
from ..ops import d2q9
from ..utils.observe import drive_chunked
from ..utils.xmath import default_float, resolve_fused

CS2 = 1.0 / 3.0


@dataclass
class ThermalResult:
    f: jnp.ndarray           # (9, H, W) fluid populations
    g: jnp.ndarray           # (9, H, W) temperature populations
    rho: jnp.ndarray
    u: jnp.ndarray           # (2, H, W) incl. the half-force shift
    theta: jnp.ndarray       # (H, W) temperature deviation
    nusselt: float           # volume-averaged Nusselt number
    steps: int
    series: object = None    # (T//record_every, 3): Nu, u_rms, theta_max
    snapshots: dict | None = None  # {ux, uy, theta} stacks (snapshot_every)


def conduction_profile(H: int, dtype=np.float64):
    """Steady pure-conduction profile through the cell centres: the
    halfway walls sit at rows -1/2 and H-1/2, so theta(i) linearly
    interpolates the wall values +-1/2 at i + 1/2."""
    x = (np.arange(H, dtype=np.float64) + 0.5) / H
    return np.asarray(0.5 - x, dtype)


def nusselt_number(u_rows, theta, kappa: float, H: int):
    """Nu = 1 + <u_x theta> / (kappa dT / H), volume-averaged: the ratio
    of total (advective + conductive) to conductive heat transport for
    the unit temperature drop dT = 1 across height H."""
    return 1.0 + jnp.mean(u_rows * theta) * H / kappa


def _capped_calls(step, n_cells: int, per_cell_ns: float, substeps: int):
    """``chunk(carry, n_steps)`` advancing in launch-capped slices (the
    axon relay hangs on single launches past ~2 s; CLAUDE.md), where
    each kernel call advances ``substeps`` steps."""
    from ..utils.xmath import launch_cap

    inner = jax.jit(
        lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
        static_argnums=1)

    def chunk(carry, n_steps):
        calls = n_steps // substeps
        while calls > 0:
            k = min(launch_cap(n_cells, per_cell_ns), calls)
            carry = inner(carry, k)
            calls -= k
        return carry

    return chunk


def _make_thermal_recorder(cadence: int, unpack, g_beta, prefix):
    """Field-snapshot recorder (ux, uy, theta at the cadence instants,
    t=0 included) — the reference drivers' snapshot convention
    (free_stream_test.cpp:79-88) with theta in place of the pressure."""
    from .channel import SnapshotRecorder

    def fields(carry):
        fc, gc = unpack(carry)
        rho = d2q9.calc_rho(fc)
        th = d2q9.calc_rho(gc)
        u = d2q9.calc_u(fc, rho)
        u = u + 0.5 * jnp.stack([g_beta * th, jnp.zeros_like(th)]) / rho
        return {"ux": u[0], "uy": u[1], "theta": th}

    return SnapshotRecorder(cadence, fields, prefix)


def d2q5_equilibrium(u, theta):
    """D2Q5 scalar equilibrium w_k theta (1 + 3 c.u + 4.5 (c.u)^2 -
    1.5 u.u) on the rest + axis directions (lattice.W5; mass and first
    moment exact — the quadratic terms cancel under the D2Q5 weights)."""
    from ..utils.xmath import tdot

    c5 = jnp.asarray(lat.C[:, :5], u.dtype)
    w5 = jnp.asarray(lat.W5, u.dtype)[:, None, None]
    cu = tdot(c5.T, u, axes=([1], [0]))
    uu = (u * u).sum(axis=0)
    return w5 * theta * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu)


def d2q5_stream(g):
    """Periodic push streaming on the 5 scalar planes."""
    out = [g[0]]
    for k in range(1, 5):
        out.append(jnp.roll(g[k], (int(lat.C[0, k]), int(lat.C[1, k])),
                            axis=(0, 1)))
    return jnp.stack(out)


def make_rb_step(H: int, W: int, *, omega_f: float, omega_g: float,
                 g_beta: float, dtype=jnp.float32,
                 scalar_lattice: str = "d2q9"):
    """Pure-jnp Rayleigh-Benard step: carry (f, g) -> (f, g).

    Order per step (the reference's collide -> stream -> wall-overwrite
    sequence, SURVEY.md section 0): macroscopics with the Guo half-force
    shift, both collisions (+ Guo source on f), periodic streaming, then
    the row walls — fluid halfway bounce-back, temperature ADE-Dirichlet
    anti-bounce-back with 2 g_eq at the resting wall values +-1/2.

    ``scalar_lattice='d2q5'`` carries the temperature on 5 populations
    instead of 9 (lattice.W5) — same advection-diffusion physics
    (measured Nu 2.666 vs d2q9's 2.658 vs Clever-Busse's 2.661 at
    Ra=1e4 on 32x64), 4 fewer planes of HBM traffic per coupled step.
    """
    q5 = scalar_lattice == "d2q5"
    if not q5 and scalar_lattice != "d2q9":
        raise ValueError(f"unknown scalar_lattice {scalar_lattice!r}")
    # resting-wall ADE equilibria w_k * theta_w (bc.ade_dirichlet applies
    # the doubling: g_new = -g_coll + 2 g_eq_wall)
    w9 = jnp.asarray(lat.W, dtype)[:, None]
    g_eq_hot = 0.5 * w9 * jnp.ones((1, W), dtype)
    g_eq_cold = -g_eq_hot
    w5w = 1.0 / 6.0

    def step(carry):
        f, g = carry
        rho = d2q9.calc_rho(f)
        theta = g.sum(axis=0)
        u = d2q9.calc_u(f, rho)
        force = jnp.stack([g_beta * theta, jnp.zeros_like(theta)])
        u = u + 0.5 * force / rho
        f_eq = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_eq, omega_f) \
            + d2q9.guo_source(u, force, omega_f)
        f_new = d2q9.stream(f_coll)
        f_new = bc.bounce_back(f_new, f_coll, "row0")
        f_new = bc.bounce_back(f_new, f_coll, "rowN")

        if q5:
            g_coll = d2q9.bgk_collision(g, d2q5_equilibrium(u, theta),
                                        omega_g)
            g_new = d2q5_stream(g_coll)
            # halfway ADE Dirichlet, incoming-only (1 direction per wall)
            g_new = g_new.at[1, 0].set(-g_coll[3, 0] + 2.0 * w5w * 0.5)
            g_new = g_new.at[3, -1].set(-g_coll[1, -1]
                                        + 2.0 * w5w * (-0.5))
        else:
            g_coll = d2q9.bgk_collision(g, d2q9.equilibrium(u, theta),
                                        omega_g)
            g_new = d2q9.stream(g_coll)
            g_new = bc.ade_dirichlet(g_new, g_coll, "row0", g_eq_hot,
                                     incoming_only=True)
            g_new = bc.ade_dirichlet(g_new, g_coll, "rowN", g_eq_cold,
                                     incoming_only=True)
        return f_new, g_new

    return step


def rayleigh_benard(H: int = 64, W: int = 128, T: int = 20000,
                    Ra: float = 1e4, Pr: float = 0.71,
                    tau_g: float = 0.8, amp: float = 1e-3,
                    record_every: int = 0, substeps: int = 1,
                    snapshot_every: int = 0,
                    snapshot_prefix: str | None = None,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 10000,
                    mesh_shape: tuple[int, int] | None = None,
                    scalar_lattice: str = "d2q9",
                    fused: bool | None = None, interpret: bool = False,
                    dtype=None) -> ThermalResult:
    """Rayleigh-Benard convection between a hot bottom and cold top wall.

    Initial state: the pure-conduction profile plus a single-roll
    perturbation ``amp * cos(2 pi y / W) * sin(pi (x + 1/2) / H)`` on
    theta.  Below Ra_c = 1708 the perturbation decays diffusively;
    above, convection rolls grow and saturate, and ``nusselt`` exceeds 1
    (Clever & Busse 1974: Nu ~ 2.66 at Ra = 1e4, Pr = 0.71 for the
    critical roll).

    ``record_every`` > 0 records (Nu, u_rms, theta_max) every k steps.
    ``fused=True`` (f32, W % 128 == 0) runs the coupled step as one
    Pallas launch (kernels.thermal_pallas); ``substeps`` (fused only)
    advances that many steps per launch — temporal blocking that cuts
    the HBM-bound kernel's per-step traffic by ~substeps (T and
    record_every must be divisible by it).

    ``mesh_shape`` runs the jnp step sharded over an (nx, ny) device
    mesh (GSPMD inserts the halo collectives; same pattern as
    ring_cavity).  For the production multi-chip path use the explicit
    sharded fused kernels directly:
    kernels.sharded_pallas.make_sharded_thermal_step (1-D, up to 8
    steps per ICI exchange) or sharded2d_pallas.
    make_sharded2d_thermal_step (rows x cols).
    """
    dtype = default_float(dtype)
    kappa = CS2 * (tau_g - 0.5)
    nu = Pr * kappa
    tau_f = nu / CS2 + 0.5
    omega_f = 1.0 / tau_f
    omega_g = 1.0 / tau_g
    g_beta = Ra * nu * kappa / float(H) ** 3

    x = (np.arange(H) + 0.5) / H
    y = np.arange(W) / W
    theta0 = (conduction_profile(H)[:, None]
              + amp * np.sin(np.pi * x)[:, None]
              * np.cos(2.0 * np.pi * y)[None, :])
    theta0 = jnp.asarray(theta0, dtype)
    u0 = jnp.zeros((2, H, W), dtype)
    f = d2q9.equilibrium(u0, jnp.ones((H, W), dtype))
    q5 = scalar_lattice == "d2q5"
    g = d2q5_equilibrium(u0, theta0) if q5 \
        else d2q9.equilibrium(u0, theta0)

    if fused is None and mesh_shape is not None:
        fused = False  # auto never overrides an explicit sharded request
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    if mesh_shape is not None:
        if fused:
            raise ValueError("fused=True runs single-chip; use the "
                             "sharded fused factories for multi-chip")
        if record_every or snapshot_every or checkpoint_dir:
            raise ValueError("record/snapshot/checkpoint are single-chip "
                             "only; run mesh_shape without them")
    if snapshot_every and checkpoint_dir:
        raise ValueError("snapshot_every and checkpoint_dir are "
                         "mutually exclusive (one drive mode per run)")
    if fused:
        from ..kernels.thermal_pallas import make_thermal_fused_step

        if T % substeps or (record_every and record_every % substeps):
            raise ValueError("T and record_every must be divisible by "
                             "substeps")
        kstep = make_thermal_fused_step(
            H, W, omega_f=omega_f, omega_g=omega_g, g_beta=g_beta,
            substeps=substeps, dtype=dtype, interpret=interpret,
            scalar_lattice=scalar_lattice)
        step = lambda S: kstep(S)                       # noqa: E731
        carry = jnp.concatenate([f, g], axis=0)
        unpack = lambda S: (S[:9], S[9:])               # noqa: E731
    else:
        if substeps != 1:
            raise ValueError("substeps requires the fused path")
        step = make_rb_step(H, W, omega_f=omega_f, omega_g=omega_g,
                            g_beta=g_beta, dtype=dtype,
                            scalar_lattice=scalar_lattice)
        carry = (f, g)
        unpack = lambda c: c                            # noqa: E731

    def record(c):
        fc, gc = unpack(c)
        rho = d2q9.calc_rho(fc)
        th = d2q9.calc_rho(gc)
        u = d2q9.calc_u(fc, rho)
        u = u + 0.5 * jnp.stack([g_beta * th, jnp.zeros_like(th)]) / rho
        return jnp.stack([nusselt_number(u[0], th, kappa, H),
                          jnp.sqrt(jnp.mean(u * u)),
                          jnp.abs(th).max()])

    snapshots = None
    if mesh_shape is not None:
        from ..parallel import mesh as meshmod
        from ..parallel.sharded import auto_sharded
        from ..utils.observe import check_finite
        from ..utils.xmath import launch_cap

        m = meshmod.make_mesh(shape=mesh_shape)
        carry = meshmod.shard_state(m, carry)
        chunk = auto_sharded(step, m)
        done = 0
        while done < T:
            n = min(launch_cap(H * W, 0.6), T - done)
            carry = chunk(carry, n)
            done += n
            check_finite(carry[0], done)
        series = None
    elif snapshot_every:
        if record_every:
            raise ValueError("snapshot_every and record_every are "
                             "mutually exclusive")
        if snapshot_every % substeps:
            raise ValueError("snapshot_every must be divisible by "
                             "substeps")
        recorder = _make_thermal_recorder(
            snapshot_every, unpack, g_beta, snapshot_prefix)
        carry = recorder.run(
            _capped_calls(step, H * W,
                          0.15 * substeps if fused else 0.6, substeps),
            carry, T)
        series = None
        snapshots = recorder.result()
    elif checkpoint_dir:
        # long-run path: periodic atomic checkpoints, resume from the
        # newest one in the directory (io.checkpoint; same semantics as
        # mrtcg_rayleigh_taylor's flagship integration)
        if record_every:
            raise ValueError("checkpointing composes with plain runs "
                             "only (no record_every)")
        from ..io.checkpoint import Checkpointer
        from ..utils.observe import check_finite
        from ..utils.xmath import launch_cap

        ckpt = Checkpointer(checkpoint_dir, every=checkpoint_every)
        restored, at = ckpt.restore_latest(carry)
        done = 0
        if restored is not None:
            carry = jax.tree.map(jnp.asarray, restored)
            done = int(at)
            if done % substeps:
                raise ValueError(
                    f"checkpoint at step {done} is not divisible by "
                    f"substeps={substeps}; resume with the substeps the "
                    "run was started with")
            if done > T:
                raise ValueError(
                    f"newest checkpoint in {checkpoint_dir} is at step "
                    f"{done} > T={T}; pass a larger T or a fresh "
                    "directory")
        chunk = jax.jit(
            lambda c, n: jax.lax.fori_loop(
                0, n, lambda _, x: step(x), c),
            static_argnums=1)
        per_cell = 0.15 * substeps if fused else 0.6
        last = done
        calls_total = T // substeps
        done_calls = done // substeps
        while done_calls < calls_total:
            to_ckpt = -(-(last + checkpoint_every
                          - done_calls * substeps) // substeps)
            n = max(1, min(launch_cap(H * W, per_cell),
                           calls_total - done_calls, to_ckpt))
            carry = chunk(carry, n)
            done_calls += n
            done = done_calls * substeps
            check_finite(carry[0], done)
            if done - last >= checkpoint_every:
                ckpt.force_save(done, jax.tree.map(np.asarray, carry))
                last = done
        series = None
    else:
        per_cell = 0.15 * substeps if fused else 0.6
        carry, series = drive_chunked(step, carry, T // substeps,
                                      record_every // substeps, H * W,
                                      per_cell, record)
    f, g = unpack(carry)
    rho = d2q9.calc_rho(f)
    theta = d2q9.calc_rho(g)
    u = d2q9.calc_u(f, rho)
    u = u + 0.5 * jnp.stack([g_beta * theta,
                             jnp.zeros_like(theta)]) / rho
    nu_now = float(nusselt_number(u[0], theta, kappa, H))
    return ThermalResult(f=f, g=g, rho=rho, u=u, theta=theta,
                         nusselt=nu_now, steps=T, series=series,
                         snapshots=snapshots)


def make_cavity_step(H: int, W: int, *, omega_f: float, omega_g: float,
                     g_beta: float, dtype=jnp.float32,
                     scalar_lattice: str = "d2q9"):
    """Differentially heated cavity step: carry (f, g) -> (f, g).

    Geometry: hot left wall (col 0, theta=+1/2), cold right wall
    (col W-1, theta=-1/2), adiabatic top/bottom rows; gravity along
    rows, so buoyancy drives a single circulation cell.  All four walls
    no-slip halfway bounce-back for the fluid; the temperature walls
    are halfway ADE-Dirichlet on the columns and plain bounce-back
    (zero normal flux = adiabatic) on the rows.

    ``scalar_lattice='d2q5'`` carries the temperature on 5 populations
    (see make_rb_step): one incoming direction per column wall, axis
    bounce-back on the adiabatic rows.
    """
    q5 = scalar_lattice == "d2q5"
    if not q5 and scalar_lattice != "d2q9":
        raise ValueError(f"unknown scalar_lattice {scalar_lattice!r}")
    w9 = jnp.asarray(lat.W, dtype)[:, None]
    g_eq_hot = 0.5 * w9 * jnp.ones((1, H), dtype)
    g_eq_cold = -g_eq_hot
    w5w = 1.0 / 6.0

    def step(carry):
        f, g = carry
        rho = d2q9.calc_rho(f)
        theta = g.sum(axis=0)
        u = d2q9.calc_u(f, rho)
        force = jnp.stack([g_beta * theta, jnp.zeros_like(theta)])
        u = u + 0.5 * force / rho
        f_eq = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_eq, omega_f) \
            + d2q9.guo_source(u, force, omega_f)
        f_new = d2q9.stream(f_coll)
        for side in ("row0", "rowN", "col0", "colN"):
            f_new = bc.bounce_back(f_new, f_coll, side)

        if q5:
            g_coll = d2q9.bgk_collision(g, d2q5_equilibrium(u, theta),
                                        omega_g)
            g_new = d2q5_stream(g_coll)
            # column ADE Dirichlet (incoming 2 at col0, 4 at colN),
            # then adiabatic row bounce-back (rows win the corners)
            g_new = g_new.at[2, :, 0].set(-g_coll[4, :, 0]
                                          + 2.0 * w5w * 0.5)
            g_new = g_new.at[4, :, -1].set(-g_coll[2, :, -1]
                                           + 2.0 * w5w * (-0.5))
            g_new = g_new.at[1, 0].set(g_coll[3, 0])
            g_new = g_new.at[3, -1].set(g_coll[1, -1])
        else:
            g_coll = d2q9.bgk_collision(g, d2q9.equilibrium(u, theta),
                                        omega_g)
            g_new = d2q9.stream(g_coll)
            g_new = bc.ade_dirichlet(g_new, g_coll, "col0", g_eq_hot,
                                     incoming_only=True)
            g_new = bc.ade_dirichlet(g_new, g_coll, "colN", g_eq_cold,
                                     incoming_only=True)
            g_new = bc.bounce_back(g_new, g_coll, "row0")
            g_new = bc.bounce_back(g_new, g_coll, "rowN")
        return f_new, g_new

    return step


def heated_cavity(H: int = 128, W: int = 128, T: int = 40000,
                  Ra: float = 1e4, Pr: float = 0.71,
                  tau_g: float = 0.8, record_every: int = 0,
                  substeps: int = 1, snapshot_every: int = 0,
                  snapshot_prefix: str | None = None,
                  scalar_lattice: str = "d2q9",
                  fused: bool | None = None, interpret: bool = False,
                  dtype=None) -> ThermalResult:
    """Differentially heated square cavity — the de Vahl Davis (1983)
    natural-convection benchmark.  Hot left / cold right walls, a
    single buoyancy-driven circulation cell, and a mean Nusselt number
    with classic reference values (Pr = 0.71): Nu = 1.118 at Ra = 1e3,
    2.243 at 1e4, 4.519 at 1e5.  Measured here (f64): 1.1176 at Ra=1e3
    (48^2), 2.2423 at 1e4 (64^2), 4.5120 at 1e5 (96^2, tau_g=0.7,
    T=120k) — all three canonical points within 0.2%.

    ``nusselt`` here is the steady volume-averaged transport across the
    cavity, 1 + <u_y theta> W / (kappa dT) — at steady state the flux
    through every vertical plane is equal, so this equals the wall
    Nusselt number up to discretisation.  Ra is defined on the cavity
    width W (the temperature-drop direction).
    """
    dtype = default_float(dtype)
    kappa = CS2 * (tau_g - 0.5)
    nu = Pr * kappa
    omega_f = 1.0 / (nu / CS2 + 0.5)
    omega_g = 1.0 / tau_g
    g_beta = Ra * nu * kappa / float(W) ** 3

    y = (np.arange(W) + 0.5) / W
    theta0 = jnp.asarray(np.broadcast_to(0.5 - y, (H, W)), dtype)
    u0 = jnp.zeros((2, H, W), dtype)
    f = d2q9.equilibrium(u0, jnp.ones((H, W), dtype))
    q5 = scalar_lattice == "d2q5"
    g = d2q5_equilibrium(u0, theta0) if q5 \
        else d2q9.equilibrium(u0, theta0)

    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    if fused:
        from ..kernels.thermal_pallas import make_heated_cavity_fused_step

        if T % substeps or (record_every and record_every % substeps):
            raise ValueError("T and record_every must be divisible by "
                             "substeps")
        kstep = make_heated_cavity_fused_step(
            H, W, omega_f=omega_f, omega_g=omega_g, g_beta=g_beta,
            substeps=substeps, dtype=dtype, interpret=interpret,
            scalar_lattice=scalar_lattice)
        step = lambda S: kstep(S)                       # noqa: E731
        carry = jnp.concatenate([f, g], axis=0)
        unpack = lambda S: (S[:9], S[9:])               # noqa: E731
    else:
        if substeps != 1:
            raise ValueError("substeps requires the fused path")
        step = make_cavity_step(H, W, omega_f=omega_f, omega_g=omega_g,
                                g_beta=g_beta, dtype=dtype,
                                scalar_lattice=scalar_lattice)
        carry = (f, g)
        unpack = lambda c: c                            # noqa: E731

    def nus(fc, gc):
        rho = d2q9.calc_rho(fc)
        th = d2q9.calc_rho(gc)
        u = d2q9.calc_u(fc, rho)
        u = u + 0.5 * jnp.stack([g_beta * th, jnp.zeros_like(th)]) / rho
        return 1.0 + jnp.mean(u[1] * th) * W / kappa, u, rho, th

    def record(c):
        fc, gc = unpack(c)
        n, u, _, th = nus(fc, gc)
        return jnp.stack([n, jnp.sqrt(jnp.mean(u * u)), jnp.abs(th).max()])

    snapshots = None
    if snapshot_every:
        if record_every:
            raise ValueError("snapshot_every and record_every are "
                             "mutually exclusive")
        if snapshot_every % substeps:
            raise ValueError("snapshot_every must be divisible by "
                             "substeps")
        recorder = _make_thermal_recorder(
            snapshot_every, unpack, g_beta, snapshot_prefix)
        carry = recorder.run(
            _capped_calls(step, H * W,
                          0.15 * substeps if fused else 0.6, substeps),
            carry, T)
        series = None
        snapshots = recorder.result()
    else:
        per_cell = 0.15 * substeps if fused else 0.6
        carry, series = drive_chunked(step, carry, T // substeps,
                                      record_every // substeps, H * W,
                                      per_cell, record)
    f, g = unpack(carry)
    nu_now, u, rho, theta = nus(f, g)
    return ThermalResult(f=f, g=g, rho=rho, u=u, theta=theta,
                         nusselt=float(nu_now), steps=T, series=series,
                         snapshots=snapshots)
