"""Channel-flow scenes (single-phase BGK family).

Each scene reproduces one reference driver:
  * horizontal_poiseuille — test/horizontal_poiseuille_test.cpp (the hard
    accuracy gate: L2 <= 1e-11 vs the analytic parabola).
  * vertical_poiseuille   — test/vertical_poiseuille_test.cpp
  * gravity_channel       — test/gravity_test.cpp
  * specular_channel      — test/specular_boundary_test.cpp
  * free_stream           — test/free_stream_test.cpp
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary import bc
from ..models.single_phase import SinglePhaseModel
from ..ops import d2q9
from ..utils.xmath import default_float, launch_cap, resolve_fused
from ..utils import observe

TAU_DEFAULT = math.sqrt(3.0 / 16.0) + 0.5  # cites horizontal_poiseuille_test.cpp:55


@dataclass
class ChannelResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    steps: int
    l2: float | None = None
    snapshots: dict | None = None


class SnapshotRecorder:
    """Accumulates the reference drivers' per-snapshot fields at the
    [simulation] cadence (the reference snapshots when ``sp.snapshot(t)``,
    i.e. t %% snapshot_steps == 0, including t=0 —
    free_stream_test.cpp:79-88, cylinder_test.cpp:90-101), optionally
    streaming to disk via io.snapshots.SnapshotWriter instead of host RAM.

    ``fields(state) -> {name: array}`` extracts the recorded fields from
    whatever the scene's step carry is."""

    def __init__(self, cadence: int, fields, prefix: str | None = None):
        self.cadence = cadence
        self.fields = fields
        self.frames: dict[str, list] = {}
        self.writer = None
        if prefix:
            from ..io.snapshots import SnapshotWriter

            self.writer = SnapshotWriter(prefix)

    def record(self, state) -> None:
        for name, arr in self.fields(state).items():
            if self.writer:
                self.writer.append(name, arr)
            else:
                self.frames.setdefault(name, []).append(np.asarray(arr))

    def run(self, chunk, state, T: int):
        """Advance ``state`` for T steps via ``chunk(state, n)``, recording
        before every ``cadence``-step chunk (so samples land exactly at the
        reference's t %% cadence == 0 instants, t=0 included)."""
        done = 0
        while done < T:
            self.record(state)
            n = min(self.cadence, T - done)
            state = chunk(state, n)
            done += n
            observe.check_finite(state, done)
        return state

    def result(self) -> dict | None:
        if self.writer:
            self.writer.close()
            return None
        return {k: np.stack(v) for k, v in self.frames.items() if v}


def single_phase_fields(incompressible: bool = True):
    """The single-phase drivers' snapshot triple: ux, uy, ps = rho/3
    (free_stream_test.cpp:142-145 saves rhos/3.0 as the pressure field;
    cylinder_test.cpp records calc_u's u = momentum/rho while free_stream
    records calc_incomp_u's plain momentum)."""

    def fields(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f) if incompressible else d2q9.calc_u(f, rho)
        return {"ux": u[0], "uy": u[1], "ps": rho / 3.0}

    return fields


def poiseuille_analytic(W: int, u_max: float) -> np.ndarray:
    """Analytic parabola u(y) = -4 u_max/W^2 * y (y - W), y = idx + 1/2.
    cites /root/reference/test/horizontal_poiseuille_test.cpp:163-164"""
    y = np.linspace(1, W, W) - 0.5
    return -4.0 * u_max / (W * W) * y * (y - W)


def poiseuille_l2(u_x: np.ndarray, u_max: float) -> float:
    """Reference's L2 metric: row-wise relative L2 averaged over ALL rows
    but summed only over interior rows.
    cites /root/reference/test/horizontal_poiseuille_test.cpp:163-173"""
    H, W = u_x.shape
    ua = poiseuille_analytic(W, u_max)
    denom = 1.0 / np.sqrt(np.sum(ua**2))
    errors = np.zeros(H)
    for r in range(1, H - 1):
        errors[r] = np.sqrt(np.sum((u_x[r] - ua) ** 2)) * denom
    return float(np.sum(errors) / H)


def _converged_run(model: SinglePhaseModel, f: jnp.ndarray, T: int,
                   t_interval: int = 100, tolerance: float = 1e-12,
                   axis: int = 0):
    """Run up to T steps, stopping when the relative change of mean(u)
    along the flow ``axis`` over t_interval steps drops below tolerance.
    cites /root/reference/test/horizontal_poiseuille_test.cpp:93-126"""
    chunk = jax.jit(model.run_chunk, static_argnums=1)
    mean_ux = jax.jit(lambda g: jnp.mean(model.macroscopics(g)[1][axis]))
    steps = 0
    old_mean = 1.0
    f = chunk(f, 1)
    steps += 1
    while steps < T:
        mean = float(mean_ux(f))
        # torch's .item() on 0/0 gives nan/inf (never converges); guard the
        # python ZeroDivisionError the same way.
        if old_mean != 0.0 and abs(mean / old_mean - 1.0) < tolerance:
            break
        old_mean = mean
        n = min(t_interval, T - steps)
        f = chunk(f, n)
        steps += n
    return f, steps


def horizontal_poiseuille(H: int = 21, W: int = 21, T: int = 8301,
                          u_max: float = 1.030985714e-1,
                          tau: float = TAU_DEFAULT,
                          fused: bool | None = None,
                          dtype=None) -> ChannelResult:
    """Pressure-driven flow along rows, no-slip walls on the first/last
    column, incompressible equilibrium.  Parameters cite
    /root/reference/test/horizontal_poiseuille_test.cpp:50-67.
    ``fused=True`` runs the whole step (pressure BC + walls included) as
    one Pallas kernel (f32, W%128==0, H%8==0)."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / tau
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet

    if fused:
        from ..kernels.channel_pallas import make_channel_fused_step
        from ..ops import d2q9 as _d

        step = make_channel_fused_step(H, W, omega, rho_inlet, rho_outlet,
                                       dtype=dtype)
        f = _d.incomp_equilibrium(jnp.zeros((2, H, W), dtype),
                                  jnp.ones((H, W), dtype))
        f, steps = _fused_run(step, f, T, converge=True)
        rho = _d.calc_rho(f)
        u = _d.calc_momentum(f)
        return ChannelResult(f=f, rho=rho, u=u, steps=steps,
                             l2=poiseuille_l2(np.asarray(u[0]), u_max))

    model = SinglePhaseModel(
        omega=omega,
        incompressible=True,
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_inlet, rho_outlet, axis=0,
                eq_fn=d2q9.incomp_equilibrium),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
            lambda fa, fc: bc.bounce_back(fa, fc, "col0"),
        ),
    )
    f = model.init(H, W, dtype=dtype)
    f, steps = _converged_run(model, f, T)
    rho, u = model.macroscopics(f)
    l2 = poiseuille_l2(np.asarray(u[0]), u_max)
    return ChannelResult(f=f, rho=rho, u=u, steps=steps, l2=l2)


def trt_poiseuille(H: int = 21, W: int = 21, T: int = 20000,
                   u_max: float = 1.030985714e-1,
                   tau: float = 1.2,
                   magic: float = None,
                   fused: bool | None = None,
                   dtype=None) -> ChannelResult:
    """horizontal_poiseuille with the TRT operator (models.trt) — BEYOND
    THE REFERENCE.  The reference's L2 <= 1e-11 gate
    (test/horizontal_poiseuille_test.cpp:175) holds for BGK only at the
    magic tau = sqrt(3/16)+1/2; TRT restores the same exactness at ANY
    ``tau`` (viscosity) by relaxing the odd parts at the rate that keeps
    Lambda = (tau+ - 1/2)(tau- - 1/2) = 3/16 (``magic``; None = 3/16).
    Geometry/BC stack and parameters otherwise cite
    test/horizontal_poiseuille_test.cpp:50-67."""
    from ..models import trt

    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / tau
    if magic is None:
        magic = trt.MAGIC_POISEUILLE
    omega_minus = trt.omega_minus_from_magic(omega, magic)
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet

    if fused:
        from ..kernels.channel_pallas import make_channel_variant_step

        step = make_channel_variant_step(
            H, W, omega=omega, incompressible=True,
            pressure=(rho_inlet, rho_outlet, 0), col_walls="bounce",
            omega_minus=omega_minus, dtype=dtype)
        f = d2q9.incomp_equilibrium(jnp.zeros((2, H, W), dtype),
                                    jnp.ones((H, W), dtype))
        f, steps = _fused_run(step, f, T, converge=True)
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f)
        return ChannelResult(f=f, rho=rho, u=u, steps=steps,
                             l2=poiseuille_l2(np.asarray(u[0]), u_max))

    model = SinglePhaseModel(
        omega=omega,
        incompressible=True,
        collision=lambda f, fe: trt.trt_collision(f, fe, omega,
                                                  omega_minus),
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_inlet, rho_outlet, axis=0,
                eq_fn=d2q9.incomp_equilibrium),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
            lambda fa, fc: bc.bounce_back(fa, fc, "col0"),
        ),
    )
    f = model.init(H, W, dtype=dtype)
    f, steps = _converged_run(model, f, T)
    rho, u = model.macroscopics(f)
    l2 = poiseuille_l2(np.asarray(u[0]), u_max)
    return ChannelResult(f=f, rho=rho, u=u, steps=steps, l2=l2)


def _fused_run(step, f, T: int, converge: bool = False,
               tolerance: float = 1e-12, interval: int = 100,
               axis: int = 0):
    """Run a fused one-launch step T times (chunked), optionally stopping
    on the reference's relative-mean-ux convergence test.  ``interval``
    defaults to the reference's 100-step cadence
    (horizontal_poiseuille_test.cpp:113-126) so the converged ``steps``
    count matches the jnp path's; raise it to trade fidelity of the stop
    step for fewer host syncs on the TPU."""
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
        static_argnums=1)
    if not converge:
        done = 0
        while done < T:
            n = min(launch_cap(f[0].size, 0.12), T - done)
            f = chunk(f, n)
            done += n
            observe.check_finite(f, done)
        return f, T
    steps, old_mean = 0, 1.0
    f = chunk(f, 1)
    steps += 1
    while steps < T:
        mean = float(jnp.mean(d2q9.calc_momentum(f)[axis]))
        if old_mean != 0.0 and abs(mean / old_mean - 1.0) < tolerance:
            break
        old_mean = mean
        n = min(interval, T - steps)
        f = chunk(f, n)
        steps += n
        observe.check_finite(f, steps)
    return f, steps


def vertical_poiseuille(H: int = 51, W: int = 51, T: int = 10000,
                        u_max: float = 0.1, tau: float = TAU_DEFAULT,
                        fused: bool | None = None,
                        tolerance: float | None = None,
                        incompressible: bool = False,
                        dtype=None) -> ChannelResult:
    """Flow along cols with compressible equilibrium; pressure BC acts on the
    cols axis, no-slip on first/last row.
    cites /root/reference/test/vertical_poiseuille_test.cpp:46-123.

    ``tolerance`` adds the relative-mean-u_y convergence watcher (the
    horizontal driver's 1e-12 stop test, horizontal_poiseuille_test.cpp:
    93-126, on the flow component).  ``l2`` on the result is the
    reference's row-averaged relative L2 of the cross-channel u_y
    profile vs the analytic parabola of width H (columns play the
    streamwise role here).  The faithful default uses the driver's
    COMPRESSIBLE equilibrium, whose floor is NOT 1e-11: u = j/rho
    varies along the channel (j is what's constant), an O(delta_rho)
    profile modulation the metric averages in (measured 1.3e-2 at
    31x31/u_max=0.05).  ``incompressible=True`` is the non-quirk escape
    hatch — the horizontal driver's He-Luo equilibrium in this
    geometry, which restores the 1e-11-class exactness at the magic
    tau."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / tau
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet

    def l2_of(u_y: np.ndarray) -> float:
        return poiseuille_l2(np.ascontiguousarray(u_y.T), u_max)

    if fused:
        from ..kernels.channel_pallas import make_channel_variant_step

        step = make_channel_variant_step(
            H, W, omega=omega, incompressible=incompressible,
            pressure=(rho_inlet, rho_outlet, 1), row_walls="bounce",
            dtype=dtype)
        eq0 = d2q9.incomp_equilibrium if incompressible else d2q9.equilibrium
        f = eq0(jnp.zeros((2, H, W), dtype), jnp.ones((H, W), dtype))
        f, steps = _fused_run(step, f, T, converge=tolerance is not None,
                              tolerance=tolerance or 1e-12, axis=1)
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f) if incompressible else d2q9.calc_u(f, rho)
        return ChannelResult(f=f, rho=rho, u=u, steps=steps,
                             l2=l2_of(np.asarray(u[1])))

    model = SinglePhaseModel(
        omega=omega,
        incompressible=incompressible,
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_inlet, rho_outlet, axis=1,
                eq_fn=(d2q9.incomp_equilibrium if incompressible
                       else d2q9.equilibrium)),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.bounce_back(fa, fc, "rowN"),
            lambda fa, fc: bc.bounce_back(fa, fc, "row0"),
        ),
    )
    f = model.init(H, W, dtype=dtype)
    if tolerance is not None:
        f, steps = _converged_run(model, f, T, tolerance=tolerance, axis=1)
    else:
        f = jax.jit(model.run_chunk, static_argnums=1)(f, T)
        steps = T
    # macroscopics: momentum when incompressible, j/rho when compressible
    rho, u = model.macroscopics(f)
    return ChannelResult(f=f, rho=rho, u=u, steps=steps,
                         l2=l2_of(np.asarray(u[1])))


def gravity_channel(H: int = 21, W: int = 21, T: int = 10000,
                    fg: float = -0.0003, tau: float = TAU_DEFAULT,
                    tolerance: float = 1e-12,
                    fused: bool | None = None,
                    dtype=None) -> ChannelResult:
    """Body-force-driven channel: u += Fg, Guo source, equal inlet/outlet
    densities.  cites /root/reference/test/gravity_test.cpp:60-177."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / tau

    if fused:
        from ..kernels.channel_pallas import make_channel_variant_step

        step = make_channel_variant_step(
            H, W, omega=omega, incompressible=True,
            pressure=(1.0, 1.0, 0), force=(fg, 0.0), col_walls="bounce",
            dtype=dtype)
        f = d2q9.incomp_equilibrium(jnp.zeros((2, H, W), dtype),
                                    jnp.ones((H, W), dtype))
        f, steps = _fused_run(step, f, T, converge=True,
                              tolerance=tolerance, interval=100)
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f) \
            + jnp.asarray([fg, 0.0], f.dtype)[:, None, None]
        return ChannelResult(f=f, rho=rho, u=u, steps=steps)

    model = SinglePhaseModel(
        omega=omega,
        incompressible=True,
        force=(fg, 0.0),
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, 1.0, 1.0, axis=0, eq_fn=d2q9.incomp_equilibrium),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
            lambda fa, fc: bc.bounce_back(fa, fc, "col0"),
        ),
    )
    f = model.init(H, W, dtype=dtype)
    f, steps = _converged_run(model, f, T, tolerance=tolerance)
    rho, u = model.macroscopics(f)
    u = u + jnp.asarray([fg, 0.0], dtype=f.dtype)[:, None, None]
    return ChannelResult(f=f, rho=rho, u=u, steps=steps)


def specular_channel(H: int = 51, W: int = 51, T: int = 10000,
                     u_max: float = 0.1, tau: float = TAU_DEFAULT,
                     fused: bool | None = None,
                     dtype=None) -> ChannelResult:
    """Pressure-driven channel with free-slip (specular) side walls: the
    profile should stay flat.  cites /root/reference/test/specular_boundary_test.cpp."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / tau
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_inlet = 3.0 * (H - 1) * p_grad + 1.0

    if fused:
        from ..kernels.channel_pallas import make_channel_variant_step

        step = make_channel_variant_step(
            H, W, omega=omega, incompressible=False,
            pressure=(rho_inlet, 1.0, 0), col_walls="specular",
            dtype=dtype)
        f = d2q9.equilibrium(jnp.zeros((2, H, W), dtype),
                             jnp.ones((H, W), dtype))
        f, steps = _fused_run(step, f, T)
        rho = d2q9.calc_rho(f)
        return ChannelResult(f=f, rho=rho, u=d2q9.calc_u(f, rho),
                             steps=steps)

    model = SinglePhaseModel(
        omega=omega,
        incompressible=False,
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_inlet, 1.0, axis=0, eq_fn=d2q9.equilibrium),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.specular(fa, fc, "colN"),
            lambda fa, fc: bc.specular(fa, fc, "col0"),
        ),
    )
    f = model.init(H, W, dtype=dtype)
    f = jax.jit(model.run_chunk, static_argnums=1)(f, T)
    rho, u = model.macroscopics(f)
    return ChannelResult(f=f, rho=rho, u=u, steps=T)


def free_stream(H: int = 54, W: int = 42, T: int = 1000,
                u_stream: float = 0.1, omega: float = 1.0 / 0.55,
                config_path: str | None = None,
                snapshot_prefix: str | None = None,
                fused: bool | None = None,
                corner_consistent: bool = False,
                dtype=None) -> ChannelResult:
    """Uniform stream preserved by ABB inlet/outlet + specular side walls.
    cites /root/reference/test/free_stream_test.cpp:75-135.

    The reference applies the specular column repair to ALL rows
    including the ABB corners (free_stream_test.cpp:104-134), AND pairs
    the quadratic ABB coefficient (2 + 9(u.c)^2 - 3u.u)E with the
    LINEARISED incompressible equilibrium (inconsistent at O(u^2)) —
    both reproduced faithfully by default (~15% bulk drift by T=100).
    ``corner_consistent=True`` is the non-quirk escape hatch: the
    specular overwrite skips the two ABB-owned corner rows (lane=1:-1)
    and the model runs the full quadratic equilibrium the ABB
    coefficient is derived from, making the uniform stream an EXACT
    (bit-identical in f64) fixed point of the whole BC stack: ABB maps
    feq to itself through the even-part identity feq_k + feq_opp =
    (2 + 9(u.c)^2 - 3u.u)E_k at rho=1, and specular is a c_y flip feq
    is invariant under at u_y=0.  jnp path only (the fused kernel
    bakes the reference's corner order in).

    ``config_path`` drives the scene from a physical-units
    [flow]/[lattice]/[simulation] TOML exactly like the reference driver
    (free_stream_test.cpp:23-36): grid H=lattice.X, W=lattice.Y, omega from
    the relaxation time, T = simulation.total_steps, and (ux, uy, ps=rho/3)
    snapshots at the simulation.snapshot_steps cadence, returned in
    ``result.snapshots`` (or streamed to ``snapshot_prefix``).  The stream
    velocity stays 0.1 — the reference driver hardcodes it (:52, :66)
    rather than using lattice.u."""
    recorder = None
    if config_path is not None:
        from ..core.params import PhysicalConfig

        cfg = PhysicalConfig.load(config_path)
        H, W = cfg.lattice.X, cfg.lattice.Y
        omega = cfg.lattice.omega
        if cfg.simulation is not None:
            T = cfg.simulation.total_steps
            recorder = SnapshotRecorder(cfg.simulation.snapshot_steps,
                                        single_phase_fields(True),
                                        snapshot_prefix)
    dtype = default_float(dtype)
    if corner_consistent:
        fused = False  # the kernel bakes the reference's corner order in
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    u_w = jnp.asarray([u_stream, 0.0], dtype)

    if fused:
        from ..kernels.channel_pallas import make_channel_variant_step

        step = make_channel_variant_step(
            H, W, omega=omega, incompressible=True, row_walls="abb",
            abb_u=(u_stream, 0.0), col_walls="specular",
            dtype=dtype)
        u0 = jnp.zeros((2, H, W), dtype).at[0].set(u_stream)
        f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
        if recorder is not None:
            chunk = jax.jit(
                lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
                static_argnums=1)
            f = recorder.run(chunk, f, T)
            steps = T
        else:
            f, steps = _fused_run(step, f, T)
        rho = d2q9.calc_rho(f)
        return ChannelResult(f=f, rho=rho, u=d2q9.calc_momentum(f),
                             steps=steps,
                             snapshots=recorder.result() if recorder else None)

    lane = slice(1, -1) if corner_consistent else slice(None)
    model = SinglePhaseModel(
        omega=omega,
        # corner-consistent mode needs the quadratic equilibrium the ABB
        # coefficient is exact against (see docstring)
        incompressible=not corner_consistent,
        post_stream_bcs=(
            lambda fa, fc: bc.anti_bounce_back(fa, fc, "row0", u_w),
            lambda fa, fc: bc.anti_bounce_back(fa, fc, "rowN", u_w),
            lambda fa, fc: bc.specular(fa, fc, "colN", lane),
            lambda fa, fc: bc.specular(fa, fc, "col0", lane),
        ),
    )
    u0 = jnp.zeros((2, H, W), dtype=dtype).at[0].set(u_stream)
    f = model.init(H, W, dtype=dtype, u0=u0)
    chunk = jax.jit(model.run_chunk, static_argnums=1)
    if recorder is not None:
        f = recorder.run(chunk, f, T)
    else:
        f = chunk(f, T)
    rho, u = model.macroscopics(f)
    return ChannelResult(f=f, rho=rho, u=u, steps=T,
                         snapshots=recorder.result() if recorder else None)


def horizontal_poiseuille_df64(H: int = 21, W: int = 21, T: int = 8301,
                               u_max: float = 1.030985714e-1,
                               tau: float = TAU_DEFAULT) -> ChannelResult:
    """The reference's hard accuracy gate in double-single ("df64")
    arithmetic (utils.df64): f64-class precision from f32 pairs, so the
    L2 <= 1e-11 assert (horizontal_poiseuille_test.cpp:175) can run ON
    the TPU, which has no native f64.  Same physics stack as
    horizontal_poiseuille (incompressible equilibrium, pressure-drop
    periodic rows, halfway bounce-back cols); every arithmetic op is an
    error-free-transformation df64 op, streaming/selects act on the
    (hi, lo) pair exactly."""
    import numpy as np

    from ..core import lattice as lat
    from ..utils import df64 as df

    df.resolve_guard()  # settle the EFT guard eagerly (outside jit)

    omega = 1.0 / tau
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet

    w_dd = [df.from_f64(np.full((H, W), lat.W[k])) for k in range(9)]
    om_dd = df.from_f64(np.full((H, W), omega))
    one_m_om = df.from_f64(np.full((H, W), 1.0 - omega))
    rho_in_dd = df.from_f64(np.full((1, W), rho_inlet))
    rho_out_dd = df.from_f64(np.full((1, W), rho_outlet))
    three = 3.0  # exact in f32
    CXl = [int(v) for v in lat.C[0]]
    CYl = [int(v) for v in lat.C[1]]
    OPPl = [int(v) for v in lat.OPP]

    def cu_k(k, ux, uy):
        acc = None
        if CXl[k] == 1:
            acc = ux
        elif CXl[k] == -1:
            acc = df.neg(ux)
        if CYl[k] == 1:
            acc = uy if acc is None else df.add(acc, uy)
        elif CYl[k] == -1:
            acc = df.neg(uy) if acc is None else df.sub(acc, uy)
        return acc

    def step(f):
        fs = [f[k] for k in range(9)]
        rho = fs[0]
        for k in range(1, 9):
            rho = df.add(rho, fs[k])
        ux = df.sub(df.add(df.add(fs[1], fs[5]), fs[8]),
                    df.add(df.add(fs[3], fs[6]), fs[7]))
        uy = df.sub(df.add(df.add(fs[2], fs[5]), fs[6]),
                    df.add(df.add(fs[4], fs[7]), fs[8]))

        feq, coll = [], []
        for k in range(9):
            cu = cu_k(k, ux, uy)
            base = rho if cu is None else df.add(rho, df.scale(cu, three))
            e = df.mul(w_dd[k], base)
            feq.append(e)
            coll.append(df.add(df.mul(one_m_om, fs[k]),
                               df.mul(om_dd, e)))

        # pressure-drop periodic rows (virtual inlet row 0 from row H-2,
        # outlet row H-1 from row 1)
        for k in range(9):
            cu_out = cu_k(k, ux[:, H - 2:H - 1], uy[:, H - 2:H - 1])
            cu_in = cu_k(k, ux[:, 1:2], uy[:, 1:2])
            base_in = rho_in_dd if cu_out is None else df.add(
                rho_in_dd, df.scale(cu_out, three))
            base_out = rho_out_dd if cu_in is None else df.add(
                rho_out_dd, df.scale(cu_in, three))
            vin = df.add(df.mul(w_dd[k][:, :1], base_in),
                         df.sub(coll[k][:, H - 2:H - 1],
                                feq[k][:, H - 2:H - 1]))
            vout = df.add(df.mul(w_dd[k][:, :1], base_out),
                          df.sub(coll[k][:, 1:2], feq[k][:, 1:2]))
            coll[k] = coll[k].at[:, 0:1].set(vin)
            coll[k] = coll[k].at[:, H - 1:H].set(vout)

        new = [jnp.roll(coll[k], (CXl[k], CYl[k]), (1, 2)) for k in range(9)]
        for k in (2, 5, 6):      # outgoing at col W-1
            new[OPPl[k]] = new[OPPl[k]].at[:, :, W - 1].set(
                coll[k][:, :, W - 1])
        for k in (4, 7, 8):      # outgoing at col 0
            new[OPPl[k]] = new[OPPl[k]].at[:, :, 0].set(coll[k][:, :, 0])
        return jnp.stack(new, axis=0)

    # init: f = W rho at u=0, rho=1 (df64-exact weights)
    f = jnp.stack([w_dd[k] for k in range(9)], axis=0)
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
        static_argnums=1)
    done = 0
    while done < T:
        n = min(2000, T - done)
        f = chunk(f, n)
        done += n

    # macroscopics + L2 gate in host f64
    f64 = np.asarray(f[:, 0], np.float64) + np.asarray(f[:, 1], np.float64)
    rho = f64.sum(axis=0)
    u = np.stack([
        f64[1] + f64[5] + f64[8] - f64[3] - f64[6] - f64[7],
        f64[2] + f64[5] + f64[6] - f64[4] - f64[7] - f64[8]])
    l2 = poiseuille_l2(u[0], u_max)
    return ChannelResult(f=f, rho=jnp.asarray(rho), u=jnp.asarray(u),
                         steps=T, l2=l2)


def power_law_analytic_profile(y: np.ndarray, h: float, cons_K: float,
                               n: float, g: float) -> np.ndarray:
    """Steady force-driven planar Poiseuille of a power-law fluid:
    u(y) = n/(n+1) (G/K)^(1/n) (h^((n+1)/n) - |y|^((n+1)/n)), y from the
    centerline, walls at |y| = h (halfway bounce-back plane)."""
    e = (n + 1.0) / n
    return (n / (n + 1.0)) * (g / cons_K) ** (1.0 / n) * (
        h ** e - np.abs(y) ** e)


def bingham_analytic_profile(y: np.ndarray, h: float, cons_K: float,
                             sigma_y: float, g: float) -> np.ndarray:
    """Steady force-driven planar Poiseuille of a Bingham plastic: a
    rigid plug inside the yield surface |y| <= y_p = sigma_y/g, the
    shifted parabola outside."""
    y_p = sigma_y / g
    ya = np.minimum(np.abs(y), h)
    outer = g / (2.0 * cons_K) * (h * h - ya * ya) \
        - sigma_y / cons_K * (h - ya)
    plug = g / (2.0 * cons_K) * (h - y_p) ** 2
    return np.where(np.abs(y) <= y_p, plug, outer)


def power_law_channel(H: int = 8, W: int = 41, T: int = 60000,
                      n: float = 0.5, cons_K: float = 0.01,
                      fg: float = 4.2e-5,
                      tau_min: float = 0.52, tau_max: float = 50.0,
                      iters: int = 8, sigma_y: float = 0.0,
                      m_pap: float = 1e4, tolerance: float = 1e-12,
                      dtype=None) -> ChannelResult:
    """Body-force-driven channel of a truncated power-law fluid (a
    Herschel-Bulkley / Bingham plastic when ``sigma_y > 0``) — BEYOND
    THE REFERENCE (models.power_law; the reference is Newtonian-only,
    src/solver.cpp:65-74).  Periodic along rows, halfway bounce-back
    side walls, STANDARD Guo forcing (u* = u + F/2rho, full-strength
    ics2=3/ics4=9 coefficients — not the reference drivers' weak
    variant) with the per-cell omega in both the relaxation and the
    source prefactor.  Converges on mean(u_x) like _converged_run and
    returns the per-cell tau field in ``snapshots['tau']``."""
    from ..models.power_law import apparent_tau

    dtype = default_float(dtype)
    fgv = jnp.asarray([fg, 0.0], dtype)[:, None, None]

    def tau_of(f, f_eq, rho):
        return apparent_tau(f, f_eq, rho, cons_K, n, tau_min, tau_max,
                            iters, sigma_y, m_pap)

    def macro(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho) + 0.5 * fgv / rho
        return rho, u

    def step(f):
        rho, u = macro(f)
        f_eq = d2q9.equilibrium(u, rho)
        om = 1.0 / tau_of(f, f_eq, rho)
        f_coll = d2q9.bgk_collision(f, f_eq, om) \
            + d2q9.guo_source(u, fgv, om, ics2=3.0, ics4=9.0)
        f_new = d2q9.stream(f_coll)
        f_new = bc.bounce_back(f_new, f_coll, "colN")
        f_new = bc.bounce_back(f_new, f_coll, "col0")
        return f_new

    f = d2q9.equilibrium(jnp.zeros((2, H, W), dtype),
                         jnp.ones((H, W), dtype))
    chunk = jax.jit(lambda g, k: jax.lax.fori_loop(
        0, k, lambda _, x: step(x), g), static_argnums=1)
    mean_ux = jax.jit(lambda g: jnp.mean(macro(g)[1][0]))
    f = chunk(f, 1)
    steps, old_mean = 1, 1.0
    while steps < T:
        mean = float(mean_ux(f))
        if old_mean != 0.0 and abs(mean / old_mean - 1.0) < tolerance:
            break
        old_mean = mean
        k = min(200, T - steps)
        f = chunk(f, k)
        steps += k
    rho, u = macro(f)
    tau = tau_of(f, d2q9.equilibrium(u, rho), rho)
    return ChannelResult(f=f, rho=rho, u=u, steps=steps,
                         snapshots={"tau": np.asarray(tau)})
