"""Obstacle scenes: IBM cylinder in a free stream, and rectangle
sedimentation with a passive advection-diffusion scalar.

  * cylinder_flow — test/cylinder_test.cpp:21-175 (IBM multi-direct forcing)
  * rectangle_sedimentation — test/rectangle_sedimentation_test.cpp:23-248
"""

from __future__ import annotations

from ..utils.xmath import tdot

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary import bc
from ..core import lattice as lat
from ..ops import d2q9
from ..ops.ibm import IBM
from ..utils.observe import drive_chunked as _drive_rigid
from ..utils.xmath import default_float, launch_cap, resolve_fused

_WEAK_GUO = (1.0 / 3.0, 1.0 / 9.0)  # cylinder_test.cpp:66-67


@dataclass
class CylinderResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    F_roi: jnp.ndarray      # Eulerian IBM force density over the ROI
    surface_force: jnp.ndarray  # (2,) total force on the body
    steps: int
    forces: object = None   # (T//record_every, 2) series when recorded
    snapshots: dict | None = None


def cylinder_flow(H: int = 160, W: int = 120, T: int = 500,
                  center=(60.0, 60.0), radius: float = 20.0,
                  n_markers: int = 64, u_stream: float = 0.05,
                  omega: float = 1.0 / 0.55,
                  ibm: IBM | None = None,
                  config_path: str | None = None,
                  markers_path: str | None = None,
                  marker_name: str = "cylinder-a",
                  snapshot_prefix: str | None = None,
                  reference_weights: bool = False,
                  fused: bool | None = None,
                  interpret: bool = False,
                  guo_coeffs: tuple = _WEAK_GUO,
                  record_every: int | None = None,
                  dtype=None) -> CylinderResult:
    """Uniform stream past an IBM cylinder: ABB inlet/outlet (rows),
    specular side walls (cols), multi-direct-forcing body force over the
    marker ROI.  Step order cites /root/reference/test/cylinder_test.cpp:
    macroscopics -> equilibrium -> IBM force (:110) -> weak-Guo source over
    the ROI only (:116-127) -> advect -> ABB rows (:132-154) ->
    specular cols (:156-163).

    The marker TOML the reference expects does not ship (SURVEY.md 5.6);
    markers default to a generated circle, or pass an ``IBM`` built from
    ``IBM.from_markers``/TOML arrays.

    ``fused=True`` (f32, W%128==0) runs each step as two back-to-back
    Pallas launches: the IBM multi-direct forcing (kernels.ibm_pallas,
    separable-weight MXU matmuls over an aligned marker window, force
    grid carried with input/output aliasing) and the grid-wide work —
    collide, Guo, stream, ABB/specular walls (kernels.cylinder_pallas).
    When the marker window does not fit the grid the forcing falls back
    to jnp over the ROI.  ``record_every=k`` (fused only) additionally
    returns the (T//k, 2) surface-force time series, recorded in-device
    via lax.scan.

    Vortex-shedding validation (measured, fused, 1024x256, D=32, Re=96,
    300k steps): with the reference's weak Guo coefficients the body is
    too weakly enforced and the lift oscillation decays (a faithful
    reference quirk, cylinder_test.cpp:66-67); with the standard
    ``guo_coeffs=(3, 9)`` shedding self-sustains at constant amplitude
    with Strouhal = 0.176 — literature 0.16-0.17 at this Re, shifted up
    by the 12.5%% blockage.

    ``config_path`` + ``markers_path`` drive the scene exactly like the
    reference driver's two TOML argv files (cylinder_test.cpp:24-38,
    :63, :75-77): grid H=lattice.X, W=lattice.Y, u_stream=lattice.u,
    omega from the relaxation time, markers from [marker_name].x/.y
    (src/ibm.cpp ctor schema), T = simulation.total_steps, and
    (ux, uy, ps, surface_force, forces) snapshots at the
    simulation.snapshot_steps cadence in ``result.snapshots``."""
    snap_cadence = None
    if config_path is not None:
        from ..core.params import PhysicalConfig

        cfg = PhysicalConfig.load(config_path)
        H, W = cfg.lattice.X, cfg.lattice.Y
        u_stream = cfg.lattice.u
        omega = cfg.lattice.omega
        if cfg.simulation is not None:
            T = cfg.simulation.total_steps
            snap_cadence = cfg.simulation.snapshot_steps
    # reference_weights selects the reference's Peskin-weight pairing,
    # which dots the x-fractions with the COLUMN axis (ibm.cpp:47-57 vs
    # :171) — the transposed-weights quirk, off by default because the
    # mathematically-intended pairing is the default everywhere in ops/ibm
    if markers_path is not None and ibm is None:
        ibm = IBM.from_toml(markers_path, marker_name,
                            reference_transposed_weights=reference_weights)
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    ib = ibm or IBM.circle(center[0], center[1], radius, n_markers,
                           reference_transposed_weights=reference_weights)
    u_w = jnp.asarray([u_stream, 0.0], dtype)

    r0, r1 = ib.roi_rows
    c0, c1 = ib.roi_cols

    def _make_recorder(unpack):
        # reference snapshot set: ux, uy (calc_u), ps = rho/3, the surface
        # force and the ROI force field, all sampled BEFORE the step
        # (cylinder_test.cpp:90-101, :168-174 saves rhos/3.0)
        if snap_cadence is None:
            return None
        from .channel import SnapshotRecorder

        def fields(carry):
            f, Fw, Fs = unpack(carry)
            rho = d2q9.calc_rho(f)
            u = d2q9.calc_u(f, rho)
            return {"ux": u[0], "uy": u[1], "ps": rho / 3.0,
                    "surface_force": Fs, "forces": Fw}

        return SnapshotRecorder(snap_cadence, fields, snapshot_prefix)

    if fused:
        from ..kernels.cylinder_pallas import make_cylinder_fused_step
        from ..kernels.ibm_pallas import make_ibm_forcing_step

        kstep = make_cylinder_fused_step(
            H, W, omega, u_wall=(u_stream, 0.0), guo=guo_coeffs,
            dtype=jnp.float32, interpret=interpret)
        kforce = make_ibm_forcing_step(H, W, ib, dtype=jnp.float32,
                                       interpret=interpret)

        if kforce is not None:
            # forcing fused into its own Pallas launch: the F grid is a
            # carry (zeros outside the marker window persist), so a step
            # is two back-to-back kernel launches with NO small XLA
            # fusions in between — measured those cost ~2x the grid
            # kernel itself in serial HBM latency (kernels/ibm_pallas.py)
            def fused_step(carry):
                f, F_full = carry
                F_full = kforce(f, F_full)
                return kstep(f, F_full), F_full
        else:
            # markers too close to the grid edge for an aligned window:
            # jnp forcing over the ROI
            def fused_step(carry):
                f, _F = carry
                f_roi = ib.roi(f)
                rho = d2q9.calc_rho(f_roi)
                u = d2q9.calc_u(f_roi, rho)
                F = ib.force_density_roi(u, rho)
                F_full = jnp.zeros((2, H, W), f.dtype) \
                    .at[:, r0:r1, c0:c1].set(F)
                return kstep(f, F_full), F_full

        u0 = jnp.zeros((2, H, W), jnp.float32).at[0].set(u_stream)
        f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), jnp.float32))
        carry = (f, jnp.zeros((2, H, W), jnp.float32))
        forces = None
        recorder = None
        if record_every:
            # record the surface force every k steps in-device (lax.scan);
            # one host transfer per launch chunk
            if T % record_every:
                raise ValueError("T must be a multiple of record_every")

            def outer(c, _):
                c2 = jax.lax.fori_loop(0, record_every,
                                       lambda _, x: fused_step(x), c)
                # F is zero outside the ROI, so the window sum IS the
                # surface force; summed only at sample times, keeping the
                # per-step gap between kernel launches free of XLA ops
                return c2, c2[1][:, r0:r1, c0:c1].sum(axis=(1, 2))

            scan = jax.jit(
                lambda c, n: jax.lax.scan(outer, c, None, length=n),
                static_argnums=1)
            series = []
            done = 0
            while done < T:
                cap = launch_cap(H * W, 0.12)
                n = min(cap // record_every or 1, (T - done) // record_every)
                carry, Fs = scan(carry, n)
                series.append(np.asarray(Fs))
                done += n * record_every
            forces = np.concatenate(series)
        else:
            chunk = jax.jit(
                lambda c, n: jax.lax.fori_loop(
                    0, n, lambda _, x: fused_step(x), c),
                static_argnums=1)
            recorder = _make_recorder(lambda c: (
                c[0], c[1][:, r0:r1, c0:c1],
                c[1][:, r0:r1, c0:c1].sum(axis=(1, 2))))
            if recorder is not None:
                carry = recorder.run(chunk, carry, T)
            else:
                done = 0
                while done < T:
                    n = min(launch_cap(H * W, 0.12), T - done)
                    carry = chunk(carry, n)
                    done += n
        f, F_full = carry
        F = F_full[:, r0:r1, c0:c1]
        F_s = F.sum(axis=(1, 2))
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        return CylinderResult(f=f, rho=rho, u=u, F_roi=F, surface_force=F_s,
                              steps=T, forces=forces,
                              snapshots=recorder.result() if recorder else None)

    def step(carry):
        f, _F, _Fs = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        f_equi = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)

        F = ib.eulerian_force_density(u, rho)
        F_s = F.sum(axis=(1, 2))

        u_roi = ib.roi(u)
        S = d2q9.guo_source(u_roi, F, omega, ics2=_WEAK_GUO[0], ics4=_WEAK_GUO[1])
        f_coll = f_coll.at[:, r0:r1, c0:c1].add(S)

        f_new = d2q9.stream(f_coll)
        f_new = bc.anti_bounce_back(f_new, f_coll, "row0", u_w)
        f_new = bc.anti_bounce_back(f_new, f_coll, "rowN", u_w)
        f_new = bc.specular(f_new, f_coll, "colN")
        f_new = bc.specular(f_new, f_coll, "col0")
        return f_new, F, F_s

    u0 = jnp.zeros((2, H, W), dtype).at[0].set(u_stream)
    rho0 = jnp.ones((H, W), dtype)
    f = d2q9.incomp_equilibrium(u0, rho0)  # cylinder_test.cpp:85
    F0 = jnp.zeros((2,) + ib.roi_shape, dtype)
    Fs0 = jnp.zeros((2,), dtype)

    chunk = jax.jit(
        lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
        static_argnums=1,
    )
    carry = (f, F0, Fs0)
    recorder = _make_recorder(lambda c: c)
    if recorder is not None:
        carry = recorder.run(chunk, carry, T)
    else:
        done = 0
        while done < T:
            n = min(2000, T - done)
            carry = chunk(carry, n)
            done += n
    f, F, F_s = carry
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    return CylinderResult(f=f, rho=rho, u=u, F_roi=F, surface_force=F_s,
                          steps=T,
                          snapshots=recorder.result() if recorder else None)


# ---------------------------------------------------------------------------
# Rectangle sedimentation (fluid + ADE passive scalar)
# ---------------------------------------------------------------------------

def _rect_wall_assignments(H: int, R23: int, C28: int, C38: int):
    """Interior rectangle bounce-back assignments for the fluid.
    cites /root/reference/test/rectangle_sedimentation_test.cpp:184-196.
    The rectangle spans rows [R23, H) at cols [C28, C38]."""
    rows = slice(R23 + 1, -1)
    ceil_cols = slice(C28, C38 + 1)
    return [
        # first (left-face) wall at col C28: reflect outgoing (2, 5, 6)
        (8, (rows, C28), 6, 1.0),
        (4, (rows, C28), 2, 1.0),
        (7, (rows, C28), 5, 1.0),
        # ceiling at row R23: reflect outgoing (1, 5, 8)
        (6, (R23, ceil_cols), 8, 1.0),
        (3, (R23, ceil_cols), 1, 1.0),
        (7, (R23, ceil_cols), 5, 1.0),
        # second (right-face) wall at col C38: reflect outgoing (4, 7, 8)
        (5, (rows, C38), 7, 1.0),
        (2, (rows, C38), 4, 1.0),
        (6, (rows, C38), 8, 1.0),
    ]


def _rect_wall_assignments_ade(H: int, R23: int, C28: int, C38: int):
    """ADE rectangle walls: anti-bounce-back with zero wall concentration
    (note the first wall's row slice extends to the last row here).
    cites /root/reference/test/rectangle_sedimentation_test.cpp:220-232."""
    rows_full = slice(R23 + 1, None)
    rows = slice(R23 + 1, -1)
    ceil_cols = slice(C28, C38 + 1)
    return [
        (8, (rows_full, C28), 6, -1.0),
        (4, (rows_full, C28), 2, -1.0),
        (7, (rows_full, C28), 5, -1.0),
        (6, (R23, ceil_cols), 8, -1.0),
        (3, (R23, ceil_cols), 1, -1.0),
        (7, (R23, ceil_cols), 5, -1.0),
        (5, (rows, C38), 7, -1.0),
        (2, (rows, C38), 4, -1.0),
        (6, (rows, C38), 8, -1.0),
    ]


@dataclass
class SedimentationResult:
    f: jnp.ndarray
    g: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    C: jnp.ndarray
    steps: int
    snapshots: dict | None = None


def rectangle_sedimentation(H: int = 256, W: int = 320, T: int = 500,
                            u_in: float = 0.02, omega: float = 1.0 / 0.55,
                            w_s: float = 3e-3, C_w: float = 1e-3,
                            R23: int = -151, C28: int = 200, C38: int = 250,
                            inlet_rows: int = 50,
                            config_path: str | None = None,
                            snapshot_prefix: str | None = None,
                            substeps: int = 1,
                            fused: bool | None = None,
                            interpret: bool = False,
                            dtype=None) -> SedimentationResult:
    """Sediment-laden flow along cols past a bottom-mounted rectangle.

    Couples a BGK fluid to a passive ADE scalar g one-way (Sc = 1); the
    scalar's equilibrium advects at u + w_s (the settling velocity is added
    to *both* components, exactly as the reference's `u+w_s` scalar-add does,
    rectangle_sedimentation_test.cpp:125,201).  BC stack per step:
      zero-gradient on g at row0 + colN (:134-141, pre-stream),
      fluid: ABB inlet col0 / extrapolated-ABB outlet colN (:148-172),
      specular row0 (:174-177), bounce-back rowN (:179-182),
      rectangle bounce-back (:184-196);
      scalar: ADE Dirichlet inlet with 2 g_eq (:204-218),
      rectangle anti-bounce-back (:220-232), bounce-back rowN (:233-236).

    ``fused=True`` (f32, W%128==0) runs the whole coupled step as one
    Pallas launch per step (kernels.sediment_pallas).

    ``config_path`` drives the scene from the physical-units TOML like the
    reference driver (rectangle_sedimentation_test.cpp:28-38): grid
    H=lattice.X, W=lattice.Y, u_in=lattice.u, omega from the relaxation
    time, T = simulation.total_steps, with (ux, uy, ps, cs) snapshots at
    the simulation cadence (:112-122, :242-245).  The rectangle geometry
    stays at the driver's hardcoded values (:73-75 comment out the
    multiplier-derived forms)."""
    snap_cadence = None
    if config_path is not None:
        from ..core.params import PhysicalConfig

        cfg = PhysicalConfig.load(config_path)
        H, W = cfg.lattice.X, cfg.lattice.Y
        u_in = cfg.lattice.u
        omega = cfg.lattice.omega
        if cfg.simulation is not None:
            T = cfg.simulation.total_steps
            snap_cadence = cfg.simulation.snapshot_steps

    def _make_recorder(unpack):
        # reference snapshot set: ux, uy, ps = rho/3 and the scalar field
        # cs, sampled before the step (rectangle_sedimentation_test.cpp:
        # 112-122 and the rhos/3.0 save at :242-245)
        if snap_cadence is None:
            return None
        from .channel import SnapshotRecorder

        def fields(carry):
            f, g = unpack(carry)
            rho = d2q9.calc_rho(f)
            u = d2q9.calc_u(f, rho)
            return {"ux": u[0], "uy": u[1], "ps": rho / 3.0,
                    "cs": d2q9.calc_rho(g)}

        return SnapshotRecorder(snap_cadence, fields, snapshot_prefix)

    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    R23 = R23 % H if R23 < 0 else R23

    if substeps != 1 and not fused:
        raise ValueError("substeps requires the fused path")
    if fused:
        from ..kernels.sediment_pallas import make_sediment_fused_step

        if substeps > 1 and (snap_cadence is not None or T % substeps):
            raise ValueError("substeps requires T % substeps == 0 and no "
                             "snapshot cadence")
        step = make_sediment_fused_step(
            H, W, omega=omega, u_in=u_in, w_s=w_s, C_w=C_w, R23=R23,
            C28=C28, C38=C38, inlet_rows=inlet_rows, substeps=substeps,
            dtype=jnp.float32, interpret=interpret)
        u0 = jnp.zeros((2, H, W), jnp.float32).at[1].set(u_in)
        rho0 = jnp.ones((H, W), jnp.float32)
        cw0 = np.zeros((H, W), np.float32)
        cw0[-inlet_rows:, 0] = C_w
        f0 = d2q9.incomp_equilibrium(u0, rho0)
        g0 = d2q9.equilibrium(u0, jnp.asarray(cw0))
        S = jnp.concatenate([f0, g0], axis=0)
        chunk = jax.jit(
            lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), s),
            static_argnums=1)
        recorder = _make_recorder(lambda s: (s[:9], s[9:]))
        if recorder is not None:
            S = recorder.run(chunk, S, T)
        else:
            done = 0
            calls = T // substeps  # each kernel call advances substeps
            while done < calls:
                n = min(launch_cap(H * W, 0.12 * substeps), calls - done)
                S = chunk(S, n)
                done += n
        f, g = S[:9], S[9:]
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        return SedimentationResult(f=f, g=g, rho=rho, u=u,
                                   C=d2q9.calc_rho(g), steps=T,
                                   snapshots=recorder.result() if recorder
                                   else None)

    fixed_u_w = jnp.zeros((2, H), dtype).at[1].set(u_in)  # inlet wall velocity
    cw_profile = np.zeros(H)
    cw_profile[-inlet_rows:] = C_w
    cw = jnp.asarray(cw_profile, dtype)

    rect_f = _rect_wall_assignments(H, R23, C28, C38)
    rect_g = _rect_wall_assignments_ade(H, R23, C28, C38)

    def g_eq_wall(u_col0):
        """Scalar wall equilibrium at the inlet line (9, H).
        cites rectangle_sedimentation_test.cpp:204-210"""
        uw = u_col0 + w_s
        c = jnp.asarray(lat.C, dtype)
        cu = tdot(c.T, uw, axes=([1], [0]))  # (9, H)
        uu = (uw * uw).sum(axis=0)
        w = jnp.asarray(lat.W, dtype)[:, None]
        return (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu) * w * cw[None, :]

    def step(carry):
        f, g, u, rho, C = carry
        f_equi = d2q9.equilibrium(u, rho)
        g_equi = d2q9.equilibrium(u + w_s, C)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)
        g_coll = d2q9.bgk_collision(g, g_equi, omega)

        # zero-gradient scalar outflows (pre-stream)
        g_coll = bc.zero_gradient(g_coll, "row0")
        g_coll = bc.zero_gradient(g_coll, "colN", lane=slice(1, -1))

        f_new = d2q9.stream(f_coll)
        g_new = d2q9.stream(g_coll)

        # fluid: ABB inlet (col0, rows 1:-1) with fixed wall velocity
        f_new = bc.anti_bounce_back(f_new, f_coll, "col0", fixed_u_w,
                                    lane=slice(1, -1))
        # fluid: ABB outlet (colN) with extrapolated wall velocity
        u_wall = 1.5 * u[:, :, -1] - 0.5 * u[:, :, -2]
        f_new = bc.anti_bounce_back(f_new, f_coll, "colN", u_wall)
        # specular top, no-slip bottom
        f_new = bc.specular(f_new, f_coll, "row0")
        f_new = bc.bounce_back(f_new, f_coll, "rowN")
        # rectangle walls
        f_new = bc.obstacle_bounce_back(f_new, f_coll, rect_f)

        rho_new = d2q9.calc_rho(f_new)
        u_new = d2q9.calc_u(f_new, rho_new)

        # ADE Dirichlet inlet uses the *updated* velocity (:199-218)
        g_wall = g_eq_wall(u_new[:, :, 0])
        g_new = bc.ade_dirichlet(g_new, g_coll, "col0", g_wall,
                                 lane=slice(1, -1))
        g_new = bc.obstacle_bounce_back(g_new, g_coll, rect_g)
        g_new = bc.bounce_back(g_new, g_coll, "rowN")
        C_new = d2q9.calc_rho(g_new)
        return f_new, g_new, u_new, rho_new, C_new

    u0 = jnp.zeros((2, H, W), dtype).at[1].set(u_in)
    rho0 = jnp.ones((H, W), dtype)
    C0 = jnp.zeros((H, W), dtype).at[:, 0].set(cw)
    f = d2q9.incomp_equilibrium(u0, rho0)
    g = d2q9.equilibrium(u0, C0)
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)

    chunk = jax.jit(
        lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
        static_argnums=1,
    )
    carry = (f, g, u, rho, C0)
    recorder = _make_recorder(lambda c: (c[0], c[1]))
    if recorder is not None:
        carry = recorder.run(chunk, carry, T)
    else:
        done = 0
        while done < T:
            n = min(2000, T - done)
            carry = chunk(carry, n)
            done += n
    f, g, u, rho, C = carry
    return SedimentationResult(f=f, g=g, rho=rho, u=u, C=C, steps=T,
                               snapshots=recorder.result() if recorder
                               else None)


# measured per-cell step costs for launch_cap budgeting
# (docs/BENCHMARKS.md: fused moving chain 15.6 GLUPS = 0.064 ns/cell;
# the jnp moving-IBM chain is ~0.54 ns/cell at 400x256)
_FUSED_NS = 0.07
_JNP_NS = 0.55


@dataclass
class FallingCylindersResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    centers: jnp.ndarray     # (B, 2) final body centers (rows, cols)
    velocities: jnp.ndarray  # (B, 2) final body velocities
    steps: int
    trajectory: object = None  # (T//record_every, B, 6) cen, ub, F_h


def falling_cylinders(H: int = 800, W: int = 128, T: int = 40000,
                      centers=((96.0, 63.0), (130.0, 64.0)),
                      radius: float = 12.0,
                      n_markers: int | None = None, rho_s: float = 1.25,
                      gravity: float = 2e-4, omega: float = 1.0 / 0.6,
                      m_max: int = 5, record_every: int = 10,
                      zeta: float = 2.0, eps: float = 50.0,
                      row_slack: int | None = None,
                      fused: bool | None = None, interpret: bool = False,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 10000,
                      dtype=None) -> FallingCylindersResult:
    """B rigid cylinders sedimenting in a closed channel — the classic
    drafting-kissing-tumbling (DKT) configuration with the default two
    slightly-offset bodies.  Multi-body extension of falling_cylinder
    (the reference has no moving bodies at all; src/ibm.cpp:15-191 is
    static single-body).

    All bodies share one UNION forcing window: their markers are
    concatenated into a single Lagrangian set with per-marker velocity
    targets, so the multi-direct-forcing iterations apply the COMBINED
    interpolation/spreading operator — the bodies' force fields couple
    within the iteration, which is what makes near-contact drafting
    physical.  Columns use the full channel width; rows ride a window of
    ``2*half + initial row span + row_slack`` (default 4 radii) cells
    that follows min(cen_rows) — bodies drifting apart beyond that span
    lose forcing support, so the scene warns if the recorded trajectory
    approaches the budget.

    Rigid closure per body: momentum exchange -sum_j f_j over ITS
    markers + buoyant gravity + short-range Glowinski barrier forces
    (ops.moving_ibm.barrier_forces: pairwise and against all four
    walls, activation range ``zeta`` cells, stiffness 1/``eps``), then
    the same stable full-inertia semi-implicit update as
    falling_cylinder.

    ``record_every`` returns a (T//k, B, 6) trajectory (center,
    velocity, hydrodynamic force per body).  ``fused`` (auto on TPU/f32)
    runs each step as two Pallas launches via the multi-body variant of
    kernels.moving_ibm_pallas.

    Validated on hardware with the defaults (f32 fused, 800x128,
    D = 24, rho_s = 1.25, g = 2e-4, terminal Re ~ 6): the full DKT
    sequence reproduces — drafting closes the 10-cell gap to 1.4 by
    t = 24k, the pair kisses (gap pinned at the zeta = 2 barrier range
    through t ~ 35k), then tumbles apart laterally (|dcol| grows 1 ->
    55 cells by t ~ 70k) — the classic Fortes-Joseph-Lundgren
    phenomenology."""
    dtype = default_float(dtype)
    cen0 = np.asarray(centers, np.float64)
    B = cen0.shape[0]
    if B < 1:
        raise ValueError("need at least one body")
    if n_markers is None:
        n_markers = int(np.ceil(2.0 * np.pi * radius))
    half = int(np.ceil(radius)) + 5
    for b in range(B):
        if not (radius + 3 <= cen0[b, 0] <= H - radius - 3
                and radius + 3 <= cen0[b, 1] <= W - radius - 3):
            raise ValueError(f"center {tuple(cen0[b])} puts markers "
                             f"(+2-cell support) outside the {H}x{W} grid")
    if row_slack is None:
        row_slack = 4 * int(np.ceil(radius))
    span0 = float(cen0[:, 0].max() - cen0[:, 0].min())
    rw = min(H, int(np.ceil(span0)) + 2 * half + row_slack)
    area = np.pi * radius * radius
    m_eff = rho_s * area
    g_net = (rho_s - 1.0) * area * gravity
    theta = np.linspace(0.0, 2.0 * np.pi, n_markers, endpoint=False)
    dx = radius * np.cos(theta)
    dy = radius * np.sin(theta)

    from ..ops.moving_ibm import barrier_forces, forcing_window_markers, \
        window_factors

    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    if fused:
        from ..kernels.moving_ibm_pallas import make_moving_bodies_step, \
            pack_states

        kforce = make_moving_bodies_step(
            H, W, dx, dy, n_bodies=B, rw=rw, half=half, g_net=g_net,
            m_eff=m_eff, m_max=m_max, zeta=zeta, eps=eps, dtype=dtype,
            interpret=interpret)
        fused = kforce is not None

    def _finish(f, cen, ub, trajectory):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        if trajectory is not None and trajectory.size:
            span = (trajectory[:, :, 0].max(1)
                    - trajectory[:, :, 0].min(1)).max()
        else:  # no trajectory: still catch the final spread post-hoc
            rows = np.asarray(cen)[:, 0]
            span = rows.max() - rows.min()
        if span + 2 * half > rw:
            import warnings
            warnings.warn(
                f"bodies spread to {span:.1f} rows — beyond the "
                f"{rw}-row forcing window budget; bodies outside the "
                f"window lose hydrodynamic forcing; raise row_slack")
        return FallingCylindersResult(f=f, rho=rho, u=u, centers=cen,
                                      velocities=ub, steps=T,
                                      trajectory=trajectory)

    if fused:
        from ..kernels.cylinder_pallas import make_box_fused_step

        kstep = make_box_fused_step(H, W, omega, dtype=dtype,
                                    interpret=interpret)

        def fused_step(carry):
            f, F, st = carry
            F2, st2 = kforce(f, st, F)
            return kstep(f, F2), F2, st2

        u0 = jnp.zeros((2, H, W), dtype)
        f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
        carry = (f, jnp.zeros((2, H, W), dtype),
                 pack_states(cen0, dtype=dtype))
        carry, trajectory = _drive_rigid(
            fused_step, carry, T, record_every, H * W, _FUSED_NS,
            lambda c: c[2][:B, :6],
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
        f, _F, st = carry
        return _finish(f, st[:B, :2], st[:B, 2:4], trajectory)

    dxj = jnp.asarray(dx, dtype)
    dyj = jnp.asarray(dy, dtype)
    g_vec = jnp.asarray([g_net, 0.0], dtype)

    def step(carry):
        f, cen, ub, _Fh = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        f_equi = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)

        r0 = jnp.clip(jnp.round(cen[:, 0].min()).astype(jnp.int32) - half,
                      0, H - rw)
        zero = jnp.int32(0)
        u_win = jax.lax.dynamic_slice(u, (zero, r0, zero), (2, rw, W))
        rho_win = jax.lax.dynamic_slice(rho, (r0, zero), (rw, W))
        xs = (cen[:, 0:1] + dxj[None]).reshape(-1)      # (B*M,)
        ys = (cen[:, 1:2] + dyj[None]).reshape(-1)
        X, Y = window_factors(xs, ys, r0.astype(f.dtype), f.dtype.type(0.0),
                              rw, W)
        ub_m = jnp.repeat(ub, n_markers, axis=0).T       # (2, B*M)
        F_win, fj = forcing_window_markers(u_win, rho_win, X, Y, ub_m,
                                           m_max)
        fj_b = fj.reshape(2, B, n_markers).sum(-1).T     # (B, 2)

        S = d2q9.guo_source(u_win, F_win, omega)
        patch = jax.lax.dynamic_slice(f_coll, (zero, r0, zero),
                                      (9, rw, W)) + S
        f_coll = jax.lax.dynamic_update_slice(f_coll, patch,
                                              (zero, r0, zero))
        f_new = d2q9.stream(f_coll)
        for side in ("row0", "rowN", "col0", "colN"):
            f_new = bc.bounce_back(f_new, f_coll, side)

        F_h = -fj_b
        F_rep = barrier_forces(cen, radius, H, W, zeta=zeta, eps=eps)
        ub = ub + (F_h + g_vec[None] + F_rep) / m_eff
        cen = cen + ub
        return f_new, cen, ub, F_h

    u0 = jnp.zeros((2, H, W), dtype)
    f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
    carry = (f, jnp.asarray(cen0, dtype), jnp.zeros((B, 2), dtype),
             jnp.zeros((B, 2), dtype))
    carry, trajectory = _drive_rigid(
        step, carry, T, record_every, H * W, _JNP_NS,
        lambda c: jnp.concatenate([c[1], c[2], c[3]], axis=1),
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
    f, cen, ub, _ = carry
    return _finish(f, cen, ub, trajectory)


def ellipse_fsi_step(H: int, W: int, *, dx, dy, half: int, omega: float,
                     m_eff: float, i_eff: float, g_net: float,
                     m_max: int = 5, dtype=jnp.float32):
    """Pure jnp step of the rotating-ellipse fluid-structure problem —
    the body of scenes.obstacles.falling_ellipse's jnp path, exposed as
    a module-level builder so lbm_tpu.diff.rollout can differentiate
    THROUGH the coupled dynamics (e.g. d(glide)/d(release angle); see
    tests/test_diff.py).  Carry: (f (9,H,W), cen (2,), ub (2,),
    cs (2,) orientation, w (), F_h (2,), T_h ())."""
    from ..ops.moving_ibm import cayley_rotate, forcing_window_markers, \
        window_factors

    dxj = jnp.asarray(dx, dtype)
    dyj = jnp.asarray(dy, dtype)
    g_vec = jnp.asarray([g_net, 0.0], dtype)
    wr = wc = 2 * half

    def step(carry):
        f, cen, ub, cs, w, _Fh, _Th = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        f_equi = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)

        rx = cs[0] * dxj - cs[1] * dyj        # world offsets (M,)
        ry = cs[1] * dxj + cs[0] * dyj
        r0 = jnp.clip(jnp.round(cen[0]).astype(jnp.int32) - half,
                      0, H - wr)
        c0 = jnp.clip(jnp.round(cen[1]).astype(jnp.int32) - half,
                      0, W - wc)
        zero = jnp.int32(0)
        u_win = jax.lax.dynamic_slice(u, (zero, r0, c0), (2, wr, wc))
        rho_win = jax.lax.dynamic_slice(rho, (r0, c0), (wr, wc))
        X, Y = window_factors(cen[0] + rx, cen[1] + ry,
                              r0.astype(f.dtype), c0.astype(f.dtype),
                              wr, wc)
        ub_m = jnp.stack([ub[0] - w * ry, ub[1] + w * rx])   # (2, M)
        F_win, fj = forcing_window_markers(u_win, rho_win, X, Y, ub_m,
                                           m_max)

        S = d2q9.guo_source(u_win, F_win, omega)
        patch = jax.lax.dynamic_slice(f_coll, (zero, r0, c0),
                                      (9, wr, wc)) + S
        f_coll = jax.lax.dynamic_update_slice(f_coll, patch,
                                              (zero, r0, c0))
        f_new = d2q9.stream(f_coll)
        for side in ("row0", "rowN", "col0", "colN"):
            f_new = bc.bounce_back(f_new, f_coll, side)

        F_h = -fj.sum(axis=1)
        T_h = -jnp.sum(rx * fj[1] - ry * fj[0])
        ub = ub + (F_h + g_vec) / m_eff
        w = w + T_h / i_eff
        cen = cen + ub
        cs = jnp.stack(cayley_rotate(cs[0], cs[1], w))
        return f_new, cen, ub, cs, w, F_h, T_h

    return step


@dataclass
class FallingEllipseResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    center: jnp.ndarray      # (2,) final body center
    velocity: jnp.ndarray    # (2,) final body velocity
    orientation: jnp.ndarray  # (2,) final (cos, sin) of the body angle
    omega_body: jnp.ndarray  # () final angular velocity
    steps: int
    trajectory: object = None  # (T//k, 10): cen, ub, F_h, cos, sin, w, T_h


def falling_ellipse(H: int = 800, W: int = 256, T: int = 40000,
                    center=None, a: float = 16.0, b: float = 8.0,
                    theta0: float = 0.3,
                    n_markers: int | None = None, rho_s: float = 1.25,
                    gravity: float = 2e-4, omega: float = 1.0 / 0.6,
                    m_max: int = 5, record_every: int = 10,
                    fused: bool | None = None, interpret: bool = False,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 10000,
                    dtype=None) -> FallingEllipseResult:
    """Sedimenting rigid ELLIPSE with full translation + ROTATION
    coupling — torque exchange beyond falling_cylinder's symmetric
    (torque-free) fall, and far beyond the reference's static markers
    (src/ibm.cpp:15-191).  The canonical falling-plate/ellipse problem:
    an initially tilted body (angle ``theta0`` of the semi-major axis
    ``a`` from the rows/fall axis) feels a hydrodynamic torque, rotates
    broadside-on and drifts laterally while tilted.

    Rigid closure: markers carry the full rigid velocity
    U_j = U_b + w x r_j with r_j = R(theta) d_j (arc-uniform offsets,
    ops.moving_ibm.ellipse_markers); the forcing returns per-marker
    forces whose sums close momentum AND angular momentum:

        F_h = -sum f_j,      T_h = -sum (r_j x f_j)

    with the same stable full-inertia update as falling_cylinder
    (m_eff = rho_s pi a b, I_eff = rho_s pi a b (a^2+b^2)/4) and the
    orientation advanced by the exactly-orthogonal Cayley map
    (ops.moving_ibm.cayley_rotate — identical algebra on the jnp and
    Mosaic paths).

    ``record_every`` returns a (T//k, 10) series: center, velocity,
    F_h, (cos, sin), angular velocity, torque.  ``fused`` (auto on
    TPU/f32 when the window fits) = two Pallas launches per step via
    kernels.moving_ibm_pallas.make_moving_rot_step."""
    from ..ops.moving_ibm import ellipse_markers

    dtype = default_float(dtype)
    if b > a:
        raise ValueError("require a >= b (semi-major along the body x)")
    if center is None:
        center = (0.25 * H, 0.5 * W)
    if not (a + 3 <= center[0] <= H - a - 3
            and a + 3 <= center[1] <= W - a - 3):
        raise ValueError(f"center {center} puts markers (+2-cell support) "
                         f"outside the {H}x{W} grid")
    dx, dy = ellipse_markers(a, b, n_markers)
    M = dx.shape[0]
    half = int(np.ceil(a)) + 5
    wr = wc = 2 * half
    if wr > H or wc > W:
        raise ValueError("window exceeds grid; enlarge H/W")
    area = np.pi * a * b
    m_eff = rho_s * area
    i_eff = rho_s * area * (a * a + b * b) / 4.0
    g_net = (rho_s - 1.0) * area * gravity
    cs0 = (float(np.cos(theta0)), float(np.sin(theta0)))

    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    if fused:
        from ..kernels.moving_ibm_pallas import make_moving_rot_step, \
            pack_state_rot

        kforce = make_moving_rot_step(
            H, W, dx, dy, half=half, g_net=g_net, m_eff=m_eff,
            i_eff=i_eff, m_max=m_max, dtype=dtype, interpret=interpret)
        fused = kforce is not None

    if fused:
        from ..kernels.cylinder_pallas import make_box_fused_step

        kstep = make_box_fused_step(H, W, omega, dtype=dtype,
                                    interpret=interpret)

        def fused_step(carry):
            f, F, st = carry
            F2, st2 = kforce(f, st, F)
            return kstep(f, F2), F2, st2

        u0 = jnp.zeros((2, H, W), dtype)
        f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
        carry = (f, jnp.zeros((2, H, W), dtype),
                 pack_state_rot(center, cs0, dtype=dtype))
        carry, trajectory = _drive_rigid(
            fused_step, carry, T, record_every, H * W, _FUSED_NS,
            lambda c: c[2][0, :10],
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
        f, _F, st = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        return FallingEllipseResult(
            f=f, rho=rho, u=u, center=st[0, :2], velocity=st[0, 2:4],
            orientation=st[0, 6:8], omega_body=st[0, 8], steps=T,
            trajectory=trajectory)

    step = ellipse_fsi_step(H, W, dx=dx, dy=dy, half=half, omega=omega,
                            m_eff=m_eff, i_eff=i_eff, g_net=g_net,
                            m_max=m_max, dtype=dtype)

    u0 = jnp.zeros((2, H, W), dtype)
    f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
    carry = (f, jnp.asarray(center, dtype), jnp.zeros((2,), dtype),
             jnp.asarray(cs0, dtype), jnp.zeros((), dtype),
             jnp.zeros((2,), dtype), jnp.zeros((), dtype))
    carry, trajectory = _drive_rigid(
        step, carry, T, record_every, H * W, _JNP_NS,
        lambda c: jnp.concatenate([c[1], c[2], c[5], c[3], c[4][None],
                                   c[6][None]]),
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
    f, cen, ub, cs, w, _, _ = carry
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    return FallingEllipseResult(f=f, rho=rho, u=u, center=cen,
                                velocity=ub, orientation=cs, omega_body=w,
                                steps=T, trajectory=trajectory)


@dataclass
class FallingCylinderResult:
    f: jnp.ndarray
    rho: jnp.ndarray
    u: jnp.ndarray
    center: jnp.ndarray      # (2,) final body center (rows, cols)
    velocity: jnp.ndarray    # (2,) final body velocity
    steps: int
    trajectory: object = None  # (T//record_every, 6): cx, cy, Ux, Uy, Fx, Fy


def falling_cylinder(H: int = 400, W: int = 256, T: int = 2000,
                     center=None, radius: float = 12.0,
                     n_markers: int | None = None, rho_s: float = 1.25,
                     gravity: float = 5e-5, omega: float = 1.0 / 0.6,
                     m_max: int = 5, record_every: int = 10,
                     fused: bool | None = None, interpret: bool = False,
                     checkpoint_dir: str | None = None,
                     checkpoint_every: int = 10000,
                     mesh=None,
                     dtype=None) -> FallingCylinderResult:
    """Sedimenting rigid cylinder via moving-marker IBM — fluid-structure
    coupling beyond the reference's static markers (src/ibm.cpp:15-191
    precomputes its weight maps once; ROADMAP item 4).

    A cylinder of density ``rho_s`` (fluid rho_0 = 1) falls under gravity
    ``g`` along +rows in a closed no-slip box.  Each step:

      macroscopics -> BGK collide -> dense Peskin factors rebuilt from
      the marker positions (ops.moving_ibm.window_factors, a traced
      window following the body) -> multi-direct forcing toward the
      body velocity U_b -> standard Guo source over the window ->
      stream -> halfway bounce-back on all four walls.

    Rigid-body closure (translation only; the symmetric fall is
    torque-free): direct-forcing momentum exchange F_h = -sum_j f_j and

        rho_s A dU/dt = F_h + (rho_s - 1) A g e_x,   A = pi r^2

    then semi-implicit Euler: U += dU, x += U.  Using the full body
    inertia rho_s A (not Uhlmann's buoyant (rho_s-1) A, which goes
    unstable here: the per-step exchange gain ~ 2.6 r exceeds the
    buoyant inertia for moderate ratios — measured blow-up in 20 steps
    at rho_s=1.5, r=6) trades a transient added-mass error of order
    1/rho_s for unconditional stability at the ratios the scene targets
    (stability needs roughly rho_s r > 2.6).  Markers default to ~1-cell
    spacing (ceil(2 pi r)), the standard direct-forcing resolution.

    ``record_every`` returns an in-device (T//k, 6) trajectory series
    (center, velocity, hydrodynamic force).  ``center`` defaults to
    (H/4, W/2); the body must keep its markers (+2-cell support) inside
    the closed box for the whole run.

    ``fused`` (auto on TPU/f32 when the margined window fits) runs each
    step as two back-to-back Pallas launches with nothing in between:
    kernels.moving_ibm_pallas carries the rigid-body state through SMEM
    (dynamic-offset window DMA, in-kernel factor rebuild + rigid-body
    update) and kernels.cylinder_pallas.make_box_fused_step does the
    grid-wide collide/Guo/stream/4-wall bounce-back.  Measured 12.2
    us/step vs 55.4 jnp at 400x256 (4.5x); equal to the jnp path at
    1e-12 in f64 (test_falling_cylinder_fused_matches_jnp).

    ``mesh`` (a jax.sharding.Mesh with axis 'x') row-shards the GSPMD
    jnp path: f is placed P(None, 'x', None) and the rigid-body state
    replicated, XLA inserting the window gathers/scatters and the
    replicated rigid update — the multi-chip moving-IBM path (the
    fused two-launch kernels stay single-chip; forces fused=False).
    Virtual-mesh equality vs the single-device path is gated at 1e-12
    (test_moving_ibm::test_falling_cylinder_gspmd_matches_single)."""
    from ..ops.moving_ibm import circle_markers, forcing_window, \
        window_factors

    dtype = default_float(dtype)
    if mesh is not None:
        fused = False  # the SMEM-state kernels are single-chip
    if center is None:
        center = (0.25 * H, 0.5 * W)
    if not (radius + 3 <= center[0] <= H - radius - 3
            and radius + 3 <= center[1] <= W - radius - 3):
        raise ValueError(f"center {center} puts markers (+2-cell Peskin "
                         f"support) outside the {H}x{W} grid")
    if n_markers is None:
        n_markers = int(np.ceil(2.0 * np.pi * radius))
    # window: marker ring +/- radius, 2-cell Peskin support, 3 slack
    half = int(np.ceil(radius)) + 5
    wr = wc = 2 * half
    if wr > H or wc > W:
        raise ValueError("window exceeds grid; enlarge H/W")
    area = np.pi * radius * radius
    m_eff = rho_s * area                  # full body inertia (stable)
    g_net = (rho_s - 1.0) * area * gravity

    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    if fused:
        from ..kernels.cylinder_pallas import make_box_fused_step
        from ..kernels.moving_ibm_pallas import make_moving_forcing_step, \
            pack_state

        theta = np.linspace(0.0, 2.0 * np.pi, n_markers, endpoint=False)
        kforce = make_moving_forcing_step(
            H, W, radius * np.cos(theta), radius * np.sin(theta),
            half=half, g_net=g_net, m_eff=m_eff, m_max=m_max,
            dtype=dtype, interpret=interpret)
        fused = kforce is not None  # margined window must fit the grid

    if fused:
        # two back-to-back Pallas launches per step, NOTHING in between:
        # the rigid-body state itself is a kernel carry, so even the
        # ub/cen update (4 tiny XLA fusions = serial HBM latency on the
        # jnp path) happens in-kernel (kernels/moving_ibm_pallas.py)
        kstep = make_box_fused_step(H, W, omega, dtype=dtype,
                                    interpret=interpret)

        def fused_step(carry):
            f, F, st = carry
            F2, st2 = kforce(f, st, F)
            return kstep(f, F2), F2, st2

        u0 = jnp.zeros((2, H, W), dtype)
        f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
        carry = (f, jnp.zeros((2, H, W), dtype), pack_state(center, dtype=dtype))
        carry, trajectory = _drive_rigid(
            fused_step, carry, T, record_every, H * W, _FUSED_NS,
            lambda c: c[2][0, :6],
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
        f, _F, st = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        return FallingCylinderResult(f=f, rho=rho, u=u, center=st[0, :2],
                                     velocity=st[0, 2:4], steps=T,
                                     trajectory=trajectory)

    def step(carry):
        f, cen, ub, _Fh = carry
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        f_equi = d2q9.equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)

        r0 = jnp.clip(jnp.round(cen[0]).astype(jnp.int32) - half,
                      0, H - wr)
        c0 = jnp.clip(jnp.round(cen[1]).astype(jnp.int32) - half,
                      0, W - wc)
        zero = jnp.int32(0)
        u_win = jax.lax.dynamic_slice(u, (zero, r0, c0), (2, wr, wc))
        rho_win = jax.lax.dynamic_slice(rho, (r0, c0), (wr, wc))
        xs, ys = circle_markers(cen, radius, n_markers, dtype=f.dtype)
        X, Y = window_factors(xs, ys, r0.astype(f.dtype),
                              c0.astype(f.dtype), wr, wc)
        F_win, f_sum = forcing_window(u_win, rho_win, X, Y, ub, m_max)

        S = d2q9.guo_source(u_win, F_win, omega)
        patch = jax.lax.dynamic_slice(f_coll, (zero, r0, c0), (9, wr, wc)) + S
        f_coll = jax.lax.dynamic_update_slice(f_coll, patch, (zero, r0, c0))

        f_new = d2q9.stream(f_coll)
        for side in ("row0", "rowN", "col0", "colN"):
            f_new = bc.bounce_back(f_new, f_coll, side)

        F_h = -f_sum
        accel = (F_h + jnp.asarray([g_net, 0.0], f.dtype)) / m_eff
        ub = ub + accel
        cen = cen + ub
        return f_new, cen, ub, F_h

    u0 = jnp.zeros((2, H, W), dtype)
    f = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), dtype))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        f = jax.device_put(f, NamedSharding(mesh, P(None, "x", None)))
        rep = NamedSharding(mesh, P())
        carry = (f,
                 jax.device_put(jnp.asarray(center, dtype), rep),
                 jax.device_put(jnp.zeros((2,), dtype), rep),
                 jax.device_put(jnp.zeros((2,), dtype), rep))
    else:
        carry = (f, jnp.asarray(center, dtype), jnp.zeros((2,), dtype),
                 jnp.zeros((2,), dtype))
    carry, trajectory = _drive_rigid(
        step, carry, T, record_every, H * W, _JNP_NS,
        lambda c: jnp.concatenate([c[1], c[2], c[3]]),
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every)
    f, cen, ub, _ = carry
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    return FallingCylinderResult(f=f, rho=rho, u=u, center=cen,
                                 velocity=ub, steps=T,
                                 trajectory=trajectory)
