"""Fused moving-marker IBM forcing as one Pallas launch.

The static forcing kernel (kernels/ibm_pallas.py) precomputes its dense
Peskin factors on the host because the reference's markers never move
(/root/reference/src/ibm.cpp:15-191).  For a moving body the factors
depend on the marker positions, which depend on the rigid-body state —
so the jnp path (ops/moving_ibm.py + scenes.obstacles.falling_cylinder)
rebuilds them inside jit each step.  That costs a serial chain of ~10
small XLA fusions per step (dynamic slices, factor evaluation, the
forcing loop, the rigid-body update), each paying an HBM round trip —
measured 2-4x the grid kernel's own runtime on production grids.

This kernel collapses the whole moving-body side into ONE launch per
step by making the rigid-body state itself a kernel carry:

* the state (1, 128) f32 row [cen_x, cen_y, ub_x, ub_y, Fh_x, Fh_y, 0..]
  enters through SMEM, so the window origin is computed on the scalar
  core and feeds a *dynamic-offset* window DMA (8-row / 128-lane aligned
  via ``pl.multiple_of``, the Mosaic alignment contract);
* marker geometry enters as constant centroid offsets (dx, dy) (1, M')
  — rigid translation moves every marker by the same cen, so
  ``x_j = cen_x + dx_j`` stays exact for ANY rigid outline, not just
  circles; padding columns park at +1e9 where the Peskin kernel is
  exactly zero, so they spread nothing and need no mask;
* the dense separable factors X (rw, M') / Y (cw, M') are evaluated on
  the VPU (ops.moving_ibm.window_factors algebra), and interpolation /
  spreading are the same two MXU matmuls as the static kernel;
* multi-direct forcing targets the body velocity U_b (Uhlmann direct
  forcing; the reference's static case is U_b = 0, ibm.cpp:169-183);
* the rigid-body closure (momentum exchange + buoyant gravity, see
  scenes.obstacles.falling_cylinder) updates ub/cen IN-KERNEL and the
  new state leaves as a (1, 128) VMEM row assembled by lane masks.

The force grid F (2, R, C) is an aliased input->output carry like the
static kernel's: only the window rows are rewritten each step.  Because
the window origin moves with the body, the window carries an extra
alignment quantum of margin per axis (+16 rows, +136 lanes before
rounding) so that step t+1's window always covers step t's marker
support: |cen_{t+1} - cen_t| <= 1 and the Peskin support is cen +/- (r+2),
so the stale nonzero rows of the previous window are always overwritten
(with exact zeros where the body has left — spread() is identically zero
beyond 2 cells of every marker).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST

# state-row lane layout (matches the jnp trajectory record
# jnp.concatenate([cen, ub, F_h]) in scenes.obstacles.falling_cylinder;
# the rotating variant appends orientation (cos, sin), angular velocity
# and torque, matching falling_ellipse's record order)
CEN_X, CEN_Y, UB_X, UB_Y, FH_X, FH_Y, ORI_C, ORI_S, ANG_W, TRQ = range(10)
STATE_LANES = 128
FAR = 1.0e9  # padding-marker offset; Peskin weight is exactly 0 there


def pack_state(center, velocity=(0.0, 0.0), dtype=jnp.float32):
    """Initial (1, 128) state row for make_moving_forcing_step."""
    row = np.zeros((1, STATE_LANES), np.float64)
    row[0, CEN_X], row[0, CEN_Y] = float(center[0]), float(center[1])
    row[0, UB_X], row[0, UB_Y] = float(velocity[0]), float(velocity[1])
    return jnp.asarray(row, dtype)


def pack_states(centers, velocities=None, dtype=jnp.float32):
    """Initial (B, 128) state rows for make_moving_bodies_step (one
    pack_state row per body)."""
    centers = np.asarray(centers, np.float64)
    B = centers.shape[0]
    rows = np.zeros((B, STATE_LANES), np.float64)
    rows[:, CEN_X:CEN_Y + 1] = centers
    if velocities is not None:
        rows[:, UB_X:UB_Y + 1] = np.asarray(velocities, np.float64)
    return jnp.asarray(rows, dtype)


def pack_state_rot(center, orientation=(1.0, 0.0), velocity=(0.0, 0.0),
                   omega_body=0.0, dtype=jnp.float32):
    """Initial (1, 128) state row for make_moving_rot_step."""
    row = np.zeros((1, STATE_LANES), np.float64)
    row[0, CEN_X], row[0, CEN_Y] = float(center[0]), float(center[1])
    row[0, UB_X], row[0, UB_Y] = float(velocity[0]), float(velocity[1])
    row[0, ORI_C], row[0, ORI_S] = float(orientation[0]), \
        float(orientation[1])
    row[0, ANG_W] = float(omega_body)
    return jnp.asarray(row, dtype)


def _make_peskin(dt):
    """Peskin 4-point kernel (ibm.cpp:39-45), vector form."""
    def peskin(r):
        r = jnp.abs(r)
        inner = 0.125 * (3.0 - 2.0 * r
                         + jnp.sqrt(jnp.maximum(
                             1.0 + 4.0 * r - 4.0 * r * r, dt(0.0))))
        outer = 0.125 * (5.0 - 2.0 * r
                         - jnp.sqrt(jnp.maximum(
                             -7.0 + 12.0 * r - 4.0 * r * r, dt(0.0))))
        zero = jnp.zeros_like(r)
        return jnp.where(r <= 1.0, inner, jnp.where(r <= 2.0, outer, zero))
    return peskin


def _window_macroscopics(fwin):
    """rho, 1/rho, ux, uy from a (9, rw, cw) VMEM population window."""
    f = [fwin[k] for k in range(9)]
    rho = f[0]
    for k in range(1, 9):
        rho = rho + f[k]
    inv_rho = 1.0 / rho
    ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
    uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho
    return rho, inv_rho, ux, uy


def _forcing_iterations(rho, inv_rho, ux, uy, Xm, Ym, ub_x_m, ub_y_m,
                        n_iter: int):
    """The shared multi-direct-forcing loop of every moving-IBM kernel:
    dense factors Xm (rw, M') / Ym (cw, M'), marker velocity targets
    ub_x/y_m ((1, M') or scalar), n_iter direct-forcing iterations
    (ibm.cpp:166-187 with the U_b target).  Returns the window force
    density (Fx, Fy) and the per-marker Lagrangian force sums
    (fxj_t, fyj_t) (1, M') — matching ops.moving_ibm.
    forcing_window_markers' accumulation order."""
    def interp(g):
        V = jax.lax.dot_general(g, Ym, (((1,), (0,)), ((), ())),
                                precision=HIGHEST)       # (rw, M')
        return jnp.sum(V * Xm, axis=0, keepdims=True)    # (1, M')

    def spread(s):
        A = Xm * s                                       # (rw, M')
        return jax.lax.dot_general(A, Ym, (((1,), (1,)), ((), ())),
                                   precision=HIGHEST)    # (rw, cw)

    rho_j = interp(rho)
    half_inv = 0.5 * inv_rho
    ux_w, uy_w = ux, uy
    Fx = jnp.zeros_like(rho)
    Fy = jnp.zeros_like(rho)
    fxj_t = jnp.zeros_like(rho_j)
    fyj_t = jnp.zeros_like(rho_j)
    for _ in range(n_iter):
        fx_j = 2.0 * rho_j * (ub_x_m - interp(ux_w))
        fy_j = 2.0 * rho_j * (ub_y_m - interp(uy_w))
        Fx_n = spread(fx_j)
        Fy_n = spread(fy_j)
        ux_w = ux_w + Fx_n * half_inv
        uy_w = uy_w + Fy_n * half_inv
        Fx = Fx + Fx_n
        Fy = Fy + Fy_n
        fxj_t = fxj_t + fx_j
        fyj_t = fyj_t + fy_j
    return Fx, Fy, fxj_t, fyj_t


def make_moving_forcing_step(H: int, W: int, marker_dx, marker_dy, *,
                             half: int, g_net: float, m_eff: float,
                             m_max: int = 5, dtype=jnp.float32,
                             interpret: bool = False):
    """Build ``fn(f, state, F_carry) -> (F_full, state_new)``.

    Args:
      marker_dx/dy: (M,) rigid offsets of the markers from the body
        centroid (for a cylinder: r cos/sin theta, ops.moving_ibm.circle_markers).
      half: the scene's window half-extent, ceil(radius) + 5 (marker
        ring + 2-cell Peskin support + slack); the aligned window adds
        its own margins on top.
      g_net, m_eff: net gravity force (rho_s - 1) A g and body inertia
        rho_s A of the rigid closure (falling_cylinder docstring).
      m_max: forcing iterations + 1, the reference's convention
        (ibm.cpp:59-66).

    Returns None when the margined window does not fit the grid (caller
    falls back to the jnp path).
    """
    if H % 8 or W % 128:
        return None
    rwa = -(-(2 * half + 16) // 8) * 8
    cwa = -(-(2 * half + 136) // 128) * 128
    if rwa > H or cwa > W:
        return None
    dx = np.asarray(marker_dx, np.float64)
    dy = np.asarray(marker_dy, np.float64)
    M = dx.shape[0]
    m_pad = -(-M // 128) * 128
    # VMEM: f window (9) + F window (2) + X/Y factor strips
    if (11 * rwa * cwa + (rwa + cwa) * m_pad) * jnp.dtype(dtype).itemsize \
            > 12 * 2 ** 20:
        return None
    dxp = np.full((1, m_pad), FAR)
    dyp = np.full((1, m_pad), FAR)
    dxp[0, :M] = dx
    dyp[0, :M] = dy
    dxv = jnp.asarray(dxp, dtype)
    dyv = jnp.asarray(dyp, dtype)
    n_iter = m_max - 1
    dt = jnp.dtype(dtype).type
    g_net = dt(g_net)
    inv_m = dt(1.0 / m_eff)

    _peskin = _make_peskin(dt)

    def kernel(state_ref, f_hbm, dx_ref, dy_ref, Fin_hbm, Fout_hbm,
               sout_ref):
        del Fin_hbm  # aliased to Fout_hbm; rows outside the window persist
        cenx = state_ref[0, CEN_X]
        ceny = state_ref[0, CEN_Y]
        ubx = state_ref[0, UB_X]
        uby = state_ref[0, UB_Y]
        # window origin: round(cen) - half, aligned down, clipped.
        # cen > 0 always (body inside the grid), so int truncation of
        # cen + 0.5 is floor = round-half-up.
        ri = (cenx + 0.5).astype(jnp.int32) - half
        ci = (ceny + 0.5).astype(jnp.int32) - half
        r0 = jnp.clip((ri // 8) * 8, 0, H - rwa)
        c0 = jnp.clip((ci // 128) * 128, 0, W - cwa)
        r0 = pl.multiple_of(r0, 8)
        c0 = pl.multiple_of(c0, 128)

        def scoped(fwin, Fwin, sem_in, sem_out):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(r0, rwa), pl.ds(c0, cwa)], fwin, sem_in)
            cp.start()
            cp.wait()
            rho, inv_rho, ux, uy = _window_macroscopics(fwin)

            # dense separable Peskin factors at the current markers
            xs = cenx + dx_ref[...]                       # (1, M')
            ys = ceny + dy_ref[...]
            rgrid = jax.lax.broadcasted_iota(
                jnp.int32, (rwa, m_pad), 0).astype(dt) + r0.astype(dt)
            cgrid = jax.lax.broadcasted_iota(
                jnp.int32, (cwa, m_pad), 0).astype(dt) + c0.astype(dt)
            Xm = _peskin(rgrid - xs)                      # (rw, M')
            Ym = _peskin(cgrid - ys)                      # (cw, M')

            Fx, Fy, fxj_t, fyj_t = _forcing_iterations(
                rho, inv_rho, ux, uy, Xm, Ym, ubx, uby, n_iter)
            Fwin[0] = Fx
            Fwin[1] = Fy
            cpo = pltpu.make_async_copy(
                Fwin, Fout_hbm.at[:, pl.ds(r0, rwa), pl.ds(c0, cwa)],
                sem_out)
            cpo.start()

            # rigid-body closure, in-kernel (falling_cylinder docstring):
            # F_h = -f_sum;  ub += (F_h + g_net e_x) / m_eff;  cen += ub
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, STATE_LANES), 1)
            Fhx = jnp.broadcast_to(
                -jnp.sum(fxj_t, axis=1, keepdims=True), (1, STATE_LANES))
            Fhy = jnp.broadcast_to(
                -jnp.sum(fyj_t, axis=1, keepdims=True), (1, STATE_LANES))
            ubx2 = ubx + (Fhx + g_net) * inv_m
            uby2 = uby + Fhy * inv_m
            out = jnp.zeros((1, STATE_LANES), dt)
            for idx, val in ((CEN_X, cenx + ubx2), (CEN_Y, ceny + uby2),
                             (UB_X, ubx2), (UB_Y, uby2),
                             (FH_X, Fhx), (FH_Y, Fhy)):
                out = jnp.where(lane == idx, val, out)
            sout_ref[...] = out
            cpo.wait()

        pl.run_scoped(
            scoped,
            fwin=pltpu.VMEM((9, rwa, cwa), dt),
            Fwin=pltpu.VMEM((2, rwa, cwa), dt),
            sem_in=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA,
        )

    step = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((2, H, W), dtype),
                   jax.ShapeDtypeStruct((1, STATE_LANES), dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, STATE_LANES), lambda: (0, 0))],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def fn(f, state, F_carry):
        return step(state, f, dxv, dyv, F_carry)

    fn.window_shape = (rwa, cwa)
    return fn


def make_moving_rot_step(H: int, W: int, marker_dx, marker_dy, *,
                         half: int, g_net: float, m_eff: float,
                         i_eff: float, m_max: int = 5, dtype=jnp.float32,
                         interpret: bool = False):
    """Rotating-body variant of make_moving_forcing_step backing
    scenes.obstacles.falling_ellipse: ``fn(f, state, F_carry) ->
    (F_full, state_new)`` with the pack_state_rot lane layout.

    The orientation (cos, sin) rides the SMEM state row: world marker
    offsets r_j = R(theta) d_j are two fused multiply-adds on the
    constant body-frame offsets, marker velocity targets carry the
    rigid U_b + w x r_j term, the per-marker force sums close BOTH
    momentum and angular momentum (T_h = -sum r_j x f_j), and the
    orientation advances by the same Cayley map as the jnp path
    (ops.moving_ibm.cayley_rotate — identical algebra, no in-kernel
    trig).  Padding markers park at dx=+1e9, dy=0: |R(theta)(1e9, 0)|
    = 1e9 for every theta, so at least one Peskin axis factor is
    exactly zero and pads spread nothing."""
    if H % 8 or W % 128:
        return None
    rwa = -(-(2 * half + 16) // 8) * 8
    cwa = -(-(2 * half + 136) // 128) * 128
    if rwa > H or cwa > W:
        return None
    dx = np.asarray(marker_dx, np.float64)
    dy = np.asarray(marker_dy, np.float64)
    M = dx.shape[0]
    m_pad = -(-M // 128) * 128
    # VMEM: f window (9) + F window (2) + X/Y factor strips
    if (11 * rwa * cwa + (rwa + cwa) * m_pad) * jnp.dtype(dtype).itemsize \
            > 12 * 2 ** 20:
        return None
    dxp = np.full((1, m_pad), FAR)
    dyp = np.zeros((1, m_pad))
    dxp[0, :M] = dx
    dyp[0, :M] = dy
    dxv = jnp.asarray(dxp, dtype)
    dyv = jnp.asarray(dyp, dtype)
    n_iter = m_max - 1
    dt = jnp.dtype(dtype).type
    g_net = dt(g_net)
    inv_m = dt(1.0 / m_eff)
    inv_i = dt(1.0 / i_eff)
    _peskin = _make_peskin(dt)

    def kernel(state_ref, f_hbm, dx_ref, dy_ref, Fin_hbm, Fout_hbm,
               sout_ref):
        del Fin_hbm
        cenx = state_ref[0, CEN_X]
        ceny = state_ref[0, CEN_Y]
        ubx = state_ref[0, UB_X]
        uby = state_ref[0, UB_Y]
        oc = state_ref[0, ORI_C]
        os_ = state_ref[0, ORI_S]
        wb = state_ref[0, ANG_W]
        ri = (cenx + 0.5).astype(jnp.int32) - half
        ci = (ceny + 0.5).astype(jnp.int32) - half
        r0 = jnp.clip((ri // 8) * 8, 0, H - rwa)
        c0 = jnp.clip((ci // 128) * 128, 0, W - cwa)
        r0 = pl.multiple_of(r0, 8)
        c0 = pl.multiple_of(c0, 128)

        def scoped(fwin, Fwin, sem_in, sem_out):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(r0, rwa), pl.ds(c0, cwa)], fwin, sem_in)
            cp.start()
            cp.wait()
            rho, inv_rho, ux, uy = _window_macroscopics(fwin)

            rx = oc * dx_ref[...] - os_ * dy_ref[...]    # (1, M') world
            ry = os_ * dx_ref[...] + oc * dy_ref[...]
            xs = cenx + rx
            ys = ceny + ry
            rgrid = jax.lax.broadcasted_iota(
                jnp.int32, (rwa, m_pad), 0).astype(dt) + r0.astype(dt)
            cgrid = jax.lax.broadcasted_iota(
                jnp.int32, (cwa, m_pad), 0).astype(dt) + c0.astype(dt)
            Xm = _peskin(rgrid - xs)
            Ym = _peskin(cgrid - ys)

            # rigid targets U_b + w x r per marker
            Fx, Fy, fxj_t, fyj_t = _forcing_iterations(
                rho, inv_rho, ux, uy, Xm, Ym,
                ubx - wb * ry, uby + wb * rx, n_iter)
            Fwin[0] = Fx
            Fwin[1] = Fy
            cpo = pltpu.make_async_copy(
                Fwin, Fout_hbm.at[:, pl.ds(r0, rwa), pl.ds(c0, cwa)],
                sem_out)
            cpo.start()

            # rigid closure with angular momentum (falling_ellipse):
            # F_h = -sum f_j;  T_h = -sum (r x f);  Cayley orientation
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, STATE_LANES), 1)
            Fhx = jnp.broadcast_to(
                -jnp.sum(fxj_t, axis=1, keepdims=True), (1, STATE_LANES))
            Fhy = jnp.broadcast_to(
                -jnp.sum(fyj_t, axis=1, keepdims=True), (1, STATE_LANES))
            Th = jnp.broadcast_to(
                -jnp.sum(rx * fyj_t - ry * fxj_t, axis=1, keepdims=True),
                (1, STATE_LANES))
            ubx2 = ubx + (Fhx + g_net) * inv_m
            uby2 = uby + Fhy * inv_m
            wb2 = wb + Th * inv_i
            # cayley_rotate(oc, os_, wb2), vector form
            t = 0.5 * wb2
            t2 = t * t
            den = 1.0 / (1.0 + t2)
            oc2 = (oc * (1.0 - t2) - os_ * (2.0 * t)) * den
            os2 = (os_ * (1.0 - t2) + oc * (2.0 * t)) * den
            out = jnp.zeros((1, STATE_LANES), dt)
            for idx, val in ((CEN_X, cenx + ubx2), (CEN_Y, ceny + uby2),
                             (UB_X, ubx2), (UB_Y, uby2),
                             (FH_X, Fhx), (FH_Y, Fhy),
                             (ORI_C, oc2), (ORI_S, os2),
                             (ANG_W, wb2), (TRQ, Th)):
                out = jnp.where(lane == idx, val, out)
            sout_ref[...] = out
            cpo.wait()

        pl.run_scoped(
            scoped,
            fwin=pltpu.VMEM((9, rwa, cwa), dt),
            Fwin=pltpu.VMEM((2, rwa, cwa), dt),
            sem_in=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA,
        )

    step = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((2, H, W), dtype),
                   jax.ShapeDtypeStruct((1, STATE_LANES), dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, STATE_LANES), lambda: (0, 0))],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def fn(f, state, F_carry):
        return step(state, f, dxv, dyv, F_carry)

    fn.window_shape = (rwa, cwa)
    return fn


def make_moving_bodies_step(H: int, W: int, marker_dx, marker_dy, *,
                            n_bodies: int, rw: int, half: int,
                            g_net: float, m_eff: float, radius: float = None,
                            m_max: int = 5, zeta: float = 2.0,
                            eps: float = 50.0, dtype=jnp.float32,
                            interpret: bool = False):
    """Multi-body variant of make_moving_forcing_step backing
    scenes.obstacles.falling_cylinders (DKT).

    ``fn(f, states, F_carry) -> (F_full, states_new)`` with ``states``
    (B, 128) rows in the pack_state layout.  All bodies share one UNION
    window: full channel width, ``rw`` rows (the scene's span budget)
    plus alignment/motion margins, following min(cen_rows).  Markers of
    all bodies are concatenated into one padded lane axis — the same
    dense factors and MXU matmuls as the single-body kernel apply the
    COMBINED multi-direct-forcing operator, and per-body momentum
    exchange comes from static lane-range masks.  The rigid update adds
    Glowinski barrier forces (pairwise + walls; ops.moving_ibm.
    barrier_forces algebra) computed in-kernel from the state rows.

    Returns None when the margined window or the marker lanes do not
    fit (caller falls back to the jnp path).
    """
    if H % 8 or W % 128:
        return None
    B = int(n_bodies)
    rwa = -(-(rw + 16) // 8) * 8
    if rwa > H or W < 2 * half + 8:
        return None
    dx = np.asarray(marker_dx, np.float64)
    dy = np.asarray(marker_dy, np.float64)
    M = dx.shape[0]
    if radius is None:
        radius = float(np.hypot(dx, dy).max())
    m_pad = -(-(B * M) // 128) * 128
    # VMEM: f window (9) + F window (2) + X/Y factors
    if (11 * rwa * W + (rwa + W) * m_pad) * jnp.dtype(dtype).itemsize \
            > 12 * 2 ** 20:
        return None
    dxp = np.full((1, m_pad), FAR)
    dyp = np.full((1, m_pad), FAR)
    for b in range(B):
        dxp[0, b * M:(b + 1) * M] = dx
        dyp[0, b * M:(b + 1) * M] = dy
    dxv = jnp.asarray(dxp, dtype)
    dyv = jnp.asarray(dyp, dtype)
    n_iter = m_max - 1
    dt = jnp.dtype(dtype).type
    g_net = dt(g_net)
    inv_m = dt(1.0 / m_eff)
    inv_eps = dt(1.0 / eps)
    inv_eps_w = dt(2.0 / eps)          # barrier_forces: eps_wall = eps/2
    reach = dt(2.0 * radius + zeta)    # pairwise activation distance
    wall_reach = dt(radius + zeta)
    _peskin = _make_peskin(dt)

    def kernel(state_ref, f_hbm, dx_ref, dy_ref, Fin_hbm, Fout_hbm,
               sout_ref):
        del Fin_hbm
        cenx = [state_ref[b, CEN_X] for b in range(B)]
        ceny = [state_ref[b, CEN_Y] for b in range(B)]
        ubx = [state_ref[b, UB_X] for b in range(B)]
        uby = [state_ref[b, UB_Y] for b in range(B)]
        cmin = cenx[0]
        for b in range(1, B):
            cmin = jnp.minimum(cmin, cenx[b])
        ri = (cmin + 0.5).astype(jnp.int32) - half
        r0 = jnp.clip((ri // 8) * 8, 0, H - rwa)
        r0 = pl.multiple_of(r0, 8)

        def scoped(fwin, Fwin, sem_in, sem_out):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(r0, rwa)], fwin, sem_in)
            cp.start()
            cp.wait()
            rho, inv_rho, ux, uy = _window_macroscopics(fwin)

            # per-marker body id via static lane ranges
            lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
            masks = [(lane_m >= b * M) & (lane_m < (b + 1) * M)
                     for b in range(B)]
            zeros_m = jnp.zeros((1, m_pad), dt)
            cen_x_m = zeros_m
            cen_y_m = zeros_m
            ub_x_m = zeros_m
            ub_y_m = zeros_m
            for b in range(B):
                cen_x_m = jnp.where(masks[b], cenx[b], cen_x_m)
                cen_y_m = jnp.where(masks[b], ceny[b], cen_y_m)
                ub_x_m = jnp.where(masks[b], ubx[b], ub_x_m)
                ub_y_m = jnp.where(masks[b], uby[b], ub_y_m)
            xs = cen_x_m + dx_ref[...]     # FAR pads stay far: weight 0
            ys = cen_y_m + dy_ref[...]
            rgrid = jax.lax.broadcasted_iota(
                jnp.int32, (rwa, m_pad), 0).astype(dt) + r0.astype(dt)
            cgrid = jax.lax.broadcasted_iota(
                jnp.int32, (W, m_pad), 0).astype(dt)
            Xm = _peskin(rgrid - xs)
            Ym = _peskin(cgrid - ys)

            Fx, Fy, fxj_t, fyj_t = _forcing_iterations(
                rho, inv_rho, ux, uy, Xm, Ym, ub_x_m, ub_y_m, n_iter)
            Fwin[0] = Fx
            Fwin[1] = Fy
            cpo = pltpu.make_async_copy(
                Fwin, Fout_hbm.at[:, pl.ds(r0, rwa)], sem_out)
            cpo.start()

            # rigid closure per body: momentum exchange + gravity +
            # Glowinski barriers (pairwise + 4 walls), as (1, 128) rows
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, STATE_LANES), 1)
            ones = jnp.ones((1, STATE_LANES), dt)
            rows = []
            for b in range(B):
                Fhx = -jnp.broadcast_to(
                    jnp.sum(jnp.where(masks[b], fxj_t, zeros_m),
                            axis=1, keepdims=True), (1, STATE_LANES))
                Fhy = -jnp.broadcast_to(
                    jnp.sum(jnp.where(masks[b], fyj_t, zeros_m),
                            axis=1, keepdims=True), (1, STATE_LANES))
                rep_x = jnp.zeros((1, STATE_LANES), dt)
                rep_y = jnp.zeros((1, STATE_LANES), dt)
                for o in range(B):
                    if o == b:
                        continue
                    dxc = (cenx[b] - cenx[o]) * ones
                    dyc = (ceny[b] - ceny[o]) * ones
                    dist = jnp.sqrt(dxc * dxc + dyc * dyc)
                    ov = jnp.maximum(reach - dist, 0.0)
                    s = ov * ov * inv_eps / dist
                    rep_x = rep_x + dxc * s
                    rep_y = rep_y + dyc * s
                # walls at -0.5 and N-0.5 (barrier_forces algebra)
                lox = jnp.maximum(wall_reach - (cenx[b] + 0.5), 0.0) * ones
                hix = jnp.maximum(cenx[b] - (H - 0.5 - wall_reach),
                                  0.0) * ones
                loy = jnp.maximum(wall_reach - (ceny[b] + 0.5), 0.0) * ones
                hiy = jnp.maximum(ceny[b] - (W - 0.5 - wall_reach),
                                  0.0) * ones
                rep_x = rep_x + (lox * lox - hix * hix) * inv_eps_w
                rep_y = rep_y + (loy * loy - hiy * hiy) * inv_eps_w
                ubx2 = ubx[b] + (Fhx + g_net + rep_x) * inv_m
                uby2 = uby[b] + (Fhy + rep_y) * inv_m
                out = jnp.zeros((1, STATE_LANES), dt)
                for idx, val in ((CEN_X, cenx[b] + ubx2),
                                 (CEN_Y, ceny[b] + uby2),
                                 (UB_X, ubx2), (UB_Y, uby2),
                                 (FH_X, Fhx), (FH_Y, Fhy)):
                    out = jnp.where(lane == idx, val, out)
                rows.append(out)
            sout_ref[...] = jnp.concatenate(rows, axis=0) if B > 1 \
                else rows[0]
            cpo.wait()

        pl.run_scoped(
            scoped,
            fwin=pltpu.VMEM((9, rwa, W), dt),
            Fwin=pltpu.VMEM((2, rwa, W), dt),
            sem_in=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA,
        )

    step = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((2, H, W), dtype),
                   jax.ShapeDtypeStruct((B, STATE_LANES), dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec((1, m_pad), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((B, STATE_LANES), lambda: (0, 0))],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def fn(f, states, F_carry):
        return step(states, f, dxv, dyv, F_carry)

    fn.window_shape = (rwa, W)
    return fn
