"""Fused free-stream/obstacle step (BGK + Guo forcing + ABB inlet/outlet +
specular side walls) as one Pallas kernel — the grid-wide half of the IBM
cylinder driver (test/cylinder_test.cpp:88-163).

TPU-first split of the IBM scene: the per-marker gather/interp/spread of
multi-direct forcing (dozens of markers, a small ROI) stays in jnp where
XLA handles it well; everything that touches the full grid — collision,
the Guo source, periodic streaming and the wall overwrites — fuses into a
single launch.  The kernel takes the Eulerian force density as a full-grid
(2, R, C) input: the Guo source is linear in F, so cells outside the
marker ROI (where F == 0) contribute exactly zero and no ROI masking is
needed in-kernel.

Step order matches cylinder_test.cpp: macroscopics -> equilibrium -> BGK
-> Guo source (weak 1/3, 1/9 coefficients, :66-67,117) -> fully periodic
streaming -> ABB rows 0/R-1 with constant wall velocity (:132-154) ->
specular columns C-1/0 (:156-163).  All BC overwrites read post-collision
values at the same row/col, so plain absolute-position masks suffice (no
cross-row extractions, hence no slab-aliasing constraint)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat
from .collide_stream import HALO

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
OPP = tuple(int(v) for v in lat.OPP)
SPEC_Y = tuple(int(v) for v in lat.SPEC_Y)


def _abb_coeffs(u_wall) -> tuple[float, ...]:
    """(2 + 9 (u_w.c_k)^2 - 3 u_w.u_w) W_k as python scalars (constant wall
    velocity; free_stream_test.cpp:106)."""
    uw = np.asarray(u_wall, np.float64)
    uu = float(uw @ uw)
    out = []
    for k in range(9):
        cu = CX[k] * uw[0] + CY[k] * uw[1]
        out.append((2.0 + 9.0 * cu * cu - 3.0 * uu) * WQ[k])
    return tuple(out)


def _collide_guo_stream(f, Fx, Fy, *, omega, guo, C, dtype):
    """Shared hot path: BGK + Guo source (full-grid F) + periodic streaming.

    Paired-direction collision + Guo source: even/odd split per
    opposite-direction pair (kernels.collide_stream.d2q9_pairs);
    cu and c.F both flip sign with the direction, so the source
    splits as even = ics4*cu*cF - ics2*uF, odd = ics2*cF.
    Returns (coll, new): post-collision and post-streaming planes."""
    ics2, ics4 = guo
    pref = 1.0 - 0.5 * omega
    rows = f[0].shape[0]
    rho = f[0]
    for k in range(1, 9):
        rho = rho + f[k]
    inv_rho = 1.0 / rho
    ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
    uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho
    uF = ux * Fx + uy * Fy

    from .collide_stream import d2q9_pairs

    t0, pairs = d2q9_pairs(ux, uy)
    one_m_om = dtype(1.0 - omega)
    om = dtype(omega)
    coll = [None] * 9
    coll[0] = one_m_om * f[0] + om * (dtype(WQ[0]) * rho * t0) \
        + dtype(WQ[0]) * (pref * (-ics2 * uF))
    for kp, km, w, cu, cc in pairs:
        wr = dtype(w) * rho
        even_f = om * (wr * (t0 + 4.5 * cc))
        odd_f = om * (wr * (3.0 * cu))
        cF = CX[kp] * Fx + CY[kp] * Fy
        even_s = dtype(w) * (pref * (ics4 * cu * cF - ics2 * uF))
        odd_s = dtype(w) * (pref * (ics2 * cF))
        coll[kp] = one_m_om * f[kp] + (even_f + odd_f) \
            + (even_s + odd_s)
        coll[km] = one_m_om * f[km] + (even_f - odd_f) \
            + (even_s - odd_s)

    # periodic streaming
    new = []
    for k in range(9):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % C, axis=1)
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        new.append(t)
    return coll, new


def _make_body(*, omega, guo, abb, R, C, dtype):
    def body(block, fblock, abs_iota, i):
        f = [block[k] for k in range(9)]
        shape = f[0].shape
        rows = shape[0]
        abs_iota = jax.lax.rem(abs_iota + jnp.int32(R), jnp.int32(R))
        ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        coll, new = _collide_guo_stream(f, fblock[0], fblock[1],
                                        omega=omega, guo=guo, C=C,
                                        dtype=dtype)

        # ABB inlet/outlet rows (all 8 moving dirs, cylinder_test.cpp:132-154)
        for mask_rows in (abs_iota == 0, abs_iota == R - 1):
            for k in range(1, 9):
                new[OPP[k]] = jnp.where(
                    mask_rows, -coll[k] + dtype(abb[k]), new[OPP[k]])
        # specular side walls (cylinder_test.cpp:156-163)
        for k in (2, 5, 6):      # outgoing at col C-1
            new[SPEC_Y[k]] = jnp.where(ci == C - 1, coll[k], new[SPEC_Y[k]])
        for k in (4, 7, 8):      # outgoing at col 0
            new[SPEC_Y[k]] = jnp.where(ci == 0, coll[k], new[SPEC_Y[k]])

        return jnp.stack([p[HALO:rows - HALO] for p in new], axis=0)

    return body


def make_cylinder_fused_step(R: int, C: int, omega: float,
                             u_wall=(0.05, 0.0),
                             guo=(1.0 / 3.0, 1.0 / 9.0),
                             dtype=jnp.float32,
                             block_rows: int | None = None,
                             interpret: bool = False):
    """Fused free-stream step: (f (9,R,C), F (2,R,C)) -> (9,R,C).

    ``F`` is the Eulerian IBM force density on the full grid (zero outside
    the marker ROI); ``u_wall`` the constant ABB wall velocity; ``guo`` the
    (ics2, ics4) source coefficients — the cylinder driver's weak (1/3, 1/9)
    by default (cylinder_test.cpp:66-67).  Built on the two-input form of
    kernels.pipeline."""
    from .pipeline import make_block_pipeline

    body = _make_body(omega=omega, guo=(float(guo[0]), float(guo[1])),
                      abb=_abb_coeffs(u_wall), R=R, C=C,
                      dtype=jnp.dtype(dtype).type)
    return make_block_pipeline((9, 2), R, C, body, planes_out=9,
                               dtype=dtype, block_rows=block_rows,
                               vmem_budget=8 * 2 ** 20,
                               flops_per_cell=110, interpret=interpret)


def make_box_fused_step(R: int, C: int, omega: float,
                        guo=(3.0, 9.0),
                        dtype=jnp.float32,
                        block_rows: int | None = None,
                        interpret: bool = False):
    """Fused closed-box step: (f (9,R,C), F (2,R,C)) -> (9,R,C).

    BGK + standard Guo source from a full-grid force density + periodic
    streaming + halfway no-slip bounce-back on all four walls — the
    grid-wide half of the moving-IBM falling-cylinder scene (pairs with
    kernels.moving_ibm_pallas.make_moving_forcing_step the way
    make_cylinder_fused_step pairs with the static forcing kernel).
    Wall handling follows cavity_pallas: masks on the UNwrapped absolute
    row index, since the wall overwrites repair every boundary-crossing
    population the periodic rolls mis-wrap (CLAUDE.md wrap-abs rule).
    Corner order matches scenes.obstacles.falling_cylinder's
    row0/rowN/col0/colN sequence (the overlapping corner writes are
    identical values, so the order is cosmetic)."""
    from .pipeline import make_block_pipeline

    guo = (float(guo[0]), float(guo[1]))
    dt = jnp.dtype(dtype).type

    def body(block, fblock, abs_iota, i):
        f = [block[k] for k in range(9)]
        shape = f[0].shape
        rows = shape[0]
        ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        coll, new = _collide_guo_stream(f, fblock[0], fblock[1],
                                        omega=omega, guo=guo, C=C,
                                        dtype=dt)

        # halfway bounce-back on the four outer walls
        for k in (3, 6, 7):                       # outgoing at row 0
            new[OPP[k]] = jnp.where(abs_iota == 0, coll[k], new[OPP[k]])
        for k in (1, 5, 8):                       # outgoing at row R-1
            new[OPP[k]] = jnp.where(abs_iota == R - 1, coll[k], new[OPP[k]])
        for k in (4, 7, 8):                       # outgoing at col 0
            new[OPP[k]] = jnp.where(ci == 0, coll[k], new[OPP[k]])
        for k in (2, 5, 6):                       # outgoing at col C-1
            new[OPP[k]] = jnp.where(ci == C - 1, coll[k], new[OPP[k]])

        return jnp.stack([p[HALO:rows - HALO] for p in new], axis=0)

    return make_block_pipeline((9, 2), R, C, body, planes_out=9,
                               dtype=dtype, block_rows=block_rows,
                               vmem_budget=8 * 2 ** 20,
                               flops_per_cell=110, interpret=interpret)
