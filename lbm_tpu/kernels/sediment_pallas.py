"""Fused rectangle-sedimentation step (BGK fluid + ADE passive scalar) as
one Pallas launch — the coupled-physics driver
(test/rectangle_sedimentation_test.cpp:23-248) at fused-kernel speed.

State packing: (18, R, C) = fluid f (9) + scalar g (9).  One launch runs
both collisions (the scalar's equilibrium advects at u + w_s,
:125,201), the pre-stream zero-gradient outflows on g (:134-141),
periodic streaming, and the full wall stack: ABB inlet col 0 with the
fixed wall velocity (:148-157), extrapolated-ABB outlet col C-1
(:159-172), specular row 0 (:174-177), bounce-back row R-1 (:179-182),
the interior rectangle's bounce-back (fluid, :184-196) and
anti-bounce-back (scalar, :220-232) walls, the ADE Dirichlet inlet with
2 g_eq at the *updated* velocity (:199-218), and the scalar's row R-1
bounce-back (:233-236).

All BC edits are absolute-position masks on the unwrapped global row
index: wrapped halo rows only feed populations that the row BCs
overwrite, or that wrap exactly as the oracle's periodic stream does.
Built on kernels.pipeline.make_block_pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat
from .collide_stream import HALO
from .pipeline import make_block_pipeline

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
OPP = tuple(int(v) for v in lat.OPP)
SPEC_X = tuple(int(v) for v in lat.SPEC_X)


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _edge_col(x, col: int):
    """(rows, 1) copy of column ``col`` via masked reduction."""
    mask = _col_iota(x.shape) == col
    return jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True)


def _bgk9(fields, ux, uy, dens, omega, shift=0.0):
    """(1-w) f + w feq with the standard compressible equilibrium at
    velocity (ux+shift, uy+shift) and density ``dens`` (paired-direction
    form, kernels.collide_stream.d2q9_pairs)."""
    from .collide_stream import d2q9_pairs

    t0, pairs = d2q9_pairs(ux + shift, uy + shift)
    out = [None] * 9
    out[0] = (1.0 - omega) * fields[0] + omega * (WQ[0] * dens * t0)
    for kp, km, w, cu, cc in pairs:
        wr = w * dens
        even = omega * (wr * (t0 + 4.5 * cc))
        odd = omega * (wr * (3.0 * cu))
        out[kp] = (1.0 - omega) * fields[kp] + (even + odd)
        out[km] = (1.0 - omega) * fields[km] + (even - odd)
    return out


def _stream9(coll, rows, C):
    new = []
    for k in range(9):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % C, axis=1)
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        new.append(t)
    return new


def make_sediment_fused_step(R: int, C: int, *, omega: float, u_in: float,
                             w_s: float, C_w: float, R23: int, C28: int,
                             C38: int, inlet_rows: int,
                             substeps: int = 1,
                             dtype=jnp.float32,
                             block_rows: int | None = None,
                             interpret: bool = False):
    """Fused coupled step: S (18, R, C) = [f(9), g(9)] -> (18, R, C),
    advancing ``substeps`` steps per launch.  Temporal blocking: the
    body has no gradient stencils, so each sweep consumes 1 of the 8
    halo rows, and the wall/inlet masks (applied on EVERY block every
    sweep — this kernel has no mask-free fast path) cut the
    cross-boundary dependencies, exactly as in thermal_pallas."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    R23 = R23 % R if R23 < 0 else R23

    def body(block, abs_iota, i):
        rows = block.shape[1]
        ci = _col_iota((rows, C))
        f = [block[k] for k in range(9)]
        g = [block[9 + k] for k in range(9)]
        if substeps > 1:
            # The scalar's row-0 side has a LIVE periodic wrap (the
            # zero-gradient edit is pre-stream; its incoming populations
            # are never overwritten), so sweep 2+ needs halo rows
            # computed as their TRUE global rows: wrap abs_iota.  Safe
            # for the masked extractions because the alias-free slab
            # guard means each global row appears exactly once per slab.
            abs_iota = jax.lax.rem(abs_iota + jnp.int32(R), jnp.int32(R))
        for _ in range(substeps):
            f, g = sweep(f, g, rows, ci, abs_iota)
        out = f + g
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    def sweep(f, g, rows, ci, abs_iota):
        rho = f[0]
        conc = g[0]
        for k in range(1, 9):
            rho = rho + f[k]
            conc = conc + g[k]
        inv_rho = 1.0 / rho
        ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
        uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho

        f_coll = _bgk9(f, ux, uy, rho, omega)
        g_coll = _bgk9(g, ux, uy, conc, omega, shift=w_s)

        # --- pre-stream zero-gradient scalar outflows (:134-141)
        row1 = [jnp.sum(jnp.where(abs_iota == 1, gc, 0.0), axis=0,
                        keepdims=True) for gc in g_coll]
        colN1 = [_edge_col(gc, C - 2) for gc in g_coll]
        in_lane = (abs_iota >= 1) & (abs_iota <= R - 2)
        for k in range(9):
            g_coll[k] = jnp.where(abs_iota == 0, row1[k], g_coll[k])
            g_coll[k] = jnp.where((ci == C - 1) & in_lane, colN1[k],
                                  g_coll[k])

        f_new = _stream9(f_coll, rows, C)
        g_new = _stream9(g_coll, rows, C)

        # --- fluid: ABB inlet col 0, fixed wall velocity (0, u_in)
        uu_w = u_in * u_in
        m_in = (ci == 0) & in_lane
        for k in range(1, 9):
            cu = CY[k] * u_in  # wall velocity has zero row component
            coeff = (2.0 + 9.0 * cu * cu - 3.0 * uu_w) * WQ[k]
            f_new[OPP[k]] = jnp.where(m_in, -f_coll[k] + coeff, f_new[OPP[k]])
        # --- fluid: extrapolated-ABB outlet col C-1 (uses start-of-step u)
        uwx = 1.5 * _edge_col(ux, C - 1) - 0.5 * _edge_col(ux, C - 2)
        uwy = 1.5 * _edge_col(uy, C - 1) - 0.5 * _edge_col(uy, C - 2)
        uu_o = uwx * uwx + uwy * uwy
        m_out = ci == C - 1
        for k in range(1, 9):
            cu = CX[k] * uwx + CY[k] * uwy
            coeff = (2.0 + 9.0 * cu * cu - 3.0 * uu_o) * WQ[k]
            f_new[OPP[k]] = jnp.where(m_out, -f_coll[k] + coeff,
                                      f_new[OPP[k]])
        # --- specular row 0, bounce-back row R-1
        for k in (3, 6, 7):
            f_new[SPEC_X[k]] = jnp.where(abs_iota == 0, f_coll[k],
                                         f_new[SPEC_X[k]])
        for k in (1, 5, 8):
            f_new[OPP[k]] = jnp.where(abs_iota == R - 1, f_coll[k],
                                      f_new[OPP[k]])

        # --- interior rectangle walls (rows R23+1.., cols C28/C38)
        rect_rows = (abs_iota >= R23 + 1) & (abs_iota <= R - 2)
        rect_rows_g = abs_iota >= R23 + 1          # ADE first wall: to last row
        ceil = (abs_iota == R23) & (ci >= C28) & (ci <= C38)
        # fluid: +1 sign; scalar: -1 (anti-bounce-back, zero wall conc)
        for dst, k, m, sgn, fc in (
                (8, 6, rect_rows & (ci == C28), 1.0, f_coll),
                (4, 2, rect_rows & (ci == C28), 1.0, f_coll),
                (7, 5, rect_rows & (ci == C28), 1.0, f_coll),
                (6, 8, ceil, 1.0, f_coll),
                (3, 1, ceil, 1.0, f_coll),
                (7, 5, ceil, 1.0, f_coll),
                (5, 7, rect_rows & (ci == C38), 1.0, f_coll),
                (2, 4, rect_rows & (ci == C38), 1.0, f_coll),
                (6, 8, rect_rows & (ci == C38), 1.0, f_coll)):
            f_new[dst] = jnp.where(m, sgn * fc[k], f_new[dst])
        for dst, k, m in (
                (8, 6, rect_rows_g & (ci == C28)),
                (4, 2, rect_rows_g & (ci == C28)),
                (7, 5, rect_rows_g & (ci == C28)),
                (6, 8, ceil), (3, 1, ceil), (7, 5, ceil),
                (5, 7, rect_rows & (ci == C38)),
                (2, 4, rect_rows & (ci == C38)),
                (6, 8, rect_rows & (ci == C38))):
            g_new[dst] = jnp.where(m, -g_coll[k], g_new[dst])

        # --- ADE Dirichlet inlet with 2 g_eq at the UPDATED velocity
        rho_n = f_new[0]
        for k in range(1, 9):
            rho_n = rho_n + f_new[k]
        mx = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
        my = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
        unx = _edge_col(mx / rho_n, 0) + w_s
        uny = _edge_col(my / rho_n, 0) + w_s
        cw = jnp.where(abs_iota >= R - inlet_rows, C_w, 0.0)[:, :1]
        uu_n = unx * unx + uny * uny
        for k in range(1, 9):
            cu = CX[k] * unx + CY[k] * uny
            geq2 = 2.0 * WQ[k] * cw * (
                1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu_n)
            g_new[OPP[k]] = jnp.where(m_in, -g_coll[k] + geq2, g_new[OPP[k]])
        # --- scalar bounce-back row R-1
        for k in (1, 5, 8):
            g_new[OPP[k]] = jnp.where(abs_iota == R - 1, g_coll[k],
                                      g_new[OPP[k]])

        return f_new, g_new

    return make_block_pipeline(18, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               flops_per_cell=250 * substeps,
                               interpret=interpret)
