"""Fused BGK channel step (pressure-periodic + no-slip walls) as one Pallas
kernel — the horizontal-Poiseuille family (the reference's hard accuracy
gate) at fused-kernel speed.

Step order matches test/horizontal_poiseuille_test.cpp:128-152 exactly:
  macroscopics -> incompressible equilibrium -> BGK -> pressure-BC rewrite
  of the post-collision rows 0 / R-1 (virtual inlet/outlet built from rows
  R-2 / 1) -> fully periodic streaming -> halfway bounce-back on the column
  walls.

The cross-row pressure coupling costs nothing extra here: block 0's top
halo already contains rows R-8..R-1 (so row R-2), and block n-1's bottom
halo contains rows 0..7 (so row 1); the rewrites are plain absolute-row
masked selects, applied to halo copies too so every block sees consistent
values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat
from .collide_stream import HALO

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
OPP = tuple(int(v) for v in lat.OPP)


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_extract(x, abs_iota, abs_row: int):
    """(1, C) copy of global row ``abs_row`` if present in the slab."""
    return jnp.sum(jnp.where(abs_iota == abs_row, x, 0.0), axis=0,
                   keepdims=True)


def _make_body(*, omega, rho_in, rho_out, R, C, dtype, family):
    """Per-block physics for kernels.pipeline."""

    def body(block, abs_iota, i):
        f = [block[k] for k in range(9)]
        shape = f[0].shape
        rows = shape[0]
        # halos wrap periodically (x64 tests promote python ints to
        # int64; keep the rem in int32)
        abs_iota = jax.lax.rem(abs_iota + jnp.int32(R), jnp.int32(R))
        ci = _col_iota(shape)

        rho = f[0]
        for k in range(1, 9):
            rho = rho + f[k]
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        if family == "bgk":
            # incompressible: the BC "velocity" is the momentum
            # (calc_incomp_u, horizontal_poiseuille_test.cpp:131)
            ux, uy = mx, my
            feq, coll = [], []
            for k in range(9):
                cu = CX[k] * ux + CY[k] * uy if (CX[k] or CY[k]) else None
                e = dtype(WQ[k]) * (rho + 3.0 * cu) if cu is not None \
                    else dtype(WQ[k]) * rho
                feq.append(e)
                coll.append(dtype(1.0 - omega) * f[k] + dtype(omega) * e)
        else:  # cascaded KBC (ulbm_poiseuille.cpp:119-130): the BC
            # velocity is the true m1 and f_equi the product-form
            # equilibrium (the driver passes iequi_f^-1, :120)
            from ..models import kbc as _kbc

            inv_rho = 1.0 / rho
            ux, uy = mx * inv_rho, my * inv_rho
            u_st = jnp.stack([ux, uy], axis=0)
            # pass the whole 3-D block (re-stacking the per-plane slices
            # miscompiles under Mosaic; see the round-1 defect notes)
            coll_st = _kbc.collide(block, rho, u_st, omega)
            feq_st = _kbc.equilibrium(rho, u_st)
            coll = [coll_st[k] for k in range(9)]
            feq = [feq_st[k] for k in range(9)]

        # ---- pressure-periodic rewrite of rows 0 / R-1
        # (horizontal_poiseuille_test.cpp:25-45)
        ux_out = _row_extract(ux, abs_iota, R - 2)
        uy_out = _row_extract(uy, abs_iota, R - 2)
        ux_in = _row_extract(ux, abs_iota, 1)
        uy_in = _row_extract(uy, abs_iota, 1)
        top_mask = abs_iota == 0
        bot_mask = abs_iota == R - 1
        for k in range(9):
            cu_out = CX[k] * ux_out + CY[k] * uy_out
            cu_in = CX[k] * ux_in + CY[k] * uy_in
            vin = dtype(WQ[k]) * (dtype(rho_in) + 3.0 * cu_out) \
                + _row_extract(coll[k], abs_iota, R - 2) \
                - _row_extract(feq[k], abs_iota, R - 2)
            vout = dtype(WQ[k]) * (dtype(rho_out) + 3.0 * cu_in) \
                + _row_extract(coll[k], abs_iota, 1) \
                - _row_extract(feq[k], abs_iota, 1)
            coll[k] = jnp.where(top_mask, vin, coll[k])
            coll[k] = jnp.where(bot_mask, vout, coll[k])

        # ---- periodic streaming
        new = []
        for k in range(9):
            t = coll[k]
            if CY[k] != 0:
                t = pltpu.roll(t, CY[k] % C, axis=1)
            if CX[k] != 0:
                t = pltpu.roll(t, CX[k] % rows, axis=0)
            new.append(t)

        # ---- halfway bounce-back column walls
        # (horizontal_poiseuille_test.cpp:146-152)
        for k in (2, 5, 6):      # outgoing at col C-1
            new[OPP[k]] = jnp.where(ci == C - 1, coll[k], new[OPP[k]])
        for k in (4, 7, 8):      # outgoing at col 0
            new[OPP[k]] = jnp.where(ci == 0, coll[k], new[OPP[k]])

        return jnp.stack([p[HALO:rows - HALO] for p in new], axis=0)

    return body


def make_channel_fused_step(R: int, C: int, omega: float, rho_inlet: float,
                            rho_outlet: float, dtype=jnp.float32,
                            block_rows: int | None = None,
                            interpret: bool = False, family: str = "bgk"):
    """Fused channel step (pressure-periodic rows + no-slip column walls):
    f (9, R, C) -> (9, R, C).  family='bgk' is the horizontal-Poiseuille
    driver; family='kbc' the cascaded ULBM one (ulbm_poiseuille.cpp).

    Both families are hardware-clean (the two round-1 Mosaic defects —
    re-stacked slab slices and halo/interior row aliasing at
    B + 2*HALO > R — are fixed; measured one-step diff vs the jnp step
    from a developed state: 3e-8 'bgk', 3.6e-7 'kbc', and the full 300k
    ULBM workload runs stably)."""
    from .pipeline import make_block_pipeline, resolve_block_rows

    if family not in ("bgk", "kbc"):
        raise ValueError(f"unknown family {family!r}")
    budget = 10 * 2 ** 20 if family == "bgk" else 5 * 2 ** 20
    # alias-free picks only: a slab containing some global row twice would
    # double-count the masked row extractions that build the pressure BC
    block_rows = resolve_block_rows((9,), 9, R, C, dtype, budget,
                                    block_rows, allow_row_alias=False)
    body = _make_body(omega=omega, rho_in=rho_inlet, rho_out=rho_outlet,
                      R=R, C=C, dtype=jnp.dtype(dtype).type, family=family)
    return make_block_pipeline(9, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               flops_per_cell=80 if family == "bgk" else 400,
                               interpret=interpret)


def make_channel_variant_step(R: int, C: int, *, omega: float,
                              incompressible: bool,
                              pressure: tuple | None = None,
                              force: tuple | None = None,
                              col_walls: str | None = None,
                              row_walls: str | None = None,
                              abb_u=(0.0, 0.0),
                              omega_minus: float | None = None,
                              dtype=jnp.float32,
                              block_rows: int | None = None,
                              interpret: bool = False):
    """Fused single-phase channel variants: the gravity / specular /
    free-stream / vertical-Poiseuille drivers as one Pallas launch each,
    mirroring models.single_phase.SinglePhaseModel.step exactly
    (macroscopics -> force shift -> equilibrium -> BGK -> weak-Guo source
    -> pressure rewrite of f_coll -> periodic stream -> wall overwrites).

      pressure   (rho_in, rho_out, axis): virtual inlet/outlet rewrite on
                 rows (axis 0) or cols (axis 1); None = none.
                 cites horizontal_poiseuille_test.cpp:25-45 /
                 vertical_poiseuille_test.cpp:24-44.
      force      (fx, fy) uniform body force: velocity shift + the
                 reference's weak (1/3, 1/9) Guo source
                 (gravity_test.cpp:81-82,146-154).
      col_walls  None | 'bounce' | 'specular' on cols 0 / C-1.
      row_walls  None | 'bounce' | 'abb' on rows 0 / R-1 (abb uses the
                 constant wall velocity ``abb_u``,
                 free_stream_test.cpp:104-125).
      omega_minus  None = BGK; a float swaps the collision for TRT
                 (models.trt: even parts relaxed at ``omega``, odd at
                 ``omega_minus``) — beyond the reference.  Not
                 supported together with ``force`` (the Guo prefactor
                 is parity-dependent under TRT).
    """
    from .collide_stream import PAIR_KS, d2q9_pairs, pair_cu
    from .mrtcg_pallas import _edge_col
    from .pipeline import make_block_pipeline

    if col_walls not in (None, "bounce", "specular"):
        raise ValueError(col_walls)
    if row_walls not in (None, "bounce", "abb"):
        raise ValueError(row_walls)
    if omega_minus is not None and force is not None:
        raise ValueError("TRT (omega_minus) + body force not supported: "
                         "the Guo prefactor is parity-dependent")
    dt = jnp.dtype(dtype).type
    has_force = force is not None
    fx, fy = (float(force[0]), float(force[1])) if has_force else (0.0, 0.0)
    pref = 1.0 - 0.5 * omega
    ics2, ics4 = 1.0 / 3.0, 1.0 / 9.0  # the drivers' weak coefficients
    SPY = tuple(int(v) for v in lat.SPEC_Y)
    if row_walls == "abb":
        import numpy as _np

        uw = _np.asarray(abb_u, _np.float64)
        uu_w = float(uw @ uw)
        abb = tuple((2.0 + 9.0 * (CX[k] * uw[0] + CY[k] * uw[1]) ** 2
                     - 3.0 * uu_w) * WQ[k] for k in range(9))

    def eq9(rho_or_const, ux_, uy_):
        """The 9 equilibria at (possibly line-shaped) fields."""
        feq = [None] * 9
        if incompressible:
            cu_p = pair_cu(ux_, uy_)
            feq[0] = dt(WQ[0]) * rho_or_const
            for kp, km in PAIR_KS:
                base = dt(WQ[kp]) * rho_or_const
                odd = dt(WQ[kp]) * (3.0 * cu_p[kp])
                feq[kp] = base + odd
                feq[km] = base - odd
        else:
            t0, pairs = d2q9_pairs(ux_, uy_)
            feq[0] = dt(WQ[0]) * rho_or_const * t0
            for kp, km, w, cu, cc in pairs:
                wr = dt(w) * rho_or_const
                even = wr * (t0 + 4.5 * cc)
                odd = wr * (3.0 * cu)
                feq[kp] = even + odd
                feq[km] = even - odd
        return feq

    def body(block, abs_iota, i):
        f = [block[k] for k in range(9)]
        shape = f[0].shape
        rows = shape[0]
        abs_iota = jax.lax.rem(abs_iota + jnp.int32(R), jnp.int32(R))
        ci = _col_iota(shape)

        rho = f[0]
        for k in range(1, 9):
            rho = rho + f[k]
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        if incompressible:
            ux, uy = mx, my
        else:
            inv_rho = 1.0 / rho
            ux, uy = mx * inv_rho, my * inv_rho
        if has_force:
            ux = ux + dt(fx)
            uy = uy + dt(fy)

        feq = eq9(rho, ux, uy)
        if omega_minus is None:
            coll = [dt(1.0 - omega) * f[k] + dt(omega) * feq[k]
                    for k in range(9)]
        else:
            # TRT: even/odd non-equilibria per opposite pair
            # (models.trt.trt_collision algebra)
            coll = [None] * 9
            coll[0] = f[0] - dt(omega) * (f[0] - feq[0])
            for kp, km in PAIR_KS:
                d_even = dt(0.5 * omega) * ((f[kp] + f[km])
                                            - (feq[kp] + feq[km]))
                d_odd = dt(0.5 * omega_minus) * ((f[kp] - f[km])
                                                 - (feq[kp] - feq[km]))
                coll[kp] = f[kp] - (d_even + d_odd)
                coll[km] = f[km] - (d_even - d_odd)
        if has_force:
            uF = ux * dt(fx) + uy * dt(fy)
            cu_p = pair_cu(ux, uy)
            coll[0] = coll[0] + dt(pref * WQ[0]) * (-ics2 * uF)
            for kp, km in PAIR_KS:
                cF = CX[kp] * fx + CY[kp] * fy  # scalar
                even_s = dt(pref * WQ[kp]) * (ics4 * cF * cu_p[kp]
                                              - ics2 * uF)
                odd_s = dt(pref * WQ[kp] * ics2 * cF)
                coll[kp] = coll[kp] + (even_s + odd_s)
                coll[km] = coll[km] + (even_s - odd_s)

        if pressure is not None:
            rho_in, rho_out, axis = pressure
            if axis == 0:
                ex = lambda x, line: _row_extract(x, abs_iota, line)  # noqa: E731
                line_out, line_in = R - 2, 1
                m_vin = abs_iota == 0
                m_vout = abs_iota == R - 1
            else:
                ex = lambda x, line: _edge_col(x, line, C)  # noqa: E731
                line_out, line_in = C - 2, 1
                m_vin = ci == 0
                m_vout = ci == C - 1
            ux_o, uy_o = ex(ux, line_out), ex(uy, line_out)
            ux_i, uy_i = ex(ux, line_in), ex(uy, line_in)
            e_in = eq9(dt(rho_in), ux_o, uy_o)
            e_out = eq9(dt(rho_out), ux_i, uy_i)
            for k in range(9):
                vin = e_in[k] + ex(coll[k], line_out) - ex(feq[k], line_out)
                vout = e_out[k] + ex(coll[k], line_in) - ex(feq[k], line_in)
                coll[k] = jnp.where(m_vin, vin, coll[k])
                coll[k] = jnp.where(m_vout, vout, coll[k])

        new = []
        for k in range(9):
            t = coll[k]
            if CY[k] != 0:
                t = pltpu.roll(t, CY[k] % C, axis=1)
            if CX[k] != 0:
                t = pltpu.roll(t, CX[k] % rows, axis=0)
            new.append(t)

        if row_walls == "bounce":
            for k in (1, 5, 8):      # outgoing at row R-1
                new[OPP[k]] = jnp.where(abs_iota == R - 1, coll[k],
                                        new[OPP[k]])
            for k in (3, 6, 7):      # outgoing at row 0
                new[OPP[k]] = jnp.where(abs_iota == 0, coll[k], new[OPP[k]])
        elif row_walls == "abb":
            for mask in (abs_iota == 0, abs_iota == R - 1):
                for k in range(1, 9):
                    new[OPP[k]] = jnp.where(mask, -coll[k] + dt(abb[k]),
                                            new[OPP[k]])
        if col_walls == "bounce":
            for k in (2, 5, 6):
                new[OPP[k]] = jnp.where(ci == C - 1, coll[k], new[OPP[k]])
            for k in (4, 7, 8):
                new[OPP[k]] = jnp.where(ci == 0, coll[k], new[OPP[k]])
        elif col_walls == "specular":
            for k in (2, 5, 6):
                new[SPY[k]] = jnp.where(ci == C - 1, coll[k], new[SPY[k]])
            for k in (4, 7, 8):
                new[SPY[k]] = jnp.where(ci == 0, coll[k], new[SPY[k]])

        return jnp.stack([p[HALO:rows - HALO] for p in new], axis=0)

    return make_block_pipeline(9, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=10 * 2 ** 20,
                               flops_per_cell=100, interpret=interpret)
