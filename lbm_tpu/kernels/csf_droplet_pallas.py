"""Fused moment-space MRT + CSF static-droplet step as one Pallas kernel
(models/mrt_csf_droplet.py::CSFDropletModel, reproducing the reference's
test/static_droplet_test.cpp:520-576 with that model's documented
deviations from the WIP driver).

State packing: S (20, R, C) = [red f (9), blue f (9), fs (2)] — like the
MRT-CSF RT kernel the surface force is CARRIED state (the model's u is
calc_u + 0.5 fs_prev/rho, so the fused step derives it exactly; at init
fs = 0 matches the model's u = 0).

Physics per step (all in one launch): psi, the driver-local 3x3
reference-swapped gradients (replicate edges; the 3x3 kernels ride the
5x5 grouped-row stencil engine zero-padded — identical taps), the
THRESHOLDED unit normal (|grad| >= 0.1 — which also makes this
formulation numerically well-conditioned, unlike the un-thresholded RT
CSF), curvature, fs = sigma/2 K grad, per-colour moment-space MRT with
the CSF force moments and the 3x3 correction moments, +/-beta
recolouring along -n, fully periodic streaming.

Validity: psi stencil + normal stencil + streaming consume 3 of the 8
halo rows (the 3x3 chain is 1 row per stage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gradients import KERNEL_X3, KERNEL_Y3
from .collide_stream import HALO, PAIR_KS, pair_cu
from .mrtcg_pallas import CX, CY, M_ROWS, MI_ROWS, WQ, _corr5_multi
from .pipeline import make_block_pipeline, resolve_block_rows

# 3x3 kernels zero-padded to 5x5 so _corr5_multi's grouped-row engine
# evaluates them unchanged (outer-ring zeros -> only +-1 taps; replicate
# fixups then reproduce exact 3x3 replicate padding)
def _pad5(k3):
    k5 = np.zeros((5, 5))
    k5[1:4, 1:4] = k3
    return tuple(tuple(float(v) for v in row) for row in k5)


K3X = _pad5(KERNEL_X3)   # the reference's 'partial_x' = COLS derivative
K3Y = _pad5(KERNEL_Y3)   # the reference's 'partial_y' = ROWS derivative

# moment-space relaxation diagonal rows 0-6 (rows 7, 8 take s_nu)
BASE_S = (0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6)


def _mmul(rows_tbl, vec):
    """Unrolled scalar-coefficient matmul (9 planes in, 9 out)."""
    out = []
    for r in range(9):
        acc = None
        for q in range(9):
            w = rows_tbl[r][q]
            if w == 0.0 or vec[q] is None:
                continue
            term = vec[q] if w == 1.0 else w * vec[q]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def make_csf_droplet_fused_step(R: int, C: int, red, blue, sigma: float,
                                delta: float = 0.1, dtype=jnp.float32,
                                block_rows: int | None = None,
                                interpret: bool = False):
    """Fused CSF droplet step: S (20, R, C) -> (20, R, C).
    ``red``/``blue`` are models.mrt_csf_droplet.CSFColour."""
    from ..models.mrt_cg import RelaxationFunction

    relax = RelaxationFunction.from_values(red.tau, blue.tau, delta)
    r0, b0 = float(red.rho_0), float(blue.rho_0)
    r_pref = float(red.A * (1.0 - 0.5 * red.omega))
    b_pref = float(blue.A * (1.0 - 0.5 * blue.omega))
    r_a2 = -1.8 * red.alpha - 0.2
    b_a2 = -1.8 * blue.alpha - 0.2
    r_acorr = 1.8 * red.alpha - 0.8
    b_acorr = 1.8 * blue.alpha - 0.8
    beta_r, beta_b = float(red.beta), float(blue.beta)

    block_rows = resolve_block_rows((20,), 20, R, C, dtype,
                                    6 * 2 ** 20, block_rows, False)
    n_blocks = R // block_rows

    def m_eq_rows(rho_k, ux, uy, uu, alpha, a2):
        """Equilibrium moments (static_droplet_test.cpp:363-378)."""
        return [
            rho_k,
            rho_k * (-3.6 * alpha - 0.4 + 3.0 * uu),
            rho_k * (5.4 * alpha - 1.4 - 3.0 * uu),
            rho_k * ux,
            rho_k * (a2 * ux),
            rho_k * uy,
            rho_k * (a2 * uy),
            rho_k * (ux * ux - uy * uy),
            rho_k * (ux * uy),
        ]

    def run(block, abs_iota, row_edges):
        rf = [block[k] for k in range(9)]
        bf = [block[9 + k] for k in range(9)]
        fsx_prev, fsy_prev = block[18], block[19]
        rows = block.shape[1]
        # FULLY periodic scene: populations crossing the row wrap are
        # computed in the neighbour block's halo, so halo rows must carry
        # their TRUE global index (wrap, like the channel kernels) or the
        # replicate stencil fixups fire on the wrong rows there.  The
        # wrapped halo is contiguous (8 rows) and the stencil chain needs
        # 3, so every read of a wrapped row's neighbourhood stays valid.
        abs_iota = jax.lax.rem(abs_iota + jnp.int32(R), jnp.int32(R))

        r_rho = rf[0]
        b_rho = bf[0]
        for k in range(1, 9):
            r_rho = r_rho + rf[k]
            b_rho = b_rho + bf[k]
        rho = r_rho + b_rho
        inv_rho = 1.0 / rho
        f_tot = [rf[k] + bf[k] for k in range(9)]
        mom_x = f_tot[1] - f_tot[3] + f_tot[5] - f_tot[6] - f_tot[7] \
            + f_tot[8]
        mom_y = f_tot[2] - f_tot[4] + f_tot[5] + f_tot[6] - f_tot[7] \
            - f_tot[8]
        # the model's carried u = calc_u + 0.5 fs_prev/rho
        ux = (mom_x + 0.5 * fsx_prev) * inv_rho
        uy = (mom_y + 0.5 * fsy_prev) * inv_rho
        uu = ux * ux + uy * uy

        a = r_rho * (1.0 / r0)
        b = b_rho * (1.0 / b0)
        psi = (a - b) / (a + b)
        # phase-interpolated tau field, inverted to rates (model.relax)
        s_nu = 1.0 / relax(psi)

        # reference-swapped 3x3 gradients, replicate edges
        g0, g1 = _corr5_multi(psi, (K3X, K3Y), abs_iota, R, C,
                              row_edges=row_edges)
        gn = jnp.sqrt(g0 * g0 + g1 * g1)
        inv_safe = 1.0 / jnp.where(gn == 0.0, 1.0, gn)
        thr = gn >= 1e-1
        n0 = -jnp.where(thr, g0 * inv_safe, 0.0)
        n1 = -jnp.where(thr, g1 * inv_safe, 0.0)
        d0n0, d1n0 = _corr5_multi(n0, (K3X, K3Y), abs_iota, R, C,
                                  row_edges=row_edges)
        d0n1, d1n1 = _corr5_multi(n1, (K3X, K3Y), abs_iota, R, C,
                                  row_edges=row_edges)
        K = n0 * n1 * (d1n0 + d0n1) - n0 * n0 * d1n1 - n1 * n1 * d0n0
        fsx = (0.5 * sigma) * (K * g0)
        fsy = (0.5 * sigma) * (K * g1)

        # CSF force per direction -> moment space (build_F :598-624)
        cu_p = pair_cu(ux, uy)
        cF_p = pair_cu(fsx, fsy)
        uF3 = 3.0 * (ux * fsx + uy * fsy)
        Fq = [None] * 9
        Fq[0] = WQ[0] * (-uF3)
        for kp, km in PAIR_KS:
            even = WQ[kp] * (9.0 * cu_p[kp] * cF_p[kp] - uF3)
            odd = WQ[kp] * (3.0 * cF_p[kp])
            Fq[kp] = even + odd
            Fq[km] = even - odd
        F_m = _mmul(M_ROWS, Fq)

        nc_p = pair_cu(n0, n1)   # {kp: c_kp . n}
        ratio_r = r_rho * inv_rho
        ratio_b = b_rho * inv_rho

        def colour(f, rho_k, other_rho, ratio, alpha, a2, acorr, pref,
                   beta):
            m = _mmul(M_ROWS, f)
            meq = m_eq_rows(rho_k, ux, uy, uu, alpha, a2)
            relaxed = [None] * 9
            for i in range(7):
                s = BASE_S[i]
                relaxed[i] = s * (meq[i] - m[i] + pref * F_m[i]) \
                    if s else None
            relaxed[7] = s_nu * (meq[7] - m[7] + pref * F_m[7])
            relaxed[8] = s_nu * (meq[8] - m[8] + pref * F_m[8])
            # 3x3 correction moments (model: dx3(qx) + dy3(qy))
            qx = acorr * rho_k * ux
            qy = acorr * rho_k * uy
            dqx = _corr5_multi(qx, (K3X,), abs_iota, R, C,
                               row_edges=row_edges)[0]
            dqy = _corr5_multi(qy, (K3Y,), abs_iota, R, C,
                               row_edges=row_edges)[0]
            relaxed[1] = relaxed[1] + 3.0 * (1.0 - 0.5 * 1.25) * (dqx + dqy)
            relaxed[7] = relaxed[7] + (1.0 - 0.5 * s_nu) * (dqx - dqy)
            mrtp = _mmul(MI_ROWS, relaxed)
            # recolouring along -n (model's de-mixing direction)
            br = beta * ratio * other_rho
            coll = [None] * 9
            coll[0] = f[0] + ratio * mrtp[0]
            for kp, km in PAIR_KS:
                reco_odd = br * (WQ[kp] * (-nc_p[kp]))
                coll[kp] = f[kp] + ratio * mrtp[kp] + reco_odd
                coll[km] = f[km] + ratio * mrtp[km] - reco_odd
            return coll

        coll_r = colour(rf, r_rho, b_rho, ratio_r, red.alpha, r_a2,
                        r_acorr, r_pref, beta_r)
        coll_b = colour(bf, b_rho, r_rho, ratio_b, blue.alpha, b_a2,
                        b_acorr, b_pref, beta_b)

        # fully periodic streaming (static_droplet_test.cpp:449-456)
        from jax.experimental.pallas import tpu as pltpu

        out = []
        for coll in (coll_r, coll_b):
            for k in range(9):
                t = coll[k]
                if CY[k] != 0:
                    t = pltpu.roll(t, CY[k] % C, axis=1)
                if CX[k] != 0:
                    t = pltpu.roll(t, CX[k] % rows, axis=0)
                out.append(t)
        out = out + [fsx, fsy]
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    def body(block, abs_iota, i):
        if n_blocks <= 2:
            return run(block, abs_iota, True)
        edge = (i == 0) | (i == n_blocks - 1)
        return jax.lax.cond(
            edge,
            lambda bl, a_: run(bl, a_, True),
            lambda bl, a_: run(bl, a_, False),
            block, abs_iota)

    return make_block_pipeline(20, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=6 * 2 ** 20,
                               flops_per_cell=1500, interpret=interpret)
