"""Fused RK (Rothman-Keller) colour-gradient mixture step as one Pallas
kernel — the second multiphase family (models/rk_cg.py::RKMixtureModel,
following src/rk.cpp's algebra driven by rk_rayleigh_taylor_test.cpp).

State packing: (11, R, C) planes = colour-blind f (9) + r_rho + b_rho.
One launch runs: mixture relaxation omega_rp, alpha/phi fields, the 5x5
colour gradient F_kl (replicate edges, via kernels.mrtcg_pallas
._corr5_multi),
BGK + Guo gravity + Reis perturbation, +/-beta recolouring, per-colour
periodic streaming with the multiphase wall rules, and the macroscopic
reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lattice as lat
from .collide_stream import HALO
from .mrtcg_pallas import KX5, KY5, _corr5_multi, _stream_with_bcs

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
BQ = tuple(float(v) for v in lat.B_CG)
NCX = tuple(float(v) for v in lat.NORM_C[0])
NCY = tuple(float(v) for v in lat.NORM_C[1])


def _make_collide(r_alpha, b_alpha, r_nu, b_nu, sigma, beta, gravity, R, C):
    gx, gy = float(gravity[0]), float(gravity[1])

    def collide(planes, abs_iota, row_edges=True):
        f = [planes[k] for k in range(9)]
        r_rho = planes[9]
        b_rho = planes[10]
        rho = r_rho + b_rho
        inv_rho = 1.0 / rho
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        ux = mx * inv_rho
        uy = my * inv_rho
        uu = ux * ux + uy * uy

        # mixture relaxation rate (src/rk.cpp:184-194)
        omega = rho / (3.0 * (r_rho * r_nu + b_rho * b_nu) + 0.5 * rho)
        # alpha/phi fields (src/rk.cpp:127-154)
        alpha = (r_alpha * r_rho + b_alpha * b_rho) * inv_rho
        phi0 = alpha
        phi_ax = 0.2 - 0.2 * alpha
        phi_di = 0.05 - 0.05 * alpha

        # colour gradient (src/rk.cpp:94-125), 5x5 replicate stencils
        a_frac = r_rho * inv_rho
        b_frac = b_rho * inv_rho
        gax, gay = _corr5_multi(a_frac, (KX5, KY5), abs_iota, R, C,
                                row_edges=row_edges)
        gbx, gby = _corr5_multi(b_frac, (KX5, KY5), abs_iota, R, C,
                                row_edges=row_edges)
        Fx = (b_rho * gax - r_rho * gbx) * inv_rho
        Fy = (b_rho * gay - r_rho * gby) * inv_rho
        Fn = jnp.sqrt(Fx * Fx + Fy * Fy)
        inv_Fn = 1.0 / (Fn + 1e-20)

        C_kl = 1.0 - jnp.abs((r_rho - b_rho) * inv_rho)
        A_kl = (4.5 * sigma) * omega
        AC = A_kl * C_kl * Fn
        inv_F2 = 1.0 / (1e-20 + Fn * Fn)

        rb = r_rho * b_rho * inv_rho
        ratio_r = r_rho * inv_rho
        ratio_b = b_rho * inv_rho

        coll_r, coll_b = [], []
        for k in range(9):
            phi = phi0 if k == 0 else (phi_ax if k < 5 else phi_di)
            if CX[k] or CY[k]:
                cu = CX[k] * ux + CY[k] * uy
                feq = rho * (phi + WQ[k] * (3.0 * cu + 4.5 * cu * cu - 1.5 * uu))
                cF = CX[k] * gx + CY[k] * gy
                uF = ux * gx + uy * gy
                src = (1.0 - 0.5 * omega) * (
                    (3.0 + 9.0 * cu) * cF - 3.0 * uF) * WQ[k]
                Fc = CX[k] * Fx + CY[k] * Fy
            else:
                feq = rho * (phi - WQ[k] * 1.5 * uu)
                src = (1.0 - 0.5 * omega) * (-3.0 * (ux * gx + uy * gy)) * WQ[k]
                Fc = None
            omega1 = (1.0 - omega) * f[k] + omega * feq
            if Fc is None:
                omega2 = AC * (-BQ[k])
            else:
                omega2 = AC * (WQ[k] * Fc * Fc * inv_F2 - BQ[k])
            post = omega1 + (src if (gx or gy) else 0.0) + omega2
            # recolouring (src/rk.cpp:82-92) with +/-beta split
            if NCX[k] or NCY[k]:
                kap = rb * (NCX[k] * Fx + NCY[k] * Fy) * inv_Fn * phi
            else:
                kap = 0.0
            coll_r.append(ratio_r * post + beta * kap)
            coll_b.append(ratio_b * post - beta * kap)
        return coll_r, coll_b

    return collide


def make_rk_fused_step(R: int, C: int, *, r_alpha: float, b_alpha: float,
                       r_nu: float, b_nu: float, sigma: float,
                       beta: float = 0.7, gravity=(0.0, 0.0),
                       dtype=jnp.float32, block_rows: int | None = None,
                       interpret: bool = False):
    """Fused RK mixture step: S (11, R, C) -> (11, R, C) with
    S = [f(9), r_rho, b_rho].  Built on kernels.pipeline."""
    from .pipeline import make_block_pipeline

    collide = _make_collide(r_alpha, b_alpha, r_nu, b_nu, sigma, beta,
                            gravity, R, C)

    from .pipeline import resolve_block_rows

    block_rows = resolve_block_rows(
        (11,), 11, R, C, dtype, 6 * 2 ** 20, block_rows, False)
    n_blocks = R // block_rows

    def run(block, abs_iota, row_edges):
        planes = [block[k] for k in range(11)]
        coll_r, coll_b = collide(planes, abs_iota, row_edges=row_edges)
        new_r = _stream_with_bcs(coll_r, abs_iota, R, C, row_edges=row_edges)
        new_b = _stream_with_bcs(coll_b, abs_iota, R, C, row_edges=row_edges)
        r_rho_new = new_r[0]
        b_rho_new = new_b[0]
        for k in range(1, 9):
            r_rho_new = r_rho_new + new_r[k]
            b_rho_new = b_rho_new + new_b[k]
        rows = block.shape[1]
        out = [new_r[k] + new_b[k] for k in range(9)] + [r_rho_new, b_rho_new]
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    def body(block, abs_iota, i):
        # interior blocks skip the global-row-edge masks (see mrtcg_pallas)
        if n_blocks <= 2:
            return run(block, abs_iota, True)
        edge = (i == 0) | (i == n_blocks - 1)
        return jax.lax.cond(
            edge,
            lambda b, a: run(b, a, True),
            lambda b, a: run(b, a, False),
            block, abs_iota)

    return make_block_pipeline(11, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=6 * 2 ** 20,
                               flops_per_cell=1200, interpret=interpret)
