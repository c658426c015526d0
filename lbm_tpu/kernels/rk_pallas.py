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
from .collide_stream import CHALO, HALO
from .mrtcg_pallas import KX5, KY5, _corr5_multi, _stream_with_bcs

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
BQ = tuple(float(v) for v in lat.B_CG)
NCX = tuple(float(v) for v in lat.NORM_C[0])
NCY = tuple(float(v) for v in lat.NORM_C[1])


def _make_collide(r_alpha, b_alpha, r_nu, b_nu, sigma, beta, gravity, R, C):
    gx, gy = float(gravity[0]), float(gravity[1])

    def collide(planes, abs_iota, row_edges=True, col_iota=None):
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

        # colour gradient (src/rk.cpp:94-125), 5x5 replicate stencils.
        # The reference evaluates grad(r_rho/rho) AND grad(b_rho/rho);
        # since a_frac + b_frac == 1 and the derivative stencils
        # annihilate constants exactly (replicate padding of a constant
        # is the constant; antisymmetric weights cancel), gb = -ga and
        #   F = (b_rho*ga - r_rho*gb)/rho = ga
        # — one stencil pass instead of two, agreeing with the two-pass
        # form to round-off (the jnp model keeps the literal form).
        a_frac = r_rho * inv_rho
        Fx, Fy = _corr5_multi(a_frac, (KX5, KY5), abs_iota, R, C,
                              row_edges=row_edges, col_iota=col_iota)
        Fn = jnp.sqrt(Fx * Fx + Fy * Fy)
        inv_Fn = 1.0 / (Fn + 1e-20)

        C_kl = 1.0 - jnp.abs((r_rho - b_rho) * inv_rho)
        A_kl = (4.5 * sigma) * omega
        AC = A_kl * C_kl * Fn
        inv_F2 = 1.0 / (1e-20 + Fn * Fn)

        rb = r_rho * b_rho * inv_rho
        ratio_r = r_rho * inv_rho
        ratio_b = b_rho * inv_rho

        # opposite-direction pairs: phi/W/B depend on |c| only, so the
        # equilibrium, Guo source and perturbation split into shared
        # even parts and +/- odd parts; omega2 is IDENTICAL within a
        # pair (Fc^2 even) and the recolouring kap flips sign
        # (kernels.collide_stream.d2q9_pairs rationale)
        from .collide_stream import PAIR_KS, pair_cu

        cu_p = pair_cu(ux, uy)           # {kp: c_kp . u}
        Fc_p = pair_cu(Fx, Fy)           # {kp: c_kp . F}
        pref = 1.0 - 0.5 * omega
        uF3 = 3.0 * (ux * gx + uy * gy)
        uu15 = 1.5 * uu

        coll_r = [None] * 9
        coll_b = [None] * 9

        def emit(k, post, kap):
            coll_r[k] = ratio_r * post + beta * kap if kap is not None \
                else ratio_r * post
            coll_b[k] = ratio_b * post - beta * kap if kap is not None \
                else ratio_b * post

        post0 = (1.0 - omega) * f[0] + omega * (rho * (phi0 - WQ[0] * uu15)) \
            + AC * (-BQ[0])
        if gx or gy:
            post0 = post0 + pref * (-uF3) * WQ[0]
        emit(0, post0, None)
        for kp, km in PAIR_KS:
            phi = phi_ax if kp < 5 else phi_di
            w = WQ[kp]
            cu = cu_p[kp]
            even_f = omega * (rho * (phi + w * (4.5 * cu * cu - uu15)))
            odd_f = omega * (rho * ((3.0 * w) * cu))
            Fc = Fc_p[kp]
            omega2 = AC * (w * Fc * Fc * inv_F2 - BQ[kp])
            base_p = (1.0 - omega) * f[kp] + (even_f + odd_f) + omega2
            base_m = (1.0 - omega) * f[km] + (even_f - odd_f) + omega2
            if gx or gy:
                cF = CX[kp] * gx + CY[kp] * gy  # scalar
                even_s = (pref * w) * (9.0 * cu * cF - uF3)
                odd_s = (pref * w) * (3.0 * cF)
                base_p = base_p + (even_s + odd_s)
                base_m = base_m + (even_s - odd_s)
            # recolouring (src/rk.cpp:82-92): NC is the normalized c, so
            # NC_kp.F = |NC| * Fc_p with |NC| = 1 (axis) or 1/sqrt(2)
            kap = rb * (NCX[kp] * Fx + NCY[kp] * Fy) * inv_Fn * phi
            emit(kp, base_p, kap)
            emit(km, base_m, -kap)
        return coll_r, coll_b

    return collide


def make_rk_body(R: int, C: int, *, r_alpha, b_alpha, r_nu, b_nu, sigma,
                 beta: float = 0.7, gravity=(0.0, 0.0)):
    """The per-slab RK mixture step body, shared by the single-chip
    pipeline and the sharded halo-input kernel (all masks are
    global-position-based on abs_iota): ``run(block (11, rows, C),
    abs_iota, row_edges) -> (11, rows - 2*HALO, C)``."""
    collide = _make_collide(r_alpha, b_alpha, r_nu, b_nu, sigma, beta,
                            gravity, R, C)

    def run(block, abs_iota, row_edges, col_iota=None):
        planes = [block[k] for k in range(11)]
        coll_r, coll_b = collide(planes, abs_iota, row_edges=row_edges,
                                 col_iota=col_iota)
        new_r = _stream_with_bcs(coll_r, abs_iota, R, C,
                                 row_edges=row_edges, col_iota=col_iota)
        new_b = _stream_with_bcs(coll_b, abs_iota, R, C,
                                 row_edges=row_edges, col_iota=col_iota)
        r_rho_new = new_r[0]
        b_rho_new = new_b[0]
        for k in range(1, 9):
            r_rho_new = r_rho_new + new_r[k]
            b_rho_new = b_rho_new + new_b[k]
        rows = block.shape[1]
        out = [new_r[k] + new_b[k] for k in range(9)] + [r_rho_new, b_rho_new]
        if col_iota is None:
            return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)
        width = out[0].shape[1]
        return jnp.stack(
            [p[HALO:rows - HALO, 0:width - CHALO] for p in out], axis=0)

    return run


def make_rk_fused_step(R: int, C: int, *, r_alpha: float, b_alpha: float,
                       r_nu: float, b_nu: float, sigma: float,
                       beta: float = 0.7, gravity=(0.0, 0.0),
                       dtype=jnp.float32, block_rows: int | None = None,
                       interpret: bool = False):
    """Fused RK mixture step: S (11, R, C) -> (11, R, C) with
    S = [f(9), r_rho, b_rho].  Built on kernels.pipeline."""
    from .pipeline import make_block_pipeline

    from .pipeline import resolve_block_rows

    # lift=False: like the other colour-gradient bodies, the lifted pick
    # measured slower on the recorded bench harness (5,227 at B=256/31
    # MiB vs 5,588 at B=128/16 MiB, 1024x256)
    block_rows = resolve_block_rows(
        (11,), 11, R, C, dtype, 6 * 2 ** 20, block_rows, False,
        lift=False)
    n_blocks = R // block_rows

    run = make_rk_body(R, C, r_alpha=r_alpha, b_alpha=b_alpha, r_nu=r_nu,
                       b_nu=b_nu, sigma=sigma, beta=beta, gravity=gravity)

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
