"""Fused Rayleigh-Benard step (BGK fluid + temperature ADE + Boussinesq
buoyancy) as one Pallas launch — scenes.thermal at fused-kernel speed.

BEYOND THE REFERENCE (no thermal model exists there); the kernel reuses
the machinery of the reference-parity kernels: the 18-plane coupled
state and block pipeline of kernels.sediment_pallas, the paired-
direction equilibria of kernels.collide_stream, and the Guo source of
the gravity/multiphase kernels (mrtcg_rayleigh_taylor.cpp:460-477 form
with standard ics2=3/ics4=9 coefficients).

State packing: (18, R, C) = fluid f (9) + temperature g (9).  One
launch computes the macroscopics with the half-force velocity shift,
both collisions (+ Guo buoyancy source on f), periodic streaming, the
halfway bounce-back fluid walls on rows 0 / R-1, and the halfway
ADE-Dirichlet temperature walls (incoming-only anti-bounce-back with
2 w_k theta_w, theta_w = +-1/2) — the exact algebra of
scenes.thermal.make_rb_step, pinned by
tests/test_thermal.py::test_fused_matches_jnp.

The slab body is shared between the single-chip block pipeline and the
row-sharded halo-input kernel (kernels.sharded_pallas.
make_sharded_thermal_step), like the multiphase bodies.  Wall-BC
kernel: abs_iota stays UNwrapped (the row walls overwrite every
population the periodic wrap corrupts; CLAUDE.md convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lattice as lat
from .collide_stream import CHALO, HALO
from .pipeline import make_block_pipeline, resolve_block_rows
from .sediment_pallas import _bgk9, _stream9

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
OPP = tuple(int(v) for v in lat.OPP)


def _collide_buoyant(f, g, omega_f, omega_g, g_beta):
    """One coupled collision: macroscopics with the Guo half-force
    shift, BGK on both distributions, Guo buoyancy source on f
    (F = (g_beta * theta, 0); S_k = (1 - w/2)((3 + 9 cu) cF - 3 uF) W_k
    with cF = cx_k Fx).  Shared by the Rayleigh-Benard and heated-
    cavity slab bodies (their walls differ, the collision does not)."""
    rho = f[0]
    theta = g[0]
    for k in range(1, 9):
        rho = rho + f[k]
        theta = theta + g[k]
    inv_rho = 1.0 / rho
    Fx = g_beta * theta
    mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
    my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
    ux = (mx + 0.5 * Fx) * inv_rho
    uy = my * inv_rho

    f_coll = _bgk9(f, ux, uy, rho, omega_f)
    g_coll = _bgk9(g, ux, uy, theta, omega_g)
    pref = 1.0 - 0.5 * omega_f
    uF3 = 3.0 * ux * Fx
    for k in range(9):
        if CX[k] == 0:
            f_coll[k] = f_coll[k] - pref * WQ[k] * uF3
        else:
            cu = CX[k] * ux + CY[k] * uy
            cF = CX[k] * Fx
            f_coll[k] = f_coll[k] + pref * WQ[k] * (
                (3.0 + 9.0 * cu) * cF - uF3)
    return f_coll, g_coll


def _collide_buoyant5(f, g, omega_f, omega_g, g_beta):
    """D2Q5-scalar variant of _collide_buoyant: the temperature rides 5
    populations (rest + axis directions, w = [1/3, 1/6 x4] =
    lattice.W5; scenes.thermal.d2q5_equilibrium algebra) — 4 fewer
    planes of HBM traffic for identical advection-diffusion physics."""
    rho = f[0]
    for k in range(1, 9):
        rho = rho + f[k]
    theta = g[0] + g[1] + g[2] + g[3] + g[4]
    inv_rho = 1.0 / rho
    Fx = g_beta * theta
    mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
    my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
    ux = (mx + 0.5 * Fx) * inv_rho
    uy = my * inv_rho

    f_coll = _bgk9(f, ux, uy, rho, omega_f)
    pref = 1.0 - 0.5 * omega_f
    uF3 = 3.0 * ux * Fx
    for k in range(9):
        if CX[k] == 0:
            f_coll[k] = f_coll[k] - pref * WQ[k] * uF3
        else:
            cu = CX[k] * ux + CY[k] * uy
            cF = CX[k] * Fx
            f_coll[k] = f_coll[k] + pref * WQ[k] * (
                (3.0 + 9.0 * cu) * cF - uF3)

    # D2Q5 scalar BGK: w theta (1 + 3cu + 4.5cu^2 - 1.5uu), paired odd
    uu15 = 1.5 * (ux * ux + uy * uy)
    w5 = 1.0 / 6.0
    th6 = w5 * theta
    g_coll = [None] * 5
    g_coll[0] = (1.0 - omega_g) * g[0] \
        + omega_g * ((1.0 / 3.0) * theta * (1.0 - uu15))
    for kp, km, cu in ((1, 3, ux), (2, 4, uy)):
        even = th6 * (1.0 + 4.5 * cu * cu - uu15)
        odd = th6 * (3.0 * cu)
        g_coll[kp] = (1.0 - omega_g) * g[kp] + omega_g * (even + odd)
        g_coll[km] = (1.0 - omega_g) * g[km] + omega_g * (even - odd)
    return f_coll, g_coll


def _stream5(coll, rows, width):
    """Periodic rolls on the 5 scalar planes (axis directions only)."""
    from jax.experimental.pallas import tpu as pltpu

    out = [coll[0]]
    for k in range(1, 5):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % width, axis=1)
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        out.append(t)
    return out


def make_thermal_body(R: int, C: int, *, omega_f: float, omega_g: float,
                      g_beta: float, substeps: int = 1):
    """The per-slab coupled step body: ``run(block (18, rows, width),
    abs_iota, row_edges) -> (18, rows - 2*HALO, width')`` with GLOBAL
    row indices in abs_iota (position-based wall masks work on any
    shard).  ``row_edges=False`` skips the row-wall masks (interior
    shards).  ``col_iota`` is not None in the 2-D-sharded mode: rolls
    then act on the padded local width (the column halo strips supply
    the periodic neighbours — no column masks are needed, the axis is
    fully periodic) and the output trims the CHALO column pad.

    ``substeps`` applies that many full collide-stream-BC sweeps per
    slab pass — temporal blocking.  Each sweep consumes 1 of the 8 halo
    rows (the body has no gradient stencils), so up to 8 sweeps amortise
    one slab's HBM round-trip / one ICI exchange; the kept interior
    never reads a wall-stale halo row because the wall masks cut the
    cross-wall dependency on every sweep.  Callers gating masks per
    block (the cond fast path) must treat a block as an edge block when
    ``substeps >= block_rows`` — see make_thermal_fused_step."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")

    def run(block, abs_iota, row_edges, col_iota=None):
        rows = block.shape[1]
        width = block.shape[2]
        f = [block[k] for k in range(9)]
        g = [block[9 + k] for k in range(9)]

        for _ in range(substeps):
            f_coll, g_coll = _collide_buoyant(f, g, omega_f, omega_g,
                                              g_beta)
            f_new = _stream9(f_coll, rows, width)
            g_new = _stream9(g_coll, rows, width)

            if row_edges:
                # fluid halfway bounce-back walls (rows 0 / R-1)
                for k in (3, 6, 7):
                    f_new[OPP[k]] = jnp.where(abs_iota == 0, f_coll[k],
                                              f_new[OPP[k]])
                for k in (1, 5, 8):
                    f_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              f_coll[k], f_new[OPP[k]])
                # temperature halfway ADE-Dirichlet walls: incoming-only
                # ABB, g_new[opp(k)] = -g_coll[k] + 2 w_k theta_w
                # (w_opp = w_k)
                for k in (3, 6, 7):               # hot bottom, +1/2
                    g_new[OPP[k]] = jnp.where(abs_iota == 0,
                                              -g_coll[k] + WQ[k],
                                              g_new[OPP[k]])
                for k in (1, 5, 8):               # cold top, -1/2
                    g_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              -g_coll[k] - WQ[k],
                                              g_new[OPP[k]])
            f, g = f_new, g_new

        out = f + g
        if col_iota is None:
            return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)
        return jnp.stack(
            [p[HALO:rows - HALO, 0:width - CHALO] for p in out],
            axis=0)

    return run


def make_thermal5_body(R: int, C: int, *, omega_f: float, omega_g: float,
                       g_beta: float, substeps: int = 1):
    """D2Q5-scalar slab body: ``run(block (14, rows, width), abs_iota,
    row_edges) -> (14, rows - 2*HALO, width')`` — the make_thermal_body
    contract on the [f(9), g(5)] state."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    w5 = 1.0 / 6.0

    def run(block, abs_iota, row_edges, col_iota=None):
        rows = block.shape[1]
        width = block.shape[2]
        f = [block[k] for k in range(9)]
        g = [block[9 + k] for k in range(5)]

        for _ in range(substeps):
            f_coll, g_coll = _collide_buoyant5(f, g, omega_f, omega_g,
                                               g_beta)
            f_new = _stream9(f_coll, rows, width)
            g_new = _stream5(g_coll, rows, width)

            if row_edges:
                for k in (3, 6, 7):
                    f_new[OPP[k]] = jnp.where(abs_iota == 0, f_coll[k],
                                              f_new[OPP[k]])
                for k in (1, 5, 8):
                    f_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              f_coll[k], f_new[OPP[k]])
                # D2Q5 halfway ADE-Dirichlet walls: one incoming
                # direction per wall (scenes.thermal.make_rb_step q5)
                g_new[1] = jnp.where(abs_iota == 0,
                                     -g_coll[3] + w5, g_new[1])
                g_new[3] = jnp.where(abs_iota == R - 1,
                                     -g_coll[1] - w5, g_new[3])
            f, g = f_new, g_new

        out = f + g
        if col_iota is None:
            return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)
        return jnp.stack(
            [p[HALO:rows - HALO, 0:width - CHALO] for p in out],
            axis=0)

    return run


def make_thermal_fused_step(R: int, C: int, *, omega_f: float,
                            omega_g: float, g_beta: float,
                            substeps: int = 1, dtype=jnp.float32,
                            block_rows: int | None = None,
                            interpret: bool = False,
                            scalar_lattice: str = "d2q9"):
    """Fused coupled step: S (P, R, C) = [f(9), g(9 or 5)] -> (P, R, C)
    with P = 18 (d2q9 scalar) or 14 (``scalar_lattice='d2q5'`` — same
    physics, 4 fewer planes of HBM traffic), advancing ``substeps``
    steps per launch (temporal blocking — the kernel is HBM-bound, so
    k sweeps per slab pass cut the per-step traffic by ~k)."""
    planes = 14 if scalar_lattice == "d2q5" else 18
    # lift=False: this family measured FASTER at the default-scope pick
    # (7.8 GLUPS at B=32/16 MiB vs 6.6 at the lifted B=64/27 MiB,
    # 1024x512 substeps=8)
    block_rows = resolve_block_rows((planes,), planes, R, C, dtype,
                                    6 * 2 ** 20, block_rows, False,
                                    lift=False)
    n_blocks = R // block_rows
    mk = make_thermal5_body if planes == 14 else make_thermal_body
    run = mk(R, C, omega_f=omega_f, omega_g=omega_g,
             g_beta=g_beta, substeps=substeps)

    def body(block, abs_iota, i):
        # only the first/last blocks can see the wall rows: the kept
        # interior's dependency region grows by 1 row per sweep, so the
        # fast path needs substeps < block_rows (else block 1 / n-2
        # reach the walls unmasked); interior blocks then take the
        # mask-free path (same trick as mrtcg_pallas)
        if n_blocks <= 2 or substeps >= block_rows:
            return run(block, abs_iota, True)
        edge = (i == 0) | (i == n_blocks - 1)
        return jax.lax.cond(
            edge,
            lambda b, a: run(b, a, True),
            lambda b, a: run(b, a, False),
            block, abs_iota)

    return make_block_pipeline(planes, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               flops_per_cell=230 * substeps,
                               interpret=interpret)


def make_heated_cavity5_body(R: int, C: int, *, omega_f: float,
                             omega_g: float, g_beta: float,
                             substeps: int = 1):
    """D2Q5-scalar heated-cavity slab body (14 planes): the cavity wall
    stack on the 5-population temperature — one incoming direction per
    column wall, axis bounce-back on the adiabatic rows (exact algebra
    of scenes.thermal.make_cavity_step q5)."""
    from jax.lax import broadcasted_iota

    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    w5 = 1.0 / 6.0

    def run(block, abs_iota, row_edges):
        rows = block.shape[1]
        ci = broadcasted_iota(jnp.int32, (rows, C), 1)
        f = [block[k] for k in range(9)]
        g = [block[9 + k] for k in range(5)]

        for _ in range(substeps):
            f_coll, g_coll = _collide_buoyant5(f, g, omega_f, omega_g,
                                               g_beta)
            f_new = _stream9(f_coll, rows, C)
            g_new = _stream5(g_coll, rows, C)

            # fluid: no-slip everywhere (rows first, then columns)
            if row_edges:
                for k in (3, 6, 7):
                    f_new[OPP[k]] = jnp.where(abs_iota == 0, f_coll[k],
                                              f_new[OPP[k]])
                for k in (1, 5, 8):
                    f_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              f_coll[k], f_new[OPP[k]])
            for k in (4, 7, 8):
                f_new[OPP[k]] = jnp.where(ci == 0, f_coll[k],
                                          f_new[OPP[k]])
            for k in (2, 5, 6):
                f_new[OPP[k]] = jnp.where(ci == C - 1, f_coll[k],
                                          f_new[OPP[k]])
            # temperature: column ADE Dirichlet (incoming 2/4), then
            # adiabatic row bounce-back (rows win the corners)
            g_new[2] = jnp.where(ci == 0, -g_coll[4] + w5, g_new[2])
            g_new[4] = jnp.where(ci == C - 1, -g_coll[2] - w5, g_new[4])
            if row_edges:
                g_new[1] = jnp.where(abs_iota == 0, g_coll[3], g_new[1])
                g_new[3] = jnp.where(abs_iota == R - 1, g_coll[1],
                                     g_new[3])
            f, g = f_new, g_new

        out = f + g
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    return run


def make_heated_cavity_fused_step(R: int, C: int, *, omega_f: float,
                                  omega_g: float, g_beta: float,
                                  substeps: int = 1, dtype=jnp.float32,
                                  block_rows: int | None = None,
                                  interpret: bool = False,
                                  scalar_lattice: str = "d2q9"):
    """Fused differentially-heated-cavity step (scenes.thermal.
    heated_cavity): S (18, R, C) -> (18, R, C), advancing ``substeps``
    steps per launch (temporal blocking; the column masks are applied
    every sweep on every block, so only the row-mask fast path needs
    the edge condition).  Same collision/buoyancy algebra as the
    Rayleigh-Benard body; the walls move to the de Vahl Davis geometry
    — no-slip on all four sides, ADE-Dirichlet hot/cold on columns
    0 / C-1, adiabatic (scalar bounce-back) rows.  Write order matches
    the jnp oracle exactly (columns after rows for f, rows after
    columns for g, so the same writes win the corners).
    ``scalar_lattice='d2q5'`` runs the 14-plane state via
    make_heated_cavity5_body."""
    from jax.lax import broadcasted_iota

    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    planes = 14 if scalar_lattice == "d2q5" else 18
    # lift=False — see make_thermal_fused_step
    block_rows = resolve_block_rows((planes,), planes, R, C, dtype,
                                    6 * 2 ** 20, block_rows, False,
                                    lift=False)
    n_blocks = R // block_rows
    if planes == 14:
        run5 = make_heated_cavity5_body(R, C, omega_f=omega_f,
                                        omega_g=omega_g, g_beta=g_beta,
                                        substeps=substeps)

        def body5(block, abs_iota, i):
            if n_blocks <= 2 or substeps >= block_rows:
                return run5(block, abs_iota, True)
            edge = (i == 0) | (i == n_blocks - 1)
            return jax.lax.cond(
                edge,
                lambda b, a: run5(b, a, True),
                lambda b, a: run5(b, a, False),
                block, abs_iota)

        return make_block_pipeline(14, R, C, body5, dtype=dtype,
                                   block_rows=block_rows,
                                   flops_per_cell=240 * substeps,
                                   interpret=interpret)

    def run(block, abs_iota, row_edges):
        rows = block.shape[1]
        ci = broadcasted_iota(jnp.int32, (rows, C), 1)
        f = [block[k] for k in range(9)]
        g = [block[9 + k] for k in range(9)]

        for _ in range(substeps):
            f_coll, g_coll = _collide_buoyant(f, g, omega_f, omega_g,
                                              g_beta)
            f_new = _stream9(f_coll, rows, C)
            g_new = _stream9(g_coll, rows, C)

            # fluid: no-slip everywhere (rows first, then columns — the
            # column writes win the corners, as in the jnp oracle)
            if row_edges:
                for k in (3, 6, 7):
                    f_new[OPP[k]] = jnp.where(abs_iota == 0, f_coll[k],
                                              f_new[OPP[k]])
                for k in (1, 5, 8):
                    f_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              f_coll[k], f_new[OPP[k]])
            for k in (4, 7, 8):
                f_new[OPP[k]] = jnp.where(ci == 0, f_coll[k],
                                          f_new[OPP[k]])
            for k in (2, 5, 6):
                f_new[OPP[k]] = jnp.where(ci == C - 1, f_coll[k],
                                          f_new[OPP[k]])
            # temperature: halfway ADE-Dirichlet columns (hot +1/2
            # left, cold -1/2 right), then adiabatic bounce-back rows
            # (rows win the corners, as in the jnp oracle)
            for k in (4, 7, 8):
                g_new[OPP[k]] = jnp.where(ci == 0, -g_coll[k] + WQ[k],
                                          g_new[OPP[k]])
            for k in (2, 5, 6):
                g_new[OPP[k]] = jnp.where(ci == C - 1,
                                          -g_coll[k] - WQ[k],
                                          g_new[OPP[k]])
            if row_edges:
                for k in (3, 6, 7):
                    g_new[OPP[k]] = jnp.where(abs_iota == 0, g_coll[k],
                                              g_new[OPP[k]])
                for k in (1, 5, 8):
                    g_new[OPP[k]] = jnp.where(abs_iota == R - 1,
                                              g_coll[k], g_new[OPP[k]])
            f, g = f_new, g_new

        out = f + g
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    def body(block, abs_iota, i):
        if n_blocks <= 2 or substeps >= block_rows:
            return run(block, abs_iota, True)
        edge = (i == 0) | (i == n_blocks - 1)
        return jax.lax.cond(
            edge,
            lambda b, a: run(b, a, True),
            lambda b, a: run(b, a, False),
            block, abs_iota)

    return make_block_pipeline(18, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               flops_per_cell=240 * substeps,
                               interpret=interpret)
