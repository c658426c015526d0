"""Fused Shan-Chen pseudopotential step (models.shan_chen) — one Pallas
launch per ``substeps`` liquid-vapor LBM steps.

BEYOND THE REFERENCE (its multiphase family is colour-gradient only);
the kernel reuses the standard machinery: the block pipeline of
kernels.pipeline, the paired-direction BGK of kernels.sediment_pallas,
and per-slab periodic rolls for both the psi interaction stencil and
streaming.  The pseudopotential force needs ONE transcendental per cell
(exp for psi = 1 - e^-rho) plus four paired neighbor differences — far
cheaper than the colour-gradient stencil set, so the family benches
closer to BGK than to MRT-CG.

Temporal blocking: each sweep consumes 2 halo rows (1 for the psi
stencil + 1 for streaming), so substeps <= HALO // 2 = 4 sweeps amortise
one HBM round-trip (vs 8 for pure-local collisions).  Fully periodic
with no position masks: wrapped halo rows are exact periodic images, so
the body is alias-safe and needs no abs_iota at all.

The slab body is shared with the 1-D (ppermute rows) and 2-D (rows x
column strips) sharded wrappers via the generic body contract
(sharded_pallas.make_sharded_body_step / sharded2d_pallas wrappers).
Pinned to models.shan_chen.step at 1e-13 f64 by
tests/test_shan_chen.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat
from .collide_stream import CHALO, HALO, d2q9_pairs
from .pipeline import make_block_pipeline, resolve_block_rows
from .sediment_pallas import _bgk9, _stream9

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)

# halo rows consumed per sweep: psi stencil (1) + streaming (1)
ROWS_PER_SWEEP = 2


def _sc_force(psi_p, G, rows, width):
    """(Fx, Fy) = -G psi sum_k w_k psi(x + c_k) c_k on a slab plane,
    periodic rolls; opposite directions pair into differences (the
    models.shan_chen.sc_force algebra, pltpu.roll semantics identical
    to jnp.roll)."""
    fx = None
    fy = None
    for kp in (1, 2, 5, 8):
        pos = psi_p
        neg = psi_p
        if CY[kp] != 0:
            pos = pltpu.roll(pos, (-CY[kp]) % width, axis=1)
            neg = pltpu.roll(neg, CY[kp] % width, axis=1)
        if CX[kp] != 0:
            pos = pltpu.roll(pos, (-CX[kp]) % rows, axis=0)
            neg = pltpu.roll(neg, CX[kp] % rows, axis=0)
        d = WQ[kp] * (pos - neg)
        if CX[kp] != 0:
            t = CX[kp] * d
            fx = t if fx is None else fx + t
        if CY[kp] != 0:
            t = CY[kp] * d
            fy = t if fy is None else fy + t
    mg = -G * psi_p
    return mg * fx, mg * fy


def _collide_sc(f, omega, G, rows, width, psi_of, forcing):
    """One Shan-Chen collision on slab plane lists (models.shan_chen.
    collide algebra).  ``forcing='guo'``: half-force velocity shift +
    paired Guo source (standard ics2=3/ics4=9; pair-even part
    9 cu cF - 3 uF, odd 3 cF).  ``forcing='shift'``: the original
    velocity-shift scheme — u_eq = u_bare + F/(omega rho), no source
    (required for the stiff Carnahan-Starling EOS)."""
    rho = f[0]
    for k in range(1, 9):
        rho = rho + f[k]
    psi_p = psi_of(rho)
    Fx, Fy = _sc_force(psi_p, G, rows, width)
    inv_rho = 1.0 / rho
    mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
    my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
    if forcing == "shift":
        inv_om = 1.0 / omega
        ux = (mx + inv_om * Fx) * inv_rho
        uy = (my + inv_om * Fy) * inv_rho
        return _bgk9(f, ux, uy, rho, omega)
    ux = (mx + 0.5 * Fx) * inv_rho
    uy = (my + 0.5 * Fy) * inv_rho

    out = _bgk9(f, ux, uy, rho, omega)
    pref = 1.0 - 0.5 * omega
    uF3 = 3.0 * (ux * Fx + uy * Fy)
    out[0] = out[0] - pref * WQ[0] * uF3
    _, pairs = d2q9_pairs(ux, uy)
    cf = {1: Fx, 2: Fy, 5: Fx + Fy, 8: Fx - Fy}
    for kp, km, w, cu, _cc in pairs:
        cF = cf[kp]
        even = pref * w * (9.0 * cu * cF - uF3)
        odd = pref * w * (3.0 * cF)
        out[kp] = out[kp] + (even + odd)
        out[km] = out[km] + (even - odd)
    return out


def resolve_eos(eos: str, G: float | None, T: float | None,
                forcing: str | None):
    """(psi_of, G, forcing) with the model's defaults: exponential EOS
    runs Guo forcing at the caller's G; Carnahan-Starling fixes G = -1
    and needs the velocity-shift scheme (models.shan_chen.collide
    docstring — Guo NaNs on the stiff EOS).  All constants stay python
    scalars (Mosaic kernels cannot capture arrays)."""
    if eos == "sc":
        if G is None:
            raise ValueError("eos='sc' needs the coupling G")
        return ((lambda rho: 1.0 - jnp.exp(-rho)), float(G),
                forcing or "guo")
    if eos == "cs":
        if T is None:
            raise ValueError("eos='cs' needs a temperature T")
        from ..models.shan_chen import CS_A, CS_B
        Tf, a, b = float(T), CS_A, CS_B

        def psi_of(rho):
            eta = (0.25 * b) * rho
            e2 = eta * eta
            P = rho * Tf * (1.0 + eta + e2 - e2 * eta) \
                / (1.0 - eta) ** 3 - a * rho * rho
            return jnp.sqrt(jnp.maximum(6.0 * (rho / 3.0 - P), 0.0))

        return psi_of, -1.0, forcing or "shift"
    raise ValueError(f"unknown eos {eos!r} (want 'sc' or 'cs')")


def make_sc_body(R: int, C: int, *, omega: float, G: float | None = None,
                 substeps: int = 1, eos: str = "sc",
                 T: float | None = None, forcing: str | None = None):
    """Per-slab body: ``run(block (9, rows, width), abs_iota, row_edges,
    col_iota=None) -> (9, rows - 2*HALO, width')`` — the generic body
    contract of the sharded wrappers.  Fully periodic: abs_iota and
    row_edges are ignored (no position masks), and in the 2-D-sharded
    mode (col_iota not None) the rolls act on the padded local width
    (the column halo strips supply the periodic neighbours) and the
    output trims the CHALO column pad."""
    if not 1 <= substeps <= HALO // ROWS_PER_SWEEP:
        raise ValueError(
            f"substeps must be in [1, {HALO // ROWS_PER_SWEEP}] "
            f"({ROWS_PER_SWEEP} halo rows consumed per sweep)")
    psi_of, G, forcing = resolve_eos(eos, G, T, forcing)

    def run(block, abs_iota, row_edges, col_iota=None):
        del abs_iota, row_edges
        rows = block.shape[1]
        width = block.shape[2]
        f = [block[k] for k in range(9)]
        for _ in range(substeps):
            f = _stream9(_collide_sc(f, omega, G, rows, width,
                                     psi_of, forcing),
                         rows, width)
        if col_iota is None:
            return jnp.stack([p[HALO:rows - HALO] for p in f], axis=0)
        return jnp.stack(
            [p[HALO:rows - HALO, 0:width - CHALO] for p in f],
            axis=0)

    return run


def make_sc_fused_step(R: int, C: int, *, omega: float,
                       G: float | None = None, substeps: int = 1,
                       eos: str = "sc", T: float | None = None,
                       forcing: str | None = None, dtype=jnp.float32,
                       block_rows: int | None = None,
                       interpret: bool = False):
    """Fused periodic Shan-Chen step: f (9, R, C) -> (9, R, C), advanced
    ``substeps`` (<= 4) steps per launch.  ``eos='cs'`` runs the
    Carnahan-Starling pseudopotential at temperature ``T`` (G fixed at
    -1, velocity-shift forcing — see resolve_eos)."""
    # 8 MiB-of-16 budget (2.0x Mosaic headroom): the psi/force planes add
    # live temporaries over plain BGK's 1.6x-headroom convention
    block_rows = resolve_block_rows((9,), 9, R, C, dtype, 8 * 2 ** 20,
                                    block_rows, True)
    run = make_sc_body(R, C, omega=omega, G=G, substeps=substeps,
                       eos=eos, T=T, forcing=forcing)

    def body(block, abs_iota, i):
        return run(block, abs_iota, True)

    return make_block_pipeline(9, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=8 * 2 ** 20,
                               flops_per_cell=90 * substeps,
                               allow_row_alias=True,
                               interpret=interpret)
