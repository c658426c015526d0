"""Fused ring-cavity step (Guo-forced strip + no-slip box and block) as one
Pallas launch — the reference's 4-domain force-driven annulus
(decompose_domain_loop.cpp:38-261) as a single-grid fused kernel.

Per step: macroscopics, the velocity shift + standard-Guo source on the
forced strip (rows [a+5, a+55) of the left arm, :117,156-163), BGK,
periodic streaming, halfway bounce-back on the four outer walls and the
four faces of the central solid block.  All BCs are absolute-position
masks on the unwrapped row index (wrapped halo rows only feed populations
the wall overwrites), built on kernels.pipeline.make_block_pipeline.
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


def make_cavity_fused_step(L: int, *, omega: float, force: float,
                           substeps: int = 1, dtype=jnp.float32,
                           block_rows: int | None = None,
                           interpret: bool = False):
    """Fused annulus step: f (9, L, L) -> (9, L, L), advancing
    ``substeps`` steps per launch (temporal blocking: the body is
    stencil-free and the annulus is fully walled — every wall mask runs
    on every block every sweep, cutting all cross-boundary
    dependencies, so each sweep consumes just 1 of the 8 halo rows)."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    a, b = L // 4, 3 * L // 4
    fx = float(force)
    pref = 1.0 - 0.5 * omega

    def body(block, abs_iota, i):
        rows = block.shape[1]
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
        f = [block[k] for k in range(9)]
        for _ in range(substeps):
            f = sweep(f, rows, ci, abs_iota)
        return jnp.stack([p[HALO:rows - HALO] for p in f], axis=0)

    def sweep(f, rows, ci, abs_iota):
        rho = f[0]
        for k in range(1, 9):
            rho = rho + f[k]
        inv_rho = 1.0 / rho
        ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
        uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho

        strip = (abs_iota >= a + 5) & (abs_iota < a + 55) & (ci < a)
        ux = jnp.where(strip, ux + fx, ux)  # velocity shift on the strip

        # paired-direction collision + standard-Guo source (x-directed
        # force, strip only); even/odd split per opposite-direction pair
        # (kernels.collide_stream.d2q9_pairs)
        from .collide_stream import d2q9_pairs

        t0, pairs = d2q9_pairs(ux, uy)
        uF = ux * fx
        coll = [None] * 9
        coll[0] = (1.0 - omega) * f[0] + omega * (WQ[0] * rho * t0) \
            + jnp.where(strip, pref * (-3.0 * uF) * WQ[0], 0.0)
        for kp, km, w, cu, cc in pairs:
            wr = w * rho
            even_f = omega * (wr * (t0 + 4.5 * cc))
            odd_f = omega * (wr * (3.0 * cu))
            cF = CX[kp] * fx  # scalar; 0.0 for the y-axis pair
            even_s = pref * w * (9.0 * cu * cF - 3.0 * uF)
            odd_s = pref * w * (3.0 * cF)  # scalar
            coll[kp] = (1.0 - omega) * f[kp] + (even_f + odd_f) \
                + jnp.where(strip, even_s + odd_s, 0.0)
            coll[km] = (1.0 - omega) * f[km] + (even_f - odd_f) \
                + jnp.where(strip, even_s - odd_s, 0.0)

        new = []
        for k in range(9):
            t = coll[k]
            if CY[k] != 0:
                t = pltpu.roll(t, CY[k] % L, axis=1)
            if CX[k] != 0:
                t = pltpu.roll(t, CX[k] % rows, axis=0)
            new.append(t)

        # outer box walls (halfway bounce-back)
        for k in (3, 6, 7):                       # outgoing at row 0
            new[OPP[k]] = jnp.where(abs_iota == 0, coll[k], new[OPP[k]])
        for k in (1, 5, 8):                       # outgoing at row L-1
            new[OPP[k]] = jnp.where(abs_iota == L - 1, coll[k], new[OPP[k]])
        for k in (4, 7, 8):                       # outgoing at col 0
            new[OPP[k]] = jnp.where(ci == 0, coll[k], new[OPP[k]])
        for k in (2, 5, 6):                       # outgoing at col L-1
            new[OPP[k]] = jnp.where(ci == L - 1, coll[k], new[OPP[k]])

        # central block faces (scenes/cavity._block_wall_assignments)
        brows = (abs_iota >= a) & (abs_iota < b)
        bcols = (ci >= a) & (ci < b)
        for dst, src_k, m in (
                (4, 2, brows & (ci == a)), (7, 5, brows & (ci == a)),
                (8, 6, brows & (ci == a)),
                (2, 4, brows & (ci == b - 1)), (5, 7, brows & (ci == b - 1)),
                (6, 8, brows & (ci == b - 1)),
                (3, 1, (abs_iota == a) & bcols), (7, 5, (abs_iota == a) & bcols),
                (6, 8, (abs_iota == a) & bcols),
                (1, 3, (abs_iota == b - 1) & bcols),
                (5, 7, (abs_iota == b - 1) & bcols),
                (8, 6, (abs_iota == b - 1) & bcols)):
            new[dst] = jnp.where(m, coll[src_k], new[dst])

        return new

    return make_block_pipeline(9, L, L, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=10 * 2 ** 20,
                               flops_per_cell=90 * substeps,
                               interpret=interpret)
