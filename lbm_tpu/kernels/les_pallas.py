"""Fused Smagorinsky-BGK collide-stream kernel (models.les) — one
Pallas launch advancing ``substeps`` steps.

BEYOND THE REFERENCE (no subgrid model exists there).  The body is
plain BGK plus three extra 9-term reductions (the non-equilibrium
stress components) and one rsqrt chain for the per-cell effective
omega — all local, so the kernel keeps BGK's structure: purely
periodic streaming via rolls, NO masks of any kind.  That makes
temporal blocking trivial: with no positional edits, every slab row
sweeps correctly wherever it sits, so up to 8 sweeps per launch just
like the BGK kernel (1 halo row per sweep), and ``allow_row_alias``
applies (no absolute-row masks or masked extractions).

Pinned to the jnp oracle (models.les.les_collide + d2q9.stream) at
1e-13 in f64 by tests/test_les.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from .collide_stream import HALO, d2q9_pairs
from .pipeline import make_block_pipeline
from .sediment_pallas import _stream9

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)

_SQRT2_18 = 18.0 * 2.0 ** 0.5


def make_les_fused_step(R: int, C: int, *, tau0: float, cs_smag: float,
                        substeps: int = 1, dtype=jnp.float32,
                        block_rows: int | None = None,
                        interpret: bool = False):
    """Fused Smagorinsky step: f (9, R, C) -> (9, R, C), ``substeps``
    steps per launch."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    t00 = float(tau0)
    a_cs = _SQRT2_18 * float(cs_smag) ** 2

    def body(block, abs_iota, i):
        rows = block.shape[1]
        f = [block[k] for k in range(9)]
        for _ in range(substeps):
            rho = f[0]
            for k in range(1, 9):
                rho = rho + f[k]
            inv_rho = 1.0 / rho
            ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
            uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho

            t0, pairs = d2q9_pairs(ux, uy)
            feq = [None] * 9
            feq[0] = WQ[0] * rho * t0
            for kp, km, w, cu, cc in pairs:
                wr = w * rho
                even = wr * (t0 + 4.5 * cc)
                odd = wr * (3.0 * cu)
                feq[kp] = even + odd
                feq[km] = even - odd
            dq = [f[k] - feq[k] for k in range(9)]

            # non-equilibrium stress |Q| (models.les.smagorinsky_tau)
            qxx = dq[1] + dq[3] + dq[5] + dq[6] + dq[7] + dq[8]
            qyy = dq[2] + dq[4] + dq[5] + dq[6] + dq[7] + dq[8]
            qxy = dq[5] - dq[6] + dq[7] - dq[8]
            qn = jnp.sqrt(qxx * qxx + 2.0 * qxy * qxy + qyy * qyy)
            tau = 0.5 * (t00 + jnp.sqrt(t00 * t00
                                        + a_cs * qn * inv_rho))
            om = 1.0 / tau
            coll = [f[k] - om * dq[k] for k in range(9)]
            f = _stream9(coll, rows, block.shape[2])

        return jnp.stack([p[HALO:rows - HALO] for p in f], axis=0)

    return make_block_pipeline(9, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               flops_per_cell=130 * substeps,
                               allow_row_alias=True,
                               interpret=interpret)
