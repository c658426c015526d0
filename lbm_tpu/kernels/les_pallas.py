"""Fused Smagorinsky-BGK collide-stream kernel (models.les).

BEYOND THE REFERENCE (no subgrid model exists there).  The collision is
plain BGK plus three extra 9-term reductions (the non-equilibrium
stress components) and one rsqrt chain for the per-cell effective
omega — all local, so it slots straight into the generic fused/sharded
machinery as a ``collide_fn``:

  * single-chip: ``make_les_fused_step`` delegates to
    kernels.collide_stream.make_fused_step — the same tuned block
    pipeline and temporal blocking (up to 8 sweeps/launch) as the BGK
    kernel;
  * multi-chip: pass ``les_collide_fn(...)`` to
    sharded_pallas.make_sharded_fused_step (1-D, communication-avoiding
    ppermute halos) or sharded2d_pallas.make_sharded_fused_step_2d —
    the same factories the BGK family rides.

Pinned to the jnp oracle (models.les.les_collide + d2q9.stream) at
1e-13 in f64 by tests/test_les.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from . import collide_stream

WQ = tuple(float(v) for v in lat.W)

_SQRT2_18 = 18.0 * 2.0 ** 0.5


def les_collide_fn(tau0: float, cs_smag: float, dtype):
    """Smagorinsky-BGK collision on a (9, rows, C) slab — same contract
    as bgk_pallas.bgk_collide_fn (models.les.smagorinsky_tau algebra,
    paired-direction equilibria)."""
    dt = jnp.dtype(dtype).type
    t00 = dt(tau0)
    a_cs = dt(_SQRT2_18 * float(cs_smag) ** 2)

    def fn(slab):
        rho = slab[0]
        for k in range(1, 9):
            rho = rho + slab[k]
        mx = slab[1] - slab[3] + slab[5] - slab[6] - slab[7] + slab[8]
        my = slab[2] - slab[4] + slab[5] + slab[6] - slab[7] - slab[8]
        inv_rho = 1.0 / rho
        ux = mx * inv_rho
        uy = my * inv_rho

        t0, pairs = collide_stream.d2q9_pairs(ux, uy)
        feq = [None] * 9
        feq[0] = dt(WQ[0]) * rho * t0
        for kp, km, w, cu, cc in pairs:
            wr = dt(w) * rho
            even = wr * (t0 + 4.5 * cc)
            odd = wr * (3.0 * cu)
            feq[kp] = even + odd
            feq[km] = even - odd
        dq = [slab[k] - feq[k] for k in range(9)]

        # non-equilibrium stress |Q| (models.les.smagorinsky_tau):
        # cx^2 = 1 on {1,3,5,6,7,8}, cy^2 = 1 on {2,4,5,6,7,8},
        # cx*cy = +1 on {5,7}, -1 on {6,8}
        qxx = dq[1] + dq[3] + dq[5] + dq[6] + dq[7] + dq[8]
        qyy = dq[2] + dq[4] + dq[5] + dq[6] + dq[7] + dq[8]
        qxy = dq[5] - dq[6] + dq[7] - dq[8]
        qn = jnp.sqrt(qxx * qxx + 2.0 * qxy * qxy + qyy * qyy)
        tau = 0.5 * (t00 + jnp.sqrt(t00 * t00 + a_cs * qn * inv_rho))
        om = 1.0 / tau
        return jnp.stack([slab[k] - om * dq[k] for k in range(9)],
                         axis=0)

    return fn


def make_les_fused_step(R: int, C: int, *, tau0: float, cs_smag: float,
                        substeps: int = 1, dtype=jnp.float32,
                        block_rows: int | None = None,
                        interpret: bool = False):
    """Fused Smagorinsky step: f (9, R, C) -> (9, R, C), ``substeps``
    steps per launch (the BGK kernel's tuned temporal blocking)."""
    return collide_stream.make_fused_step(
        R, C, les_collide_fn(tau0, cs_smag, dtype), dtype=dtype,
        block_rows=block_rows, interpret=interpret,
        flops_per_cell=130, substeps=substeps)
