"""Fused D2Q9 BGK collide-stream Pallas TPU kernel.

One kernel launch per time step replaces the ~50 XLA fusions of the jnp
oracle (moments -> equilibrium -> BGK -> 9 streaming rolls, compare
/root/reference/src/solver.cpp:23-131 where each op is a separate CUDA
kernel).  The block pipeline lives in kernels.pipeline (via
kernels.collide_stream); this module
provides the hand-unrolled BGK collision (explicit 9-term moment sums — no
dot_general, so no f32->bf16 precision loss) and the public
``make_fused_step`` used by bench.py.

Measured on the v5e chip: 3.7 GLUPS marginal at 4096x2048 f32 (~266 GB/s
effective, vs the 72 B/cell/step speed-of-light at ~819 GB/s HBM).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from . import collide_stream

CX = collide_stream.CX
CY = collide_stream.CY
WQ = tuple(float(v) for v in lat.W)
HALO = collide_stream.HALO
pick_block_rows = collide_stream.pick_block_rows


def bgk_collide_fn(omega: float, dtype):
    """Explicit-sum BGK collision on a (9, rows, C) slab.

    Paired-direction formulation: opposite directions share every
    velocity-dependent subexpression.  With cu(k) = -cu(opp(k)), the
    equilibrium polynomial splits into even + odd parts, so each of the
    four direction pairs costs one shared even term W*rho*(1 - 1.5uu +
    4.5cu^2) plus one shared odd term W*rho*3cu, combined by +/-.  ux^2
    and uy^2 are reused from uu; s = ux+uy and d = ux-uy serve the two
    diagonal pairs.  ~25% fewer VPU ops than the direction-by-direction
    form (the fused kernel is compute-bound, not HBM-bound: 312 GB/s of
    819 at the former 34.7 GLUPS) — measured 34.7 -> 36-39 GLUPS
    (medians of two bench runs; timing through the axon relay is a few %
    noisy) at 7936x128/substeps=8 on the v5e chip.  Matches ops.d2q9 to
    f32 round-off (same algebra, reassociated)."""
    dt = jnp.dtype(dtype).type

    def fn(slab):
        rho = slab[0]
        for k in range(1, 9):
            rho = rho + slab[k]
        mx = slab[1] - slab[3] + slab[5] - slab[6] - slab[7] + slab[8]
        my = slab[2] - slab[4] + slab[5] + slab[6] - slab[7] - slab[8]
        inv_rho = 1.0 / rho
        ux = mx * inv_rho
        uy = my * inv_rho
        one_m_omega = dt(1.0 - omega)
        omega_c = dt(omega)
        t0, pairs = collide_stream.d2q9_pairs(ux, uy)
        feq = [None] * 9
        feq[0] = dt(WQ[0]) * rho * t0
        for (kp, km, w, cu, cc) in pairs:
            wr = dt(w) * rho
            even = wr * (t0 + 4.5 * cc)
            odd = wr * (3.0 * cu)
            feq[kp] = even + odd
            feq[km] = even - odd
        return jnp.stack(
            [one_m_omega * slab[k] + omega_c * feq[k] for k in range(9)],
            axis=0)

    return fn


def make_fused_step(R: int, C: int, omega: float, dtype=jnp.float32,
                    block_rows: int | None = None, interpret: bool = False,
                    substeps: int = 1, vmem_limit_bytes: int | None = None):
    """Fused periodic BGK collide-stream: f (9, R, C) -> (9, R, C), advanced
    ``substeps`` steps per launch (temporal blocking; measured 3.7 GLUPS at
    substeps=1 -> 14.7 GLUPS at substeps=8 on the v5e chip).
    Matches d2q9.stream(d2q9.bgk_collision(f, equilibrium, omega)) to f32
    round-off; tests/test_pallas.py checks in interpret mode and the verify
    drive checked on hardware."""
    return collide_stream.make_fused_step(
        R, C, bgk_collide_fn(omega, dtype), dtype=dtype,
        block_rows=block_rows, interpret=interpret, flops_per_cell=60,
        substeps=substeps, vmem_limit_bytes=vmem_limit_bytes)
