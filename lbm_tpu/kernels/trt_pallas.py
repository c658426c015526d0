"""Fused TRT collide-stream kernel (models.trt).

BEYOND THE REFERENCE (which has no TRT operator).  The TRT relaxation
acts separately on the even/odd parts of each opposite-direction pair —
exactly the decomposition the paired-direction BGK kernel already
computes (kernels.collide_stream.d2q9_pairs gives the equilibrium's
even and odd parts per pair directly), so the collide_fn costs two
extra multiply-adds per pair over BGK and slots straight into the
generic machinery:

  * single-chip: ``make_trt_fused_step`` delegates to
    kernels.collide_stream.make_fused_step (tuned block pipeline +
    temporal blocking up to 8 sweeps/launch);
  * multi-chip: pass ``trt_collide_fn(...)`` to
    sharded_pallas.make_sharded_fused_step or
    sharded2d_pallas.make_sharded_fused_step_2d, like the BGK/LES
    families;
  * walled channels: make_channel_variant_step(omega_minus=...) in
    kernels/channel_pallas.py runs the same algebra with the full BC
    stack.

Pinned to the jnp oracle (models.trt.trt_collision + d2q9.stream) at
1e-13 in f64 by tests/test_trt.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from . import collide_stream

WQ = tuple(float(v) for v in lat.W)


def trt_collide_fn(omega_plus: float, omega_minus: float, dtype):
    """TRT collision on a (9, rows, C) slab — same contract as
    bgk_pallas.bgk_collide_fn.  Even/odd non-equilibria per opposite
    pair (models.trt.trt_collision algebra, reassociated into the
    paired-direction form)."""
    dt = jnp.dtype(dtype).type
    w_p = dt(omega_plus)
    w_m = dt(omega_minus)

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
        out = [None] * 9
        feq0 = dt(WQ[0]) * rho * t0
        out[0] = slab[0] - w_p * (slab[0] - feq0)
        for kp, km, w, cu, cc in pairs:
            wr = dt(w) * rho
            even_eq = wr * (t0 + 4.5 * cc)
            odd_eq = wr * (3.0 * cu)
            ne_even = 0.5 * (slab[kp] + slab[km]) - even_eq
            ne_odd = 0.5 * (slab[kp] - slab[km]) - odd_eq
            d_even = w_p * ne_even
            d_odd = w_m * ne_odd
            out[kp] = slab[kp] - (d_even + d_odd)
            out[km] = slab[km] - (d_even - d_odd)
        return jnp.stack(out, axis=0)

    return fn


def make_trt_fused_step(R: int, C: int, *, omega_plus: float,
                        omega_minus: float, substeps: int = 1,
                        dtype=jnp.float32,
                        block_rows: int | None = None,
                        interpret: bool = False):
    """Fully periodic fused TRT step: (9, R, C) -> (9, R, C), advancing
    ``substeps`` LBM steps per launch."""
    return collide_stream.make_fused_step(
        R, C, trt_collide_fn(omega_plus, omega_minus, dtype), dtype=dtype,
        substeps=substeps, block_rows=block_rows, interpret=interpret)
