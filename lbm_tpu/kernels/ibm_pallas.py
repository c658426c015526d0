"""Fused IBM multi-direct-forcing as one small Pallas kernel.

Motivation (measured, v5e, 1024x512 cylinder scene): the grid-wide fused
step runs at ~33 us but the jnp forcing path between two kernel launches
costs ~65 us — not for its FLOPs (trivial) but because every small XLA
fusion in the serial f -> ROI macroscopics -> interp/spread -> F chain
pays an HBM round-trip latency that the double-buffered Pallas kernels
hide.  Collapsing the whole forcing into one kernel leaves *zero* XLA
ops between the two launches per step.

Design:
* the marker ROI is covered by an 8x128-aligned window [ra0,ra1)x[ca0,ca1)
  so the f/F DMAs are tile-aligned (`IBM.aligned_window`);
* the Peskin 4-point kernel is a tensor product (the reference stores the
  row/col 4-vectors separately, ibm.cpp:47-57), so interpolation and
  spreading become two small MXU matmuls against dense per-axis factors
  X (rw, M) and Y (cw, M) (`IBM.window_operators`):
      interp(g)  = colsum(X * (g @ Y))        -> (1, M) marker values
      spread(s)  = (X * s) @ Y.T              -> (rw, cw)
  exactly `sum_j s_j wx_j(r) wy_j(c)` — the same multi-direct-forcing
  algebra as ops.ibm.force_density_roi (ibm.cpp:158-190), reassociated;
* the force grid F (2, R, C) is a loop CARRY aliased input->output
  (`input_output_aliases`): the kernel rewrites only the window rows, the
  zeros everywhere else persist from initialisation, so per step it moves
  just the window (~0.6 MB) instead of the full grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def make_ibm_forcing_step(R: int, C: int, ib, dtype=jnp.float32,
                          m_pad: int = 128, interpret: bool = False):
    """Build `fn(f, F_carry) -> F_full` computing the multi-direct-forcing
    Eulerian force density in one Pallas launch, or return None when the
    aligned marker window does not fit the grid (caller falls back to the
    jnp path).  ``F_carry`` must be zeros outside the window (it is on the
    first call; the kernel preserves that invariant)."""
    win = ib.aligned_window(R, C)
    if win is None or ib.row_w is None:
        return None
    ra0, ra1, ca0, ca1 = win
    rw, cw = ra1 - ra0, ca1 - ca0
    # lane-pad the marker count; more markers than the requested pad just
    # widens the (tiny) operator matrices instead of failing over to jnp
    m_pad = max(m_pad, -(-ib.row_w.shape[0] // 128) * 128)
    X, Y = ib.window_operators(ra0, ra1, ca0, ca1, m_pad)
    Xd = jnp.asarray(X, dtype)
    Yd = jnp.asarray(Y, dtype)
    n_iter = ib.m_max - 1

    def kernel(f_hbm, X_ref, Y_ref, Fin_hbm, Fout_hbm):
        del Fin_hbm  # aliased to Fout_hbm; rows outside the window persist

        def scoped(fwin, Fwin, sem_in, sem_out):
            cp = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(ra0, rw), pl.ds(ca0, cw)], fwin, sem_in)
            cp.start()
            cp.wait()
            Xm = X_ref[...]
            Ym = Y_ref[...]
            f = [fwin[k] for k in range(9)]
            rho = f[0]
            for k in range(1, 9):
                rho = rho + f[k]
            inv_rho = 1.0 / rho
            ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) * inv_rho
            uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) * inv_rho

            def interp(g):
                V = jax.lax.dot_general(g, Ym, (((1,), (0,)), ((), ())),
                                        precision=HIGHEST)   # (rw, M)
                return jnp.sum(V * Xm, axis=0, keepdims=True)  # (1, M)

            def spread(s):
                A = Xm * s                                     # (rw, M)
                return jax.lax.dot_general(A, Ym, (((1,), (1,)), ((), ())),
                                           precision=HIGHEST)  # (rw, cw)

            rho_j = interp(rho)
            half_inv = 0.5 * inv_rho
            ux_w, uy_w = ux, uy
            Fx = jnp.zeros_like(rho)
            Fy = jnp.zeros_like(rho)
            for _ in range(n_iter):
                fx_j = -2.0 * rho_j * interp(ux_w)
                fy_j = -2.0 * rho_j * interp(uy_w)
                Fx_n = spread(fx_j)
                Fy_n = spread(fy_j)
                ux_w = ux_w + Fx_n * half_inv
                uy_w = uy_w + Fy_n * half_inv
                Fx = Fx + Fx_n
                Fy = Fy + Fy_n
            Fwin[0] = Fx
            Fwin[1] = Fy
            cpo = pltpu.make_async_copy(
                Fwin, Fout_hbm.at[:, pl.ds(ra0, rw), pl.ds(ca0, cw)],
                sem_out)
            cpo.start()
            cpo.wait()

        pl.run_scoped(
            scoped,
            fwin=pltpu.VMEM((9, rw, cw), jnp.dtype(dtype).type),
            Fwin=pltpu.VMEM((2, rw, cw), jnp.dtype(dtype).type),
            sem_in=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA,
        )

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, R, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((rw, m_pad), lambda: (0, 0)),
                  pl.BlockSpec((cw, m_pad), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def fn(f, F_carry):
        return step(f, Xd, Yd, F_carry)

    fn.window = win
    return fn
