"""Generic fused collide-stream Pallas harness.

Any *local* collision operator (a pure function of the 9 populations at a
cell) fuses with periodic streaming into one kernel launch per step:

    make_fused_step(R, C, collide_fn)  with
    collide_fn: f_slab (9, rows, C) -> post-collision (9, rows, C)

The harness supplies the double-buffered HBM->VMEM block pipeline and the
streaming-as-output-addressing trick of kernels.bgk_pallas (see that module
for the design notes); collide_fn runs on each (9, B+16, C) slab entirely
in VMEM, so ordinary jnp code — including the model-layer collision
functions (models.kbc.collide, ops.d2q9.bgk_collision) — works unchanged
inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
HALO = 8  # sublane-aligned halo depth (Mosaic requires 8-row alignment)


def _stream_slab(coll, C, rows):
    """Periodic streaming on a slab via rolls (valid region shrinks by one
    row per application; callers keep the interior)."""
    out = []
    for k in range(9):
        shifted = coll[k]
        if CY[k] != 0:
            shifted = pltpu.roll(shifted, CY[k] % C, axis=1)
        if CX[k] != 0:
            shifted = pltpu.roll(shifted, CX[k] % rows, axis=0)
        out.append(shifted)
    return jnp.stack(out, axis=0)


def _kernel(f_hbm, out_hbm, *, collide_fn, block_rows, n_blocks, R, C, dtype,
            substeps=1):
    B = block_rows

    def body(slab, obuf, in_sems, out_sems):
        def dma_in(slot, i):
            start = pl.multiple_of(i * B, 8)
            top = pl.multiple_of((start - HALO) % R, 8)
            bot = pl.multiple_of((start + B) % R, 8)
            return (
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(top, HALO), :], slab.at[slot, :, 0:HALO, :],
                    in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(start, B), :],
                    slab.at[slot, :, HALO:HALO + B, :],
                    in_sems.at[slot, 1]),
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(bot, HALO), :],
                    slab.at[slot, :, HALO + B:HALO + 2 * HALO + B, :],
                    in_sems.at[slot, 2]),
            )

        def dma_out(slot, i):
            return pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[:, pl.ds(i * B, B), :],
                out_sems.at[slot])

        for d in dma_in(0, 0):
            d.start()

        def loop(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                for d in dma_in(nxt, i + 1):
                    d.start()

            for d in dma_in(slot, i):
                d.wait()

            @pl.when(i >= 2)
            def _():
                dma_out(slot, i - 2).wait()

            # Temporal blocking: apply `substeps` collide-stream sweeps on
            # the slab before writing back.  Columns are fully resident
            # (exact periodic wrap); along rows each sweep invalidates one
            # more edge row, so the HALO-deep halo supports substeps <= HALO
            # and the kept interior [HALO, HALO+B) stays exact.  HBM traffic
            # drops by the substep factor.
            rows = B + 2 * HALO
            cur = slab[slot]
            for _ in range(substeps):
                cur = _stream_slab(collide_fn(cur), C, rows)
            obuf[slot] = cur[:, HALO:HALO + B, :]

            dma_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma_out(jax.lax.rem(n_blocks - 2, 2), n_blocks - 2).wait()
        dma_out(jax.lax.rem(n_blocks - 1, 2), n_blocks - 1).wait()

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((2, 9, block_rows + 2 * HALO, C), dtype),
        obuf=pltpu.VMEM((2, 9, block_rows, C), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def pick_block_rows(R: int, C: int, dtype=jnp.float32,
                    vmem_budget=10 * 2 ** 20) -> int:
    """Largest power-of-two row block that (a) divides R, (b) fits the
    double-buffered slabs in the VMEM budget, and (c) keeps each slab plane
    under the empirical Mosaic ceiling ((b+16)*C*itemsize <= 256 KiB for
    f32 — measured: B=16@C=2048 and B=64@C=512 compile, B=32@C=2048 does
    not).  Larger blocks cut temporal-blocking compute redundancy: measured
    14.7 GLUPS at B=16/C=2048 vs 20.2 GLUPS at B=64/C=512, substeps=8."""
    itemsize = jnp.dtype(dtype).itemsize
    b = 256
    while b > 8:
        need = 2 * 9 * (b + 2 * HALO) * C * itemsize + 2 * 9 * b * C * itemsize
        plane = (b + 2 * HALO) * C * itemsize
        if need <= vmem_budget and plane <= 256 * 1024 and R % b == 0:
            return b
        b //= 2
    return 8


def make_fused_step(R: int, C: int, collide_fn, dtype=jnp.float32,
                    block_rows: int | None = None, interpret: bool = False,
                    flops_per_cell: int = 60, substeps: int = 1):
    """Fused periodic collide-stream with an arbitrary local collision.

    ``substeps`` > 1 enables temporal blocking: one launch advances the
    state by that many LBM steps while reading/writing HBM once (valid for
    substeps <= HALO and fully periodic domains)."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if block_rows is None:
        block_rows = pick_block_rows(R, C, dtype)
    if R % block_rows != 0:
        raise ValueError(f"rows {R} not divisible by block {block_rows}")
    if C % 128 != 0:
        raise ValueError(f"cols {C} must be a multiple of 128")
    n_blocks = R // block_rows

    kernel = functools.partial(
        _kernel, collide_fn=collide_fn, block_rows=block_rows,
        n_blocks=n_blocks, R=R, C=C, dtype=jnp.dtype(dtype).type,
        substeps=substeps)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, R, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * R * C,
            bytes_accessed=2 * 9 * R * C * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def kbc_collide_fn(s2: float):
    """KBC cascaded collision as a slab function (models.kbc.collide runs
    unchanged inside the kernel — pure local jnp with scalar constants).
    Moments use explicit 9-term sums (no dot_general: Pallas kernels cannot
    capture array constants, and the sums keep full f32 precision)."""
    from ..models import kbc

    def fn(f):
        m0 = f[0]
        for k in range(1, 9):
            m0 = m0 + f[k]
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        u = jnp.stack([mx / m0, my / m0], axis=0)
        return kbc.collide(f, m0, u, s2)

    return fn


def make_kbc_fused_step(R: int, C: int, s2: float, dtype=jnp.float32,
                        block_rows: int | None = None, interpret: bool = False,
                        substeps: int = 1):
    """Fused KBC collide-stream (the ULBM family's 300k-step workloads,
    test/ulbm_poiseuille.cpp:64)."""
    if block_rows is None:
        # KBC keeps many live temporaries; halve the block budget
        block_rows = pick_block_rows(R, C, dtype, vmem_budget=5 * 2 ** 20)
    return make_fused_step(R, C, kbc_collide_fn(s2), dtype=dtype,
                           block_rows=block_rows, interpret=interpret,
                           flops_per_cell=400, substeps=substeps)
