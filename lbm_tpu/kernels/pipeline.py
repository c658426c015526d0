"""Generic double-buffered block pipeline for fused LBM kernels.

Every fused kernel in this package shares the same skeleton: stream the
(P, R, C) state through VMEM in row blocks with an 8-row periodic halo,
double-buffering the HBM->VMEM input DMAs against compute, and
double-buffering the output DMAs against the next block.  This module
factors that skeleton out; a kernel supplies only its per-block physics:

    body(block, abs_iota, i) -> (P_out, B, C) array

where ``block`` is the (P, B + 2*HALO, C) halo-padded slab (halos wrap
periodically over rows; callers' BC masks overwrite whatever wrapped
values are physically wrong, matching the reference's
advect-then-overwrite order), ``abs_iota`` the absolute global row index
of every slab row (int32, NOT wrapped — compare against 0..R-1 directly;
halo rows beyond the edges are negative / >= R), and ``i`` the block
index.  The body's output block is written to rows [i*B, (i+1)*B).

Hosts every single-input BC kernel: channel_pallas, mrtcg_pallas,
rk_pallas, sediment_pallas, cavity_pallas.  Three kernels stay standalone
on purpose: collide_stream/bgk_pallas (temporal blocking re-runs the body
``substeps`` times per block, amortising the DMA), cylinder_pallas (two
input arrays — f and the IBM force field — need a second DMA set), and
the sharded kernels (halo inputs replace the periodic wrap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .collide_stream import HALO


def _kernel(*refs, body, planes_out, block_rows, n_blocks, R, C, dtype):
    ins, out_hbm = refs[:-1], refs[-1]
    B = block_rows
    n_in = len(ins)

    def scoped(slabs, obuf, in_sems, out_sems):
        def dma_in(slot, i):
            start = pl.multiple_of(i * B, 8)
            top = pl.multiple_of((start - HALO) % R, 8)
            bot = pl.multiple_of((start + B) % R, 8)
            cps = []
            for j, src in enumerate(ins):
                slab = slabs[j]
                cps += [
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(top, HALO), :],
                        slab.at[slot, :, 0:HALO, :], in_sems.at[slot, 3 * j]),
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(start, B), :],
                        slab.at[slot, :, HALO:HALO + B, :],
                        in_sems.at[slot, 3 * j + 1]),
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(bot, HALO), :],
                        slab.at[slot, :, HALO + B:HALO + 2 * HALO + B, :],
                        in_sems.at[slot, 3 * j + 2]),
                ]
            return cps

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

            shape = (B + 2 * HALO, C)
            abs_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0) \
                + (i * B - HALO)
            blocks = tuple(slabs[j][slot] for j in range(n_in))
            obuf[slot] = body(*blocks, abs_iota, i)

            dma_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma_out(jax.lax.rem(n_blocks - 2, 2), n_blocks - 2).wait()
        dma_out(jax.lax.rem(n_blocks - 1, 2), n_blocks - 1).wait()

    pl.run_scoped(
        scoped,
        slabs=tuple(
            pltpu.VMEM((2, src.shape[0], block_rows + 2 * HALO, C), dtype)
            for src in ins),
        obuf=pltpu.VMEM((2, planes_out, block_rows, C), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3 * n_in)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def resolve_block_rows(planes_tup, planes_out: int, R: int, C: int, dtype,
                       vmem_budget: int, block_rows: int | None,
                       allow_row_alias: bool) -> int:
    """Auto-pick (or validate) the row-block size: largest multiple of 8
    (DMA alignment) dividing R whose double-buffered slabs fit the VMEM
    budget and whose planes stay under the empirical 256 KiB Mosaic
    ceiling.  Exposed so kernels that branch on the block index can learn
    the pick up front."""
    p_sum = sum(planes_tup)
    if block_rows is None:
        itemsize = jnp.dtype(dtype).itemsize
        # taller blocks cut halo redundancy; see
        # kernels.collide_stream.pick_block_rows for the measurements
        b_max = 256 * 1024 // (C * itemsize) - 2 * HALO
        if not allow_row_alias:
            # a slab must not contain any global row twice (wrapped halo
            # rows overlapping the interior would double-count the
            # absolute-row masked extractions) — cap candidates so every
            # pick honours B + 2*HALO <= R.  Every candidate stays a
            # multiple of 8: halving a pick after the fact can break the
            # pl.multiple_of(i*B, 8) DMA alignment promise.
            b_max = min(b_max, R - 2 * HALO)
        b_max = min(512, b_max - b_max % 8)
        if b_max < 8:
            raise ValueError(
                f"no legal block: need C*itemsize <= "
                f"{256 * 1024 // (3 * HALO)} (C={C}, {jnp.dtype(dtype).name})"
                + ("" if allow_row_alias else f" and R >= {3 * HALO} "
                   f"(R={R}) for an alias-free slab"))
        b = b_max
        while b > 8:
            need = (2 * p_sum * (b + 2 * HALO)
                    + 2 * planes_out * b) * C * itemsize
            if need <= vmem_budget and R % b == 0:
                break
            b -= 8
        block_rows = b
    if R % block_rows != 0:
        raise ValueError(f"rows {R} not divisible by block {block_rows}")
    if not allow_row_alias and block_rows + 2 * HALO > R:
        raise ValueError(
            f"need R >= block_rows + {2 * HALO} (R={R}, block={block_rows})")
    if C % 128 != 0:
        raise ValueError(f"cols {C} must be a multiple of 128")
    return block_rows


def make_block_pipeline(planes, R: int, C: int, body,
                        planes_out: int | None = None, dtype=jnp.float32,
                        block_rows: int | None = None,
                        vmem_budget: int = 6 * 2 ** 20,
                        flops_per_cell: int = 200,
                        allow_row_alias: bool = False,
                        interpret: bool = False):
    """Fused step over one or more (P_j, R, C) inputs: one launch per call.

    ``allow_row_alias=True`` skips the ``R >= B + 2*HALO`` guard — safe
    ONLY for purely periodic bodies with no absolute-row masks or masked
    row extractions (wrapped halo rows then legitimately duplicate
    interior rows).

    ``planes`` is an int (single input) or a tuple of ints (one per input
    array, each halo-slabbed independently — e.g. the cylinder kernel's
    f + force field).  ``body(*blocks, abs_iota, i)`` runs on each
    halo-padded row block and returns the (planes_out, B, C) output block
    (see module docstring)."""
    planes_tup = (planes,) if isinstance(planes, int) else tuple(planes)
    planes_out = planes_out if planes_out is not None else planes_tup[0]
    p_sum = sum(planes_tup)
    block_rows = resolve_block_rows(planes_tup, planes_out, R, C, dtype,
                                    vmem_budget, block_rows, allow_row_alias)
    kernel = functools.partial(
        _kernel, body=body, planes_out=planes_out, block_rows=block_rows,
        n_blocks=R // block_rows, R=R, C=C, dtype=jnp.dtype(dtype).type)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((planes_out, R, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(planes_tup),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * R * C,
            bytes_accessed=(p_sum + planes_out) * R * C
            * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )
