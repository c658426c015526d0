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

# Scoped-VMEM limits requested from the Mosaic compiler
# (xla_tpu_scoped_vmem_limit_kib; hardware default 16 MiB).  The default
# forces tiny row blocks on wide grids — at C=2048 f32 the 9-plane BGK
# slab was capped at B=16, paying 2x halo-compute redundancy under
# temporal blocking.  Raising it is NOT free: the request itself slows
# kernels that never needed it (7936x128/B=496 BGK, slabs 8.9 MiB:
# 35.4 GLUPS at a <= 48 MiB request, 29.8 at 64 MiB, 24.3 at 100 MiB),
# so each pallas_call requests the SMALLEST limit that admits its slabs
# (vmem_limit_for below) and the auto block pick stays inside the
# measured penalty-free zone (SAFE_SCOPE): 15.8 GLUPS (B=16, default
# scope) -> 21.2 (B=128, 64 MiB) ~= 21.0 (B=64, 34 MiB) at 4096x2048
# substeps=8, with the B=64 pick avoiding the >48 MiB regime that cost
# 16-31% on the narrow geometry.  Mosaic needs ~1.6x the accounted slab
# bytes (B=128's 40.1 MiB slabs compile at 64 MiB, not 48) — the
# caller's vmem_budget-of-16-MiB convention supplies that headroom.
DEFAULT_SCOPE = 16 * 2 ** 20   # hardware default, free
SAFE_SCOPE = 48 * 2 ** 20      # largest measured penalty-free request
VMEM_LIMIT = 100 * 2 ** 20     # hard cap (v5e has 128 MiB VMEM/core)
# auto-picked blocks may fill vmem_budget of SAFE_SCOPE (the same
# fraction the caller tuned against the default scope), keeping every
# auto pick's request penalty-free; explicit block_rows may go to
# VMEM_LIMIT.
_BUDGET_SCALE = SAFE_SCOPE / DEFAULT_SCOPE


def slab_bytes(planes_tup, planes_out: int, block_rows: int, C: int,
               dtype, halo: int = HALO) -> int:
    """Accounted VMEM for the double-buffered in-slabs + out-blocks."""
    return (2 * sum(planes_tup) * (block_rows + 2 * halo)
            + 2 * planes_out * block_rows) * C * jnp.dtype(dtype).itemsize


def vmem_limit_for(need_bytes: int, vmem_budget: int) -> int:
    """Smallest scoped-VMEM request (whole MiB) admitting ``need_bytes``
    of slabs at the caller's headroom convention — slabs may fill
    ``vmem_budget`` of the scope, the rest is Mosaic working space and
    live collision temporaries."""
    lim = need_bytes * DEFAULT_SCOPE // vmem_budget
    lim = (lim + 2 ** 20 - 1) // 2 ** 20 * 2 ** 20
    return int(max(DEFAULT_SCOPE, min(VMEM_LIMIT, lim)))


def _kernel(*refs, body, planes_out, block_rows, n_blocks, R, C, dtype,
            halo):
    ins, out_hbm = refs[:-1], refs[-1]
    B = block_rows
    H = halo
    n_in = len(ins)

    def scoped(slabs, obuf, in_sems, out_sems):
        def dma_in(slot, i):
            start = pl.multiple_of(i * B, 8)
            top = pl.multiple_of((start - H) % R, 8)
            bot = pl.multiple_of((start + B) % R, 8)
            cps = []
            for j, src in enumerate(ins):
                slab = slabs[j]
                cps += [
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(top, H), :],
                        slab.at[slot, :, 0:H, :], in_sems.at[slot, 3 * j]),
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(start, B), :],
                        slab.at[slot, :, H:H + B, :],
                        in_sems.at[slot, 3 * j + 1]),
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(bot, H), :],
                        slab.at[slot, :, H + B:H + 2 * H + B, :],
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

            shape = (B + 2 * H, C)
            abs_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0) \
                + (i * B - H)
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
            pltpu.VMEM((2, src.shape[0], block_rows + 2 * H, C), dtype)
            for src in ins),
        obuf=pltpu.VMEM((2, planes_out, block_rows, C), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3 * n_in)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def resolve_block_rows(planes_tup, planes_out: int, R: int, C: int, dtype,
                       vmem_budget: int, block_rows: int | None,
                       allow_row_alias: bool, lift: bool = True,
                       halo: int = HALO) -> int:
    """Auto-pick (or validate) the row-block size: largest multiple of 8
    (DMA alignment) dividing R whose double-buffered slabs fit the VMEM
    budget (scaled by _BUDGET_SCALE — callers' budgets are ratios of the
    default 16 MiB scope, the pipeline requests the matching adaptive
    limit; see vmem_limit_for).  Taller blocks cut halo-compute
    redundancy: the default-scope B=16 cap at C=2048 paid (16+16)/16 =
    2x redundant collisions per output row (15.8 GLUPS); B=64 pays
    1.25x (21.0 GLUPS at 4096x2048, substeps=8).  The gain is NOT
    universal — some stencil/coupled families measure FASTER at the
    default-scope pick (thermal 7.8 vs 6.6 GLUPS at B=32 vs 64, CSF 4.0
    vs 3.2 at B=128 vs 512) — ``lift=False`` keeps the unscaled budget
    (and hence the free 16 MiB request) for those.  Exposed so kernels
    that branch on the block index can learn the pick up front."""
    budget = int(vmem_budget * _BUDGET_SCALE) if lift else vmem_budget
    if halo % 8 != 0 or halo < 8:
        raise ValueError(f"halo must be a positive multiple of 8 ({halo})")
    # the halo DMAs fetch [i*B - halo, i*B) (mod R) as ONE contiguous
    # copy — legal only while no strip straddles the array boundary,
    # i.e. block_rows >= halo (block 1's top strip starts at B - halo)
    b_floor = halo

    def need(b):
        return slab_bytes(planes_tup, planes_out, b, C, dtype, halo)

    if block_rows is None:
        b_max = 512
        if not allow_row_alias:
            # a slab must not contain any global row twice (wrapped halo
            # rows overlapping the interior would double-count the
            # absolute-row masked extractions) — cap candidates so every
            # pick honours B + 2*halo <= R.  Every candidate stays a
            # multiple of 8: halving a pick after the fact can break the
            # pl.multiple_of(i*B, 8) DMA alignment promise.
            b_max = min(b_max, R - 2 * halo)
        b_max -= b_max % 8
        if b_max < b_floor:
            raise ValueError(
                f"no legal block: need R >= {2 * halo + b_floor} (R={R}) "
                f"for an alias-free slab with {halo}-row halo strips")
        b = b_max
        while b > b_floor and not (need(b) <= budget and R % b == 0):
            b -= 8
        if need(b) > budget:
            raise ValueError(
                f"no legal block: even B={b_floor} slabs need "
                f"{need(b_floor)} bytes > budget {budget} "
                f"(planes={sum(planes_tup)}, C={C}, "
                f"{jnp.dtype(dtype).name})")
        block_rows = b
    if R % block_rows != 0:
        raise ValueError(f"rows {R} not divisible by block {block_rows}")
    if block_rows < b_floor:
        raise ValueError(
            f"block_rows {block_rows} < halo {halo}: the [i*B - halo, "
            f"i*B) strip DMA would straddle the array boundary")
    if not allow_row_alias and block_rows + 2 * halo > R:
        raise ValueError(
            f"need R >= block_rows + {2 * halo} (R={R}, block={block_rows})")
    if C % 128 != 0:
        raise ValueError(f"cols {C} must be a multiple of 128")
    return block_rows


def make_block_pipeline(planes, R: int, C: int, body,
                        planes_out: int | None = None, dtype=jnp.float32,
                        block_rows: int | None = None,
                        vmem_budget: int = 6 * 2 ** 20,
                        flops_per_cell: int = 200,
                        allow_row_alias: bool = False,
                        vmem_limit_bytes: int | None = None,
                        lift: bool = True,
                        halo: int = HALO,
                        interpret: bool = False):
    """Fused step over one or more (P_j, R, C) inputs: one launch per call.

    ``allow_row_alias=True`` skips the ``R >= B + 2*halo`` guard — safe
    ONLY for purely periodic bodies with no absolute-row masks or masked
    row extractions (wrapped halo rows then legitimately duplicate
    interior rows).

    ``halo`` deepens the slab halo beyond the default 8 rows (multiples
    of 8 — DMA alignment) so stencil bodies can temporally block: a body
    consuming r halo rows per sweep may run ``substeps <= halo // r``
    sweeps per slab pass, amortising the HBM round-trip.

    ``planes`` is an int (single input) or a tuple of ints (one per input
    array, each halo-slabbed independently — e.g. the cylinder kernel's
    f + force field).  ``body(*blocks, abs_iota, i)`` runs on each
    halo-padded row block and returns the (planes_out, B, C) output block
    (see module docstring)."""
    planes_tup = (planes,) if isinstance(planes, int) else tuple(planes)
    planes_out = planes_out if planes_out is not None else planes_tup[0]
    p_sum = sum(planes_tup)
    block_rows = resolve_block_rows(planes_tup, planes_out, R, C, dtype,
                                    vmem_budget, block_rows,
                                    allow_row_alias, lift, halo)
    kernel = functools.partial(
        _kernel, body=body, planes_out=planes_out, block_rows=block_rows,
        n_blocks=R // block_rows, R=R, C=C, dtype=jnp.dtype(dtype).type,
        halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((planes_out, R, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(planes_tup),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(
                slab_bytes(planes_tup, planes_out, block_rows, C, dtype,
                           halo),
                vmem_budget) if vmem_limit_bytes is None
            else vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * R * C,
            bytes_accessed=(p_sum + planes_out) * R * C
            * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )
