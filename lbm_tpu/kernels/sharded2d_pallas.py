"""2-D sharded fused collide-stream: rows over mesh 'x', cols over 'y'.

Pod-scale form of kernels.sharded_pallas: with hundreds of chips a 1-D row
decomposition starves the block pipeline, so the grid is split over both
mesh axes.  Per (multi-)step:

  1. row halos (HALO=8 rows) ride two ppermutes over 'x'; the row-padded
     local field is assembled once in jnp;
  2. column halos are 128-wide strips of the row-padded field (lane-tile
     aligned — Mosaic wants 128-lane slices) exchanged over 'y', corners
     included automatically because the strips carry the row halos;
  3. the local Pallas kernel tiles over row blocks; every DMA is contiguous
     (no periodic wrap logic — the halos came from the neighbours), column
     rolls act on the 128+C_loc+128 padded width and the kept interior
     slice stays lane-aligned.

The 8-row / 128-col halos support up to 8 collide-stream sweeps per
exchange (communication-avoiding temporal blocking in both axes).

When to use: only when the mesh actually has a column axis.  The wide
column halos cost real compute on narrow locals — measured single-chip at
C_loc=512/substeps=8: 5.9 GLUPS here vs 20 GLUPS for the 1-D kernel (slab
width 512 -> 768 plus the rowpad concat copy).  Prefer
kernels.sharded_pallas (1-D rows) until the per-chip row count starves the
block pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .collide_stream import CX, CY, HALO

CHALO = 128  # lane-aligned column halo width


def _stream_slab_padded(coll, W_pad, rows):
    out = []
    for k in range(9):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % W_pad, axis=1)
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        out.append(t)
    return jnp.stack(out, axis=0)


def _kernel(rowpad_hbm, left_hbm, right_hbm, out_hbm, *, collide_fn,
            block_rows, n_blocks, C_loc, dtype, substeps):
    B = block_rows
    W_pad = C_loc + 2 * CHALO
    rows = B + 2 * HALO

    def body(slab, obuf, in_sems, out_sems):
        def start_in(slot, i):
            start = pl.multiple_of(i * B, 8)  # rowpad row offset (no wrap)
            pltpu.make_async_copy(
                left_hbm.at[:, pl.ds(start, rows), :],
                slab.at[slot, :, :, 0:CHALO], in_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                rowpad_hbm.at[:, pl.ds(start, rows), :],
                slab.at[slot, :, :, CHALO:CHALO + C_loc],
                in_sems.at[slot, 1]).start()
            pltpu.make_async_copy(
                right_hbm.at[:, pl.ds(start, rows), :],
                slab.at[slot, :, :, CHALO + C_loc:W_pad],
                in_sems.at[slot, 2]).start()

        def wait_in(slot):
            pltpu.make_async_copy(
                left_hbm.at[:, pl.ds(0, rows), :],
                slab.at[slot, :, :, 0:CHALO], in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                rowpad_hbm.at[:, pl.ds(0, rows), :],
                slab.at[slot, :, :, CHALO:CHALO + C_loc],
                in_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(
                right_hbm.at[:, pl.ds(0, rows), :],
                slab.at[slot, :, :, CHALO + C_loc:W_pad],
                in_sems.at[slot, 2]).wait()

        def dma_out(slot, i):
            return pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[:, pl.ds(i * B, B), :],
                out_sems.at[slot])

        start_in(0, 0)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start_in(nxt, i + 1)

            wait_in(slot)

            @pl.when(i >= 2)
            def _():
                dma_out(slot, i - 2).wait()

            cur = slab[slot]
            for _s in range(substeps):
                cur = _stream_slab_padded(collide_fn(cur), W_pad, rows)
            obuf[slot] = cur[:, HALO:HALO + B, CHALO:CHALO + C_loc]

            dma_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma_out(jax.lax.rem(n_blocks - 2, 2), n_blocks - 2).wait()
        dma_out(jax.lax.rem(n_blocks - 1, 2), n_blocks - 1).wait()

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((2, 9, rows, W_pad), dtype),
        obuf=pltpu.VMEM((2, 9, block_rows, C_loc), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def make_local_2d_step(R_loc: int, C_loc: int, collide_fn, dtype=jnp.float32,
                       block_rows: int | None = None, substeps: int = 1,
                       interpret: bool = False):
    """(rowpad (9,R+16,C), left (9,R+16,128), right (9,R+16,128)) -> (9,R,C)."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if C_loc % 128 != 0:
        raise ValueError("local cols must be a multiple of 128")
    if block_rows is None:
        itemsize = jnp.dtype(dtype).itemsize
        b = 128
        while b > 8:
            plane = (b + 2 * HALO) * (C_loc + 2 * CHALO) * itemsize
            if plane <= 256 * 1024 and R_loc % b == 0:
                break
            b //= 2
        block_rows = b
    if R_loc % block_rows != 0:
        raise ValueError(f"local rows {R_loc} not divisible by {block_rows}")
    kernel = functools.partial(
        _kernel, collide_fn=collide_fn, block_rows=block_rows,
        n_blocks=R_loc // block_rows, C_loc=C_loc,
        dtype=jnp.dtype(dtype).type, substeps=substeps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, R_loc, C_loc), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=60 * substeps * R_loc * C_loc,
            bytes_accessed=2 * 9 * R_loc * C_loc * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def make_sharded_fused_step_2d(mesh: Mesh, R: int, C: int, collide_fn,
                               dtype=jnp.float32,
                               block_rows: int | None = None,
                               substeps: int = 1, interpret: bool = False):
    """Globally periodic fused collide-stream sharded over ('x', 'y')."""
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if C_loc < CHALO:
        raise ValueError(f"local cols {C_loc} must be >= {CHALO}")
    inner = make_local_2d_step(R_loc, C_loc, collide_fn, dtype=dtype,
                               block_rows=block_rows, substeps=substeps,
                               interpret=interpret)

    def local_step(f_loc):
        n_x = lax.axis_size("x")
        n_y = lax.axis_size("y")
        # --- row halo exchange over 'x'
        top_edge = f_loc[:, :HALO]
        bot_edge = f_loc[:, -HALO:]
        if n_x == 1:
            halo_top, halo_bot = bot_edge, top_edge
        else:
            fwd = [(i, (i + 1) % n_x) for i in range(n_x)]
            bwd = [(i, (i - 1) % n_x) for i in range(n_x)]
            halo_top = lax.ppermute(bot_edge, "x", fwd)
            halo_bot = lax.ppermute(top_edge, "x", bwd)
        rowpad = jnp.concatenate([halo_top, f_loc, halo_bot], axis=1)
        # --- column halo strips of the row-padded field over 'y'
        # (corners included because the strips carry the row halos)
        left_edge = rowpad[:, :, :CHALO]
        right_edge = rowpad[:, :, -CHALO:]
        if n_y == 1:
            halo_left, halo_right = right_edge, left_edge
        else:
            fwd = [(i, (i + 1) % n_y) for i in range(n_y)]
            bwd = [(i, (i - 1) % n_y) for i in range(n_y)]
            halo_left = lax.ppermute(right_edge, "y", fwd)
            halo_right = lax.ppermute(left_edge, "y", bwd)
        return inner(rowpad, halo_left, halo_right)

    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", "y"), out_specs=P(None, "x", "y"),
        check_vma=False)
