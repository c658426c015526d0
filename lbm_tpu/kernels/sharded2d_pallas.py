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

from .collide_stream import CHALO, CX, CY, HALO
from .pipeline import _BUDGET_SCALE, vmem_limit_for


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
    itemsize = jnp.dtype(dtype).itemsize
    W_padded = C_loc + 2 * CHALO

    def slab_vmem(b):
        # double-buffered (9, b+16, W_pad) slabs + (9, b, C_loc) outputs
        return 2 * 9 * ((b + 2 * HALO) * W_padded + b * C_loc) * itemsize

    if block_rows is None:
        def fits(b):
            # the pallas_call below requests the matching adaptive
            # scoped-VMEM limit (pipeline.vmem_limit_for)
            return slab_vmem(b) <= int(10 * 2 ** 20 * _BUDGET_SCALE)
        b = 128
        while b > 8:
            if fits(b) and R_loc % b == 0:
                break
            b //= 2
        if not fits(b):  # fall-through guard: fail clean, not in Mosaic
            raise ValueError(
                f"no block_rows fits the VMEM budget for "
                f"{C_loc} local cols (+{2 * CHALO} halo) {jnp.dtype(dtype)}; "
                "shard the column axis more finely")
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
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(slab_vmem(block_rows),
                                            10 * 2 ** 20)),
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


def _body2d_kernel(offs_ref, rowpad_hbm, left_hbm, right_hbm, out_hbm, *,
                   body_fn, planes, block_rows, n_blocks, C_loc, C_glob,
                   dtype, row_edges):
    """Generic 2-D-sharded slab kernel: like _kernel but with an
    arbitrary position-masked body and scalar-prefetched GLOBAL row/col
    offsets.  abs rows stay unwrapped (wall masks need true indices; the
    crossing populations are overwritten); global columns are WRAPPED
    (the column axis is periodic, so halo columns must carry their true
    global index — see the csf_droplet_pallas lesson)."""
    B = block_rows
    W_pad = C_loc + 2 * CHALO
    rows = B + 2 * HALO

    def scoped(slab, obuf, in_sems, out_sems):
        def start_in(slot, i):
            start = pl.multiple_of(i * B, 8)
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

            shape = (rows, W_pad)
            abs_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0) \
                + (i * B - HALO) + offs_ref[0]
            cj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) \
                + (offs_ref[1] - jnp.int32(CHALO))
            Cg = jnp.int32(C_glob)
            cj = jax.lax.rem(jax.lax.rem(cj, Cg) + Cg, Cg)
            obuf[slot] = body_fn(slab[slot], abs_iota, row_edges,
                                 col_iota=cj)

            dma_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma_out(jax.lax.rem(n_blocks - 2, 2), n_blocks - 2).wait()
        dma_out(jax.lax.rem(n_blocks - 1, 2), n_blocks - 1).wait()

    pl.run_scoped(
        scoped,
        slab=pltpu.VMEM((2, planes, rows, C_loc + 2 * CHALO), dtype),
        obuf=pltpu.VMEM((2, planes, block_rows, C_loc), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def make_local_2d_body_step(planes: int, R_loc: int, C_loc: int, C_glob: int,
                            body_fn, dtype=jnp.float32,
                            block_rows: int | None = None,
                            row_edges: bool = True,
                            flops_per_cell: int = 2000,
                            interpret: bool = False):
    """2-D-sharded local sweep with an arbitrary position-masked body:
    ``(offs (2,) i32 [row_off, col_off], rowpad (P, R_loc+16, C_loc),
    left/right (P, R_loc+16, 128)) -> (P, R_loc, C_loc)``."""
    if C_loc % 128 != 0:
        raise ValueError("local cols must be a multiple of 128")
    W_pad = C_loc + 2 * CHALO
    itemsize = jnp.dtype(dtype).itemsize

    def slab_vmem(b):
        return 2 * (2 * planes * (b + 2 * HALO) * W_pad
                    + planes * b * C_loc) * itemsize

    if block_rows is None:
        def fits(b):
            # the pallas_call requests the matching adaptive scoped-VMEM
            # limit; budget scaled like pipeline.resolve_block_rows
            return slab_vmem(b) <= int(10 * 2 ** 20 * _BUDGET_SCALE)
        b = 128
        while b > 8:
            if fits(b) and R_loc % b == 0:
                break
            b -= 8
        # the loop falls through to b=8 for wide C_loc; re-check the
        # Mosaic plane/VMEM ceilings there so an oversized slab raises a
        # clean ValueError instead of a Mosaic compile failure
        if not fits(b):
            raise ValueError(
                f"no block_rows fits the VMEM budget for {planes} planes x "
                f"{C_loc} local cols (+{2 * CHALO} halo) {jnp.dtype(dtype)}; "
                "shard the column axis more finely")
        block_rows = b
    if R_loc % block_rows != 0:
        raise ValueError(f"local rows {R_loc} not divisible by {block_rows}")
    kernel = functools.partial(
        _body2d_kernel, body_fn=body_fn, planes=planes,
        block_rows=block_rows, n_blocks=R_loc // block_rows, C_loc=C_loc,
        C_glob=C_glob, dtype=jnp.dtype(dtype).type, row_edges=row_edges)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((planes, R_loc, C_loc), dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(slab_vmem(block_rows),
                                            10 * 2 ** 20)),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * R_loc * C_loc,
            bytes_accessed=2 * planes * R_loc * C_loc
            * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def make_sharded2d_rk_step(mesh: Mesh, R: int, C: int, *, r_alpha,
                           b_alpha, r_nu, b_nu, sigma, beta: float = 0.7,
                           gravity=(0.0, 0.0), dtype=jnp.float32,
                           block_rows: int | None = None,
                           interpret: bool = False):
    """The RK mixture step sharded over both mesh axes: S (11, R, C) ->
    (11, R, C); same scheme and guards as make_sharded2d_mrtcg_step."""
    from .rk_pallas import make_rk_body

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < 2 * CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {2 * CHALO} (C={C}, ny={ny}); "
            "use sharded_pallas.make_sharded_rk_step for 1-D meshes")
    run = make_rk_body(R, C, r_alpha=r_alpha, b_alpha=b_alpha, r_nu=r_nu,
                       b_nu=b_nu, sigma=sigma, beta=beta, gravity=gravity)
    return _sharded2d_wrap(mesh, 11, R_loc, C_loc, C, run, dtype,
                           block_rows, interpret)


def make_sharded2d_mrtcg_step(mesh: Mesh, R: int, C: int, red, blue,
                              sigma: float, gravity=(0.0, 0.0),
                              delta: float = 0.1,
                              apply_gravity_source: bool = True,
                              dtype=jnp.float32,
                              block_rows: int | None = None,
                              interpret: bool = False,
                              substeps: int = 1,
                              surface_tension: str = "perturbation"):
    """The flagship MRT-CG two-phase step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y') — the pod-scale decomposition:
    F (2, 9, R, C) -> (2, 9, R, C), one two-phase halo exchange per step
    (rows via ppermute over 'x', then 128-lane column strips of the
    row-padded field over 'y'; corners ride the strips).  The body is
    the shared make_mrtcg_body with GLOBAL row masks (walls) and WRAPPED
    global column indices (periodic columns + replicate gradient edges).
    Requires C - C/ny >= 2*CHALO so no global column appears twice in a
    slab (the column analog of the row alias guard).

    ``surface_tension='csf'`` runs the CSF curvature body instead (the
    mrt_rayleigh_taylor.cpp variant); the state is then the flat
    (20, R, C) stack incl. the two surface-force carry planes, exactly
    as sharded_pallas.make_sharded_mrtcg_step returns for 1-D meshes."""
    from .mrtcg_pallas import make_mrtcg_body

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < 2 * CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {2 * CHALO} (C={C}, ny={ny}): "
            "otherwise a slab holds a global column twice and the masked "
            "column extractions double-count — use "
            "sharded_pallas.make_sharded_mrtcg_step for 1-D meshes")

    planes = 20 if surface_tension == "csf" else 18
    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype, substeps=substeps,
                          surface_tension=surface_tension)
    sharded = _sharded2d_wrap(mesh, planes, R_loc, C_loc, C, run, dtype,
                              block_rows, interpret)
    if planes == 20:
        return sharded  # (20, R, C) incl. the fst carry planes

    def wrapped(F):
        return sharded(F.reshape(18, R, C)).reshape(2, 9, R, C)

    return wrapped


def _sharded2d_wrap(mesh: Mesh, planes: int, R_loc: int, C_loc: int,
                    C_glob: int, run, dtype, block_rows, interpret):
    """shard_map driver shared by the 2-D multiphase factories: two-phase
    halo exchange (rows over 'x', then 128-lane column strips of the
    row-padded field over 'y'), scalar global offsets, edge/interior row
    variants."""
    nx = mesh.shape["x"]
    mk = functools.partial(
        make_local_2d_body_step, planes, R_loc, C_loc, C_glob, run,
        dtype=dtype, block_rows=block_rows, interpret=interpret)
    inner_edge = mk(row_edges=True)
    inner_int = mk(row_edges=False) if nx > 2 else None

    def local_step(F_loc):
        n_x = lax.axis_size("x")
        n_y = lax.axis_size("y")
        top_edge = F_loc[:, :HALO]
        bot_edge = F_loc[:, -HALO:]
        if n_x == 1:
            halo_top, halo_bot = bot_edge, top_edge
        else:
            fwd = [(i, (i + 1) % n_x) for i in range(n_x)]
            bwd = [(i, (i - 1) % n_x) for i in range(n_x)]
            halo_top = lax.ppermute(bot_edge, "x", fwd)
            halo_bot = lax.ppermute(top_edge, "x", bwd)
        rowpad = jnp.concatenate([halo_top, F_loc, halo_bot], axis=1)
        left_edge = rowpad[:, :, :CHALO]
        right_edge = rowpad[:, :, -CHALO:]
        if n_y == 1:
            halo_left, halo_right = right_edge, left_edge
        else:
            fwd = [(i, (i + 1) % n_y) for i in range(n_y)]
            bwd = [(i, (i - 1) % n_y) for i in range(n_y)]
            halo_left = lax.ppermute(right_edge, "y", fwd)
            halo_right = lax.ppermute(left_edge, "y", bwd)
        rank_x = lax.axis_index("x")
        offs = jnp.stack([(rank_x * R_loc).astype(jnp.int32),
                          (lax.axis_index("y") * C_loc).astype(jnp.int32)])
        if inner_int is None:
            return inner_edge(offs, rowpad, halo_left, halo_right)
        return lax.cond(
            (rank_x == 0) | (rank_x == n_x - 1),
            lambda o, f, l, r: inner_edge(o, f, l, r),
            lambda o, f, l, r: inner_int(o, f, l, r),
            offs, rowpad, halo_left, halo_right)

    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", "y"), out_specs=P(None, "x", "y"),
        check_vma=False)


def make_sharded2d_sc_step(mesh: Mesh, R: int, C: int, *, omega: float,
                           G: float, substeps: int = 1,
                           dtype=jnp.float32,
                           block_rows: int | None = None,
                           interpret: bool = False):
    """The Shan-Chen pseudopotential step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y'): f (9, R, C) -> (9, R, C).  Fully
    periodic — the body needs no masks at all; the psi stencil and
    streaming read the halo rows/strips (2 rows consumed per sweep, so
    ``substeps`` <= 4 amortise one two-phase exchange); same guards as
    the other 2-D factories."""
    from .shan_chen_pallas import make_sc_body

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < 2 * CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {2 * CHALO} (C={C}, ny={ny}); "
            "use sharded_pallas.make_sharded_body_step for 1-D meshes")
    run = make_sc_body(R, C, omega=omega, G=G, substeps=substeps)
    return _sharded2d_wrap(mesh, 9, R_loc, C_loc, C, run, dtype,
                           block_rows, interpret)


def make_sharded2d_thermal_step(mesh: Mesh, R: int, C: int, *,
                                omega_f: float, omega_g: float,
                                g_beta: float, substeps: int = 1,
                                dtype=jnp.float32,
                                block_rows: int | None = None,
                                interpret: bool = False):
    """The Rayleigh-Benard coupled step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y'): S (18, R, C) -> (18, R, C); same
    body as kernels.thermal_pallas (row walls = global-position masks;
    the column axis is fully periodic, served by the 128-lane halo
    strips with no masks), same guards as the other 2-D factories."""
    from .thermal_pallas import make_thermal_body

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < 2 * CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {2 * CHALO} (C={C}, ny={ny}); "
            "use sharded_pallas.make_sharded_thermal_step for 1-D meshes")
    run = make_thermal_body(R, C, omega_f=omega_f, omega_g=omega_g,
                            g_beta=g_beta, substeps=substeps)
    return _sharded2d_wrap(mesh, 18, R_loc, C_loc, C, run, dtype,
                           block_rows, interpret)
