"""2-D sharded fused collide-stream: rows over mesh 'x', cols over 'y'.

Pod-scale form of kernels.sharded_pallas: with hundreds of chips a 1-D row
decomposition starves the block pipeline, so the grid is split over both
mesh axes.  Column halos are the hard part on TPU — Mosaic wants 128-lane
tiles, so a naive left+right pad costs 256 redundant lanes of compute per
row.  This module instead uses ONE combined 128-lane halo tile appended
AFTER the interior lanes (the round-2 layout padded both sides and
concatenated a full row-padded copy of the field; measured 5.9 GLUPS at
C_loc=512/substeps=8 vs 20 for the 1-D kernel).  With this layout the
2-D local BGK kernel measures 22.2 GLUPS vs 27.5 for the 1-D kernel at
the same 4096x512 local shape — a 1.24x column-halo overhead
(scripts/bench_2d.py, 2026-08-20, one v5e chip, self-halos standing in
for the identical-in-both-paths exchange):

  lanes [0, C_loc)            interior (global cols [off, off+C_loc))
  lanes [C_loc, C_loc+64)     right halo (global cols [off+C_loc, +64))
  lanes [C_loc+64, C_loc+128) left halo (global cols [off-64, off))

Cyclic ``pltpu.roll`` over the padded width W = C_loc + 128 then wires the
seams for free: lane 0's left neighbour is lane W-1 = the deepest left-halo
lane, and lane C_loc-1's right neighbour is lane C_loc = the first
right-halo lane.  The only garbage front is the middle of the halo tile
(right half meets left half), which advances r lanes per sweep from lane
C_loc+64 in both directions — the kept interior stays exact while
``substeps * lanes_per_sweep <= 32``.

Per (multi-)step:

  1. row halos (HALO=8 rows) ride two ppermutes over 'x' — they are passed
     to the kernel as separate inputs and DMA'd per block exactly like the
     1-D kernel (NO full-field row-padded concat copy);
  2. 64-lane column strips WITH the row halos attached (three narrow
     concats) ride two ppermutes over 'y'; corners come along for free;
  3. the local Pallas kernel tiles over row blocks with 4 DMAs per block:
     3 row-source copies for the interior lanes + 1 contiguous copy of the
     combined tile rows.

The 8-row halos support up to 8 collide-stream sweeps per exchange
(communication-avoiding temporal blocking in both axes; the 64-lane column
halos are never the binding constraint).

When to use: only when the mesh actually has a column axis.  Prefer
kernels.sharded_pallas (1-D rows) until the per-chip row count starves the
block pipeline.  Reproduces the reference's in-process 2-D decomposition
semantics (test/decompose_domain_loop.cpp:232-261) on a device mesh.
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

#: lanes exchanged per side; both sides pack into one CHALO=128 tile
CHALF = CHALO // 2


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


def _dma_in(ins, slab, in_sems, slot, i, *, B, H, C_loc, n_blocks,
            start_them: bool):
    """The 4 per-block input DMAs shared by both kernels: 3 row-source
    copies for the interior lanes (top halo / body / bottom halo, sourced
    from the exchanged strips on the first/last block) + 1 contiguous
    combined-tile copy.  ``start_them=False`` rebuilds shape-matching
    descriptors for the waits (offset-0 slices — only shape + semaphore
    matter for a wait)."""
    f_hbm, top_hbm, bot_hbm, comb_hbm = ins
    start = pl.multiple_of(i * B, 8) if start_them else 0

    def go(cp):
        cp.start() if start_them else cp.wait()

    # top halo rows
    if start_them:
        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(
                top_hbm, slab.at[slot, :, 0:H, 0:C_loc],
                in_sems.at[slot, 0]).start()

        @pl.when(i != 0)
        def _():
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(pl.multiple_of(start - H, 8), H), :],
                slab.at[slot, :, 0:H, 0:C_loc], in_sems.at[slot, 0]).start()
    else:
        go(pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(0, H), :], slab.at[slot, :, 0:H, 0:C_loc],
            in_sems.at[slot, 0]))
    # interior rows
    go(pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(start, B), :],
        slab.at[slot, :, H:H + B, 0:C_loc], in_sems.at[slot, 1]))
    # bottom halo rows
    if start_them:
        @pl.when(i == n_blocks - 1)
        def _():
            pltpu.make_async_copy(
                bot_hbm, slab.at[slot, :, H + B:H + 2 * H + B, 0:C_loc],
                in_sems.at[slot, 2]).start()

        @pl.when(i != n_blocks - 1)
        def _():
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(pl.multiple_of(start + B, 8), H), :],
                slab.at[slot, :, H + B:H + 2 * H + B, 0:C_loc],
                in_sems.at[slot, 2]).start()
    else:
        go(pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(0, H), :],
            slab.at[slot, :, H + B:H + 2 * H + B, 0:C_loc],
            in_sems.at[slot, 2]))
    # combined column-halo tile (rows already padded — no edge cases)
    go(pltpu.make_async_copy(
        comb_hbm.at[:, pl.ds(start, B + 2 * H), :],
        slab.at[slot, :, :, C_loc:C_loc + CHALO], in_sems.at[slot, 3]))


def _kernel(f_hbm, top_hbm, bot_hbm, comb_hbm, out_hbm, *, collide_fn,
            block_rows, n_blocks, C_loc, dtype, substeps):
    B = block_rows
    W_pad = C_loc + CHALO
    rows = B + 2 * HALO
    ins = (f_hbm, top_hbm, bot_hbm, comb_hbm)

    def body(slab, obuf, in_sems, out_sems):
        dma = functools.partial(_dma_in, ins, slab, in_sems, B=B, H=HALO,
                                C_loc=C_loc, n_blocks=n_blocks)

        def dma_out(slot, i):
            return pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[:, pl.ds(i * B, B), :],
                out_sems.at[slot])

        dma(0, 0, start_them=True)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                dma(nxt, i + 1, start_them=True)

            dma(slot, i, start_them=False)

            @pl.when(i >= 2)
            def _():
                dma_out(slot, i - 2).wait()

            cur = slab[slot]
            for _s in range(substeps):
                cur = _stream_slab_padded(collide_fn(cur), W_pad, rows)
            obuf[slot] = cur[:, HALO:HALO + B, 0:C_loc]

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
        in_sems=pltpu.SemaphoreType.DMA((2, 4)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _slab_vmem(planes, b, C_loc, itemsize):
    return 2 * planes * ((b + 2 * HALO) * (C_loc + CHALO)
                         + b * C_loc) * itemsize


def _pick_block_rows(planes, R_loc, C_loc, itemsize, block_rows):
    if block_rows is None:
        def fits(b):
            # the pallas_call requests the matching adaptive scoped-VMEM
            # limit (pipeline.vmem_limit_for)
            return (_slab_vmem(planes, b, C_loc, itemsize)
                    <= int(10 * 2 ** 20 * _BUDGET_SCALE))
        b = 128
        while b > 8:
            if fits(b) and R_loc % b == 0:
                break
            b -= 8
        if not fits(b):  # fall-through guard: fail clean, not in Mosaic
            raise ValueError(
                f"no block_rows fits the VMEM budget for {planes} planes x "
                f"{C_loc} local cols (+{CHALO} halo tile); "
                "shard the column axis more finely")
        block_rows = b
    if R_loc % block_rows != 0:
        raise ValueError(f"local rows {R_loc} not divisible by {block_rows}")
    return block_rows


def make_local_2d_step(R_loc: int, C_loc: int, collide_fn, dtype=jnp.float32,
                       block_rows: int | None = None, substeps: int = 1,
                       interpret: bool = False):
    """(f_loc (9,R,C), top (9,8,C), bot (9,8,C),
    combined (9,R+16,128)) -> (9,R,C).  ``combined`` packs the right halo
    (64 lanes, global cols [off+C, off+C+64)) then the left halo (64
    lanes, [off-64, off)) — see the module docstring."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if C_loc % 128 != 0:
        raise ValueError("local cols must be a multiple of 128")
    itemsize = jnp.dtype(dtype).itemsize
    block_rows = _pick_block_rows(9, R_loc, C_loc, itemsize, block_rows)
    kernel = functools.partial(
        _kernel, collide_fn=collide_fn, block_rows=block_rows,
        n_blocks=R_loc // block_rows, C_loc=C_loc,
        dtype=jnp.dtype(dtype).type, substeps=substeps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, R_loc, C_loc), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(
                _slab_vmem(9, block_rows, C_loc, itemsize), 10 * 2 ** 20)),
        cost_estimate=pl.CostEstimate(
            flops=60 * substeps * R_loc * C_loc,
            bytes_accessed=2 * 9 * R_loc * C_loc * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def _exchange_halos(F_loc, planes_axis_sizes=None):
    """Two-phase halo exchange shared by every 2-D factory: row halos over
    'x', then 64-lane column strips (row halos attached) over 'y'.
    Returns (halo_top, halo_bot, combined)."""
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
    # narrow row-padded strips: 3 concats of (planes, *, 64) — cheap
    left_strip = jnp.concatenate(
        [halo_top[:, :, :CHALF], F_loc[:, :, :CHALF],
         halo_bot[:, :, :CHALF]], axis=1)
    right_strip = jnp.concatenate(
        [halo_top[:, :, -CHALF:], F_loc[:, :, -CHALF:],
         halo_bot[:, :, -CHALF:]], axis=1)
    if n_y == 1:
        halo_left, halo_right = right_strip, left_strip
    else:
        fwd = [(i, (i + 1) % n_y) for i in range(n_y)]
        bwd = [(i, (i - 1) % n_y) for i in range(n_y)]
        halo_left = lax.ppermute(right_strip, "y", fwd)
        halo_right = lax.ppermute(left_strip, "y", bwd)
    combined = jnp.concatenate([halo_right, halo_left], axis=2)
    return halo_top, halo_bot, combined


def make_sharded_fused_step_2d(mesh: Mesh, R: int, C: int, collide_fn,
                               dtype=jnp.float32,
                               block_rows: int | None = None,
                               substeps: int | str = 1,
                               interpret: bool = False):
    """Globally periodic fused collide-stream sharded over ('x', 'y').
    ``substeps="auto"`` resolves through the ICI-aware cadence picker
    (sharded_pallas.resolve_substeps), clamped to the 8-row strip."""
    from .sharded_pallas import resolve_substeps

    substeps = resolve_substeps(substeps, "bgk", C=C, cap=HALO)
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
        halo_top, halo_bot, combined = _exchange_halos(f_loc)
        return inner(f_loc, halo_top, halo_bot, combined)

    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", "y"), out_specs=P(None, "x", "y"),
        check_vma=False)


def _body2d_kernel(offs_ref, f_hbm, top_hbm, bot_hbm, comb_hbm, out_hbm, *,
                   body_fn, planes, block_rows, n_blocks, C_loc, C_glob,
                   dtype, row_edges):
    """Generic 2-D-sharded slab kernel: like _kernel but with an
    arbitrary position-masked body and scalar-prefetched GLOBAL row/col
    offsets.  abs rows stay unwrapped (wall masks need true indices; the
    crossing populations are overwritten); global columns are WRAPPED
    (the column axis is periodic, so halo lanes must carry their true
    global index — see the csf_droplet_pallas lesson).  Combined-tile
    lane k maps to global column offs[1] + k for k < C_loc + CHALF and
    offs[1] + k - (C_loc + CHALO) for the left-halo lanes."""
    B = block_rows
    W_pad = C_loc + CHALO
    rows = B + 2 * HALO
    ins = (f_hbm, top_hbm, bot_hbm, comb_hbm)

    def scoped(slab, obuf, in_sems, out_sems):
        dma = functools.partial(_dma_in, ins, slab, in_sems, B=B, H=HALO,
                                C_loc=C_loc, n_blocks=n_blocks)

        def dma_out(slot, i):
            return pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[:, pl.ds(i * B, B), :],
                out_sems.at[slot])

        dma(0, 0, start_them=True)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                dma(nxt, i + 1, start_them=True)

            dma(slot, i, start_them=False)

            @pl.when(i >= 2)
            def _():
                dma_out(slot, i - 2).wait()

            shape = (rows, W_pad)
            abs_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0) \
                + (i * B - HALO) + offs_ref[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            cj = lane + jnp.where(lane < C_loc + CHALF, offs_ref[1],
                                  offs_ref[1] - jnp.int32(C_loc + CHALO))
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
        slab=pltpu.VMEM((2, planes, rows, W_pad), dtype),
        obuf=pltpu.VMEM((2, planes, block_rows, C_loc), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 4)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def make_local_2d_body_step(planes: int, R_loc: int, C_loc: int, C_glob: int,
                            body_fn, dtype=jnp.float32,
                            block_rows: int | None = None,
                            row_edges: bool = True,
                            flops_per_cell: int = 2000,
                            interpret: bool = False):
    """2-D-sharded local sweep with an arbitrary position-masked body:
    ``(offs (2,) i32 [row_off, col_off], f_loc (P, R_loc, C_loc),
    top/bot (P, 8, C_loc), combined (P, R_loc+16, 128)) ->
    (P, R_loc, C_loc)``.  The body must slice its column output as
    ``[0:width-CHALO]`` in col_iota mode (interior lanes lead)."""
    if C_loc % 128 != 0:
        raise ValueError("local cols must be a multiple of 128")
    itemsize = jnp.dtype(dtype).itemsize
    block_rows = _pick_block_rows(planes, R_loc, C_loc, itemsize, block_rows)
    kernel = functools.partial(
        _body2d_kernel, body_fn=body_fn, planes=planes,
        block_rows=block_rows, n_blocks=R_loc // block_rows, C_loc=C_loc,
        C_glob=C_glob, dtype=jnp.dtype(dtype).type, row_edges=row_edges)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((planes, R_loc, C_loc), dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(
                _slab_vmem(planes, block_rows, C_loc, itemsize),
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
    if ny < 2 or C - C_loc < CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {CHALO} (C={C}, ny={ny}); "
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
                              substeps: int | str = 1,
                              surface_tension: str = "perturbation"):
    """The flagship MRT-CG two-phase step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y') — the pod-scale decomposition:
    F (2, 9, R, C) -> (2, 9, R, C), one two-phase halo exchange per step
    (rows via ppermute over 'x', then 64-lane column strips of the
    row-padded edges over 'y'; corners ride the strips).  The body is
    the shared make_mrtcg_body with GLOBAL row masks (walls) and WRAPPED
    global column indices (periodic columns + replicate gradient edges).
    Requires C - C/ny >= CHALO so no global column appears twice in a
    slab (the column analog of the row alias guard).

    ``surface_tension='csf'`` runs the CSF curvature body instead (the
    mrt_rayleigh_taylor.cpp variant); the state is then the flat
    (20, R, C) stack incl. the two surface-force carry planes, exactly
    as sharded_pallas.make_sharded_mrtcg_step returns for 1-D meshes.

    ``substeps="auto"`` resolves through the ICI-aware picker, clamped
    to this kernel family's structural limits: the fixed 8-row slab
    halo admits ``8 // rows_per_sweep`` sweeps (2 for the 3-row
    perturbation body, 1 for the 5-row CSF body — tighter than the
    combined-tile seam bound ``substeps * lanes_per_sweep <= 32``)."""
    from .mrtcg_pallas import make_mrtcg_body
    from .sharded_pallas import resolve_substeps

    rps = 5 if surface_tension == "csf" else 3
    substeps = resolve_substeps(
        substeps, "csf" if surface_tension == "csf" else "mrtcg", C=C,
        cap=min(HALO // rps, 32 // rps))
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {CHALO} (C={C}, ny={ny}): "
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
    halo exchange (rows over 'x', then 64-lane column strips over 'y'),
    scalar global offsets, edge/interior row variants."""
    nx = mesh.shape["x"]
    mk = functools.partial(
        make_local_2d_body_step, planes, R_loc, C_loc, C_glob, run,
        dtype=dtype, block_rows=block_rows, interpret=interpret)
    inner_edge = mk(row_edges=True)
    inner_int = mk(row_edges=False) if nx > 2 else None

    def local_step(F_loc):
        n_x = lax.axis_size("x")
        halo_top, halo_bot, combined = _exchange_halos(F_loc)
        rank_x = lax.axis_index("x")
        offs = jnp.stack([(rank_x * R_loc).astype(jnp.int32),
                          (lax.axis_index("y") * C_loc).astype(jnp.int32)])
        if inner_int is None:
            return inner_edge(offs, F_loc, halo_top, halo_bot, combined)
        return lax.cond(
            (rank_x == 0) | (rank_x == n_x - 1),
            lambda o, f, t, b, c: inner_edge(o, f, t, b, c),
            lambda o, f, t, b, c: inner_int(o, f, t, b, c),
            offs, F_loc, halo_top, halo_bot, combined)

    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", "y"), out_specs=P(None, "x", "y"),
        check_vma=False)


def make_sharded2d_sc_step(mesh: Mesh, R: int, C: int, *, omega: float,
                           G: float, substeps: int | str = 1,
                           dtype=jnp.float32,
                           block_rows: int | None = None,
                           interpret: bool = False):
    """The Shan-Chen pseudopotential step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y'): f (9, R, C) -> (9, R, C).  Fully
    periodic — the body needs no masks at all; the psi stencil and
    streaming read the halo rows/lanes (2 consumed per sweep, so
    ``substeps`` <= 4 amortise one two-phase exchange — "auto" resolves
    through the picker with that cap); same guards as the other 2-D
    factories."""
    from .shan_chen_pallas import make_sc_body
    from .sharded_pallas import resolve_substeps

    substeps = resolve_substeps(substeps, "sc", C=C, cap=HALO // 2)
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {CHALO} (C={C}, ny={ny}); "
            "use sharded_pallas.make_sharded_body_step for 1-D meshes")
    run = make_sc_body(R, C, omega=omega, G=G, substeps=substeps)
    return _sharded2d_wrap(mesh, 9, R_loc, C_loc, C, run, dtype,
                           block_rows, interpret)


def make_sharded2d_thermal_step(mesh: Mesh, R: int, C: int, *,
                                omega_f: float, omega_g: float,
                                g_beta: float, substeps: int | str = 1,
                                dtype=jnp.float32,
                                block_rows: int | None = None,
                                interpret: bool = False):
    """The Rayleigh-Benard coupled step sharded over BOTH mesh axes
    (rows over 'x', cols over 'y'): S (18, R, C) -> (18, R, C); same
    body as kernels.thermal_pallas (row walls = global-position masks;
    the column axis is fully periodic, served by the 64-lane halo
    strips with no masks), same guards as the other 2-D factories;
    ``substeps="auto"`` resolves through the ICI-aware picker."""
    from .thermal_pallas import make_thermal_body
    from .sharded_pallas import resolve_substeps

    substeps = resolve_substeps(substeps, "thermal", C=C, cap=HALO)
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if R % nx or C % ny:
        raise ValueError(f"grid {R}x{C} not divisible by mesh {nx}x{ny}")
    R_loc, C_loc = R // nx, C // ny
    if ny < 2 or C - C_loc < CHALO:
        raise ValueError(
            f"need ny >= 2 and C - C/ny >= {CHALO} (C={C}, ny={ny}); "
            "use sharded_pallas.make_sharded_thermal_step for 1-D meshes")
    run = make_thermal_body(R, C, omega_f=omega_f, omega_g=omega_g,
                            g_beta=g_beta, substeps=substeps)
    return _sharded2d_wrap(mesh, 18, R_loc, C_loc, C, run, dtype,
                           block_rows, interpret)
