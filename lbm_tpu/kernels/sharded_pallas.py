"""Multi-chip fused collide-stream: ppermute halo exchange + a Pallas
kernel with explicit halo inputs.

Marries the two performance pillars: the fused single-chip block pipeline
(kernels.collide_stream) and spatial domain decomposition over the device
mesh (parallel/).  Each step (or k-step temporal block):

    1. every rank ships its first/last HALO rows to its ring neighbours
       with two full-ring lax.ppermute calls (ICI);
    2. a local Pallas kernel runs the fused sweep, sourcing the top halo of
       block 0 and the bottom halo of the last block from the received
       buffers instead of the periodic wrap.

Because the halo is HALO=8 rows deep, up to 8 collide-stream sweeps run
per exchange (communication-avoiding temporal blocking, same validity
argument as kernels.collide_stream): the ICI exchange cost is amortised
over `substeps` time steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .collide_stream import HALO, _stream_slab, pick_block_rows
from .pipeline import slab_bytes, vmem_limit_for

# Measured exchange-cadence model (one real v5e chip; docs/BENCHMARKS.md
# "Exchange cadence" + the round-4 "Multiphase cadence/geometry optimum"
# sweep): effective MLUPS of the fused step vs substeps (steps per ICI
# exchange).  The single-chip numbers lower-bound the real-mesh optimum:
# the measured per-launch exchange-skeleton overhead is <1 us for BGK
# (the gain is launch amortisation, not the skeleton), and on a real
# mesh the ppermute's ICI term only strengthens the case for the
# deepest valid cadence.  The colour-gradient rows are the REDUCED
# kernels at block_rows=256 (mrtcg_pallas.default_geometry) — the
# round-3 "substeps=4 regresses" entry was a block-geometry artifact of
# the auto-picked B=64, whose 16-row halo pays 1.5x redundant sweeps vs
# 1.125x at B=256; at the tall block the cadence gain is monotone up to
# the Mosaic scoped-VMEM ceiling (ss=8 / B=512 OOM).
_CADENCE_MLUPS = {
    "bgk": {1: 26100, 2: 29253, 4: 31130, 8: 32459},      # 2048x512
    "mrtcg": {1: 3079, 2: 3854, 4: 4574, 5: 4720},         # 1024x512 B=256
    "csf": {1: 2418, 2: 3061, 3: 3313, 4: 3336},           # 1024x512 B=256
}
#: measurement grids of _CADENCE_MLUPS (cells per launch)
_CADENCE_CELLS = {"bgk": 2048 * 512, "mrtcg": 1024 * 512,
                  "csf": 1024 * 512}
#: halo rows one sweep consumes (streaming + gradient stencils)
_ROWS_PER_SWEEP = {"bgk": 1, "thermal": 1, "cavity": 1, "sediment": 1,
                   "les": 1, "trt": 1, "plaw": 1, "d3q19": 1, "sc": 2,
                   "mrtcg": 3, "rk": 3, "csf": 5}
#: state planes carried per family (exchange payload = planes x halo x C)
_PLANES = {"bgk": 9, "thermal": 18, "cavity": 9, "sediment": 18, "les": 9,
           "trt": 9, "plaw": 9, "d3q19": 19, "sc": 9, "mrtcg": 18,
           "rk": 11, "csf": 20}

# ICI constants (public figures, jax-ml.github.io/scaling-book): one-way
# per-link bandwidth and a per-collective latency floor.  The halo rides
# ONE mesh axis (a ring over 'x'), so the per-exchange cost is the strip
# payload over one link plus two ppermute latencies (both directions
# overlap on the bidirectional links, so bandwidth is NOT halved; the two
# collectives still each pay the launch/latency floor).
ICI = {
    "v5e": {"bw_oneway": 4.5e10, "latency": 1e-6},
    "v5p": {"bw_oneway": 9.0e10, "latency": 1e-6},
    "v4": {"bw_oneway": 4.5e10, "latency": 1e-6},
}


def _halo_rows(substeps: int, rows_per_sweep: int) -> int:
    """Exchanged strip depth (8-aligned; mirrors mrtcg_pallas.halo_for)."""
    return max(HALO, -(-substeps * rows_per_sweep // 8) * 8)


def exchange_seconds(substeps: int, family: str, C: int,
                     itemsize: int = 4, generation: str = "v5e") -> float:
    """Analytic per-exchange ICI cost of one halo exchange at cadence
    ``substeps``: strip bytes / one-way bandwidth + 2 ppermute latencies.
    Deeper cadences exchange DEEPER strips (halo_for), so the payload
    term grows with substeps while its amortisation (1/substeps) shrinks
    faster — the net per-step exchange cost is monotonically decreasing
    in substeps."""
    ici = ICI[generation]
    rows = _halo_rows(substeps, _ROWS_PER_SWEEP.get(family, 3))
    payload = rows * C * _PLANES.get(family, 18) * itemsize
    return payload / ici["bw_oneway"] + 2.0 * ici["latency"]


def pick_substeps(family: str, C: int | None = None,
                  cells: int | None = None, itemsize: int = 4,
                  generation: str = "v5e") -> int:
    """ICI-aware exchange-cadence picker: argmax over the measured
    single-chip effective-MLUPS table (_CADENCE_MLUPS — launch
    amortisation + redundant halo recompute, measured on one real v5e
    chip) of

        eff(s) = cells / (cells / MLUPS(s) + exchange_seconds(s) / s)

    i.e. the measured per-step compute time plus the analytic per-step
    share of one ICI exchange (docs/BENCHMARKS.md "Exchange cadence").
    Monotone by construction: growing the latency or shrinking the
    bandwidth only ever moves the pick to DEEPER cadences (the exchange
    term is amortised by 1/s).  ``C``/``cells`` default to the table's
    measurement grid; families without their own table map to the
    structurally matching row (1 halo row/sweep -> bgk, stencil bodies
    -> mrtcg) with their own payload constants."""
    key = family if family in _CADENCE_MLUPS else (
        "bgk" if _ROWS_PER_SWEEP.get(family, 3) <= 2 else "mrtcg")
    table = _CADENCE_MLUPS[key]
    cells = cells if cells is not None else _CADENCE_CELLS[key]
    C = C if C is not None else 512
    # structural cap: the deepest cadence whose halo the body admits
    # (sc's 2 rows/sweep caps at 4 on the 8-row strip; deeper halos are
    # legal for mrtcg-class bodies via halo_for, already in the table)
    cap = 8 // _ROWS_PER_SWEEP.get(family, 3) if family == "sc" else None

    def eff(s):
        t_step = cells / (table[s] * 1e6)
        t_exch = exchange_seconds(s, family, C, itemsize, generation) / s
        return cells / (t_step + t_exch)

    candidates = [s for s in table if cap is None or s <= cap]
    return max(candidates, key=eff)


def default_substeps(family: str, C: int | None = None,
                     generation: str = "v5e") -> int:
    """Data-driven default exchange cadence for a sharded family: the
    measured single-chip cadence table (_CADENCE_MLUPS) combined with
    the analytic ICI exchange term (pick_substeps).  Stencil-free
    wall-BC bodies (thermal/cavity/sediment class) consume 1 halo row
    per sweep like BGK and share its table; stencil families fall back
    to the mrtcg row.  Returns a value the caller must still pass
    explicitly — the returned step function advances `substeps` steps
    per call, so an implicit default would silently change step
    semantics.  Factories accept ``substeps="auto"`` as the explicit
    opt-in that resolves through this picker (resolve_substeps)."""
    if family == "sc":  # 2 halo rows/sweep -> deepest valid cadence is 4
        return 4
    return pick_substeps(family, C=C, generation=generation)


def resolve_substeps(substeps, family: str, C: int | None = None,
                     cap: int | None = None,
                     generation: str = "v5e") -> int:
    """Resolve a factory ``substeps`` argument: ints pass through
    untouched; the string ``"auto"`` resolves through the ICI-aware
    cadence picker (default_substeps), clamped to ``cap`` — a
    structural limit such as the 2-D kernels' fixed 8-row slab halo or
    the combined-tile seam garbage-front bound.  "auto" is an explicit
    opt-in rather than the parameter default because the returned step
    advances ``substeps`` steps per call: a caller writing "auto"
    acknowledges the call-semantics change, which an implicit default
    would silently impose."""
    if isinstance(substeps, str):
        if substeps != "auto":
            raise ValueError(
                f"substeps must be an int or 'auto', got {substeps!r}")
        s = default_substeps(family, C=C, generation=generation)
        return max(1, min(s, cap)) if cap is not None else s
    return substeps


def make_local_halo_step(R_loc: int, C: int, collide_fn, dtype=jnp.float32,
                         block_rows: int | None = None, substeps: int = 1,
                         interpret: bool = False):
    """Fused sweep over a local shard with explicit (9, HALO, C) halo
    inputs: (f_local, halo_top, halo_bot) -> f_local'.  Thin wrapper over
    make_local_halo_body_step with the temporal-blocked collide-stream
    body (the halos are pure data — no position masks — so the global
    offset is irrelevant and passed as zero)."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if block_rows is None:
        block_rows = pick_block_rows(R_loc, C, dtype)

    def body(block, abs_iota, row_edges):
        del abs_iota, row_edges
        rows = block.shape[1]
        cur = block
        for _s in range(substeps):
            cur = _stream_slab(collide_fn(cur), C, rows)
        return cur[:, HALO:rows - HALO, :]

    inner = make_local_halo_body_step(
        9, R_loc, C, body, dtype=dtype, block_rows=block_rows,
        row_edges=False, flops_per_cell=60 * substeps, interpret=interpret)

    def fn(f_loc, halo_top, halo_bot):
        return inner(jnp.zeros((1,), jnp.int32), f_loc, halo_top, halo_bot)

    return fn


def _halo_body_kernel(off_ref, f_hbm, top_hbm, bot_hbm, out_hbm, *, body_fn,
                      planes, block_rows, n_blocks, C, dtype, row_edges,
                      halo):
    """Generic halo-input slab kernel: like _halo_kernel but with an
    arbitrary body(block, abs_iota, row_edges) and a scalar-prefetched
    GLOBAL row offset, so position-based BC masks and replicate
    extractions see true global coordinates on any shard.  ``halo`` sets
    the slab halo depth (= the exchanged strip height; multiples of 8)."""
    B = block_rows
    H = halo

    def scoped(slab, obuf, in_sems, out_sems):
        def start_in(slot, i):
            start = pl.multiple_of(i * B, 8)

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(
                    top_hbm, slab.at[slot, :, 0:H, :],
                    in_sems.at[slot, 0]).start()

            @pl.when(i != 0)
            def _():
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(pl.multiple_of(start - H, 8), H), :],
                    slab.at[slot, :, 0:H, :], in_sems.at[slot, 0]).start()

            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(start, B), :],
                slab.at[slot, :, H:H + B, :], in_sems.at[slot, 1]).start()

            @pl.when(i == n_blocks - 1)
            def _():
                pltpu.make_async_copy(
                    bot_hbm, slab.at[slot, :, H + B:H + 2 * H + B, :],
                    in_sems.at[slot, 2]).start()

            @pl.when(i != n_blocks - 1)
            def _():
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(pl.multiple_of(start + B, 8), H), :],
                    slab.at[slot, :, H + B:H + 2 * H + B, :],
                    in_sems.at[slot, 2]).start()

        def wait_in(slot):
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(0, H), :], slab.at[slot, :, 0:H, :],
                in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(0, B), :],
                slab.at[slot, :, H:H + B, :], in_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(0, H), :],
                slab.at[slot, :, H + B:H + 2 * H + B, :],
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

            shape = (B + 2 * H, C)
            abs_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0) \
                + (i * B - H) + off_ref[0]
            obuf[slot] = body_fn(slab[slot], abs_iota, row_edges)

            dma_out(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma_out(jax.lax.rem(n_blocks - 2, 2), n_blocks - 2).wait()
        dma_out(jax.lax.rem(n_blocks - 1, 2), n_blocks - 1).wait()

    pl.run_scoped(
        scoped,
        slab=pltpu.VMEM((2, planes, block_rows + 2 * H, C), dtype),
        obuf=pltpu.VMEM((2, planes, block_rows, C), dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 3)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def make_local_halo_body_step(planes: int, R_loc: int, C: int, body_fn,
                              dtype=jnp.float32, block_rows: int = 8,
                              row_edges: bool = True,
                              flops_per_cell: int = 2000,
                              halo: int = HALO,
                              interpret: bool = False):
    """Fused sweep over a local (planes, R_loc, C) shard with explicit
    (planes, halo, C) halo inputs and a global-row offset: ``(off (1,)
    i32, f_local, halo_top, halo_bot) -> f_local'`` where the body
    receives ``abs_iota = local row + off`` (global coordinates)."""
    if R_loc % block_rows != 0:
        raise ValueError(f"local rows {R_loc} not divisible by {block_rows}")
    if halo % 8 != 0 or halo < 8:
        raise ValueError(f"halo must be a positive multiple of 8 ({halo})")
    kernel = functools.partial(
        _halo_body_kernel, body_fn=body_fn, planes=planes,
        block_rows=block_rows, n_blocks=R_loc // block_rows, C=C,
        dtype=jnp.dtype(dtype).type, row_edges=row_edges, halo=halo)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((planes, R_loc, C), dtype),
        # the scoped-VMEM request must admit the lifted block picks but
        # stay minimal — over-requesting slows kernels that fit the
        # default scope (see pipeline.vmem_limit_for)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit_for(
                slab_bytes((planes,), planes, block_rows, C, dtype,
                           halo),
                10 * 2 ** 20)),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * R_loc * C,
            bytes_accessed=2 * planes * R_loc * C * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def make_sharded_body_step(mesh: Mesh, planes: int, R: int, C: int, run,
                           dtype=jnp.float32, block_rows: int | None = None,
                           halo: int = HALO,
                           interpret: bool = False):
    """Row-shard an arbitrary position-masked slab body over mesh axis
    'x': (planes, R, C) -> (planes, R, C) with ppermute halo exchange.
    ``run(block, abs_iota, row_edges)`` must use GLOBAL-row masks only
    (abs_iota carries global coordinates via scalar prefetch).  Edge
    ranks run the masked body; interior ranks the mask-free fast path.

    ``halo`` sets the exchanged strip depth (multiples of 8).  Deeper
    halos buy temporal blocking for stencil bodies: a body consuming r
    halo rows per sweep amortises ONE ICI exchange over ``halo // r``
    sweeps (pass a multi-substep body and the matching halo — see
    make_sharded_mrtcg_step)."""
    from .pipeline import resolve_block_rows

    nx = mesh.shape["x"]
    if R % nx != 0:
        raise ValueError(f"rows {R} not divisible by mesh x={nx}")
    R_loc = R // nx
    if R_loc < halo:
        raise ValueError(
            f"local shard rows {R_loc} shallower than the {halo}-row "
            f"exchange strip")
    block_rows = resolve_block_rows((planes,), planes, R_loc, C, dtype,
                                    6 * 2 ** 20, block_rows, False,
                                    halo=halo)
    mk = functools.partial(
        make_local_halo_body_step, planes, R_loc, C, run, dtype=dtype,
        block_rows=block_rows, halo=halo, interpret=interpret)
    inner_edge = mk(row_edges=True)
    inner_int = mk(row_edges=False) if nx > 2 else None

    def local_step(F_loc):
        n = lax.axis_size("x")
        top_edge = F_loc[:, :halo]
        bot_edge = F_loc[:, -halo:]
        if n == 1:
            halo_top, halo_bot = bot_edge, top_edge
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            halo_top = lax.ppermute(bot_edge, "x", fwd)
            halo_bot = lax.ppermute(top_edge, "x", bwd)
        rank = lax.axis_index("x")
        off = (rank * R_loc).astype(jnp.int32).reshape(1)
        if inner_int is None:
            return inner_edge(off, F_loc, halo_top, halo_bot)
        return lax.cond(
            (rank == 0) | (rank == n - 1),
            lambda o, f, t, b: inner_edge(o, f, t, b),
            lambda o, f, t, b: inner_int(o, f, t, b),
            off, F_loc, halo_top, halo_bot)

    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", None), out_specs=P(None, "x", None),
        check_vma=False)


def make_sharded_mrtcg_step(mesh: Mesh, R: int, C: int, red, blue,
                            sigma: float, gravity=(0.0, 0.0),
                            delta: float = 0.1,
                            apply_gravity_source: bool = True,
                            dtype=jnp.float32,
                            block_rows: int | None = None,
                            interpret: bool = False,
                            surface_tension: str = "perturbation",
                            substeps: int | str = 1):
    """The flagship MRT colour-gradient two-phase step, row-sharded over
    mesh axis 'x' with ppermute halo exchange feeding the fused kernel.
    Perturbation mode (default): F (2, 9, R, C) -> (2, 9, R, C),
    advanced ``substeps`` steps per ONE ICI exchange
    (communication-avoiding temporal blocking: each sweep consumes 3
    halo rows — 2 for the 5x5 gradients + 1 for streaming — and the
    exchanged strip deepens to the smallest 8-aligned halo covering
    3*substeps rows, so substeps=2 rides the default 8-row strip and
    substeps up to 5 a 16-row strip).  ``surface_tension='csf'``
    instead steps the 20-plane state S (20, R, C) = [red f, blue f,
    fst carry] of kernels.mrtcg_pallas.make_csf_fused_step (5 halo
    rows/sweep: the chained curvature stencils — substeps=2/3 on a
    16-row strip).  Matches the single-chip kernels exactly: the body
    is shared (make_mrtcg_body) and all masks are
    global-position-based.  ``substeps="auto"`` resolves the cadence
    through the ICI-aware picker (resolve_substeps)."""
    from .mrtcg_pallas import halo_for, make_mrtcg_body

    substeps = resolve_substeps(
        substeps, "csf" if surface_tension == "csf" else "mrtcg", C=C)
    planes = 20 if surface_tension == "csf" else 18
    halo = halo_for(substeps, 5 if surface_tension == "csf" else 3)
    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype,
                          surface_tension=surface_tension,
                          substeps=substeps, halo=halo)
    sharded = make_sharded_body_step(mesh, planes, R, C, run, dtype=dtype,
                                     block_rows=block_rows, halo=halo,
                                     interpret=interpret)
    if planes == 20:
        return sharded  # (20, R, C) incl. the fst carry planes

    def wrapped(F):
        return sharded(F.reshape(18, R, C)).reshape(2, 9, R, C)

    return wrapped


def make_sharded_mrtcg_reduced_step(mesh: Mesh, R: int, C: int, red, blue,
                                    sigma: float, gravity=(0.0, 0.0),
                                    delta: float = 0.1,
                                    apply_gravity_source: bool = True,
                                    dtype=jnp.float32,
                                    block_rows: int | None = None,
                                    interpret: bool = False,
                                    surface_tension: str = "perturbation",
                                    substeps: int | str = 1):
    """Row-sharded REDUCED-state MRT colour-gradient step: G (10, R, C)
    -> (10, R, C) (12 planes in CSF mode, fst carried in planes 10-11) —
    the production multi-chip flagship path.  Identical physics to
    make_sharded_mrtcg_step (same make_mrtcg_body), but the state, the
    HBM traffic AND the ICI halo payload shrink to 10/18ths (12/20ths
    CSF): the exchanged strip is planes x halo x C, so the reduced
    layout cuts the per-exchange ICI bytes by the same ratio.  Convert
    with mrtcg_pallas.reduce_mrtcg_state / make_mrtcg_split_step.
    ``substeps="auto"`` resolves through the ICI-aware picker."""
    from .mrtcg_pallas import halo_for, make_mrtcg_body, reduced_planes

    substeps = resolve_substeps(
        substeps, "csf" if surface_tension == "csf" else "mrtcg", C=C)
    planes = reduced_planes(surface_tension)
    halo = halo_for(substeps, 5 if surface_tension == "csf" else 3)
    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype,
                          surface_tension=surface_tension, reduced=True,
                          substeps=substeps, halo=halo)
    return make_sharded_body_step(mesh, planes, R, C, run, dtype=dtype,
                                  block_rows=block_rows, halo=halo,
                                  interpret=interpret)


def make_sharded_rk_step(mesh: Mesh, R: int, C: int, *, r_alpha, b_alpha,
                         r_nu, b_nu, sigma, beta: float = 0.7,
                         gravity=(0.0, 0.0), dtype=jnp.float32,
                         block_rows: int | None = None,
                         interpret: bool = False):
    """The RK colour-gradient mixture step row-sharded over mesh axis
    'x': S (11, R, C) = [f(9), r_rho, b_rho] -> (11, R, C), same
    body as kernels.rk_pallas (global-position masks), one ICI halo
    exchange per step."""
    from .rk_pallas import make_rk_body

    run = make_rk_body(R, C, r_alpha=r_alpha, b_alpha=b_alpha, r_nu=r_nu,
                       b_nu=b_nu, sigma=sigma, beta=beta, gravity=gravity)
    return make_sharded_body_step(mesh, 11, R, C, run, dtype=dtype,
                                  block_rows=block_rows, interpret=interpret)


def make_sharded_thermal_step(mesh: Mesh, R: int, C: int, *,
                              omega_f: float, omega_g: float,
                              g_beta: float, substeps: int | str = 1,
                              dtype=jnp.float32,
                              block_rows: int | None = None,
                              interpret: bool = False):
    """The Rayleigh-Benard coupled step (BGK fluid + temperature ADE +
    Boussinesq buoyancy, scenes.thermal) row-sharded over mesh axis
    'x': S (18, R, C) = [f(9), g(9)] -> (18, R, C), same body as
    kernels.thermal_pallas (global-position wall masks), one ICI halo
    exchange per ``substeps`` steps (the stencil-free body consumes only
    1 of the 8 halo rows per sweep, so up to 8 steps amortise one
    exchange — deeper communication avoidance than the stencil
    families).  ``substeps="auto"`` resolves through the ICI-aware
    picker (clamped to the 8-row strip)."""
    from .thermal_pallas import make_thermal_body

    substeps = resolve_substeps(substeps, "thermal", C=C, cap=HALO)
    run = make_thermal_body(R, C, omega_f=omega_f, omega_g=omega_g,
                            g_beta=g_beta, substeps=substeps)
    return make_sharded_body_step(mesh, 18, R, C, run, dtype=dtype,
                                  block_rows=block_rows,
                                  interpret=interpret)


def make_sharded_fused_step(mesh: Mesh, R: int, C: int, collide_fn,
                            dtype=jnp.float32, block_rows: int | None = None,
                            substeps: int | str = 1,
                            interpret: bool = False):
    """Globally periodic fused collide-stream sharded over mesh axis 'x'
    (rows).  Returns a function f (9, R, C) -> (9, R, C) advancing
    ``substeps`` steps per call with ONE ring halo exchange
    (``"auto"`` resolves through the ICI-aware cadence picker)."""
    substeps = resolve_substeps(substeps, "bgk", C=C, cap=HALO)
    nx = mesh.shape["x"]
    if R % nx != 0:
        raise ValueError(f"rows {R} not divisible by mesh x={nx}")
    R_loc = R // nx
    inner = make_local_halo_step(R_loc, C, collide_fn, dtype=dtype,
                                 block_rows=block_rows, substeps=substeps,
                                 interpret=interpret)

    def local_step(f_loc):
        n = lax.axis_size("x")
        top_edge = f_loc[:, :HALO]
        bot_edge = f_loc[:, -HALO:]
        if n == 1:
            halo_top, halo_bot = bot_edge, top_edge
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            halo_top = lax.ppermute(bot_edge, "x", fwd)  # prev rank's last rows
            halo_bot = lax.ppermute(top_edge, "x", bwd)  # next rank's first rows
        return inner(f_loc, halo_top, halo_bot)

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation, which the default vma checker rejects
    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", None), out_specs=P(None, "x", None),
        check_vma=False)
