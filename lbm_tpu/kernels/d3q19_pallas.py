"""Fused D3Q19 collide-stream kernels — the 3-D extension at
fused-kernel speed (BEYOND THE REFERENCE, which is strictly 2-D).

TPU mapping ("depth-as-planes"): the (19, X, Y, Z) state is viewed as
(19 * X, Y, Z) population planes — the wall-normal x axis folds into
the PLANE INDEX, so the block pipeline's 2-D machinery applies
unchanged with (Y, Z) as (rows, lanes).  The consequences are elegant:

  * x-streaming is STATIC plane arithmetic — out[19 x + k] reads
    coll[19 (x - cx_k) + k]; no rolls, no masks;
  * the halfway x-walls are exact static wiring: at the wall depth the
    incoming population is coll[opp(k)] at the SAME cell (the full
    bounce-back reversal has no y/z displacement), so the 3-D channel
    kernel has NO masks at all;
  * y streams as the blocked-row roll (halo rows feed the edges),
    z as the fully-resident lane roll — exactly the 2-D pattern;
  * temporal blocking works as in 2-D: each sweep consumes 1 of the 8
    Y-halo rows (x and z are fully resident), so up to 8 sweeps per
    launch.

VMEM bounds the depth: the double-buffered slabs at the minimum
block_rows = 8 need 19 X (2(8+16) + 2*8) Z itemsize = 4864 X Z bytes
f32, so X Z <= ~6400 under the pipeline's penalty-free SAFE_SCOPE lift
(e.g. X = 48 at Z = 128, or X = 8 at Z = 512) — the factory checks
this explicitly and raises a clear ValueError (resolve_block_rows'
auto-pick alone bottoms out at b = 8 without re-checking the budget).

Pinned to ops.d3q19 + scenes.three_d at 1e-13 (observed 3e-16) in f64
(tests/test_d3q19.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..ops.d3q19 import C3, OPP3, Q, W3
from .collide_stream import HALO
from .pipeline import (_BUDGET_SCALE, VMEM_LIMIT, make_block_pipeline,
                       resolve_block_rows)

CX = tuple(int(v) for v in C3[0])
CY = tuple(int(v) for v in C3[1])
CZ = tuple(int(v) for v in C3[2])
WQ = tuple(float(v) for v in W3)
OPP = tuple(int(v) for v in OPP3)


def _collide_x(fx, omega, gz):
    """One depth-slice BGK collision (+ optional Guo force along z, with
    the half-force velocity shift).  ``fx`` is the 19-entry list of
    (rows, Z) planes at this depth.  cu flips sign under k -> opp(k)
    while cF = cz gz also flips, so 9 cu cF is even and 3 cF odd —
    the opposite-direction pairing shares every even subexpression."""
    rho = fx[0]
    for k in range(1, Q):
        rho = rho + fx[k]
    inv_rho = 1.0 / rho
    mx = my = mz = None
    for k in range(1, Q):
        if CX[k]:
            mx = fx[k] * CX[k] if mx is None else mx + fx[k] * CX[k]
        if CY[k]:
            my = fx[k] * CY[k] if my is None else my + fx[k] * CY[k]
        if CZ[k]:
            mz = fx[k] * CZ[k] if mz is None else mz + fx[k] * CZ[k]
    ux = mx * inv_rho
    uy = my * inv_rho
    uz = (mz + 0.5 * gz) * inv_rho if gz else mz * inv_rho
    uu15 = 1.5 * (ux * ux + uy * uy + uz * uz)

    pref = (1.0 - 0.5 * omega) if gz else 0.0
    out = [None] * Q
    out[0] = (1.0 - omega) * fx[0] \
        + omega * (WQ[0] * rho * (1.0 - uu15))
    if gz:
        out[0] = out[0] - pref * WQ[0] * (3.0 * uz * gz)
    done = set()
    for k in range(1, Q):
        if k in done:
            continue
        ko = OPP[k]
        done.add(ko)
        cu = CX[k] * ux + CY[k] * uy + CZ[k] * uz
        w = WQ[k]
        wr = w * rho
        even = omega * (wr * (1.0 + 4.5 * cu * cu - uu15))
        odd = omega * (wr * (3.0 * cu))
        out[k] = (1.0 - omega) * fx[k] + (even + odd)
        out[ko] = (1.0 - omega) * fx[ko] + (even - odd)
        if gz:
            cF = CZ[k] * gz                     # scalar (0 for z-free)
            even_s = pref * w * (9.0 * cu * cF - 3.0 * uz * gz)
            odd_s = pref * w * (3.0 * cF)
            out[k] = out[k] + (even_s + odd_s)
            out[ko] = out[ko] + (even_s - odd_s)
    return out


def make_d3q19_fused_step(X: int, Y: int, Z: int, *, omega: float,
                          force_z: float = 0.0, x_walls: bool = False,
                          y_walls: bool = False, z_walls: bool = False,
                          lid_u: float = 0.0,
                          substeps: int = 1, dtype=jnp.float32,
                          block_rows: int | None = None,
                          interpret: bool = False):
    """Fused D3Q19 step on the flattened (19 * X, Y, Z) state:
    ``S -> S`` advancing ``substeps`` steps per launch.  ``x_walls``
    adds halfway no-slip planes at x = -1/2 and X - 1/2 (static
    plane wiring); otherwise x is periodic.  ``force_z`` adds the Guo
    body force along z (scenes.three_d.poiseuille_3d).

    ``y_walls`` / ``z_walls`` add halfway no-slip faces on the row /
    lane axes (global-row masks on UNwrapped abs_iota / lane-iota
    masks; the masks overwrite every population the periodic wrap
    corrupts each sweep, so temporal blocking stays valid — the
    thermal-kernel argument).  ``lid_u`` (needs y_walls) slides the
    y = Y - 1/2 face along +z with the standard moving-wall momentum
    correction (ops.d3q19.bounce_back with u_wall) — the 3-D
    lid-driven cavity (scenes.three_d.lid_cavity_3d).  Write order
    matches the jnp oracle: x wiring, then y masks, then z masks (z
    wins shared edges)."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if lid_u and not y_walls:
        raise ValueError("lid_u needs y_walls=True")
    P = Q * X
    # 10 MiB-of-16 convention = 1.6x Mosaic headroom over the accounted
    # slabs; this kernel's actual scoped need measured 1.49x (35.41 MiB
    # at B=32/Z=128's 23.7 MiB slabs), so the old 12 MiB (1.33x) OOMs
    budget = 10 * 2 ** 20
    # without y-walls the body never reads abs_iota (x-walls are static
    # plane wiring), so row aliasing is safe — thin-Y channels run
    # fused; y-wall masks extract by absolute row, so those need
    # alias-free slabs (Y >= B + 16)
    explicit = block_rows is not None
    block_rows = resolve_block_rows((P,), P, Y, Z, dtype, budget,
                                    block_rows, not y_walls)
    itemsize = jnp.dtype(dtype).itemsize
    budget_eff = int(budget * _BUDGET_SCALE)  # resolve scales the same way
    need = (2 * P * (block_rows + 2 * HALO)
            + 2 * P * block_rows) * Z * itemsize
    # Auto picks stay in the penalty-free request zone (<= SAFE_SCOPE
    # after the ~1.6x Mosaic headroom); explicit block_rows may spend
    # the whole physical VMEM (the resolve_block_rows convention) —
    # the request vmem_limit_for computes for them lands above
    # SAFE_SCOPE, which costs 16-31% on narrow geometry but can net
    # win when it buys op granularity (P=304 caps auto picks at B=32,
    # i.e. (48, Z)-shaped bodies).
    cap = VMEM_LIMIT * 10 // 16 if explicit else budget_eff
    if need > cap:
        raise ValueError(
            f"D3Q19 slab needs {need >> 20} MiB VMEM (X={X}, Z={Z}, "
            f"block_rows={block_rows}); reduce X*Z below "
            f"~{cap // ((2 * (8 + 2 * HALO) + 2 * 8) * Q * itemsize)}")
    run = make_d3q19_body(X, Y, Z, omega=omega, force_z=force_z,
                          x_walls=x_walls, y_walls=y_walls,
                          z_walls=z_walls, lid_u=lid_u,
                          substeps=substeps)

    def body(block, abs_iota, i):
        return run(block, abs_iota, True)

    return make_block_pipeline(P, Y, Z, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=budget,
                               flops_per_cell=140 * X * substeps,
                               allow_row_alias=not y_walls,
                               interpret=interpret)


def make_d3q19_body(X: int, Y: int, Z: int, *, omega: float,
                    force_z: float = 0.0, x_walls: bool = False,
                    y_walls: bool = False, z_walls: bool = False,
                    lid_u: float = 0.0, substeps: int = 1):
    """The per-slab D3Q19 step body on the flattened (19 X, rows, Z)
    state: ``run(block, abs_iota, row_edges) -> (19 X, rows - 16, Z)``
    — the generic body contract, shared by the single-chip pipeline and
    the row-sharded halo-input wrapper (sharded_pallas.
    make_sharded_body_step, which shards the y/row axis; abs_iota then
    carries GLOBAL rows via scalar prefetch so the y-face masks fire on
    the right ranks; ``row_edges=False`` skips them on interior
    ranks)."""
    gz = float(force_z)
    y_out_lo = tuple(k for k in range(1, Q) if CY[k] < 0)
    y_out_hi = tuple(k for k in range(1, Q) if CY[k] > 0)
    z_out_lo = tuple(k for k in range(1, Q) if CZ[k] < 0)
    z_out_hi = tuple(k for k in range(1, Q) if CZ[k] > 0)

    def run(block, abs_iota, row_edges):
        rows = block.shape[1]
        width = block.shape[2]
        f = [[block[Q * x + k] for k in range(Q)] for x in range(X)]
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1) \
            if z_walls else None

        for _ in range(substeps):
            coll = [_collide_x(f[x], omega, gz) for x in range(X)]

            new = [[None] * Q for _ in range(X)]
            for x in range(X):
                for k in range(Q):
                    xs = x - CX[k]
                    if 0 <= xs < X or not x_walls:
                        t = coll[xs % X][k]
                        if CZ[k]:
                            t = pltpu.roll(t, CZ[k] % width, axis=1)
                        if CY[k]:
                            t = pltpu.roll(t, CY[k] % rows, axis=0)
                        new[x][k] = t
                    else:
                        # halfway x-wall: full reversal arrives at the
                        # SAME cell — no y/z displacement, no masks
                        new[x][k] = coll[x][OPP[k]]

            # y faces: no-slip at y = -1/2, moving lid (along +z,
            # standard 6 w_k c.u_w correction) at y = Y - 1/2; applied
            # every sweep so the masks cut the cross-wall dependency
            # (temporal-blocking validity, thermal-kernel argument)
            if y_walls and row_edges:
                for x in range(X):
                    for k in y_out_lo:
                        new[x][OPP[k]] = jnp.where(
                            abs_iota == 0, coll[x][k], new[x][OPP[k]])
                    for k in y_out_hi:
                        src = coll[x][k]
                        if lid_u and CZ[k]:
                            src = src - (6.0 * WQ[k] * CZ[k] * lid_u)
                        new[x][OPP[k]] = jnp.where(
                            abs_iota == Y - 1, src, new[x][OPP[k]])
            # z faces after y (z wins shared edges, like the 2-D cavity
            # kernels' column-after-row order); lanes have no halo, so
            # the masks repair the periodic lane wrap every sweep
            if z_walls:
                for x in range(X):
                    for k in z_out_lo:
                        new[x][OPP[k]] = jnp.where(
                            ci == 0, coll[x][k], new[x][OPP[k]])
                    for k in z_out_hi:
                        new[x][OPP[k]] = jnp.where(
                            ci == width - 1, coll[x][k], new[x][OPP[k]])
            f = new

        out = [f[x][k] for x in range(X) for k in range(Q)]
        return jnp.stack([p[HALO:rows - HALO] for p in out], axis=0)

    return run
