"""Fused D3Q19 kernel, depth-in-LANES layout — a measured NEGATIVE
result kept as engineering record (same physics, same oracle as
kernels/d3q19_pallas.py: ops.d3q19; BEYOND THE REFERENCE, which is
strictly 2-D).

MEASURED VERDICT (2026-08-20, v5e, 16x512x128 channel, substeps=8):
848 MLUPS vs the depth-as-planes kernel's 8,516 — 10x SLOWER, despite
16x wider per-op arrays.  The cost is the lane rolls themselves: on a
(B+16, 2048) block every z/x-stream roll crosses 16 lane tiles
(cross-tile carries), where the planes layout only ever rolls within
one 128-lane tile; ~30 wide rolls/sweep overwhelm the granularity
gain.  Mosaic compile is also ~60x slower (~2 min/sweep-depth).  See
docs/BENCHMARKS.md "d3q19 roofline" for the full alternatives table —
this file stays because the result is load-bearing for that verdict
(and the seam-roll streaming pattern is reusable where rolls are
rare).

Motivation (measured, docs/BENCHMARKS.md "d3q19 roofline"): the
depth-as-planes layout carries P = 19 X population planes of (Y, Z),
so its VMEM-bound auto block pick at X=16, Z=128 is B = 32 and every
VPU op runs on a (48, 128)-shaped array — 6 native (8, 128) tiles.  It
sustains only 3.2 T-op/s of the ~5 T-op/s practical VPU ceiling, and
shallower-depth repacks of the same cell count (more rows, fewer
planes) measure +28-37%.  This kernel instead folds depth into the
LANE axis: the state is 19 planes of (Y, X*Z) with

    lane = z * X + x            (z-major, x minor)

so at X=16, Z=128 every op runs on (B+16, 2048)-shaped arrays — 16x
the lane width at identical slab bytes (VMEM need is layout-invariant:
rows x total-state-width).  Streaming by axis:

  * z is the MAJOR lane digit, so z-streaming is a pure cyclic lane
    roll by CZ[k] * X — the 2048-wrap IS z-periodicity, no seam fixes;
  * x-streaming is a lane roll by CX[k]; the cyclic wrap crosses the
    x segment boundary at exactly the X-1/2 faces, i.e. the seam lanes
    ARE the wall lanes: with x walls the halfway bounce-back masks
    (same-cell full reversal, as in the planes kernel) overwrite every
    wrapped lane, and with periodic x a second roll + select repairs
    the two seam columns;
  * y streams as the blocked-row roll on the halo rows — unchanged,
    so temporal blocking still consumes 1 of the HALO=8 y rows/sweep.

Collision is shared verbatim with the planes kernel (`_collide_x` on
the 19 wide planes).  Pinned to ops.d3q19 at 1e-13 in f64
(tests/test_d3q19.py::test_lanes_3d_matches_jnp and
::test_lanes_cavity_matches_jnp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .collide_stream import HALO
from .d3q19_pallas import CX, CY, CZ, OPP, Q, WQ, _collide_x
from .pipeline import make_block_pipeline, resolve_block_rows


def pack_lanes(f: jnp.ndarray, X: int, Y: int, Z: int) -> jnp.ndarray:
    """(19, X, Y, Z) -> (19, Y, X*Z) with lane = z * X + x."""
    return jnp.transpose(f, (0, 2, 3, 1)).reshape(Q, Y, X * Z)


def unpack_lanes(S: jnp.ndarray, X: int, Y: int, Z: int) -> jnp.ndarray:
    """Inverse of pack_lanes."""
    return jnp.transpose(S.reshape(Q, Y, Z, X), (0, 3, 1, 2))


def make_d3q19_lanes_body(X: int, Y: int, Z: int, *, omega: float,
                          force_z: float = 0.0, x_walls: bool = False,
                          y_walls: bool = False, z_walls: bool = False,
                          lid_u: float = 0.0, substeps: int = 1):
    """Per-slab step body on the (19, rows, X*Z) lanes state:
    ``run(block, abs_iota, row_edges) -> (19, rows - 16, X*Z)`` — the
    generic body contract (same as make_d3q19_body), so it can ride
    the row-sharded halo-input wrapper too.  Write order matches the
    jnp oracle and the planes kernel: x wiring, then y masks, then z
    masks (z wins shared edges)."""
    gz = float(force_z)
    W = X * Z
    y_out_lo = tuple(k for k in range(1, Q) if CY[k] < 0)
    y_out_hi = tuple(k for k in range(1, Q) if CY[k] > 0)
    z_out_lo = tuple(k for k in range(1, Q) if CZ[k] < 0)
    z_out_hi = tuple(k for k in range(1, Q) if CZ[k] > 0)

    def run(block, abs_iota, row_edges):
        rows = block.shape[1]
        f = [block[k] for k in range(Q)]
        li = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        xi = jax.lax.rem(li, jnp.int32(X)) if X > 1 else None
        zi = li // X if z_walls else None

        for _ in range(substeps):
            coll = _collide_x(f, omega, gz)

            new = [None] * Q
            for k in range(Q):
                t = coll[k]
                if CZ[k]:
                    t = pltpu.roll(t, (CZ[k] * X) % W, axis=1)
                if CX[k] and X > 1:
                    t = pltpu.roll(t, CX[k] % W, axis=1)
                    if not x_walls:
                        # repair the seam column the cyclic wrap crossed:
                        # its true source is the far end of the SAME z
                        # segment (x-periodicity)
                        fix = pltpu.roll(coll[k], (CZ[k] * X + CX[k]
                                                   - CX[k] * X) % W, axis=1)
                        seam = (xi == 0) if CX[k] > 0 else (xi == X - 1)
                        t = jnp.where(seam, fix, t)
                if CY[k]:
                    t = pltpu.roll(t, CY[k] % rows, axis=0)
                new[k] = t

            if x_walls:
                # halfway x-wall: full reversal arrives at the SAME cell
                # (no y/z displacement) — overwrites the wrapped seam
                for k in range(Q):
                    if not CX[k]:
                        continue
                    if X == 1:          # degenerate: every cell is wall
                        new[k] = coll[OPP[k]]
                    elif CX[k] > 0:
                        new[k] = jnp.where(xi == 0, coll[OPP[k]], new[k])
                    else:
                        new[k] = jnp.where(xi == X - 1, coll[OPP[k]],
                                           new[k])
            if y_walls and row_edges:
                for k in y_out_lo:
                    new[OPP[k]] = jnp.where(
                        abs_iota == 0, coll[k], new[OPP[k]])
                for k in y_out_hi:
                    src = coll[k]
                    if lid_u and CZ[k]:
                        src = src - (6.0 * WQ[k] * CZ[k] * lid_u)
                    new[OPP[k]] = jnp.where(
                        abs_iota == Y - 1, src, new[OPP[k]])
            if z_walls:
                for k in z_out_lo:
                    new[OPP[k]] = jnp.where(zi == 0, coll[k], new[OPP[k]])
                for k in z_out_hi:
                    new[OPP[k]] = jnp.where(
                        zi == Z - 1, coll[k], new[OPP[k]])
            f = new

        return jnp.stack([p[HALO:rows - HALO] for p in f], axis=0)

    return run


def make_d3q19_lanes_step(X: int, Y: int, Z: int, *, omega: float,
                          force_z: float = 0.0, x_walls: bool = False,
                          y_walls: bool = False, z_walls: bool = False,
                          lid_u: float = 0.0,
                          substeps: int = 1, dtype=jnp.float32,
                          block_rows: int | None = None,
                          interpret: bool = False):
    """Fused D3Q19 step on the (19, Y, X*Z) lanes state: ``S -> S``
    advancing ``substeps`` steps per launch.  Same feature set and
    semantics as make_d3q19_fused_step (x/y/z walls, moving lid along
    +z, Guo z-force); state layout converts via pack_lanes /
    unpack_lanes."""
    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if lid_u and not y_walls:
        raise ValueError("lid_u needs y_walls=True")
    W = X * Z
    if W % 128 != 0:
        raise ValueError(f"X*Z = {W} must be a multiple of 128")
    budget = 10 * 2 ** 20            # planes-kernel convention
    block_rows = resolve_block_rows((Q,), Q, Y, W, dtype, budget,
                                    block_rows, not y_walls)
    run = make_d3q19_lanes_body(X, Y, Z, omega=omega, force_z=force_z,
                                x_walls=x_walls, y_walls=y_walls,
                                z_walls=z_walls, lid_u=lid_u,
                                substeps=substeps)

    def body(block, abs_iota, i):
        return run(block, abs_iota, True)

    return make_block_pipeline(Q, Y, W, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=budget,
                               flops_per_cell=140 * substeps,
                               allow_row_alias=not y_walls,
                               interpret=interpret)
