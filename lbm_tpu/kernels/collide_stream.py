"""Generic fused collide-stream Pallas harness.

Any *local* collision operator (a pure function of the 9 populations at a
cell) fuses with periodic streaming into one kernel launch per step:

    make_fused_step(R, C, collide_fn)  with
    collide_fn: f_slab (9, rows, C) -> post-collision (9, rows, C)

The double-buffered HBM->VMEM block pipeline is kernels.pipeline (this
module supplies the substeps temporal-blocking body and the
streaming-as-output-addressing trick; see kernels.bgk_pallas for the BGK
design notes); collide_fn runs on each (9, B+16, C) slab entirely
in VMEM, so ordinary jnp code — including the model-layer collision
functions (models.kbc.collide, ops.d2q9.bgk_collision) — works unchanged
inside the kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
HALO = 8  # sublane-aligned halo depth (Mosaic requires 8-row alignment)
CHALO = 128  # lane-aligned column halo width (2-D sharded kernels)


# opposite-direction pairs (kp, km) with c_km = -c_kp; the single source
# for every paired kernel (OPP in core.lattice gives km = OPP[kp])
PAIR_KS = ((1, 3), (2, 4), (5, 7), (8, 6))


def pair_cu(ux, uy):
    """{kp: c_kp . u} for the four pair leaders — ux, uy, ux+uy, ux-uy."""
    return {1: ux, 2: uy, 5: ux + uy, 8: ux - uy}


def d2q9_pairs(ux, uy):
    """Shared subexpressions for the paired-direction equilibrium/source
    split (see kernels.bgk_pallas.bgk_collide_fn): returns the common even
    base ``t0 = 1 - 1.5|u|^2`` (reusing ux^2, uy^2) and, for each of the
    four opposite-direction pairs, ``(kp, km, W, cu, cu^2)`` where
    ``cu = c_kp . u = -c_km . u``.  Any per-direction polynomial in
    (cu, |u|^2) then splits into an even part shared by the pair and an
    odd part combined by +/-; the Guo source pairs the same way because
    ``c . F`` also flips sign with the direction."""
    uxx = ux * ux
    uyy = uy * uy
    t0 = 1.0 - 1.5 * (uxx + uyy)
    cu = pair_cu(ux, uy)
    cc = {1: uxx, 2: uyy, 5: cu[5] * cu[5], 8: cu[8] * cu[8]}
    return t0, tuple((kp, km, WQ[kp], cu[kp], cc[kp])
                     for kp, km in PAIR_KS)


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


def pick_block_rows(R: int, C: int, dtype=jnp.float32,
                    vmem_budget=10 * 2 ** 20) -> int:
    """Largest multiple-of-8 row block (9-plane state) that (a) divides R
    and (b) fits the double-buffered slabs in the VMEM budget (scaled to
    the pipeline's penalty-free SAFE_SCOPE; the pallas_call requests the
    matching adaptive scoped-VMEM limit — pipeline.vmem_limit_for).
    Larger blocks cut temporal-blocking compute redundancy: 15.8 GLUPS at
    B=16/C=2048 vs 21.0 at B=64/C=2048 (substeps=8, the VMEM lift), and
    narrow columns compound the win because 1-cell column rolls stay
    within a single 128-lane tile (25.9 GLUPS at 7680x256/B=240, 33.7 at
    7936x128/B=496)."""
    from .pipeline import resolve_block_rows

    return resolve_block_rows((9,), 9, R, C, dtype, vmem_budget,
                              None, allow_row_alias=True)


def make_fused_step(R: int, C: int, collide_fn, dtype=jnp.float32,
                    block_rows: int | None = None, interpret: bool = False,
                    flops_per_cell: int = 60, substeps: int = 1,
                    vmem_limit_bytes: int | None = None):
    """Fused periodic collide-stream with an arbitrary local collision.

    ``substeps`` > 1 enables temporal blocking: one launch advances the
    state by that many LBM steps while reading/writing HBM once (valid for
    substeps <= HALO and fully periodic domains)."""
    from .pipeline import make_block_pipeline

    if not 1 <= substeps <= HALO:
        raise ValueError(f"substeps must be in [1, {HALO}]")
    if block_rows is None:
        block_rows = pick_block_rows(R, C, dtype)

    def body(block, abs_iota, i):
        # Temporal blocking: apply `substeps` collide-stream sweeps on the
        # slab before writing back.  Columns are fully resident (exact
        # periodic wrap); along rows each sweep invalidates one more edge
        # row, so the HALO-deep halo supports substeps <= HALO and the kept
        # interior [HALO, HALO+B) stays exact.  HBM traffic drops by the
        # substep factor.
        rows = block.shape[1]
        cur = block
        for _ in range(substeps):
            cur = _stream_slab(collide_fn(cur), C, rows)
        return cur[:, HALO:rows - HALO, :]

    # the purely periodic body is alias-safe: wrapped halo rows are exact
    # periodic images, no absolute-row masks are involved
    # vmem_budget mirrors pick_block_rows' convention so the adaptive
    # scoped-VMEM request keeps the same headroom ratio as the pick
    return make_block_pipeline(9, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=10 * 2 ** 20,
                               flops_per_cell=flops_per_cell,
                               allow_row_alias=True,
                               vmem_limit_bytes=vmem_limit_bytes,
                               interpret=interpret)


def kbc_collide_fn(s2: float, gamma_impl: str = "factored"):
    """KBC cascaded collision as a slab function (models.kbc.collide runs
    unchanged inside the kernel — pure local jnp with scalar constants).
    Moments use explicit 9-term sums (no dot_general: Pallas kernels cannot
    capture array constants, and the sums keep full f32 precision).
    ``gamma_impl="factored"`` selects the separable-basis gamma
    (models.kbc.gamma_factored — the measured identity experiment)."""
    from ..models import kbc

    def fn(f):
        m0 = f[0]
        for k in range(1, 9):
            m0 = m0 + f[k]
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        u = jnp.stack([mx / m0, my / m0], axis=0)
        return kbc.collide(f, m0, u, s2, gamma_impl=gamma_impl)

    return fn


def make_kbc_fused_step(R: int, C: int, s2: float, dtype=jnp.float32,
                        block_rows: int | None = None, interpret: bool = False,
                        substeps: int = 1, gamma_impl: str = "factored"):
    """Fused KBC collide-stream (the ULBM family's 300k-step workloads,
    test/ulbm_poiseuille.cpp:64)."""
    if block_rows is None:
        # KBC keeps many live temporaries; halve the block budget
        block_rows = pick_block_rows(R, C, dtype, vmem_budget=5 * 2 ** 20)
    return make_fused_step(R, C, kbc_collide_fn(s2, gamma_impl), dtype=dtype,
                           block_rows=block_rows, interpret=interpret,
                           flops_per_cell=400, substeps=substeps)
