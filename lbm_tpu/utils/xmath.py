"""Precision-pinned contraction helpers.

The D2Q9 moment/equilibrium contractions are 9-wide sums with heavy
cancellation (momentum is a difference of opposite populations).  JAX's
default matmul precision lowers f32 dot_general to bf16 passes (measured
rel. error ~1e1 on the (2,9)x(9,R,C) moment contraction on both the CPU
and TPU backends), which destroys the f32 performance path.  Every lattice
contraction in this package therefore pins Precision.HIGHEST — these ops are
tiny and bandwidth-bound, so this costs nothing on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def tdot(a, b, axes):
    return jnp.tensordot(a, b, axes=axes, precision=HIGHEST)


def esum(spec, *operands):
    return jnp.einsum(spec, *operands, precision=HIGHEST)


def resolve_fused(fused, dtype, rows: int | None = None,
                  cols: int | None = None) -> bool:
    """Resolve a scene's ``fused`` flag; ``None`` means auto.

    Auto picks the one-launch Pallas path exactly when it can run: a
    non-CPU backend, f32 (the kernels' production precision), and the
    fused kernels' tiling constraints (cols % 128 == 0; rows % 8 == 0
    and rows >= 24 — the alias-free block-pipeline minimum).  Explicit
    True/False always wins, so CLI users on the TPU get the fast path by
    default while f64 validation and odd geometries stay on the jnp
    oracle."""
    if fused is not None:
        return bool(fused)
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if jax.devices()[0].platform == "cpu":
        return False
    if cols is not None and cols % 128 != 0:
        return False
    if rows is not None and (rows % 8 != 0 or rows < 24):
        return False
    return True


def default_float(dtype=None):
    """Resolve the package-wide default dtype for scene/model entry points.

    The reference is double precision everywhere
    (torch::set_default_dtype(kDouble), e.g. test/horizontal_poiseuille_test.cpp:69),
    so validation paths want f64 — but on TPU x64 is disabled and an
    explicit ``jnp.float64`` would be truncated with a warning per call.
    ``None`` therefore means "f64 if x64 is enabled, else f32", resolved
    silently via dtype canonicalization."""
    if dtype is None:
        return jax.dtypes.canonicalize_dtype(jnp.float64)
    return dtype


def launch_cap(cells: int, per_cell_ns: float = 0.35) -> int:
    """Per-launch fori_loop trip cap for TPU scene loops.

    The axon relay hangs forever on single launches past ~2 s of device
    time (CLAUDE.md), so chunks are bounded to ~1.4 s assuming a
    conservative per-cell step cost: 0.35 ns/cell covers the slowest
    fused two-phase kernel (csf, measured ~0.31 ns/cell at 1024x512);
    pass ~0.06 for the single-phase families.  Capped at the historical
    20000 so small-grid behaviour is unchanged."""
    return min(20000, max(500, int(1.4e9 / (per_cell_ns * max(cells, 1)))))
