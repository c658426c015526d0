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
