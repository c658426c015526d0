"""Isotropic finite-difference gradients (5x5 and 3x3 stencils).

The reference computes gradients with torch Conv2d (cross-correlation, i.e.
no kernel flip) with **replicate** edge padding:
  * 5x5 isotropic stencil, weights xi*kernel, 1/5040 normalisation
    (src/differential.hpp:9-40, src/differential.cpp:3-39);
  * a compact 3x3 D2Q9-weight stencil local to two drivers
    (test/static_droplet_test.cpp:79-139, test/rk_static_droplet_test.cpp:48-108).

Quirk preserved for parity: in the reference's 3x3 variant the kernels named
partial_x / partial_y actually differentiate along *cols* / *rows*
respectively — swapped relative to the 5x5 convention (x = rows).  The 3x3
functions here reproduce that behaviour; callers who want consistent
orientation can pass ``reference_swapped=False``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

# 5x5 isotropic weights.  cites /root/reference/src/differential.hpp:9-18
XI_5 = (1.0 / 5040.0) * np.array(
    [
        [1.0, 32.0, 84.0, 32.0, 1.0],
        [32.0, 448.0, 960.0, 448.0, 32.0],
        [84.0, 960.0, 0.0, 960.0, 84.0],
        [32.0, 448.0, 960.0, 448.0, 32.0],
        [1.0, 32.0, 84.0, 32.0, 1.0],
    ]
)

# Displacement factors (cross-correlation convention): w_x[i,j] = i-2,
# w_y[i,j] = j-2.  cites /root/reference/src/differential.hpp:20-40
_ROW_OFF5 = np.arange(5, dtype=np.float64)[:, None] - 2.0
_COL_OFF5 = np.arange(5, dtype=np.float64)[None, :] - 2.0
KERNEL_X5 = XI_5 * np.broadcast_to(_ROW_OFF5, (5, 5))
KERNEL_Y5 = XI_5 * np.broadcast_to(_COL_OFF5, (5, 5))

# 3x3 D2Q9-weight kernels, exactly as written in the drivers.
# cites /root/reference/test/rk_static_droplet_test.cpp:52-62
KERNEL_X3 = 3.0 * np.array(
    [
        [-1.0 / 36.0, 0.0, 1.0 / 36.0],
        [-1.0 / 9.0, 0.0, 1.0 / 9.0],
        [-1.0 / 36.0, 0.0, 1.0 / 36.0],
    ]
)
KERNEL_Y3 = -3.0 * np.array(
    [
        [1.0 / 36.0, 1.0 / 9.0, 1.0 / 36.0],
        [0.0, 0.0, 0.0],
        [-1.0 / 36.0, -1.0 / 9.0, -1.0 / 36.0],
    ]
)


def correlate2d_replicate(psi: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Cross-correlate a (R, C) field with a small kernel, replicate padding.

    Matches torch Conv2d(padding_mode=kReplicate) semantics
    (src/differential.cpp:3-15).
    """
    k = kernel.shape[0]
    h = k // 2
    padded = jnp.pad(psi, ((h, h), (h, h)), mode="edge")
    lhs = padded[None, None, :, :]
    rhs = jnp.asarray(kernel, dtype=psi.dtype)[None, None, :, :]
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    return out[0, 0]


def dx5(psi: jnp.ndarray) -> jnp.ndarray:
    """d/dx (rows) via the 5x5 isotropic stencil.  cites src/differential.cpp:23-27"""
    return correlate2d_replicate(psi, KERNEL_X5)


def dy5(psi: jnp.ndarray) -> jnp.ndarray:
    """d/dy (cols) via the 5x5 isotropic stencil.  cites src/differential.cpp:29-33"""
    return correlate2d_replicate(psi, KERNEL_Y5)


def grad5(psi: jnp.ndarray) -> jnp.ndarray:
    """(2, R, C) gradient via the 5x5 stencil.  cites src/differential.cpp:35-39"""
    return jnp.stack([dx5(psi), dy5(psi)], axis=0)


def dx3(psi: jnp.ndarray, reference_swapped: bool = True) -> jnp.ndarray:
    """Reference's 3x3 'partial_x' (differentiates along cols when
    reference_swapped, matching test/rk_static_droplet_test.cpp:52-56).
    With reference_swapped=False differentiates along rows (consistent
    with the 5x5 convention)."""
    return correlate2d_replicate(psi, KERNEL_X3 if reference_swapped else KERNEL_X3.T)


def dy3(psi: jnp.ndarray, reference_swapped: bool = True) -> jnp.ndarray:
    """Reference's 3x3 'partial_y' (differentiates along rows when
    reference_swapped, matching test/rk_static_droplet_test.cpp:58-62).
    With reference_swapped=False differentiates along cols."""
    return correlate2d_replicate(psi, KERNEL_Y3 if reference_swapped else KERNEL_X3)


def grad3(psi: jnp.ndarray, reference_swapped: bool = True) -> jnp.ndarray:
    """(2, R, C) gradient via the 3x3 stencil (component 0 = 'x' in the
    reference's swapped sense).  cites test/rk_static_droplet_test.cpp:101-105"""
    return jnp.stack(
        [dx3(psi, reference_swapped), dy3(psi, reference_swapped)], axis=0
    )
