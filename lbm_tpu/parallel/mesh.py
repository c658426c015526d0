"""Device-mesh helpers for spatial domain decomposition.

The reference's entire "distributed" story is manual in-process subdomain
slicing with edge copies (test/decompose_domain.cpp:180-187,
test/decompose_domain_loop.cpp:232-261).  Here a decomposition is a
`jax.sharding.Mesh` over axes ('x', 'y') with the grid sharded as
P(None, 'x', 'y') — population planes replicated-in-axis-0, rows over 'x',
cols over 'y'.  Collectives ride ICI; DCN only across slices (standard JAX
multi-slice semantics).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FIELD_SPEC = P(None, "x", "y")   # f (9, R, C), u (2, R, C)
SCALAR_SPEC = P("x", "y")        # rho (R, C)


def make_mesh(devices=None, shape: tuple[int, int] | None = None) -> Mesh:
    """Build an ('x', 'y') mesh from the available devices.

    ``shape`` fixes (nx, ny); default splits all devices along 'x' (rows),
    the long axis in every reference workload (e.g. 1024x256 RT,
    mrt_rayleigh_taylor.cpp:180).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    nx, ny = shape
    if nx * ny != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(nx, ny)
    return Mesh(arr, ("x", "y"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, FIELD_SPEC)


def scalar_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, SCALAR_SPEC)


def shard_state(mesh: Mesh, tree):
    """Device-put a pytree of (9/2, R, C) fields and (R, C) scalars with the
    canonical decomposition."""

    def put(x):
        spec = FIELD_SPEC if x.ndim == 3 else SCALAR_SPEC
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
