"""Explicit halo exchange via lax.ppermute, for use inside shard_map.

The payload mirrors the reference's inter-domain binding: the data crossing
a cut is the edge line of the neighbouring block (the reference copies the 3
outgoing populations with diagonal offsets, decompose_domain.cpp:181-187;
exchanging the full 9-population edge line and streaming locally is
algebraically identical and one contiguous ICI transfer instead of three
strided ones).

Corners are handled by the standard two-pass trick: exchange rows first,
then exchange the *row-padded* array's columns — the second pass carries the
corner cells automatically.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _ring_perms(n: int, forward: bool):
    if forward:
        return [(i, (i + 1) % n) for i in range(n)]
    return [(i, (i - 1) % n) for i in range(n)]


def halo_pad_axis(x: jnp.ndarray, axis_name: str, grid_axis: int,
                  width: int = 1) -> jnp.ndarray:
    """Pad a locally-sharded array with ``width`` halo lines from the ring
    neighbours along one mesh axis (periodic).  ``grid_axis`` is the array
    axis that is sharded.  Works for any leading component axes."""
    n = lax.axis_size(axis_name)

    def take(a, sl):
        idx = [slice(None)] * a.ndim
        idx[grid_axis] = sl
        return a[tuple(idx)]

    lo_edge = take(x, slice(0, width))          # my first lines -> prev's high halo
    hi_edge = take(x, slice(-width, None))      # my last lines  -> next's low halo
    if n == 1:
        lo_halo, hi_halo = hi_edge, lo_edge
    else:
        # neighbour (i-1) receives my low edge as its high halo
        hi_halo = lax.ppermute(lo_edge, axis_name, _ring_perms(n, forward=False))
        # neighbour (i+1) receives my high edge as its low halo
        lo_halo = lax.ppermute(hi_edge, axis_name, _ring_perms(n, forward=True))
    return jnp.concatenate([lo_halo, x, hi_halo], axis=grid_axis)


def halo_pad_2d(x: jnp.ndarray, width: int = 1,
                x_axis: str = "x", y_axis: str = "y",
                row_axis: int = -2, col_axis: int = -1) -> jnp.ndarray:
    """Periodic 2-D halo pad: rows then columns-of-the-padded-rows, so the
    diagonal (corner) cells arrive from the diagonal neighbour."""
    row_axis = row_axis % x.ndim
    col_axis = col_axis % x.ndim
    padded = halo_pad_axis(x, x_axis, row_axis, width)
    return halo_pad_axis(padded, y_axis, col_axis, width)
