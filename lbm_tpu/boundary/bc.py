"""Boundary-condition library.

In the reference every BC exists only as inline slice assignments inside the
18 driver files (see SURVEY.md section 2.2).  Here they are first-class,
composable edge rules.  All of them follow the reference's ordering contract:

    collide -> (pressure BC edits f_coll) -> fully periodic stream
            -> wall rules overwrite f_adve from post-collision f_coll

Sides name the wall line of the grid: 'row0' (r=0), 'rowN' (r=-1),
'col0' (c=0), 'colN' (c=-1).  ``lane`` restricts the along-wall extent
(a python slice), matching e.g. Slice(1,-1) inlets in the drivers.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..core import lattice as lat
from ..ops import d2q9

# Outgoing (wall-ward) directions per side.
SIDE_OUT = {
    "row0": (3, 6, 7),  # cx < 0
    "rowN": (1, 5, 8),  # cx > 0
    "col0": (4, 7, 8),  # cy < 0
    "colN": (2, 5, 6),  # cy > 0
}

_SIDE_INDEX = {"row0": 0, "rowN": -1, "col0": 0, "colN": -1}
_SIDE_AXIS = {"row0": 0, "rowN": 0, "col0": 1, "colN": 1}

# All eight moving directions (ABB walls rewrite every one of them,
# cites /root/reference/test/free_stream_test.cpp:107-114).
_MOVING = (1, 2, 3, 4, 5, 6, 7, 8)


def _line(f_k: jnp.ndarray, side: str, lane: slice) -> jnp.ndarray:
    if _SIDE_AXIS[side] == 0:
        return f_k[_SIDE_INDEX[side], lane]
    return f_k[lane, _SIDE_INDEX[side]]


def _write_grid_line(arr: jnp.ndarray, axis: int, idx: int,
                     val: jnp.ndarray, lane: slice = slice(None)) -> jnp.ndarray:
    """Overwrite one wall line of (P, R, C) ``arr`` with ``val`` (P, L)
    via an element-wise masked select.

    Line writes used to be static-index dynamic-update-slices
    (``arr.at[:, idx, lane].set``), but XLA's SPMD partitioner mis-lowers
    a single-line update on a sharded grid axis when composed with the
    streaming rolls — observed under GSPMD row sharding: the rowN write
    landed on EVERY shard's local last row (tests/test_parallel.py::
    test_auto_gspmd_mrtcg_equals_single_device caught it).  Masked
    selects are partitioned trivially and fuse to the same cost under
    jit on a single device."""
    P_, R, C = arr.shape
    n_wall = R if axis == 0 else C
    n_along = C if axis == 0 else R
    start, stop, step = lane.indices(n_along)
    assert step == 1, "lane slices must be contiguous"
    pos = idx % n_wall
    if start != 0 or stop != n_along:
        val = jnp.pad(val, ((0, 0), (start, n_along - stop)))
    wall_i = jax.lax.broadcasted_iota(jnp.int32, (R, C), axis)
    along_i = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1 - axis)
    mask = wall_i == pos
    if start != 0 or stop != n_along:
        mask = mask & (along_i >= start) & (along_i < stop)
    full = val[:, None, :] if axis == 0 else val[:, :, None]
    return jnp.where(mask[None], jnp.broadcast_to(full, arr.shape), arr)


def _set_line(f: jnp.ndarray, k: int, side: str, lane: slice, values) -> jnp.ndarray:
    values = jnp.broadcast_to(
        values, _line(f[k], side, lane).shape)
    plane = _write_grid_line(f[k][None], _SIDE_AXIS[side],
                             _SIDE_INDEX[side], values[None], lane)[0]
    return f.at[k].set(plane)


def bounce_back(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    side: str,
    lane: slice = slice(None),
) -> jnp.ndarray:
    """Halfway no-slip: f_adve[wall, opp(k)] = f_coll[wall, k] for the
    outgoing k.  cites /root/reference/test/horizontal_poiseuille_test.cpp:146-152"""
    for k in SIDE_OUT[side]:
        f_adve = _set_line(f_adve, int(lat.OPP[k]), side, lane, _line(f_coll[k], side, lane))
    return f_adve


def specular(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    side: str,
    lane: slice = slice(None),
) -> jnp.ndarray:
    """Free-slip: mirror only the wall-normal velocity component.
    cites /root/reference/test/specular_boundary_test.cpp:122-128"""
    spec = lat.SPEC_X if _SIDE_AXIS[side] == 0 else lat.SPEC_Y
    for k in SIDE_OUT[side]:
        f_adve = _set_line(f_adve, int(spec[k]), side, lane, _line(f_coll[k], side, lane))
    return f_adve


def anti_bounce_back(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    side: str,
    u_w: jnp.ndarray,
    lane: slice = slice(None),
    scale: float = 1.0,
) -> jnp.ndarray:
    """Moving-wall velocity BC: for every moving direction k,
    f_adve[wall, opp(k)] = -f_coll[wall, k] + scale*(2 + 9(u_w.c_k)^2 - 3 u_w.u_w) E_k.

    ``u_w`` is (2,) or (2, N) wall velocity along the lane.
    cites /root/reference/test/free_stream_test.cpp:104-125"""
    coeff = scale * d2q9.abb_coefficient(u_w)
    for k in _MOVING:
        ck = coeff[k] if coeff.ndim == 1 else coeff[k][lane]
        f_adve = _set_line(
            f_adve, int(lat.OPP[k]), side, lane, -_line(f_coll[k], side, lane) + ck
        )
    return f_adve


def ade_dirichlet(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    side: str,
    g_eq_wall: jnp.ndarray,
    lane: slice = slice(None),
    incoming_only: bool = False,
) -> jnp.ndarray:
    """ADE Dirichlet (concentration) inlet via anti-bounce-back with twice the
    wall equilibrium: g_adve[opp(k)] = -g_coll[k] + 2 g_eq_wall[k].

    ``g_eq_wall`` is (9, N) along the lane.
    cites /root/reference/test/rectangle_sedimentation_test.cpp:204-218

    The default overwrites all 8 moving directions, faithful to the
    reference driver — which pins the concentration AT the boundary
    node.  ``incoming_only=True`` repairs only the 3 populations
    entering through the wall (the halfway anti-bounce-back scheme):
    the Dirichlet value then sits on the halfway wall at -1/2 / N-1/2,
    consistent with bounce_back's no-slip plane (scenes.thermal)."""
    for k in (SIDE_OUT[side] if incoming_only else _MOVING):
        f_adve = _set_line(
            f_adve,
            int(lat.OPP[k]),
            side,
            lane,
            -_line(f_coll[k], side, lane) + 2.0 * g_eq_wall[k][lane],
        )
    return f_adve


def pressure_periodic(
    f_coll: jnp.ndarray,
    f_equi: jnp.ndarray,
    u: jnp.ndarray,
    rho_inlet: float,
    rho_outlet: float,
    axis: int = 0,
    eq_fn: Callable = d2q9.incomp_equilibrium,
) -> jnp.ndarray:
    """Generalised periodic BC with a pressure drop (virtual inlet/outlet).

    f_coll[virtual_in]  = eq(u[outlet], rho_in)  + (f_coll - f_equi)[outlet]
    f_coll[virtual_out] = eq(u[inlet],  rho_out) + (f_coll - f_equi)[inlet]

    with virtual_in = line 0, inlet = line 1, outlet = line -2,
    virtual_out = line -1 along ``axis``.
    cites /root/reference/test/horizontal_poiseuille_test.cpp:25-45 (axis 0,
    incompressible), test/vertical_poiseuille_test.cpp:24-44 (compressible).
    """

    def take(arr, idx):
        # keepdims single-line slice along the grid axis (arrays carry a
        # leading component axis: f (9,R,C), u (2,R,C))
        sl = [slice(None)] * arr.ndim
        ax = 1 + axis
        sl[ax] = slice(idx, idx + 1) if idx >= 0 else slice(idx, (idx + 1) or None)
        return arr[tuple(sl)]

    def put(arr, idx, val):
        return _write_grid_line(arr, axis, idx, jnp.squeeze(val, axis=1 + axis))

    ones = jnp.ones_like(take(f_coll, 0)[0])  # (1,C) or (R,1)
    eq_in = eq_fn(take(u, -2), rho_inlet * ones)
    f_coll_new = put(f_coll, 0, eq_in + take(f_coll, -2) - take(f_equi, -2))
    eq_out = eq_fn(take(u, 1), rho_outlet * ones)
    f_coll_new = put(f_coll_new, -1, eq_out + take(f_coll, 1) - take(f_equi, 1))
    return f_coll_new


def zero_gradient(
    f_coll: jnp.ndarray,
    side: str,
    lane: slice = slice(None),
) -> jnp.ndarray:
    """Outflow: copy all post-collision populations from the adjacent
    interior line onto the wall line *before* streaming.
    cites /root/reference/test/rectangle_sedimentation_test.cpp:134-141"""
    inner = 1 if _SIDE_INDEX[side] == 0 else -2
    axis = _SIDE_AXIS[side]
    vals = f_coll[:, inner, lane] if axis == 0 else f_coll[:, lane, inner]
    return _write_grid_line(f_coll, axis, _SIDE_INDEX[side], vals, lane)


def periodic_edge(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    side: str,
    lane: slice = slice(None),
    diagonal_shift: bool = True,
) -> jnp.ndarray:
    """Repair the wall line of a periodic edge from the opposite wall's
    post-collision populations (used when other BCs clobbered what the fully
    periodic stream wrote, or to impose the reference's exact corner rules).

    With ``diagonal_shift`` the diagonals are offset by one cell along the
    wall (true periodic streaming, cites
    /root/reference/test/ulbm_double_shear_flow.cpp:122-138); without it the
    diagonals are copied straight across, reproducing the multiphase drivers'
    variant (cites /root/reference/test/mrtcg_rayleigh_taylor.cpp:517-523).
    """
    incoming_side = side
    src_index = 0 if _SIDE_INDEX[side] == -1 else -1
    axis = _SIDE_AXIS[side]
    # populations entering through this wall = outgoing dirs of the opposite wall
    opposite = {"row0": "rowN", "rowN": "row0", "col0": "colN", "colN": "col0"}[side]
    for k in SIDE_OUT[opposite]:
        # along-wall displacement of direction k
        shift = int(lat.C[1 - axis, k]) if diagonal_shift else 0
        if axis == 0:
            src = f_coll[k, src_index, lane]
        else:
            src = f_coll[k, lane, src_index]
        val = jnp.roll(src, shift) if shift else src
        f_adve = _set_line(f_adve, k, side, lane, val)
    return f_adve


def obstacle_bounce_back(
    f_adve: jnp.ndarray,
    f_coll: jnp.ndarray,
    assignments: Sequence[tuple[int, tuple, int, float]],
) -> jnp.ndarray:
    """Interior-wall bounce-back expressed as raw (dst_dir, index, src_dir,
    sign) assignments: f_adve[dst, idx] = sign * f_coll[src, idx].

    Used for the sedimentation rectangle walls, which the reference writes as
    arbitrary slice overwrites (test/rectangle_sedimentation_test.cpp:184-196);
    a mask-free, fully static formulation that XLA turns into cheap
    dynamic-update-slices.
    """
    for dst, idx, src, sign in assignments:
        f_adve = f_adve.at[(dst,) + tuple(idx)].set(sign * f_coll[(src,) + tuple(idx)])
    return f_adve
