"""D3Q19 lattice + reference operations — BEYOND THE REFERENCE.

The reference is strictly 2-D (D2Q9 everywhere, src/solver.cpp:12-21);
this module extends the framework to 3-D with the standard D3Q19
lattice: rest + 6 axis + 12 face-diagonal velocities, weights
[1/3, 1/18 x6, 1/36 x12], cs^2 = 1/3.  The API mirrors ops.d2q9 — pure
jnp whole-grid operations over (19, X, Y, Z) population stacks, the
oracle any fused 3-D kernel is tested against.

Conventions: grid axes (0, 1, 2) = (x, y, z); opposite pairs follow
OPP3; populations are planes with k outermost like the 2-D layout.
Validation (tests/test_d3q19.py): exact mass/momentum conservation,
the z-invariant 2-D Taylor-Green embedding's ANALYTIC decay (an exact
Navier-Stokes solution in 3-D), and the body-forced plane Poiseuille
profile between halfway walls at the 2-D gate's accuracy class.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.xmath import tdot

Q = 19

# velocity set: rest, 6 axis, 12 face diagonals (xy, xz, yz)
C3 = np.array([
    [0, 0, 0],
    [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    [1, 1, 0], [-1, -1, 0], [1, -1, 0], [-1, 1, 0],
    [1, 0, 1], [-1, 0, -1], [1, 0, -1], [-1, 0, 1],
    [0, 1, 1], [0, -1, -1], [0, 1, -1], [0, -1, 1],
], dtype=np.int64).T                                  # (3, 19)

W3 = np.array([1.0 / 3.0] + [1.0 / 18.0] * 6 + [1.0 / 36.0] * 12)

# opposite directions: c_OPP3[k] = -c_k
OPP3 = np.array([0, 2, 1, 4, 3, 6, 5,
                 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 18, 17],
                dtype=np.int64)

ICS2 = 3.0
ICS4 = 9.0


def calc_rho(f: jnp.ndarray) -> jnp.ndarray:
    return f.sum(axis=0)


def calc_u(f: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(C3, f.dtype)
    return tdot(c, f, axes=([1], [0])) / rho[None]


def equilibrium(u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Standard second-order D3Q19 equilibrium (solver.cpp:51-62 form
    generalised to 3-D)."""
    c = jnp.asarray(C3, u.dtype)
    w = jnp.asarray(W3, u.dtype)[:, None, None, None]
    cu = tdot(c.T, u, axes=([1], [0]))
    uu = (u * u).sum(axis=0)
    return rho * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu) * w


def bgk_collision(f: jnp.ndarray, f_eq: jnp.ndarray,
                  omega) -> jnp.ndarray:
    return (1.0 - omega) * f + omega * f_eq


def guo_source(u: jnp.ndarray, force: jnp.ndarray, omega) -> jnp.ndarray:
    """Guo body-force source (standard coefficients), (19, X, Y, Z)."""
    c = jnp.asarray(C3, u.dtype)
    w = jnp.asarray(W3, u.dtype)[:, None, None, None]
    cu = tdot(c.T, u, axes=([1], [0]))
    cF = tdot(c.T, force, axes=([1], [0]))
    uF = (u * force).sum(axis=0)
    return (1.0 - 0.5 * omega) * ((ICS2 + ICS4 * cu) * cF
                                  - ICS2 * uF) * w


def stream(f: jnp.ndarray) -> jnp.ndarray:
    """Fully periodic push streaming (the 3-D analog of the reference's
    advect, src/solver.cpp:76-131)."""
    out = []
    for k in range(Q):
        out.append(jnp.roll(f[k], (int(C3[0, k]), int(C3[1, k]),
                                   int(C3[2, k])), axis=(0, 1, 2)))
    return jnp.stack(out)


# axis-0 wall helpers: outgoing directions through the x = -1/2 wall
# (cx < 0) and the x = X-1/2 wall (cx > 0)
X_OUT_LO = tuple(int(k) for k in range(Q) if C3[0, k] < 0)
X_OUT_HI = tuple(int(k) for k in range(Q) if C3[0, k] > 0)


def bounce_back_x(f_adve: jnp.ndarray, f_coll: jnp.ndarray,
                  side: str) -> jnp.ndarray:
    """Halfway no-slip on the x = -1/2 ('lo') or x = X-1/2 ('hi') plane
    (the 3-D analog of bc.bounce_back's row walls)."""
    idx = 0 if side == "lo" else -1
    ks = X_OUT_LO if side == "lo" else X_OUT_HI
    for k in ks:
        f_adve = f_adve.at[int(OPP3[k]), idx].set(f_coll[k, idx])
    return f_adve


def wall_ks(axis: int, side: str):
    """Outgoing directions through the ``axis`` = -1/2 ('lo') or
    N-1/2 ('hi') face."""
    sign = -1 if side == "lo" else 1
    return tuple(int(k) for k in range(Q) if int(C3[axis, k]) * sign > 0)


def bounce_back(f_adve: jnp.ndarray, f_coll: jnp.ndarray, axis: int,
                side: str, u_wall=None, rho_w: float = 1.0) -> jnp.ndarray:
    """Halfway bounce-back on any grid face, optionally moving.

    Static: f_adve[opp(k), wall] = f_coll[k, wall] for every outgoing k
    (generalises bounce_back_x to all three axes).  With ``u_wall``
    (a 3-tuple, the tangential lid velocity) the standard moving-wall
    momentum correction applies:

        f_opp = f_coll - 2 w_k rho_w (c_k . u_w) / cs^2
              = f_coll - 6 w_k rho_w (c_k . u_w)

    (the 3-D analog of the 2-D ABB lid, bc.anti_bounce_back with the
    halfway-wall convention; rho_w = 1 is the standard constant-density
    approximation)."""
    idx = 0 if side == "lo" else -1
    for k in wall_ks(axis, side):
        sl = [int(OPP3[k]), slice(None), slice(None), slice(None)]
        sl[1 + axis] = idx
        src = [k, slice(None), slice(None), slice(None)]
        src[1 + axis] = idx
        val = f_coll[tuple(src)]
        if u_wall is not None:
            cu = sum(float(C3[a, k]) * float(u_wall[a]) for a in range(3))
            if cu:
                val = val - (6.0 * float(W3[k]) * rho_w * cu)
        f_adve = f_adve.at[tuple(sl)].set(val)
    return f_adve
