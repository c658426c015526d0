"""Core D2Q9 operators in pure jnp (the oracle the Pallas kernels must match).

Layout convention of this framework: populations are stored as planes,
``f.shape == (9, R, C)`` with the population index OUTERMOST.  The last two
dims map directly onto the TPU sublane x lane tiles; per-direction shifts
(streaming) become whole-plane rolls.  The reference stores {R,C,9}
(src/domain.cpp:7-11); the two layouts are a transpose of each other.

Macroscopic fields: rho (R, C); u (2, R, C) with component 0 = x/rows.
"""

from __future__ import annotations

from ..utils.xmath import tdot

import jax.numpy as jnp

from ..core import lattice as lat


def _const(a, dtype):
    return jnp.asarray(a, dtype=dtype)


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------

def calc_rho(f: jnp.ndarray) -> jnp.ndarray:
    """Zeroth moment.  cites /root/reference/src/solver.cpp:23-26"""
    return f.sum(axis=0)


def calc_momentum(f: jnp.ndarray) -> jnp.ndarray:
    """First moment (f . c^T), shape (2, R, C).
    cites /root/reference/src/solver.cpp:28-31 (calc_incomp_u)"""
    c = _const(lat.C, f.dtype)
    return tdot(c, f, axes=([1], [0]))


def calc_u(f: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Velocity = first moment / density.  cites /root/reference/src/solver.cpp:34-37"""
    return calc_momentum(f) / rho


# ---------------------------------------------------------------------------
# Equilibria
# ---------------------------------------------------------------------------

def _cu(u: jnp.ndarray) -> jnp.ndarray:
    """(9, R, C) array of c_k . u per direction."""
    c = _const(lat.C, u.dtype)
    return tdot(c.T, u, axes=([1], [0]))


def equilibrium(u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Standard second-order equilibrium.
    cites /root/reference/src/solver.cpp:51-62"""
    w = _const(lat.W, u.dtype)[:, None, None]
    cu = _cu(u)
    uu = (u * u).sum(axis=0)
    return rho * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * uu) * w


def incomp_equilibrium(u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Incompressible (linearised) equilibrium.
    cites /root/reference/src/solver.cpp:39-49"""
    w = _const(lat.W, u.dtype)[:, None, None]
    return (rho + 3.0 * _cu(u)) * w


# ---------------------------------------------------------------------------
# Collision
# ---------------------------------------------------------------------------

def bgk_collision(f: jnp.ndarray, f_eq: jnp.ndarray, omega) -> jnp.ndarray:
    """BGK relaxation.  cites /root/reference/src/solver.cpp:65-74"""
    return (1.0 - omega) * f + omega * f_eq


def guo_source(u: jnp.ndarray, force: jnp.ndarray, omega,
               ics2: float = lat.ICS2, ics4: float = lat.ICS4) -> jnp.ndarray:
    """Guo body-force source term S, shape (9, R, C).

    S_k = (1 - omega/2) * ((ics2 + ics4 (u.c_k)) F.c_k - ics2 (u.F)) * W_k

    With the default ics2=3, ics4=9 this is the standard Guo forcing, as the
    multiphase drivers use (mrtcg_rayleigh_taylor.cpp:405-406,460-462,
    decompose_domain_loop.cpp:67-68).  The gravity and cylinder drivers
    plug in ics2=1/3, ics4=1/9 instead — a 9x weaker source
    (gravity_test.cpp:81-82,154; cylinder_test.cpp:66-67,117) — pass those
    values to reproduce them exactly.

    ``force`` broadcasts against (2, R, C); ``omega`` may be scalar or a
    per-cell (R, C) field (the multiphase drivers pass s_nu).
    """
    cu = _cu(u)
    cF = _cu(force) if force.ndim == u.ndim else _cu(force[:, None, None])
    uF = (u * force).sum(axis=0) if force.ndim == u.ndim else tdot(force, u, axes=([0], [0]))
    w = _const(lat.W, u.dtype)[:, None, None]
    return (1.0 - 0.5 * omega) * ((ics2 + ics4 * cu) * cF - ics2 * uF) * w


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------

def stream(f: jnp.ndarray) -> jnp.ndarray:
    """Fully periodic push-style streaming: g[r+cx, c+cy, k] = f[r, c, k].

    Exactly reproduces solver::advect's 9-direction slice copies with
    wrap-around (/root/reference/src/solver.cpp:76-131) as one roll per
    direction; boundary conditions later *overwrite* the wrongly wrapped
    edge populations (the reference's ordering, see e.g.
    test/horizontal_poiseuille_test.cpp:143-152).
    """
    planes = [
        jnp.roll(f[k], shift=(int(lat.C[0, k]), int(lat.C[1, k])), axis=(0, 1))
        for k in range(lat.Q)
    ]
    return jnp.stack(planes, axis=0)


# Precomputed python-int shift table for kernel writers.
SHIFTS = tuple((int(lat.C[0, k]), int(lat.C[1, k])) for k in range(lat.Q))


def abb_coefficient(u_w: jnp.ndarray) -> jnp.ndarray:
    """Anti-bounce-back wall coefficient (2 + 9 (u_w.c)^2 - 3 u_w.u_w) W.

    ``u_w`` has shape (2,) or (2, N) for a per-node wall velocity; returns
    (9,) or (9, N).  cites /root/reference/test/free_stream_test.cpp:106."""
    c = _const(lat.C, u_w.dtype)
    cu = tdot(c.T, u_w, axes=([1], [0]))
    uu = (u_w * u_w).sum(axis=0)
    w = _const(lat.W, u_w.dtype)
    w = w.reshape((lat.Q,) + (1,) * (cu.ndim - 1))
    return (2.0 + 9.0 * cu * cu - 3.0 * uu) * w
