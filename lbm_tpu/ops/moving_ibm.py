"""Moving-marker immersed boundary: dense per-step Peskin factors.

The static IBM (ops/ibm.py) precomputes its gather/spread operators on
the host because the reference's markers never move
(/root/reference/src/ibm.cpp:15-191 — the ctor builds the weight tables
once and `ibm::f` only replays them).  Moving bodies need the weights
rebuilt from the marker positions every step INSIDE jit.  The Peskin
4-point kernel vanishes for |r| >= 2, so instead of scattering 4-point
stencils (a serial lowering on TPU) the factors are evaluated densely
over the window axes:

    X[i, j] = phi(rows[i] - x_j)        (rw, M)
    Y[i, j] = phi(cols[i] - y_j)        (cw, M)

which equals the static separable operator exactly (the kernel is zero
at every node outside the 4-point support) and costs two tiny
elementwise evaluations.  Interpolation and spreading stay the same two
MXU matmuls as kernels/ibm_pallas.py:

    interp(g) = colsum(X * (g @ Y))     -> (M,) marker values
    spread(s) = (X * s) @ Y.T           -> (rw, cw)

Multi-direct forcing targets the marker velocity U_b (direct forcing a
la Uhlmann; the reference's static case is U_b = 0, ibm.cpp:169-183):

    f_j = 2 rho_j (U_bj - u_j)

The per-marker force sum over all forcing iterations is returned as
well: by the Peskin partition of unity it equals the total momentum the
forcing adds to the fluid per step, so the hydrodynamic reaction on the
body is its negation — the momentum-exchange closure the rigid-body
update in scenes.obstacles.falling_cylinder integrates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def peskin4j(r):
    """Peskin 4-point kernel, jnp (traceable) version of ops.ibm.peskin4.
    cites /root/reference/src/ibm.cpp:39-45"""
    r = jnp.abs(r)
    inner = 0.125 * (3.0 - 2.0 * r
                     + jnp.sqrt(jnp.maximum(1.0 + 4.0 * r - 4.0 * r * r,
                                            0.0)))
    outer = 0.125 * (5.0 - 2.0 * r
                     - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * r - 4.0 * r * r,
                                            0.0)))
    zero = jnp.zeros_like(r)
    return jnp.where(r <= 1.0, inner, jnp.where(r <= 2.0, outer, zero))


def window_factors(xs, ys, ra0, ca0, rw: int, cw: int, m_pad: int = 0):
    """Dense separable Peskin factors for markers at absolute grid
    coordinates (xs, ys) on the window [ra0, ra0+rw) x [ca0, ca0+cw).

    ra0/ca0 may be traced (dynamic window following the body).  Returns
    X (rw, M') and Y (cw, M') with M' = max(M, m_pad); padding columns
    are zero so they contribute nothing to either matmul.  Matches
    IBM.window_operators exactly for the same markers/window."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    dtype = xs.dtype
    rows = ra0 + jnp.arange(rw, dtype=dtype)
    cols = ca0 + jnp.arange(cw, dtype=dtype)
    X = peskin4j(rows[:, None] - xs[None, :])
    Y = peskin4j(cols[:, None] - ys[None, :])
    M = xs.shape[0]
    if m_pad > M:
        X = jnp.pad(X, ((0, 0), (0, m_pad - M)))
        Y = jnp.pad(Y, ((0, 0), (0, m_pad - M)))
    return X, Y


def forcing_window(u_win, rho_win, X, Y, ub, m_max: int = 5):
    """Multi-direct-forcing over a window with a marker-velocity target.

    Args:
      u_win: (2, rw, cw) fluid velocity on the window.
      rho_win: (rw, cw) density on the window.
      X, Y: dense factors from window_factors (pad columns allowed —
        their interpolated rho is 0 so they spread zero force).
      ub: (2,) rigid-body velocity or (2, M') per-marker velocities.
      m_max: iterations + 1, the reference's convention (ibm.cpp:59-66).

    Returns (F_win, f_sum): the Eulerian force density (2, rw, cw) and
    the summed Lagrangian force (2,) — the momentum the forcing adds to
    the fluid; the body feels -f_sum.  Same iteration structure as
    ops.ibm.force_density_roi / ibm.cpp:158-190 with the U_b target."""
    dtype = u_win.dtype
    X = X.astype(dtype)
    Y = Y.astype(dtype)
    if jnp.ndim(ub) == 1:
        ub = jnp.asarray(ub, dtype)[:, None]

    def interp(g):
        V = jnp.matmul(g, Y, precision=HIGHEST)          # (rw, M')
        return jnp.sum(V * X, axis=0)                    # (M',)

    def spread(s):
        A = X * s[None, :]                               # (rw, M')
        return jnp.matmul(A, Y.T, precision=HIGHEST)     # (rw, cw)

    rho_j = interp(rho_win)
    inv_rho = 1.0 / rho_win

    def body(_, carry):
        u_work, F_total, f_sum = carry
        fx_j = 2.0 * rho_j * (ub[0] - interp(u_work[0]))
        fy_j = 2.0 * rho_j * (ub[1] - interp(u_work[1]))
        F_n = jnp.stack([spread(fx_j), spread(fy_j)])
        u_work = u_work + 0.5 * F_n * inv_rho[None]
        f_sum = f_sum + jnp.stack([fx_j.sum(), fy_j.sum()])
        return u_work, F_total + F_n, f_sum

    init = (u_win, jnp.zeros_like(u_win), jnp.zeros((2,), dtype))
    _, F, f_sum = jax.lax.fori_loop(0, m_max - 1, body, init)
    return F, f_sum


def circle_markers(center, radius: float, n_markers: int, dtype=None):
    """Marker ring for a cylinder at a (possibly traced) center (2,).
    Mirrors IBM.circle; n_markers ~ ceil(2 pi r) keeps ~1-cell spacing,
    the standard direct-forcing resolution."""
    center = jnp.asarray(center)
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, n_markers, endpoint=False,
                         dtype=dtype or center.dtype)
    return (center[0] + radius * jnp.cos(theta),
            center[1] + radius * jnp.sin(theta))
