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

Multi-body (scenes.obstacles.falling_cylinders): several bodies'
markers concatenate into ONE Lagrangian set with per-marker velocity
targets — forcing_window_markers then applies the combined
interpolation/spreading operator, coupling the bodies' force fields
within the multi-direct iterations, and returns per-marker force sums
for per-body momentum exchange.  barrier_forces adds the short-range
Glowinski collision model (pairwise + walls) to the rigid update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def peskin4j(r):
    """Peskin 4-point kernel, jnp (traceable) version of ops.ibm.peskin4.
    cites /root/reference/src/ibm.cpp:39-45

    The sqrt arguments are clamped with the double-where pattern (not
    jnp.maximum): each argument is strictly positive wherever its branch
    is SELECTED, but reverse-mode AD propagates d sqrt(0) = inf from
    unselected branches through jnp.where as NaN (the diff-FSI rollouts
    in tests/test_diff.py differentiate through this kernel)."""
    r = jnp.abs(r)
    in1 = 1.0 + 4.0 * r - 4.0 * r * r
    in2 = -7.0 + 12.0 * r - 4.0 * r * r
    s1 = jnp.sqrt(jnp.where(in1 > 0.0, in1, 1.0))
    s2 = jnp.sqrt(jnp.where(in2 > 0.0, in2, 1.0))
    inner = 0.125 * (3.0 - 2.0 * r + jnp.where(in1 > 0.0, s1, 0.0))
    outer = 0.125 * (5.0 - 2.0 * r - jnp.where(in2 > 0.0, s2, 0.0))
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
    F, fj = forcing_window_markers(u_win, rho_win, X, Y, ub, m_max)
    return F, fj.sum(axis=1)


def forcing_window_markers(u_win, rho_win, X, Y, ub, m_max: int = 5):
    """forcing_window, but returning the PER-MARKER Lagrangian force sum
    (2, M') over all forcing iterations instead of its total — the
    multi-body scenes mask-sum it per body (each body feels minus the
    sum over ITS markers).  X/Y may hold several bodies' markers
    concatenated; the multi-direct iterations then apply the combined
    interpolation/spreading operator, i.e. the bodies' force fields
    interact within the iteration (the physically-coupled extension of
    ibm.cpp:158-190's single-body loop)."""
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
        u_work, F_total, fj = carry
        fx_j = 2.0 * rho_j * (ub[0] - interp(u_work[0]))
        fy_j = 2.0 * rho_j * (ub[1] - interp(u_work[1]))
        F_n = jnp.stack([spread(fx_j), spread(fy_j)])
        u_work = u_work + 0.5 * F_n * inv_rho[None]
        return u_work, F_total + F_n, fj + jnp.stack([fx_j, fy_j])

    init = (u_win, jnp.zeros_like(u_win),
            jnp.zeros((2,) + X.shape[1:], dtype))
    _, F, fj = jax.lax.fori_loop(0, m_max - 1, body, init)
    return F, fj


def barrier_forces(cen, radii, H: int, W: int, zeta: float = 2.0,
                   eps: float = 50.0, eps_wall: float = None):
    """Short-range repulsive barrier forces between rigid circles and
    against the box walls — the Glowinski-style collision model standard
    for particulate DKT benchmarks (the reference has no moving bodies
    at all; this backs scenes.obstacles.falling_cylinders).

    For a pair at distance d: F = (c_ij/d) * max(0, R_i+R_j+zeta-d)^2/eps
    pushing the bodies apart once their gap is below the activation range
    ``zeta`` (cells); walls use the mirror-image form with ``eps_wall``
    (default eps/2, i.e. a stiffer wall).  Returns (B, 2).
    """
    cen = jnp.asarray(cen)
    dtype = cen.dtype
    radii = jnp.broadcast_to(jnp.asarray(radii, dtype), cen.shape[:1])
    if eps_wall is None:
        eps_wall = 0.5 * eps
    d_vec = cen[:, None, :] - cen[None, :, :]              # (B, B, 2)
    d2 = jnp.sum(d_vec * d_vec, axis=-1)
    B = cen.shape[0]
    d2 = d2 + jnp.eye(B, dtype=dtype)                      # keep diag finite
    d = jnp.sqrt(d2)
    overlap = jnp.maximum(radii[:, None] + radii[None, :] + zeta - d, 0.0)
    overlap = overlap * (1.0 - jnp.eye(B, dtype=dtype))
    F_pair = jnp.sum(d_vec / d[..., None] * (overlap * overlap)[..., None]
                     / eps, axis=1)
    # walls: halfway bounce-back walls sit at -0.5 and N-0.5
    lo = cen - (radii[:, None] + zeta)                     # gap to -0.5
    hi = jnp.asarray([H - 0.5, W - 0.5], dtype) - cen \
        - (radii[:, None] + zeta)
    bounds = jnp.asarray([-0.5, -0.5], dtype)
    F_wall = (jnp.maximum(bounds - lo, 0.0) ** 2
              - jnp.maximum(-hi, 0.0) ** 2) / eps_wall
    return F_pair + F_wall


def ellipse_markers(a: float, b: float, n_markers: int | None = None):
    """Host-side (numpy) marker OFFSETS on an ellipse with semi-axes
    (a, b) along (rows, cols), spaced uniformly in ARC LENGTH (uniform
    parameter spacing would cluster markers at the flat ends and break
    the ~1-cell Lagrangian resolution direct forcing needs).  Default
    n_markers = ceil(perimeter).  Returns (dx, dy) centroid offsets for
    the rotating-body scenes (orientation is applied by the rigid
    state, not baked in here)."""
    t = np.linspace(0.0, 2.0 * np.pi, 4096, endpoint=False)
    px = a * np.cos(t)
    py = b * np.sin(t)
    seg = np.hypot(np.diff(px, append=px[:1]), np.diff(py, append=py[:1]))
    s = np.concatenate([[0.0], np.cumsum(seg)])      # s[k] = arc to node k
    P = s[-1]
    if n_markers is None:
        n_markers = int(np.ceil(P))
    ti = np.interp(np.arange(n_markers) * P / n_markers, s,
                   np.concatenate([t, [2.0 * np.pi]]))
    return a * np.cos(ti), b * np.sin(ti)


def cayley_rotate(c, s, w):
    """Advance the orientation unit vector (c, s) by one step of angular
    velocity ``w`` using the Cayley map with t = w/2: exactly orthogonal
    for any w, angle = 2 atan(w/2) = w + O(w^3) — the shared discrete
    rotation update of the jnp scene AND the Mosaic kernel (no trig, so
    both paths evaluate bit-identical algebra)."""
    t = 0.5 * w
    t2 = t * t
    den = 1.0 / (1.0 + t2)
    return ((c * (1.0 - t2) - s * (2.0 * t)) * den,
            (s * (1.0 - t2) + c * (2.0 * t)) * den)


def circle_markers(center, radius: float, n_markers: int, dtype=None):
    """Marker ring for a cylinder at a (possibly traced) center (2,).
    Mirrors IBM.circle; n_markers ~ ceil(2 pi r) keeps ~1-cell spacing,
    the standard direct-forcing resolution."""
    center = jnp.asarray(center)
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, n_markers, endpoint=False,
                         dtype=dtype or center.dtype)
    return (center[0] + radius * jnp.cos(theta),
            center[1] + radius * jnp.sin(theta))
