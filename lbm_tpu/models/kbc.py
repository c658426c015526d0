"""Cascaded central-moment KBC (entropic-stabilised) collision — the
reference's "ULBM" family.

Re-implements ulbm::d2q9::kbc (/root/reference/src/ulbm.cpp:32-320) as pure
functions over the planes layout f (9, R, C).  The long per-direction
polynomials (delta_s, delta_h, product-form equilibrium) are transcribed
term-for-term — including the reference's `x2 + uy` terms in delta_h
directions 5-8 (ulbm.cpp:217-226), which look like a typo for `x2*uy` but
are kept for bit-parity with the reference's behaviour.

Structure of one collide (ulbm.cpp:91-126):
  1. central moments cT of f about u                       (:265-320)
  2. per-cell entropic gamma from delta_s/delta_h/1/feq    (:138-148)
  3. subtract equilibrium central moments (k = 0, 3, 8)    (:98-100)
  4. scale by S = diag(1,1,1, s2,s2,s2, g*s2,g*s2,g*s2)    (:46-49,:128-136)
  5. back-map with inv(N) (explicit algebra)               (:104-112)
  6. f_post = f - inv(M) @ icf                             (:114-125)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import lattice as lat
from ..ops import d2q9

CS2 = 1.0 / 3.0
CS4 = 1.0 / 9.0

# inv(M) of the cascaded basis.  cites /root/reference/src/ulbm.hpp:29-40
INV_M = np.array(
    [
        [1.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, 1.0],
        [0.0, 0.5, 0.0, 0.25, 0.25, 0.0, 0.0, -0.5, -0.5],
        [0.0, 0.0, 0.5, 0.25, -0.25, 0.0, -0.5, 0.0, -0.5],
        [0.0, -0.5, 0.0, 0.25, 0.25, 0.0, 0.0, 0.5, -0.5],
        [0.0, 0.0, -0.5, 0.25, -0.25, 0.0, 0.5, 0.0, -0.5],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.25, 0.25, 0.25, 0.25],
        [0.0, 0.0, 0.0, 0.0, 0.0, -0.25, 0.25, -0.25, 0.25],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.25, -0.25, -0.25, 0.25],
        [0.0, 0.0, 0.0, 0.0, 0.0, -0.25, -0.25, 0.25, 0.25],
    ]
)


def central_moments(f: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """(9, R, C) central moments (1, cx, cy, cx2+cy2, cx2-cy2, cxcy,
    cx2cy, cxcy2, cx2cy2) of f about u.  cites ulbm.cpp:265-320.

    Accumulated direction-by-direction (81 fused multiply-adds on planes)
    instead of materialising the (9 moments, 9 dirs, R, C) basis tensor —
    keeps peak memory at O(9 R C), which also lets models.kbc.collide run
    unchanged inside the fused Pallas kernel's VMEM budget."""
    cx = [int(v) for v in lat.C[0]]
    cy = [int(v) for v in lat.C[1]]
    acc = [None] * 9
    for k in range(9):
        cmx = cx[k] - u[0]
        cmy = cy[k] - u[1]
        cmx2 = cmx * cmx
        cmy2 = cmy * cmy
        terms = (
            f[k],
            f[k] * cmx,
            f[k] * cmy,
            f[k] * (cmx2 + cmy2),
            f[k] * (cmx2 - cmy2),
            f[k] * (cmx * cmy),
            f[k] * (cmx2 * cmy),
            f[k] * (cmx * cmy2),
            f[k] * (cmx2 * cmy2),
        )
        for m in range(9):
            acc[m] = terms[m] if acc[m] is None else acc[m] + terms[m]
    return jnp.stack(acc, axis=0)


def _poly_pack(u: jnp.ndarray, m0: jnp.ndarray):
    ux, uy = u[0], u[1]
    return ux, uy, ux * ux, uy * uy, m0


def delta_s(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray) -> jnp.ndarray:
    """Shear-part deviation polynomials.  cites ulbm.cpp:157-192"""
    ux, uy, x2, y2, m0 = _poly_pack(u, m0)
    T3, T4, T5 = cT[3], cT[4], cT[5]
    T3c = T3 - 2.0 * CS2 * m0
    rows = [
        -0.5 * T4 * (x2 - y2) + 4.0 * T5 * ux * uy - CS4 * m0
        - m0 * (x2 * y2 - x2 - y2 + 1.0) + T3c * (0.5 * x2 + 0.5 * y2 - 1.0),
        0.25 * T4 * (x2 - y2 + ux + 1.0) - T5 * uy * (2.0 * ux + 1.0)
        + 0.5 * CS4 * m0 + 0.5 * m0 * (x2 * y2 - x2 + y2 * ux - ux)
        - 0.25 * T3c * (x2 + y2 + ux - 1.0),
        -0.25 * T4 * (-x2 + y2 + uy + 1.0) - T5 * ux * (2.0 * uy + 1.0)
        + 0.5 * CS4 * m0 + 0.5 * m0 * (x2 * y2 - y2 + x2 * uy - uy)
        - 0.25 * T3c * (x2 + y2 + uy - 1.0),
        0.25 * T4 * (x2 - y2 - ux + 1.0) - T5 * uy * (2.0 * ux - 1.0)
        + 0.5 * CS4 * m0 + 0.5 * m0 * (x2 * y2 - x2 - y2 * ux + ux)
        - 0.25 * T3c * (x2 + y2 - ux - 1.0),
        0.25 * T4 * (x2 - y2 + uy - 1.0) - T5 * ux * (2.0 * uy - 1.0)
        + 0.5 * CS4 * m0 + 0.5 * m0 * (x2 * y2 - y2 - x2 * uy + uy)
        - 0.25 * T3c * (x2 + y2 - uy - 1.0),
        -0.125 * T4 * (x2 - y2 + ux - uy)
        + T5 * (ux * uy + 0.5 * ux + 0.5 * uy + 0.25) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 + x2 * uy + y2 * ux + ux * uy)
        + 0.125 * T3c * (x2 + y2 + ux + uy),
        0.125 * T4 * (-x2 + y2 + ux + uy)
        + T5 * (ux * uy + 0.5 * ux - 0.5 * uy - 0.25) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 + x2 * uy - y2 * ux - ux * uy)
        + 0.125 * T3c * (x2 + y2 - ux + uy),
        -0.125 * T4 * (x2 - y2 - ux + uy)
        + T5 * (ux * uy - 0.5 * ux - 0.5 * uy + 0.25) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 - x2 * uy - y2 * ux + ux * uy)
        + 0.125 * T3c * (x2 + y2 - ux - uy),
        -0.125 * T4 * (x2 - y2 + ux + uy)
        + T5 * (ux * uy - 0.5 * ux + 0.5 * uy - 0.25) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 - x2 * uy + y2 * ux - ux * uy)
        + 0.125 * T3c * (x2 + y2 + ux - uy),
    ]
    return jnp.stack(rows, axis=0)


def delta_h(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray) -> jnp.ndarray:
    """High-order-part deviation polynomials.  cites ulbm.cpp:194-228.
    NOTE: the `x2 + uy` (sum, not product) terms in directions 5-8 replicate
    the reference source exactly (ulbm.cpp:217-226)."""
    ux, uy, x2, y2, m0 = _poly_pack(u, m0)
    T6, T7, T8 = cT[6], cT[7], cT[8]
    rows = [
        2.0 * T6 * uy + 2.0 * T7 * ux + T8
        - 2.0 * CS2 * m0 * (0.5 * x2 + 0.5 * y2 - 1.0) - CS4 * m0
        - m0 * (x2 * y2 - x2 - y2 + 1.0),
        -T6 * uy - T7 * (ux + 0.5) - 0.5 * T8
        + 0.5 * CS2 * m0 * (x2 + y2 + ux - 1.0) + 0.5 * CS4 * m0
        + 0.5 * m0 * (x2 * y2 - x2 + y2 * ux - ux),
        -T6 * (uy + 0.5) - T7 * ux - 0.5 * T8
        + 0.5 * CS2 * m0 * (x2 + y2 + uy - 1.0) + 0.5 * CS4 * m0
        + 0.5 * m0 * (x2 * y2 + x2 * uy - y2 - uy),
        -T6 * uy - T7 * (ux - 0.5) - 0.5 * T8
        + 0.5 * CS2 * m0 * (x2 + y2 - ux - 1.0) + 0.5 * CS4 * m0
        + 0.5 * m0 * (x2 * y2 - x2 - y2 * ux + ux),
        -T6 * (uy - 0.5) - T7 * ux - 0.5 * T8
        + 0.5 * CS2 * m0 * (x2 + y2 - uy - 1.0) + 0.5 * CS4 * m0
        + 0.5 * m0 * (x2 * y2 - x2 * uy - y2 + uy),
        T6 * (0.5 * uy + 0.25) + T7 * (0.5 * ux + 0.25) + 0.25 * T8
        - 0.25 * CS2 * m0 * (x2 + y2 + ux + uy) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 + x2 + uy + y2 * ux + ux * uy),
        T6 * (0.5 * uy + 0.25) + T7 * (0.5 * ux - 0.25) + 0.25 * T8
        - 0.25 * CS2 * m0 * (x2 + y2 - ux + uy) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 + x2 + uy - y2 * ux - ux * uy),
        T6 * (0.5 * uy - 0.25) + T7 * (0.5 * ux - 0.25) + 0.25 * T8
        - 0.25 * CS2 * m0 * (x2 + y2 - ux - uy) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 - x2 + uy - y2 * ux + ux * uy),
        T6 * (0.5 * uy - 0.25) + T7 * (0.5 * ux + 0.25) + 0.25 * T8
        - 0.25 * CS2 * m0 * (x2 + y2 + ux - uy) - 0.25 * CS4 * m0
        - 0.25 * m0 * (x2 * y2 - x2 + uy + y2 * ux - ux * uy),
    ]
    return jnp.stack(rows, axis=0)


def _eq_factors(u: jnp.ndarray) -> jnp.ndarray:
    """Product-form equilibrium per unit density (9, R, C).
    cites ulbm.cpp:248-263 (and :230-246 for the reciprocal use)."""
    ux, uy = u[0], u[1]
    x2, y2 = ux * ux, uy * uy
    rows = [
        2.0 * CS2 * (0.5 * x2 + 0.5 * y2 - 1.0) + CS4 + x2 * y2 - x2 - y2 + 1.0,
        0.5 * (-CS2 * (x2 + y2 + ux - 1.0) - CS4 - x2 * y2 + x2 - y2 * ux + ux),
        0.5 * (-CS2 * (x2 + y2 + uy - 1.0) - CS4 - x2 * y2 - x2 * uy + y2 + uy),
        0.5 * (-CS2 * (x2 + y2 - ux - 1.0) - CS4 - x2 * y2 + x2 + y2 * ux - ux),
        0.5 * (-CS2 * (x2 + y2 - uy - 1.0) - CS4 - x2 * y2 + x2 * uy + y2 - uy),
        0.25 * (CS2 * (x2 + y2 + ux + uy) + CS4 + x2 * y2 + x2 * uy + y2 * ux + ux * uy),
        0.25 * (CS2 * (x2 + y2 - ux + uy) + CS4 + x2 * y2 + x2 * uy - y2 * ux - ux * uy),
        0.25 * (CS2 * (x2 + y2 - ux - uy) + CS4 + x2 * y2 - x2 * uy - y2 * ux + ux * uy),
        0.25 * (CS2 * (x2 + y2 + ux - uy) + CS4 + x2 * y2 - x2 * uy + y2 * ux - ux * uy),
    ]
    return jnp.stack(rows, axis=0)


def equilibrium(m0: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """f_eq = m0 * product-form factors.  cites ulbm.cpp:248-263"""
    return m0[None] * _eq_factors(u)


def gamma(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray, s2: float) -> jnp.ndarray:
    """Per-cell entropic stabiliser.  cites ulbm.cpp:138-148.

    Near equilibrium both delta_h and delta_s vanish and the reference's
    bare num/den is 0/0 — it survives only on f64 rounding noise
    (torch::set_default_dtype kDouble everywhere).  For the f32 TPU path
    the ratio is regularised: an epsilon denominator plus a clamp, which
    reduces to gamma = 1/s2 (plain relaxation of the h-moments at unit
    rate) in the indeterminate limit and is inert when delta_h is finite.
    """
    ds = delta_s(cT, u, m0)
    dh = delta_h(cT, u, m0)
    inv_feq = 1.0 / equilibrium(m0, u)
    is2 = 1.0 / s2
    num = (ds * dh * inv_feq).sum(axis=0)
    den = (dh * dh * inv_feq).sum(axis=0)
    eps = 1e-28 if num.dtype == jnp.float32 else 1e-200
    g = is2 - (1.0 - is2) * num / (den + eps)
    # Clamp to the linear-stability window of the h-moment relaxation:
    # gamma*s2 must lie in (0, 2).  Inert when the estimator is sane; at
    # omega -> 2 (e.g. ulbm_poiseuille's nu=1e-4 -> s2=1.9994) the noisy
    # near-equilibrium estimate otherwise leaves the window and blows the
    # f32 path up within ~100 steps.
    return jnp.clip(g, 0.0, 2.0 * is2)


def collide(f: jnp.ndarray, m0: jnp.ndarray, u: jnp.ndarray, s2: float) -> jnp.ndarray:
    """One KBC collision; returns the post-collision populations.
    cites ulbm.cpp:91-126"""
    cT = central_moments(f, u)
    g = gamma(cT, u, m0, s2)

    # subtract equilibrium central moments (only k = 0, 3, 8 nonzero)
    # (plane-wise, no scatter: keeps this lowerable inside Pallas kernels)
    cT = jnp.stack(
        [cT[0] - m0, cT[1], cT[2], cT[3] - 2.0 * CS2 * m0, cT[4],
         cT[5], cT[6], cT[7], cT[8] - CS4 * m0], axis=0)

    # relaxation-rate diagonal
    one = jnp.ones_like(m0)
    s = jnp.stack([one, one, one] + [s2 * one] * 3 + [g * s2] * 3, axis=0)
    T = cT * s

    # inv(N) back-map (explicit algebra, ulbm.cpp:104-112)
    ux, uy = u[0], u[1]
    x2, y2 = ux * ux, uy * uy
    icf = jnp.stack(
        [
            T[0],
            T[0] * ux + T[1],
            T[0] * uy + T[2],
            T[0] * (x2 + y2) + 2.0 * T[1] * ux + 2.0 * T[2] * uy + T[3],
            T[0] * (x2 - y2) + 2.0 * T[1] * ux - 2.0 * T[2] * uy + T[4],
            T[0] * ux * uy + T[1] * uy + T[2] * ux + T[5],
            T[0] * x2 * uy + 2.0 * T[1] * ux * uy + T[2] * x2
            + 0.5 * T[3] * uy + 0.5 * T[4] * uy + 2.0 * T[5] * ux + T[6],
            T[0] * ux * y2 + T[1] * y2 + 2.0 * T[2] * ux * uy
            + 0.5 * T[3] * ux - 0.5 * T[4] * ux + 2.0 * T[5] * uy + T[7],
            T[0] * x2 * y2 + 2.0 * T[1] * ux * y2 + 2.0 * T[2] * x2 * uy
            + 0.5 * T[3] * (x2 + y2) - 0.5 * T[4] * (x2 - y2)
            + 4.0 * T[5] * ux * uy + 2.0 * T[6] * uy + 2.0 * T[7] * ux + T[8],
        ],
        axis=0,
    )

    # inv(M) applied as an unrolled sparse sum (the reference also unrolls
    # it, ulbm.cpp:114-123).  Scalar coefficients keep this valid inside
    # Pallas kernels (no captured array constants) and skip the zeros.
    rows = []
    for m in range(9):
        acc = None
        for j in range(9):
            w = float(INV_M[m, j])
            if w == 0.0:
                continue
            term = icf[j] if w == 1.0 else w * icf[j]
            acc = term if acc is None else acc + term
        rows.append(f[m] - acc)
    return jnp.stack(rows, axis=0)


@dataclass(frozen=True)
class KBCModel:
    """Driver-level KBC state machine: collide -> advect -> recompute
    macroscopics, mirroring the ulbm_* drivers' loops."""

    s2: float  # shear relaxation rate (the drivers' "omega")

    def macroscopics(self, f: jnp.ndarray):
        m0 = d2q9.calc_rho(f)
        m1 = d2q9.calc_momentum(f) / m0
        return m0, m1

    def collide(self, f, m0, u):
        return collide(f, m0, u, self.s2)

    def equilibrium(self, m0, u):
        return equilibrium(m0, u)
