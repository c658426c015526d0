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

    Evaluated via raw moments + the binomial shift theorem instead of the
    reference's direct (c-u)-product accumulation: the nine raw moments
    m_pq = sum_k f_k cx^p cy^q are plain signed sums of the planes (cx,
    cy in {0, +-1} — no multiplies), and the central moments follow by
    shifting about u.  Mathematically identical, ~40% fewer vector ops,
    and still O(9 R C) peak memory so it runs unchanged inside the fused
    Pallas kernel's VMEM budget."""
    ux, uy = u[0], u[1]
    f0, f1, f2, f3, f4, f5, f6, f7, f8 = (f[k] for k in range(9))
    diag = f5 + f6 + f7 + f8
    m00 = f0 + f1 + f2 + f3 + f4 + diag
    m10 = f1 - f3 + f5 - f6 - f7 + f8
    m01 = f2 - f4 + f5 + f6 - f7 - f8
    m20 = f1 + f3 + diag
    m02 = f2 + f4 + diag
    m11 = f5 - f6 + f7 - f8
    m21 = f5 + f6 - f7 - f8
    m12 = f5 - f6 - f7 + f8
    m22 = diag
    x2, y2, xy = ux * ux, uy * uy, ux * uy
    k10 = m10 - ux * m00
    k01 = m01 - uy * m00
    mu20 = m20 - 2.0 * ux * m10 + x2 * m00
    mu02 = m02 - 2.0 * uy * m01 + y2 * m00
    mu11 = m11 - ux * m01 - uy * m10 + xy * m00
    mu21 = m21 - uy * m20 - 2.0 * ux * m11 + 2.0 * xy * m10 \
        + x2 * m01 - x2 * uy * m00
    mu12 = m12 - ux * m02 - 2.0 * uy * m11 + 2.0 * xy * m01 \
        + y2 * m10 - y2 * ux * m00
    mu22 = m22 - 2.0 * uy * m21 + y2 * m20 - 2.0 * ux * m12 \
        + 4.0 * xy * m11 - 2.0 * ux * y2 * m10 \
        + x2 * m02 - 2.0 * x2 * uy * m01 + x2 * y2 * m00
    return jnp.stack(
        [m00, k10, k01, mu20 + mu02, mu20 - mu02, mu11, mu21, mu12, mu22],
        axis=0)


def _poly_pack(u: jnp.ndarray, m0: jnp.ndarray):
    ux, uy = u[0], u[1]
    return ux, uy, ux * ux, uy * uy, m0


def delta_s(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray,
            feq: jnp.ndarray | None = None) -> jnp.ndarray:
    """Shear-part deviation polynomials.  cites ulbm.cpp:157-192.

    Algebraically refactored from the reference's term-for-term form: every
    direction's m0-polynomial (including the T3c = T3 - 2*cs2*m0 shift)
    collects into exactly -feq[k], so delta_s = S_k(T3, T4, T5; u) - feq
    with S_k a short bilinear form.  Pass the product-form ``feq``
    (equilibrium(m0, u)) to share it with delta_h and 1/feq; it is
    recomputed when omitted.  Verified identical to the transcription to
    f64 round-off."""
    ux, uy, x2, y2, m0 = _poly_pack(u, m0)
    if feq is None:
        feq = equilibrium(m0, u)
    T3, T4, T5 = cT[3], cT[4], cT[5]
    xy = ux * uy
    r2 = x2 + y2
    d2 = x2 - y2
    # Paired-direction evaluation: with the bilinear core
    # P = T3*r2 - T4*d2, each opposite pair's rows are (even +/- odd) -
    # feq, and the four even parts are +/-0.25 P / +/-0.125 P plus short
    # corrections — about half the vector ops of the row-by-row form
    # (verified identical to it, and hence to the transcription, to f64
    # round-off).
    P = T3 * r2 - T4 * d2
    T5xy = T5 * xy
    sd = ux + uy
    dd = ux - uy
    ev_ax = -0.25 * P - 2.0 * T5xy                # axis pairs' shared core
    ev_di = 0.125 * P + T5xy                      # diagonal pairs' core
    even13 = ev_ax + 0.25 * (T3 + T4)
    even24 = ev_ax + 0.25 * (T3 - T4)
    even57 = ev_di + 0.25 * T5
    even86 = ev_di - 0.25 * T5
    odd13 = 0.25 * ((T4 - T3) * ux) - T5 * uy
    odd24 = -0.25 * ((T3 + T4) * uy) - T5 * ux
    odd57 = 0.125 * (T3 * sd - T4 * dd) + 0.5 * (T5 * sd)
    odd86 = 0.125 * (T3 * dd - T4 * sd) - 0.5 * (T5 * dd)
    rows = [
        T3 * (0.5 * r2 - 1.0) - 0.5 * T4 * d2 + 4.0 * T5xy - feq[0],
        even13 + odd13 - feq[1],
        even24 + odd24 - feq[2],
        even13 - odd13 - feq[3],
        even24 - odd24 - feq[4],
        even57 + odd57 - feq[5],
        even86 - odd86 - feq[6],
        even57 - odd57 - feq[7],
        even86 + odd86 - feq[8],
    ]
    return jnp.stack(rows, axis=0)


def delta_h(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray,
            feq: jnp.ndarray | None = None) -> jnp.ndarray:
    """High-order-part deviation polynomials.  cites ulbm.cpp:194-228.

    Refactored like delta_s: delta_h = H_k(T6, T7, T8; u) - feq[k], plus a
    shared correction on directions 5-8 that reproduces the reference's
    `x2 + uy` (sum, not product) terms exactly (ulbm.cpp:217-226 — they
    look like a typo for `x2*uy` but are kept for bit-parity): relative to
    the product form, directions 5/6 carry -m0(x2 + uy - x2*uy)/4 and
    directions 7/8 carry -m0(uy - x2 + x2*uy)/4.  Verified identical to
    the transcription to f64 round-off."""
    ux, uy, x2, y2, m0 = _poly_pack(u, m0)
    if feq is None:
        feq = equilibrium(m0, u)
    T6, T7, T8 = cT[6], cT[7], cT[8]
    x2uy = x2 * uy
    c56 = -0.25 * m0 * (x2 + uy - x2uy)
    c78 = -0.25 * m0 * (uy - x2 + x2uy)
    h6p = T6 * (0.5 * uy + 0.25)
    h6m = T6 * (0.5 * uy - 0.25)
    h7p = T7 * (0.5 * ux + 0.25)
    h7m = T7 * (0.5 * ux - 0.25)
    T6uy = T6 * uy
    T7ux = T7 * ux
    ev_ax = -T6uy - T7ux - 0.5 * T8  # shared even part of rows 1-4
    rows = [
        2.0 * T6uy + 2.0 * T7ux + T8 - feq[0],
        ev_ax - 0.5 * T7 - feq[1],
        ev_ax - 0.5 * T6 - feq[2],
        ev_ax + 0.5 * T7 - feq[3],
        ev_ax + 0.5 * T6 - feq[4],
        h6p + h7p + 0.25 * T8 - feq[5] + c56,
        h6p + h7m + 0.25 * T8 - feq[6] + c56,
        h6m + h7m + 0.25 * T8 - feq[7] + c78,
        h6m + h7p + 0.25 * T8 - feq[8] + c78,
    ]
    return jnp.stack(rows, axis=0)


def _eq_factor_pairs(u: jnp.ndarray):
    """Per-axis product-form equilibrium factors: 3-tuples over
    cx/cy in {0, +1, -1} with Phi_0 = 1 - (cs2 + u^2) and
    Phi_{+-1} = (cs2 + u^2 +- u)/2.  cites ulbm.cpp:248-263."""
    ux, uy = u[0], u[1]
    x2, y2 = ux * ux, uy * uy
    ax, ay = CS2 + x2, CS2 + y2
    px = (1.0 - ax, 0.5 * (ax + ux), 0.5 * (ax - ux))   # cx = 0, +1, -1
    py = (1.0 - ay, 0.5 * (ay + uy), 0.5 * (ay - uy))   # cy = 0, +1, -1
    return px, py


_CX3 = [int(v) % 3 for v in lat.C[0]]
_CY3 = [int(v) % 3 for v in lat.C[1]]


def _eq_factors(u: jnp.ndarray) -> jnp.ndarray:
    """Product-form equilibrium per unit density (9, R, C).
    cites ulbm.cpp:248-263 (and :230-246 for the reciprocal use).

    The reference expands the products into per-direction polynomials;
    here they are kept factored — eqf_k = Phi_{cx_k}(ux) * Phi_{cy_k}(uy)
    (same function in ~20 vector ops instead of ~100; verified identical
    to the expansion to f64 round-off)."""
    px, py = _eq_factor_pairs(u)
    return jnp.stack([px[_CX3[k]] * py[_CY3[k]] for k in range(9)],
                     axis=0)


def equilibrium(m0: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """f_eq = m0 * product-form factors.  cites ulbm.cpp:248-263"""
    return m0[None] * _eq_factors(u)


def gamma(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray, s2: float,
          feq: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-cell entropic stabiliser.  cites ulbm.cpp:138-148.

    Near equilibrium both delta_h and delta_s vanish and the reference's
    bare num/den is 0/0 — it survives only on f64 rounding noise
    (torch::set_default_dtype kDouble everywhere).  For the f32 TPU path
    the ratio is regularised: an epsilon denominator plus a clamp, which
    reduces to gamma = 1/s2 (plain relaxation of the h-moments at unit
    rate) in the indeterminate limit and is inert when delta_h is finite.
    """
    if feq is None:
        feq = equilibrium(m0, u)
    ds = delta_s(cT, u, m0, feq)
    dh = delta_h(cT, u, m0, feq)
    # Factored reciprocal: 1/feq_k = (1/m0) ipx[cx_k] ipy[cy_k] with only
    # 3+3 distinct axis factors (the product-form split of
    # ulbm.cpp:248-263), and the 1/m0 factor cancels between num and den
    # (both get scaled by m0; the eps floor absorbs the rescale) —
    # 6 plane divides instead of 9 in the stage the kernel ablation
    # blamed for ~a third of its time.
    px, py = _eq_factor_pairs(u)
    ipx = tuple(1.0 / p for p in px)
    ipy = tuple(1.0 / p for p in py)
    is2 = 1.0 / s2
    num = None
    den = None
    for k in range(9):
        w = ipx[_CX3[k]] * ipy[_CY3[k]]
        dhw = dh[k] * w
        nk = ds[k] * dhw
        dk = dh[k] * dhw
        num = nk if num is None else num + nk
        den = dk if den is None else den + dk
    eps = 1e-28 if num.dtype == jnp.float32 else 1e-200
    g = is2 - (1.0 - is2) * num / (den + eps)
    # Clamp to the linear-stability window of the h-moment relaxation:
    # gamma*s2 must lie in (0, 2).  Inert when the estimator is sane; at
    # omega -> 2 (e.g. ulbm_poiseuille's nu=1e-4 -> s2=1.9994) the noisy
    # near-equilibrium estimate otherwise leaves the window and blows the
    # f32 path up within ~100 steps.
    return jnp.clip(g, 0.0, 2.0 * is2)


def gamma_factored(cT: jnp.ndarray, u: jnp.ndarray, m0: jnp.ndarray,
                   s2: float) -> jnp.ndarray:
    """The entropic stabiliser via the SEPARABLE-BASIS identity — the
    ROADMAP candidate-2 / VERDICT r4 item 7 experiment.

    Mathematically exact alternative to ``gamma``: because the cascaded
    basis is the tensor-monomial basis cx^p cy^q and 1/f_eq factors as
    (1/m0) ipx(cx) ipy(cy) (product-form equilibrium, ulbm.cpp:248-263),
    the two 9-direction reductions collapse to bilinear forms over 9
    monomial coefficient planes contracted with the three per-axis
    reciprocal sums Sx0/SxE/SxO (and y-analogues):

        ds_k = [inv(M) icfS]_k - feq_k     (icfS = u-shifted T3,T4,T5)
        dh_k = [inv(M) icfH]_k + c_k - feq_k   (c = the x2+uy quirk rows)
        num  = sum sigma_pq V_pq + m0^2 (1 + uy)
        den  = sum   tau_pq V_pq + m0^2 (1 + 2 uy)

    with V the two-stage Gram contraction (verified identical to the
    direct ``gamma`` to f64 round-off; the m0^2 terms absorb the
    feq-cross sums, using sum_k ds_k = 0 and sum_k c_k = -m0 uy).

    Kept as a MEASURED NEGATIVE: the identity is exact but does not pay
    — the Gram weights are per-cell planes, so the contraction costs
    ~27 plane products plus 9+8 coefficient planes, about the same op
    count as materialising the paired-direction polynomials (see
    docs/BENCHMARKS.md "KBC gamma identity")."""
    ux, uy = u[0], u[1]
    x2, y2 = ux * ux, uy * uy
    T3, T4, T5, T6, T7, T8 = (cT[k] for k in range(3, 9))
    # u-shifted back-map coefficients (the inv(N) rows for slots 3-5 /
    # 6-8 only; same algebra as collide's icf)
    A6 = 0.5 * (T3 + T4) * uy + 2.0 * T5 * ux
    A7 = 0.5 * (T3 - T4) * ux + 2.0 * T5 * uy
    A8 = 0.5 * T3 * (x2 + y2) - 0.5 * T4 * (x2 - y2) + 4.0 * T5 * (ux * uy)
    B8 = 2.0 * T6 * uy + 2.0 * T7 * ux + T8
    # the reference's x2+uy (sum, not product) quirk rows, in monomial
    # form c = cx^2 cy^2 g0 + cx^2 cy g1 (ulbm.cpp:217-226)
    x2uy = x2 * uy
    c56 = -0.25 * m0 * (x2 + uy - x2uy)
    c78 = -0.25 * m0 * (uy - x2 + x2uy)
    g0 = 0.5 * (c56 + c78)
    g1 = 0.5 * (c56 - c78)
    # per-axis reciprocal sums of the product-form factors
    px, py = _eq_factor_pairs(u)
    ipx = tuple(1.0 / p for p in px)
    ipy = tuple(1.0 / p for p in py)
    Sx0 = ipx[0] + ipx[1] + ipx[2]
    SxE = ipx[1] + ipx[2]
    SxO = ipx[1] - ipx[2]
    Sy0 = ipy[0] + ipy[1] + ipy[2]
    SyE = ipy[1] + ipy[2]
    SyO = ipy[1] - ipy[2]
    # sigma: monomial coefficients of S = inv(M) icfS
    s00 = A8 - T3
    s02 = 1.25 * T3 - 0.25 * T4 - 1.5 * A8
    s20 = 1.25 * T3 + 0.25 * T4 - 1.5 * A8
    s22 = 2.25 * A8 - 1.5 * T3
    s11 = 0.25 * T5
    s01 = -0.5 * A6
    s21 = 0.75 * A6
    s10 = -0.5 * A7
    s12 = 0.75 * A7
    # tau: monomial coefficients of H + c = inv(M) icfH + quirk
    t00 = B8
    t02 = -1.5 * B8
    t20 = t02
    t22 = 2.25 * B8 + g0
    t01 = -0.5 * T6
    t21 = 0.75 * T6 + g1
    t10 = -0.5 * T7
    t12 = 0.75 * T7
    # stage 1: x-contraction  ttilde_{p,s} = sum_r Gx_{p+r} tau_{r,s}
    tt00 = Sx0 * t00 + SxO * t10 + SxE * t20
    tt10 = SxO * (t00 + t20) + SxE * t10
    tt20 = SxE * (t00 + t20) + SxO * t10
    tt01 = Sx0 * t01 + SxE * t21
    tt11 = SxO * (t01 + t21)
    tt21 = SxE * (t01 + t21)
    tt02 = Sx0 * t02 + SxO * t12 + SxE * t22
    tt12 = SxO * (t02 + t22) + SxE * t12
    tt22 = SxE * (t02 + t22) + SxO * t12
    # stage 2: y-contraction  V_{p,q} = sum_s Gy_{q+s} ttilde_{p,s}
    def vrow(tt0, tt1, tt2):
        v0 = Sy0 * tt0 + SyO * tt1 + SyE * tt2
        v1 = SyO * (tt0 + tt2) + SyE * tt1
        v2 = SyE * (tt0 + tt2) + SyO * tt1
        return v0, v1, v2

    v00, v01, v02 = vrow(tt00, tt01, tt02)
    v10, v11, v12 = vrow(tt10, tt11, tt12)
    v20, v21, v22 = vrow(tt20, tt21, tt22)
    m2 = m0 * m0
    num = (s00 * v00 + s01 * v01 + s02 * v02
           + s10 * v10 + s11 * v11 + s12 * v12
           + s20 * v20 + s21 * v21 + s22 * v22) + m2 * (1.0 + uy)
    den = (t00 * v00 + t01 * v01 + t02 * v02
           + t10 * v10 + t12 * v12
           + t20 * v20 + t21 * v21 + t22 * v22) + m2 * (1.0 + 2.0 * uy)
    is2 = 1.0 / s2
    eps = 1e-28 if num.dtype == jnp.float32 else 1e-200
    g = is2 - (1.0 - is2) * num / (den + eps)
    return jnp.clip(g, 0.0, 2.0 * is2)


def collide(f: jnp.ndarray, m0: jnp.ndarray, u: jnp.ndarray, s2: float,
            gamma_impl: str = "factored") -> jnp.ndarray:
    """One KBC collision; returns the post-collision populations.
    cites ulbm.cpp:91-126.  The entropic stabiliser defaults to the
    separable-basis identity (gamma_factored) — identical to the direct
    two-reduction ``gamma`` to f64 round-off and measured +4% on the
    fused kernel (9,150 vs 8,778 MLUPS at 3968x128, 2026-08-21);
    ``gamma_impl="direct"`` keeps the term-for-term form."""
    cT = central_moments(f, u)
    if gamma_impl == "factored":
        g = gamma_factored(cT, u, m0, s2)
    else:
        g = gamma(cT, u, m0, s2, equilibrium(m0, u))

    # subtract equilibrium central moments (only k = 0, 3, 8 nonzero) and
    # apply the relaxation diagonal in the same stack: rows 0-2 relax at
    # unit rate (no multiply), 3-5 at the scalar s2, 6-8 at the per-cell
    # g*s2 — skips the all-ones planes and three identity multiplies of
    # the explicit diagonal form (plane-wise, no scatter: keeps this
    # lowerable inside Pallas kernels)
    gs2 = g * s2
    T = jnp.stack(
        [cT[0] - m0, cT[1], cT[2],
         s2 * (cT[3] - 2.0 * CS2 * m0), s2 * cT[4], s2 * cT[5],
         gs2 * cT[6], gs2 * cT[7], gs2 * (cT[8] - CS4 * m0)], axis=0)

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
