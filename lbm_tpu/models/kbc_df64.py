"""Cascaded KBC collision in double-single ("df64") arithmetic.

Near-verbatim transcription of models.kbc (itself pinned to
/root/reference/src/ulbm.cpp:32-320 at 1e-13) with every arithmetic op
lowered to the error-free-transformation df64 ops of utils.df64.DD —
f64-class precision from f32 pairs, so the reference's double-precision
convergence criteria (the 1e-12 relative-mean-ux watcher,
ulbm_poiseuille.cpp:63-77 via horizontal_poiseuille_test.cpp:95-120) can
run ON the TPU, below the measured f32 watcher floor of ~1.3e-6
(docs/BENCHMARKS.md "Long-horizon f32 error budget").

State convention: populations and moments are python LISTS of DD values
(each a (2, R, C) hi/lo pair) — the df64 analog of the planes layout;
velocity is the pair (ux, uy).  Structure and term order mirror
models.kbc function-for-function; tests/test_ulbm_scenes.py pins this
module against the f64 oracle at 1e-13-class tolerances.
"""

from __future__ import annotations

from ..core import lattice as lat
from ..models.kbc import CS2, CS4, INV_M
from ..utils.df64 import DD

_CX3 = [int(v) % 3 for v in lat.C[0]]
_CY3 = [int(v) % 3 for v in lat.C[1]]


def central_moments(f: list, ux: DD, uy: DD) -> list:
    """Raw moments + binomial shift, mirroring kbc.central_moments
    (cites ulbm.cpp:265-320)."""
    f0, f1, f2, f3, f4, f5, f6, f7, f8 = f
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
    return [m00, k10, k01, mu20 + mu02, mu20 - mu02, mu11, mu21, mu12,
            mu22]


def _eq_factor_pairs(ux: DD, uy: DD):
    """Product-form equilibrium axis factors (cites ulbm.cpp:248-263)."""
    x2, y2 = ux * ux, uy * uy
    ax, ay = CS2 + x2, CS2 + y2
    px = (1.0 - ax, 0.5 * (ax + ux), 0.5 * (ax - ux))   # cx = 0, +1, -1
    py = (1.0 - ay, 0.5 * (ay + uy), 0.5 * (ay - uy))   # cy = 0, +1, -1
    return px, py


def equilibrium(m0: DD, ux: DD, uy: DD) -> list:
    """f_eq = m0 * product-form factors (cites ulbm.cpp:248-263)."""
    px, py = _eq_factor_pairs(ux, uy)
    return [m0 * (px[_CX3[k]] * py[_CY3[k]]) for k in range(9)]


def delta_s(cT: list, ux: DD, uy: DD, feq: list) -> list:
    """Shear-part deviation polynomials (cites ulbm.cpp:157-192; the
    paired-direction refactor of kbc.delta_s)."""
    x2, y2 = ux * ux, uy * uy
    T3, T4, T5 = cT[3], cT[4], cT[5]
    xy = ux * uy
    r2 = x2 + y2
    d2 = x2 - y2
    P = T3 * r2 - T4 * d2
    T5xy = T5 * xy
    sd = ux + uy
    dd_ = ux - uy
    ev_ax = -0.25 * P - 2.0 * T5xy
    ev_di = 0.125 * P + T5xy
    even13 = ev_ax + 0.25 * (T3 + T4)
    even24 = ev_ax + 0.25 * (T3 - T4)
    even57 = ev_di + 0.25 * T5
    even86 = ev_di - 0.25 * T5
    odd13 = 0.25 * ((T4 - T3) * ux) - T5 * uy
    odd24 = -0.25 * ((T3 + T4) * uy) - T5 * ux
    odd57 = 0.125 * (T3 * sd - T4 * dd_) + 0.5 * (T5 * sd)
    odd86 = 0.125 * (T3 * dd_ - T4 * sd) - 0.5 * (T5 * dd_)
    return [
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


def delta_h(cT: list, ux: DD, uy: DD, m0: DD, feq: list) -> list:
    """High-order deviation polynomials (cites ulbm.cpp:194-228,
    including the reference's `x2 + uy` sum-not-product quirk on
    directions 5-8 — see kbc.delta_h)."""
    x2 = ux * ux
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
    ev_ax = -1.0 * T6uy - T7ux - 0.5 * T8
    return [
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


def gamma(cT: list, ux: DD, uy: DD, m0: DD, s2: float, feq: list) -> DD:
    """Per-cell entropic stabiliser (cites ulbm.cpp:138-148), with the
    same regularisation as kbc.gamma: eps denominator + clamp to the
    (0, 2/s2) stability window.  eps = 1e-28 matches the f32 hi part's
    underflow scale — at df64 precision it is even more inert."""
    ds = delta_s(cT, ux, uy, feq)
    dh = delta_h(cT, ux, uy, m0, feq)
    px, py = _eq_factor_pairs(ux, uy)
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
    g = is2 - (1.0 - is2) * (num / (den + 1e-28))
    return g.clip(0.0, 2.0 * is2)


def collide(f: list, m0: DD, ux: DD, uy: DD, s2: float) -> list:
    """One KBC collision in df64 (cites ulbm.cpp:91-126), mirroring
    kbc.collide stage-for-stage."""
    cT = central_moments(f, ux, uy)
    feq = equilibrium(m0, ux, uy)
    g = gamma(cT, ux, uy, m0, s2, feq)

    gs2 = g * s2
    T = [cT[0] - m0, cT[1], cT[2],
         s2 * (cT[3] - (2.0 * CS2) * m0), s2 * cT[4], s2 * cT[5],
         gs2 * cT[6], gs2 * cT[7], gs2 * (cT[8] - CS4 * m0)]

    x2, y2 = ux * ux, uy * uy
    icf = [
        T[0],
        T[0] * ux + T[1],
        T[0] * uy + T[2],
        T[0] * (x2 + y2) + 2.0 * T[1] * ux + 2.0 * T[2] * uy + T[3],
        T[0] * (x2 - y2) + 2.0 * T[1] * ux - 2.0 * T[2] * uy + T[4],
        T[0] * (ux * uy) + T[1] * uy + T[2] * ux + T[5],
        T[0] * (x2 * uy) + 2.0 * (T[1] * (ux * uy)) + T[2] * x2
        + 0.5 * (T[3] * uy) + 0.5 * (T[4] * uy) + 2.0 * (T[5] * ux) + T[6],
        T[0] * (ux * y2) + T[1] * y2 + 2.0 * (T[2] * (ux * uy))
        + 0.5 * (T[3] * ux) - 0.5 * (T[4] * ux) + 2.0 * (T[5] * uy) + T[7],
        T[0] * (x2 * y2) + 2.0 * (T[1] * (ux * y2)) + 2.0 * (T[2] * (x2 * uy))
        + 0.5 * (T[3] * (x2 + y2)) - 0.5 * (T[4] * (x2 - y2))
        + 4.0 * (T[5] * (ux * uy)) + 2.0 * (T[6] * uy) + 2.0 * (T[7] * ux)
        + T[8],
    ]

    out = []
    for m in range(9):
        acc = None
        for j in range(9):
            w = float(INV_M[m, j])
            if w == 0.0:
                continue
            term = icf[j] if w == 1.0 else w * icf[j]
            acc = term if acc is None else acc + term
        out.append(f[m] - acc)
    return out


def macroscopics(f: list):
    """m0 = sum_k f_k; u = (f . c) / m0 — the KBC drivers' convention
    (ulbm_double_shear_flow.cpp:141-142)."""
    m0 = f[0]
    for k in range(1, 9):
        m0 = m0 + f[k]
    mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
    my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
    return m0, mx / m0, my / m0
