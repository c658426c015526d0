"""ULBM scene-level tests (short workloads; the reference's are 300k/10k
steps with no asserts, SURVEY.md section 4)."""

import numpy as np
import pytest

from lbm_tpu.scenes import ulbm


def test_ulbm_poiseuille_short():
    res = ulbm.ulbm_poiseuille(H=24, W=24, T=400, nu=1e-2, u_max=0.05)
    assert np.isfinite(np.asarray(res.f)).all()
    ux = np.asarray(res.m1[0])
    # pressure drop drives +x flow, fastest at mid-channel, zero-ish at walls
    mid = ux[12]
    assert mid[12] > 0
    # wall-adjacent cell is slowest (profile still developing at T=400,
    # so only monotonicity toward the centre is asserted)
    assert mid[12] > 3 * abs(mid[0])
    assert mid[12] > mid[1] and mid[12] > mid[-2]


def test_ulbm_poiseuille_convergence_watcher():
    """Long-horizon run under the 1e-12 relative-mean-ux convergence
    watcher (the stop test the reference's single-phase drivers use,
    horizontal_poiseuille_test.cpp:95,112-120; its ULBM driver runs a
    FLAT 300k steps with no assert, ulbm_poiseuille.cpp:105-147).

    Faithful-floor note: the driver's pressure BC mixes the
    INCOMPRESSIBLE equilibrium for the target-density part with the KBC
    PRODUCT-FORM equilibrium for the non-equilibrium subtraction
    (ulbm_poiseuille.cpp:40-58 + :120 iequi_f^-1) — an O(u^3) mismatch
    that secularly drains density until it balances, so the converged
    amplitude overshoots u_max by ~15% (u = j/rho with rho < 1) at this
    geometry; the SHAPE converges to the parabola within 1.6%
    (measured).  At aggressive (nu >= 2e-3, wider-grid) parameters the
    same drain runs away before converging — a regime the reference
    never exercised (it ran nu=1e-4 only, where 300k steps is ~7% of
    the diffusive time: a spin-up segment, not a steady state)."""
    from lbm_tpu.scenes import channel

    res = ulbm.ulbm_poiseuille(H=8, W=11, T=100000, nu=5e-3, u_max=0.01,
                               tolerance=1e-12)
    assert res.steps < 100000      # the watcher actually stopped it
    ux = np.asarray(res.m1[0])
    assert np.isfinite(ux).all()
    mid = ux[4]
    ua = channel.poiseuille_analytic(11, 0.01)
    # parabolic shape (normalised): measured floor 1.6e-2, gated at 2x
    shape_err = np.abs(mid / mid.max() - ua / ua.max()).max()
    assert shape_err < 0.032, f"shape_err={shape_err}"
    # faithful amplitude overshoot: measured 1.147, gated as a band
    ratio = mid.max() / ua.max()
    assert 1.0 < ratio < 1.25, f"amplitude ratio={ratio}"
    assert res.l2 < 0.2, f"l2={res.l2} (measured floor 0.102)"
