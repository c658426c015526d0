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


def test_kbc_df64_collide_matches_f64_oracle():
    """models.kbc_df64 (the DD-operator transcription) pins to the f64
    kbc.collide oracle at 1e-12-class error on a random state."""
    import jax.numpy as jnp
    import numpy as np
    from lbm_tpu.models import kbc, kbc_df64
    from lbm_tpu.utils.df64 import DD, from_f64, to_f64

    rng = np.random.default_rng(5)
    R, C = 8, 16
    f64 = rng.uniform(0.05, 0.3, (9, R, C))
    m0 = f64.sum(0)
    mx = f64[1] - f64[3] + f64[5] - f64[6] - f64[7] + f64[8]
    my = f64[2] - f64[4] + f64[5] + f64[6] - f64[7] - f64[8]
    u64 = np.stack([mx / m0, my / m0])
    s2 = 1.0 / (0.5 + 3 * 0.05)
    want = np.asarray(kbc.collide(jnp.asarray(f64), jnp.asarray(m0),
                                  jnp.asarray(u64), s2))
    fdd = [DD(from_f64(f64[k])) for k in range(9)]
    m0d, uxd, uyd = kbc_df64.macroscopics(fdd)
    out = kbc_df64.collide(fdd, m0d, uxd, uyd, s2)
    got = np.stack([to_f64(o.v) for o in out])
    assert np.abs(got - want).max() < 1e-12


def test_ulbm_poiseuille_df64_tracks_f64_scene():
    """The df64 KBC channel scene tracks the f64 jnp scene trajectory at
    1e-12-class error over 50 steps INCLUDING under jit (the XLA
    x-(x-y)->y simplifier hazard the df64 EFTs barrier against —
    utils.df64._ob)."""
    import numpy as np

    r64 = ulbm.ulbm_poiseuille(H=8, W=16, T=50, nu=0.05, u_max=0.01)
    rdd = ulbm.ulbm_poiseuille_df64(H=8, W=16, T=50, nu=0.05,
                                    u_max=0.01, tolerance=0.0,
                                    t_interval=10)
    f_dd = np.asarray(rdd.f[:, 0], np.float64) \
        + np.asarray(rdd.f[:, 1], np.float64)
    assert rdd.steps == 50
    assert np.abs(f_dd - np.asarray(r64.f)).max() < 1e-12
