"""Channel scenes — the reference's hard physics gates.

The key assertion replicates /root/reference/test/horizontal_poiseuille_test.cpp:175:
L2 error vs the analytic parabola <= 1e-11 in float64.
"""

import numpy as np
import pytest

from lbm_tpu.scenes import channel


def test_horizontal_poiseuille_l2_gate():
    res = channel.horizontal_poiseuille()
    assert res.l2 is not None
    assert res.l2 <= 1e-11, f"L2={res.l2} (gate 1e-11, reference assert)"


def test_gravity_channel_matches_parabola():
    # gravity-driven channel converges to the same parabola with
    # u_max = |Fg| W^2 / (8 nu)
    tau = channel.TAU_DEFAULT
    nu = (2.0 * tau - 1.0) / 6.0
    W = 21
    fg = -0.0003
    res = channel.gravity_channel(H=21, W=W, T=10000, fg=fg)
    u_max = -fg * W * W / (8.0 * nu)
    ua = channel.poiseuille_analytic(W, -u_max)
    mid = np.asarray(res.u[0][10])
    np.testing.assert_allclose(mid, ua, rtol=2e-2, atol=1e-6)


def test_specular_channel_flat_profile():
    res = channel.specular_channel(H=31, W=21, T=3000)
    ux = np.asarray(res.u[0])
    mid = ux[15]
    # free-slip walls: plug profile, no transverse shear
    assert np.ptp(mid) <= 1e-8 * max(1.0, abs(mid.mean()))


def test_free_stream_preserved():
    res = channel.free_stream(H=30, W=24, T=500)
    ux = np.asarray(res.u[0]) / np.asarray(res.rho)
    # uniform 0.1 stream must persist through ABB + specular walls
    np.testing.assert_allclose(ux, 0.1, atol=5e-3)


def test_vertical_poiseuille_profile():
    res = channel.vertical_poiseuille(H=31, W=31, T=6000, u_max=0.05)
    # flow along cols; profile across rows should be close to parabolic
    W = 31
    uy = np.asarray(res.u[1] / res.rho)
    mid = uy[:, 15]
    ua = channel.poiseuille_analytic(W, 0.05)
    np.testing.assert_allclose(mid, ua, rtol=0.1, atol=2e-3)
