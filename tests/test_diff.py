"""Differentiable-simulation tests (lbm_tpu/diff.py).

The reference never differentiates through its solver; these gates define
the TPU-native framework's adjoint capability: exact discrete gradients
through full rollouts (validated against central finite differences in
f64), identical values/gradients across rematerialisation policies, and an
end-to-end inverse-design loop (optax on a scene parameter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu import diff
from lbm_tpu.boundary import bc
from lbm_tpu.models.single_phase import SinglePhaseModel
from lbm_tpu.ops import d2q9

TAU = 0.933  # sqrt(3/16) + 0.5, the channel drivers' tau


def _gravity_channel_model(omega, fg):
    """Body-force channel with bounce-back walls (gravity_test.cpp:60-177
    stack); omega/fg may be traced scalars."""
    return SinglePhaseModel(
        omega=omega,
        incompressible=True,
        force=(fg, 0.0),
        pre_stream_bcs=(
            lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, 1.0, 1.0, axis=0, eq_fn=d2q9.incomp_equilibrium),
        ),
        post_stream_bcs=(
            lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
            lambda fa, fc: bc.bounce_back(fa, fc, "col0"),
        ),
    )


def _mean_flow(params, T=150, H=9, W=11, policy="sqrt"):
    om, fg = params
    model = _gravity_channel_model(om, fg)
    f0 = SinglePhaseModel(omega=1.0 / TAU, incompressible=True).init(H, W)
    f = diff.rollout(model.step, f0, T, policy=policy)
    _, u = model.macroscopics(f)
    return jnp.mean(u[0][:, 1:-1])


def test_grad_matches_finite_difference():
    """d(mean flow)/d(omega, fg) via reverse-mode AD through 150 steps
    must match central finite differences to ~sqrt(eps) accuracy (f64)."""
    p0 = (1.0 / TAU, -3e-4)
    val, grads = jax.value_and_grad(_mean_flow)(p0)
    assert np.isfinite(float(val))
    for i, h in [(0, 1e-6), (1, 1e-9)]:
        pp = list(p0)
        pp[i] += h
        up = _mean_flow(tuple(pp))
        pp[i] -= 2 * h
        dn = _mean_flow(tuple(pp))
        fd = float((up - dn) / (2 * h))
        ad = float(grads[i])
        np.testing.assert_allclose(ad, fd, rtol=1e-5,
                                   err_msg=f"param {i}: AD {ad} vs FD {fd}")
    # gradients are physically sensible: more force -> more flow (fg < 0
    # drives +x here through u += Fg with fg negative? mean is signed)
    assert grads[1] != 0.0


def test_policies_agree_on_value_and_grad():
    p0 = (1.0 / TAU, -3e-4)
    ref_v, ref_g = jax.value_and_grad(
        lambda p: _mean_flow(p, policy="none"))(p0)
    for policy in ("linear", "sqrt"):
        v, g = jax.value_and_grad(
            lambda p: _mean_flow(p, policy=policy))(p0)
        # remat changes fusion order, so agreement is to roundoff (f64),
        # not bit-exact
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-13)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-10)


def test_sqrt_policy_remainder_steps():
    # n_steps not a multiple of the segment length exercises the
    # remainder path
    p0 = (1.0 / TAU, -3e-4)
    a = _mean_flow(p0, T=37, policy="sqrt")
    b = _mean_flow(p0, T=37, policy="none")
    np.testing.assert_allclose(float(a), float(b), rtol=0, atol=0)


def test_inverse_design_calibrates_force():
    """End-to-end inverse design: recover the body force that produces a
    target mean flow, via optax.adam on the rollout gradient."""
    import optax

    om = 1.0 / TAU
    target = _mean_flow((om, -4e-4), T=120)

    def loss(fg):
        return (_mean_flow((om, fg), T=120) - target) ** 2

    fg = jnp.asarray(-1e-4)
    opt = optax.adam(1e-5)
    ostate = opt.init(fg)
    lg = jax.jit(jax.value_and_grad(loss))
    l0 = None
    for _ in range(80):
        l, g = lg(fg)
        if l0 is None:
            l0 = float(l)
        upd, ostate = opt.update(g, ostate)
        fg = optax.apply_updates(fg, upd)
    assert float(l) < 1e-3 * l0, (l0, float(l))
    np.testing.assert_allclose(float(fg), -4e-4, rtol=0.05)


def test_multiphase_rollout_differentiable():
    """grad of the droplet pressure jump w.r.t. sigma through 5 MRT-CG
    steps is finite and positive (Laplace: dp grows with sigma)."""
    from lbm_tpu.models.mrt_cg import MRTCGModel
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_droplet, mrtcg_boundary)

    R = C = 24

    def dp(sigma):
        model = MRTCGModel(red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=sigma,
                           boundary=mrtcg_boundary,
                           apply_gravity_source=False)
        r0 = init_rho_droplet(R, C, DEFAULT_RED.rho_0, True, 6.0)
        b0 = init_rho_droplet(R, C, DEFAULT_BLUE.rho_0, False, 6.0)
        state = diff.rollout(model.step, model.init_state(r0, b0), 5,
                             policy="linear")
        rho = state.red.rho + state.blue.rho
        # cs2-weighted pressure difference centre vs corner
        return (rho[R // 2, C // 2] - rho[1, 1]) / 3.0

    g = jax.grad(dp)(1e-3)
    assert np.isfinite(float(g))
    assert float(g) > 0.0


def test_fsi_rollout_differentiable_vs_fd():
    """Exact adjoints THROUGH the coupled fluid-structure dynamics:
    grad of the ellipse's lateral glide w.r.t. its release angle over a
    40-step rigid-coupled rollout matches central finite differences.
    Nothing in the reference is differentiable at all; here even the
    moving-IBM momentum/torque exchange and the Cayley orientation
    update carry gradients."""
    from lbm_tpu.ops.moving_ibm import ellipse_markers
    from lbm_tpu.scenes.obstacles import ellipse_fsi_step

    H = W = 64
    a, b, rho_s, gravity = 6.0, 3.0, 1.5, 2e-4
    dx, dy = ellipse_markers(a, b)
    half = int(np.ceil(a)) + 5
    area = np.pi * a * b
    step = ellipse_fsi_step(
        H, W, dx=dx, dy=dy, half=half, omega=1.0 / 0.6,
        m_eff=rho_s * area, i_eff=rho_s * area * (a * a + b * b) / 4.0,
        g_net=(rho_s - 1.0) * area * gravity, dtype=jnp.float64)
    f0 = d2q9.incomp_equilibrium(jnp.zeros((2, H, W), jnp.float64),
                                 jnp.ones((H, W), jnp.float64))

    def glide(theta0):
        cs0 = jnp.stack([jnp.cos(theta0), jnp.sin(theta0)])
        carry = (f0, jnp.asarray([24.0, 32.0], jnp.float64),
                 jnp.zeros((2,), jnp.float64), cs0,
                 jnp.zeros((), jnp.float64), jnp.zeros((2,), jnp.float64),
                 jnp.zeros((), jnp.float64))
        out = diff.rollout(step, carry, 40, policy="sqrt")
        return out[1][1]                      # final lateral position

    g = jax.jit(jax.grad(glide))(jnp.float64(0.3))
    h = 1e-4
    fd = (glide(jnp.float64(0.3 + h)) - glide(jnp.float64(0.3 - h))) \
        / (2.0 * h)
    assert np.isfinite(float(g))
    # the Peskin kernel is only C^1 (branch kinks), so central FD at
    # h=1e-4 carries O(h) error near crossings; 4e-4 relative agreement
    # is the expected FD floor, not adjoint error
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-3)
