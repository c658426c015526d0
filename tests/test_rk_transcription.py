"""Literal-transcription oracle for the RK (Reis-Phillips) droplet algebra.

`_Ref` is a verbatim torch-f64 transcription of the self-contained
/root/reference/test/rk_static_droplet_test.cpp driver — its (R, C, 9)
layout, 3x3 swapped-axis partial kernels (:52-63), the colour class
(:110-285: per-colour BGK omega1 + Reis omega2, recolouring disabled),
the tau-interpolating relaxation_function (:288-360), and the driver's
full-edge wrap-copy boundary stack (:204-211).  models/rk_cg.py's
RKDropletModel must match it at <= 1e-13 in f64.
"""

import numpy as np
import torch

import jax.numpy as jnp

from lbm_tpu.models.rk_cg import RKDropletColour, RKDropletModel
from lbm_tpu.scenes.multiphase import init_rho_droplet

torch.set_default_dtype(torch.float64)

ICS2 = 3.0

W = torch.tensor([4.0 / 9.0,
                  1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0,
                  1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0])

E = torch.tensor([[0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0],
                  [0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0]])

B = torch.tensor([-4.0 / 27.0,
                  2.0 / 27.0, 2.0 / 27.0, 2.0 / 27.0, 2.0 / 27.0,
                  5.0 / 108.0, 5.0 / 108.0, 5.0 / 108.0, 5.0 / 108.0])

# rk_static_droplet_test.cpp:52-63 — note kernel_partial_x varies along
# COLUMNS (the swapped-axis quirk reproduced by ops/gradients.grad3)
KERNEL_PARTIAL_X = 3.0 * torch.tensor(
    [[-1.0 / 36.0, 0.0, 1.0 / 36.0],
     [-1.0 / 9.0, 0.0, 1.0 / 9.0],
     [-1.0 / 36.0, 0.0, 1.0 / 36.0]])

KERNEL_PARTIAL_Y = -3.0 * torch.tensor(
    [[1.0 / 36.0, 1.0 / 9.0, 1.0 / 36.0],
     [0.0, 0.0, 0.0],
     [-1.0 / 36.0, -1.0 / 9.0, -1.0 / 36.0]])


def _conv3(psi, kernel):
    p = torch.nn.functional.pad(psi[None, None], (1, 1, 1, 1),
                                mode="replicate")
    return torch.nn.functional.conv2d(p, kernel.reshape(1, 1, 3, 3))[0, 0]


class _Partial:
    def x(self, psi):
        return _conv3(psi, KERNEL_PARTIAL_X)

    def y(self, psi):
        return _conv3(psi, KERNEL_PARTIAL_Y)

    def grad(self, psi):
        return torch.stack([self.x(psi), self.y(psi)], dim=-1)


partial = _Partial()


def advect(f):
    cx = [0, 1, 0, -1, 0, 1, -1, -1, 1]
    cy = [0, 0, 1, 0, -1, 1, 1, -1, -1]
    g = f.clone()
    for k in range(9):
        g[..., k] = torch.roll(f[..., k], shifts=(cx[k], cy[k]), dims=(0, 1))
    return g


class _Colour:
    """rk_static_droplet_test.cpp:110-285."""

    def __init__(self, R, C, rho_0, alpha, A, nu, beta):
        self.rho_0, self.alpha, self.A, self.beta = rho_0, alpha, A, beta
        self.omega_rp = 1.0 / (0.5 + nu / (1.0 / 3.0))
        self.cks2 = 0.6 * (1.0 - alpha)
        a, b = 0.2 * (1 - alpha), 0.05 * (1 - alpha)
        self.phi = torch.tensor([alpha, a, a, a, a, b, b, b, b])
        self.adv_f = torch.zeros(R, C, 9)
        self.rho = torch.zeros(R, C)

    def eval_equilibrium(self, rho_, u):
        E_u = torch.matmul(u, E)
        u_u = (u * u).sum(-1).unsqueeze(-1)
        return rho_.unsqueeze(-1) * (
            self.phi + torch.mul(
                ICS2 * E_u + 0.5 * ICS2 * ICS2 * E_u.pow(2)
                - 0.5 * ICS2 * u_u, W))

    def eval_reis_omega2(self, F, F_norm):
        return 0.5 * self.A * F_norm.unsqueeze(-1) * (
            torch.mul(torch.matmul(F, E).pow(2.0)
                      / (1e-20 + F_norm.pow(2.0).unsqueeze(-1)), W) - B)

    def apply_boundary_conditions(self, adv_f, col_f):
        """:204-211 — the driver copies ALL NINE populations of each edge
        from the opposite edge's post-collision values (utils::indices
        left/right/top/bottom carry a trailing Ellipsis over k)."""
        S = slice(1, -1)
        adv_f[S, 0, :] = col_f[S, -1, :]
        adv_f[S, -1, :] = col_f[S, 0, :]
        adv_f[0, :, :] = col_f[-1, :, :]
        adv_f[-1, :, :] = col_f[0, :, :]
        return adv_f

    def step(self, u, relax_params, F, F_norm):
        equ_f = self.eval_equilibrium(self.rho, u)
        omega1 = relax_params.unsqueeze(-1) * (equ_f - self.adv_f)
        omega2 = self.eval_reis_omega2(F, F_norm)
        omega3 = omega1 + omega2
        col_f = self.adv_f + omega3
        self.adv_f = self.apply_boundary_conditions(advect(col_f), col_f)


class _RelaxationFunction:
    """:288-360 — interpolates relaxation TIMES (1/omega), caller inverts."""

    def __init__(self, r_omega, b_omega, delta):
        self.delta = delta
        self.r_tau = 1.0 / r_omega
        self.b_tau = 1.0 / b_omega
        self.s1 = 2.0 * self.r_tau * self.b_tau / (self.r_tau + self.b_tau)
        self.s2 = 2.0 * (self.r_tau - self.s1) / delta
        self.s3 = -self.s2 / (2.0 * delta)
        self.t2 = 2.0 * (self.s1 - self.b_tau) / delta
        self.t3 = self.t2 / (2.0 * delta)

    def eval(self, psi):
        s = torch.zeros_like(psi)
        s = torch.where(psi > self.delta, torch.full_like(psi, self.r_tau), s)
        m = (self.delta >= psi) & (psi > 0.0)
        s = torch.where(m, self.s1 + self.s2 * psi + self.s3 * psi * psi, s)
        m = (0.0 >= psi) & (psi >= -self.delta)
        s = torch.where(m, self.s1 + self.t2 * psi + self.t3 * psi * psi, s)
        s = torch.where(psi < -self.delta, torch.full_like(psi, self.b_tau), s)
        return s


class _Ref:
    """Main loop :475-615 (omega3 = omega1 + omega2; the CSF force and
    kappa are snapshot diagnostics only)."""

    def __init__(self, L, radius):
        u = torch.zeros(L, L, 2)
        self.u = u
        self.r = _Colour(L, L, 1.2, 1.0 / 3.0, 1e-4, 0.16, +0.7)
        self.b = _Colour(L, L, 1.0, 0.2, 1e-4, 0.14, -0.7)
        rr = torch.tensor(init_rho_droplet(L, L, 1.2, inside=True,
                                           radius=radius, sharpness=2.0))
        br = torch.tensor(init_rho_droplet(L, L, 1.0, inside=False,
                                           radius=radius, sharpness=2.0))
        self.r.rho = rr
        self.b.rho = br
        self.r.adv_f = self.r.eval_equilibrium(rr, u)
        self.b.adv_f = self.b.eval_equilibrium(br, u)
        self.r.rho = self.r.adv_f.sum(2)
        self.b.rho = self.b.adv_f.sum(2)
        self.rho_mix = self.r.rho + self.b.rho
        self.relax_func = _RelaxationFunction(self.r.omega_rp,
                                              self.b.omega_rp, 0.98)

    def step(self):
        pf = ((self.r.rho / self.r.rho_0 - self.b.rho / self.b.rho_0)
              / (self.r.rho / self.r.rho_0 + self.b.rho / self.b.rho_0))
        grad_pf = partial.grad(pf)
        grad_norm = torch.sqrt(grad_pf[..., 0].pow(2)
                               + grad_pf[..., 1].pow(2))
        relax_params = self.relax_func.eval(pf).pow(-1)
        self.r.step(self.u, relax_params, grad_pf, grad_norm)
        self.b.step(self.u, relax_params, grad_pf, grad_norm)
        self.r.rho = self.r.adv_f.sum(2)
        self.b.rho = self.b.adv_f.sum(2)
        self.rho_mix = self.r.rho + self.b.rho
        self.u = ((self.r.adv_f + self.b.adv_f).matmul(E.t())
                  / self.rho_mix.unsqueeze(-1))


def _to_planes(t):
    return np.moveaxis(t.numpy(), -1, 0)


def test_rk_droplet_matches_reference_transcription():
    L, radius, steps = 41, 10.0, 4
    ref = _Ref(L, radius)

    red = RKDropletColour(rho_0=1.2, alpha=1.0 / 3.0, A=1e-4, nu=0.16,
                          beta=0.7)
    blue = RKDropletColour(rho_0=1.0, alpha=0.2, A=1e-4, nu=0.14, beta=-0.7)
    model = RKDropletModel(red=red, blue=blue, sigma=5e-3, delta=0.98)
    r0 = init_rho_droplet(L, L, 1.2, inside=True, radius=radius,
                          sharpness=2.0)
    b0 = init_rho_droplet(L, L, 1.0, inside=False, radius=radius,
                          sharpness=2.0)
    state = model.init_state(r0, b0, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(state.red.f),
                               _to_planes(ref.r.adv_f), rtol=0, atol=1e-14)

    for t in range(steps):
        ref.step()
        state = model.step(state)
        np.testing.assert_allclose(
            np.asarray(state.red.f), _to_planes(ref.r.adv_f),
            rtol=0, atol=1e-13, err_msg=f"step {t + 1}: red.f")
        np.testing.assert_allclose(
            np.asarray(state.blue.f), _to_planes(ref.b.adv_f),
            rtol=0, atol=1e-13, err_msg=f"step {t + 1}: blue.f")
        np.testing.assert_allclose(
            np.asarray(state.u), np.moveaxis(ref.u.numpy(), -1, 0),
            rtol=0, atol=1e-13, err_msg=f"step {t + 1}: u")
