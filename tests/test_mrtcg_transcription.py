"""Literal-transcription oracle for the MRT-CG colour-gradient algebra.

Same approach as tests/test_kbc.py's ulbm.cpp oracle: the `_Ref` class below
is a deliberately verbatim torch-f64 transcription of
/root/reference/test/mrtcg_static_droplet.cpp — same (R, C, 9)/(R, C, 2)
tensor layout, the literal M/Mi/B/W/E tables (:130-182), torch Conv2d
replicate-padded stencils (src/differential.hpp:9-40), the masked
relaxation_function (:34-101), and the driver's exact step order
(:466-530) with its boundary stack (:560-583).  The optimized
models/mrt_cg.py (planes layout, diagonal-S tensordots, paired algebra)
must match it field-for-field at <= 1e-13 over multiple steps, so any
coefficient/sign drift in the multiphase algebra turns this red.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lbm_tpu.core.params import ColourParams
from lbm_tpu.models.mrt_cg import MRTCGModel
from lbm_tpu.scenes.multiphase import (DEFAULT_BLUE, DEFAULT_RED,
                                       init_rho_droplet, mrtcg_boundary)

torch.set_default_dtype(torch.float64)

# --- literal constant tables (mrtcg_static_droplet.cpp:130-182) ------------

M = torch.tensor(
    [[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
     [-4.0, -1.0, -1.0, -1.0, -1.0, 2.0, 2.0, 2.0, 2.0],
     [4.0, -2.0, -2.0, -2.0, -2.0, 1.0, 1.0, 1.0, 1.0],
     [0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0],
     [0.0, -2.0, 0.0, 2.0, 0.0, 1.0, -1.0, -1.0, 1.0],
     [0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0],
     [0.0, 0.0, -2.0, 0.0, 2.0, 1.0, 1.0, -1.0, -1.0],
     [0.0, 1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, -1.0, 1.0, -1.0]])

Mi = (1.0 / 36.0) * torch.tensor(
    [[4.0, -4.0, 4.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
     [4.0, -1.0, -2.0, 6.0, -6.0, 0.0, 0.0, 9.0, 0.0],
     [4.0, -1.0, -2.0, 0.0, 0.0, 6.0, -6.0, -9.0, 0.0],
     [4.0, -1.0, -2.0, -6.0, 6.0, 0.0, 0.0, 9.0, 0.0],
     [4.0, -1.0, -2.0, 0.0, 0.0, -6.0, 6.0, -9.0, 0.0],
     [4.0, 2.0, 1.0, 6.0, 3.0, 6.0, 3.0, 0.0, 9.0],
     [4.0, 2.0, 1.0, -6.0, -3.0, 6.0, 3.0, 0.0, -9.0],
     [4.0, 2.0, 1.0, -6.0, -3.0, -6.0, -3.0, 0.0, 9.0],
     [4.0, 2.0, 1.0, 6.0, 3.0, -6.0, -3.0, 0.0, -9.0]])

B = torch.tensor([-4.0 / 27.0,
                  2.0 / 27.0, 2.0 / 27.0, 2.0 / 27.0, 2.0 / 27.0,
                  5.0 / 108.0, 5.0 / 108.0, 5.0 / 108.0, 5.0 / 108.0])

W = torch.tensor([4.0 / 9.0,
                  1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0,
                  1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0])

E = torch.tensor([[0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0],
                  [0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0]])

unit_E = E / torch.tensor(
    [1.0, 1.0, 1.0, 1.0, 1.0, np.sqrt(2), np.sqrt(2), np.sqrt(2), np.sqrt(2)])

# src/differential.hpp:9-40 (kernel_partial_x carries a leading minus)
XI = (1.0 / 5040.0) * torch.tensor(
    [[1.0, 32.0, 84.0, 32.0, 1.0],
     [32.0, 448.0, 960.0, 448.0, 32.0],
     [84.0, 960.0, 0.0, 960.0, 84.0],
     [32.0, 448.0, 960.0, 448.0, 32.0],
     [1.0, 32.0, 84.0, 32.0, 1.0]])

KERNEL_PARTIAL_Y = torch.tensor(
    [[-2.0, -1.0, 0.0, 1.0, 2.0]] * 5)

KERNEL_PARTIAL_X = -torch.tensor(
    [[2.0, 2.0, 2.0, 2.0, 2.0],
     [1.0, 1.0, 1.0, 1.0, 1.0],
     [0.0, 0.0, 0.0, 0.0, 0.0],
     [-1.0, -1.0, -1.0, -1.0, -1.0],
     [-2.0, -2.0, -2.0, -2.0, -2.0]])


def _conv(psi, kernel):
    """differential::initialize_convolution + forward: 5x5 Conv2d,
    replicate padding (src/differential.cpp:3-33)."""
    p = torch.nn.functional.pad(psi[None, None], (2, 2, 2, 2),
                                mode="replicate")
    return torch.nn.functional.conv2d(
        p, (XI * kernel).reshape(1, 1, 5, 5))[0, 0]


class _Diff:
    def x(self, psi):
        return _conv(psi, KERNEL_PARTIAL_X)

    def y(self, psi):
        return _conv(psi, KERNEL_PARTIAL_Y)

    def grad(self, psi):
        return torch.stack([self.x(psi), self.y(psi)], dim=-1)


class _RelaxationFunction:
    """mrtcg_static_droplet.cpp:34-101 (interpolates RATES via init_omega)."""

    def __init__(self, red, blue, delta):
        def init_omega(nu, cs2):
            return 1.0 / (0.5 + nu / cs2)

        self.delta = delta
        self.r_omega = init_omega(red.nu, red.cs2)
        self.b_omega = init_omega(blue.nu, blue.cs2)
        self.s1 = 2.0 * self.r_omega * self.b_omega / (self.r_omega + self.b_omega)
        self.s2 = 2.0 * (self.r_omega - self.s1) / delta
        self.s3 = -self.s2 / (2.0 * delta)
        self.t2 = 2.0 * (self.s1 - self.b_omega) / delta
        self.t3 = self.t2 / (2.0 * delta)

    def eval(self, psi):
        s_nu = torch.zeros_like(psi)
        s_nu = torch.where(psi > self.delta,
                           torch.full_like(psi, self.r_omega), s_nu)
        mask = (self.delta >= psi) & (psi > 0.0)
        s_nu = torch.where(mask, self.s1 + self.s2 * psi + self.s3 * psi * psi,
                           s_nu)
        mask = (0.0 >= psi) & (psi >= -self.delta)
        s_nu = torch.where(mask, self.s1 + self.t2 * psi + self.t3 * psi * psi,
                           s_nu)
        s_nu = torch.where(psi < -self.delta,
                           torch.full_like(psi, self.b_omega), s_nu)
        return s_nu


class _Colour:
    """src/colour.cpp:11-64 derived constants in torch."""

    def __init__(self, p: ColourParams):
        self.rho_0 = p.rho_0
        self.alpha = p.alpha
        self.nu = p.nu
        self.beta = p.beta
        self.cs2 = 3.0 * (1.0 - p.alpha) / 5.0
        a = 0.2 * (1.0 - p.alpha)
        b = 0.05 * (1.0 - p.alpha)
        self.phi = torch.tensor([p.alpha, a, a, a, a, b, b, b, b])
        c_sq = (E ** 2).sum(dim=0)
        self.eta = 1.0 + 0.5 * (3.0 * self.cs2 - 1.0) * (3.0 * c_sq - 4.0)


def eval_phase_field(r_rho_0, r_rho, b_rho_0, b_rho):
    return ((r_rho / r_rho_0 - b_rho / b_rho_0)
            / (r_rho / r_rho_0 + b_rho / b_rho_0))


def eval_equilibrium(k_rho, k_phi, k_eta, u):
    uE = u.matmul(E)
    return k_rho * (k_phi + W * (3.0 * uE * k_eta + 9.0 * uE.pow(2)
                                 - 3.0 * u.mul(u).sum(-1).unsqueeze(-1)))


def eval_mrt_operator(fk, equ_fk, Ck, S):
    return Mi.matmul(
        S.matmul(M.matmul((equ_fk - fk).unsqueeze(-1))) + Ck.unsqueeze(-1)
    ).squeeze(-1)


def eval_xi(grad, grad_norm):
    return 0.5 * grad_norm * (
        W * (grad.matmul(E) / (1e-20 + grad_norm)).pow(2) - B)


def eval_kappa(r_rho, b_rho, rho, grad, grad_norm, r_phi, b_phi):
    return ((r_rho * b_rho * grad.matmul(unit_E)
             * (r_rho * r_phi + b_rho * b_phi))
            / (rho.pow(2) * (1e-20 + grad_norm)))


def eval_rec_operator(f, rhok, rho, betak, kappa):
    return rhok * f / rho + betak * kappa


def update_C(D, k, k_rho, u, s_nu):
    DxQx = D.x((1.8 * k.alpha - 0.8) * k_rho.squeeze(-1) * u[..., 0])
    DyQy = D.y((1.8 * k.alpha - 0.8) * k_rho.squeeze(-1) * u[..., 1])
    C = torch.zeros(u.shape[0], u.shape[1], 9)
    C[..., 1] = 3.0 * (1.0 - 0.5 * 1.25) * (DxQx + DyQy)
    C[..., 7] = (1.0 - 0.5 * s_nu.squeeze(-1)) * (DxQx - DyQy)
    return C


def advect(f):
    """src/solver.cpp:76-...: periodic roll by (cx, cy) per direction."""
    cx = [0, 1, 0, -1, 0, 1, -1, -1, 1]
    cy = [0, 0, 1, 0, -1, 1, 1, -1, -1]
    g = f.clone()
    for k in range(9):
        g[..., k] = torch.roll(f[..., k], shifts=(cx[k], cy[k]), dims=(0, 1))
    return g


def apply_boundary_conditions(adv_f, col_f):
    """mrtcg_static_droplet.cpp:560-583: no-diagonal-offset periodic
    columns on rows 1..-2, then bounce-back top/bottom rows."""
    S = slice(1, -1)
    adv_f[S, 0, 2] = col_f[S, -1, 2]
    adv_f[S, 0, 5] = col_f[S, -1, 5]
    adv_f[S, 0, 6] = col_f[S, -1, 6]
    adv_f[S, -1, 4] = col_f[S, 0, 4]
    adv_f[S, -1, 8] = col_f[S, 0, 8]
    adv_f[S, -1, 7] = col_f[S, 0, 7]
    adv_f[-1, :, 3] = col_f[-1, :, 1]
    adv_f[-1, :, 7] = col_f[-1, :, 5]
    adv_f[-1, :, 6] = col_f[-1, :, 8]
    adv_f[0, :, 1] = col_f[0, :, 3]
    adv_f[0, :, 5] = col_f[0, :, 7]
    adv_f[0, :, 8] = col_f[0, :, 6]
    return adv_f


class _Ref:
    """The droplet driver's main loop (mrtcg_static_droplet.cpp:466-530),
    Fg entering only through the 0.5 Fg/rho velocity shift — the force
    source is commented out (:513-515)."""

    def __init__(self, r_rho, b_rho, red, blue, sigma, Fg, delta=0.1):
        self.red, self.blue = _Colour(red), _Colour(blue)
        self.sigma = sigma
        self.relax = _RelaxationFunction(self.red, self.blue, delta)
        self.D = _Diff()
        self.Fg = torch.tensor([[Fg[0]], [Fg[1]]])
        self.r_rho = r_rho.unsqueeze(-1)
        self.b_rho = b_rho.unsqueeze(-1)
        self.rho = self.r_rho + self.b_rho
        u = torch.zeros(r_rho.shape[0], r_rho.shape[1], 2)
        self.u = u + 0.5 * self.Fg.t() / self.rho
        self.r_f = eval_equilibrium(self.r_rho, self.red.phi, self.red.eta,
                                    self.u)
        self.b_f = eval_equilibrium(self.b_rho, self.blue.phi, self.blue.eta,
                                    self.u)

    def step(self):
        r, b = self.red, self.blue
        r_equ = eval_equilibrium(self.r_rho, r.phi, r.eta, self.u)
        b_equ = eval_equilibrium(self.b_rho, b.phi, b.eta, self.u)

        psi = eval_phase_field(r.rho_0, self.r_rho, b.rho_0, self.b_rho)
        s_nu = self.relax.eval(psi)
        r_C = update_C(self.D, r, self.r_rho, self.u, s_nu)
        b_C = update_C(self.D, b, self.b_rho, self.u, s_nu)

        # S = diag(0, 1.25, 1.14, 0, 1.6, 0, 1.6, s_nu, s_nu)  (:432-435,
        # :279-283)
        R_, C_ = psi.shape[0], psi.shape[1]
        S = torch.diag(torch.tensor(
            [0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6, 0.0, 0.0])
        ).expand(R_, C_, 9, 9).clone()
        S[..., 7, 7] = s_nu.squeeze(-1)
        S[..., 8, 8] = s_nu.squeeze(-1)

        r_o1 = eval_mrt_operator(self.r_f, r_equ, r_C, S)
        b_o1 = eval_mrt_operator(self.b_f, b_equ, b_C, S)

        grad = self.D.grad(psi.squeeze(-1))
        grad_norm = torch.sqrt(
            grad[..., 0].pow(2) + grad[..., 1].pow(2)).unsqueeze(-1)
        xi = eval_xi(grad, grad_norm)
        A = 4.5 * self.sigma * s_nu
        r_o2 = A * xi
        b_o2 = A * xi

        kappa = eval_kappa(self.r_rho, self.b_rho, self.rho, grad, grad_norm,
                           r.phi, b.phi)
        total_f = self.r_f + r_o1 + r_o2 + self.b_f + b_o1 + b_o2
        r_o3 = eval_rec_operator(total_f, self.r_rho, self.rho, r.beta, kappa)
        b_o3 = eval_rec_operator(total_f, self.b_rho, self.rho, b.beta, kappa)

        r_col, b_col = r_o3, b_o3
        r_adv = apply_boundary_conditions(advect(r_col), r_col)
        b_adv = apply_boundary_conditions(advect(b_col), b_col)

        self.r_f, self.b_f = r_adv, b_adv
        self.r_rho = r_adv.sum(-1).unsqueeze(-1)
        self.b_rho = b_adv.sum(-1).unsqueeze(-1)
        self.rho = self.r_rho + self.b_rho
        self.u = ((r_adv + b_adv).matmul(E.t()) / self.rho
                  + 0.5 * self.Fg.t() / self.rho)


def _to_planes(t):
    """(R, C, 9) -> (9, R, C) numpy."""
    return np.moveaxis(t.numpy(), -1, 0)


@pytest.mark.parametrize("red,blue", [(DEFAULT_RED, DEFAULT_BLUE)])
def test_mrtcg_algebra_matches_reference_transcription(red, blue):
    R, C, sigma, radius, steps = 40, 40, 0.1, 10.0, 4
    Fg = (0.0, -6.25e-6)
    r0 = init_rho_droplet(R, C, red.rho_0, inside=True, radius=radius)
    b0 = init_rho_droplet(R, C, blue.rho_0, inside=False, radius=radius)

    ref = _Ref(torch.tensor(r0), torch.tensor(b0), red, blue, sigma, Fg)

    model = MRTCGModel(red=red, blue=blue, sigma=sigma, gravity=Fg,
                       apply_gravity_source=False, boundary=mrtcg_boundary)
    state = model.init_state(r0, b0, dtype=jnp.float64,
                             u_init_gravity_shift=True)

    # identical initial populations
    np.testing.assert_allclose(np.asarray(state.red.f), _to_planes(ref.r_f),
                               rtol=0, atol=1e-14)

    for t in range(steps):
        ref.step()
        state = model.step(state)
        for name, got, want in (
                ("red.f", state.red.f, ref.r_f),
                ("blue.f", state.blue.f, ref.b_f)):
            np.testing.assert_allclose(
                np.asarray(got), _to_planes(want), rtol=0, atol=1e-13,
                err_msg=f"step {t + 1}: {name}")
        np.testing.assert_allclose(
            np.asarray(state.u), np.moveaxis(ref.u.numpy(), -1, 0),
            rtol=0, atol=1e-13, err_msg=f"step {t + 1}: u")


def test_mrtcg_operator_pieces_match_transcription():
    """Pin the individual operators (equilibrium, omega1 with the literal
    S matmul chain, xi, kappa, C) — a failure here localises which piece
    drifted."""
    from lbm_tpu.models import mrt_cg as m

    rng = np.random.default_rng(7)
    R, C = 12, 16
    red, blue = _Colour(DEFAULT_RED), _Colour(DEFAULT_BLUE)
    r_rho = torch.tensor(rng.uniform(0.5, 3.0, (R, C))).unsqueeze(-1)
    b_rho = torch.tensor(rng.uniform(0.1, 1.0, (R, C))).unsqueeze(-1)
    rho = r_rho + b_rho
    u = torch.tensor(rng.uniform(-0.05, 0.05, (R, C, 2)))
    f = torch.tensor(rng.uniform(0.0, 1.0, (R, C, 9)))

    u_j = jnp.asarray(np.moveaxis(u.numpy(), -1, 0))
    rho_j = jnp.asarray(r_rho.squeeze(-1).numpy())

    # equilibrium
    eq_ref = eval_equilibrium(r_rho, red.phi, red.eta, u)
    eq_jax = m.cg_equilibrium(rho_j, DEFAULT_RED.phi(), DEFAULT_RED.eta(), u_j)
    np.testing.assert_allclose(np.asarray(eq_jax), _to_planes(eq_ref),
                               rtol=0, atol=1e-14)

    # omega1 via the full {R,C,9,9} S chain vs the diagonal-s tensordots
    psi = eval_phase_field(red.rho_0, r_rho, blue.rho_0, b_rho)
    relax = _RelaxationFunction(red, blue, 0.1)
    s_nu = relax.eval(psi)
    D = _Diff()
    Ck = update_C(D, red, r_rho, u, s_nu)
    S = torch.diag(torch.tensor(
        [0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6, 0.0, 0.0])
    ).expand(R, C, 9, 9).clone()
    S[..., 7, 7] = s_nu.squeeze(-1)
    S[..., 8, 8] = s_nu.squeeze(-1)
    o1_ref = eval_mrt_operator(f, eq_ref, Ck, S)

    f_j = jnp.asarray(np.moveaxis(f.numpy(), -1, 0))
    s_nu_j = jnp.asarray(s_nu.squeeze(-1).numpy())
    Ck_j = m.correction_C(DEFAULT_RED.alpha, rho_j, u_j, s_nu_j)
    np.testing.assert_allclose(np.asarray(Ck_j), _to_planes(Ck),
                               rtol=0, atol=1e-14)
    o1_jax = m.mrt_omega1(f_j, eq_jax, Ck_j, s_nu_j)
    np.testing.assert_allclose(np.asarray(o1_jax), _to_planes(o1_ref),
                               rtol=0, atol=1e-13)

    # xi + kappa
    grad = D.grad(psi.squeeze(-1))
    grad_norm = torch.sqrt(
        grad[..., 0].pow(2) + grad[..., 1].pow(2)).unsqueeze(-1)
    xi_ref = eval_xi(grad, grad_norm)
    kap_ref = eval_kappa(r_rho, b_rho, rho, grad, grad_norm,
                         red.phi, blue.phi)
    grad_j = jnp.asarray(np.moveaxis(grad.numpy(), -1, 0))
    gn_j = jnp.asarray(grad_norm.squeeze(-1).numpy())
    xi_jax = m.xi_perturbation(grad_j, gn_j)
    np.testing.assert_allclose(np.asarray(xi_jax), _to_planes(xi_ref),
                               rtol=0, atol=1e-14)
    kap_jax = m.kappa_recolour(
        rho_j, jnp.asarray(b_rho.squeeze(-1).numpy()),
        jnp.asarray(rho.squeeze(-1).numpy()), grad_j, gn_j,
        DEFAULT_RED.phi(), DEFAULT_BLUE.phi())
    np.testing.assert_allclose(np.asarray(kap_jax), _to_planes(kap_ref),
                               rtol=0, atol=1e-14)


# ---------------------------------------------------------------------------
# CSF variant (mrt_rayleigh_taylor.cpp) — literal transcription
# ---------------------------------------------------------------------------


class _RefCSF(_Ref):
    """The CSF RT driver's main loop (mrt_rayleigh_taylor.cpp:392-545):
    curvature surface force + eta forcing instead of the xi perturbation,
    the PLAIN-E eval_kappa (:304-320), the Guo gravity source applied
    (:526-530), scalar initial velocity shift 0.5 Fg/red.rho_0 (:464) and
    the surface force added to the velocity shift (:541)."""

    def __init__(self, r_rho, b_rho, red, blue, sigma, Fg, delta=0.1):
        self.red, self.blue = _Colour(red), _Colour(blue)
        self.red.rlx = 1.0 / (0.5 + self.red.nu / self.red.cs2)
        self.blue.rlx = 1.0 / (0.5 + self.blue.nu / self.blue.cs2)
        self.red.A, self.blue.A = red.A, blue.A
        self.sigma = sigma
        self.relax = _RelaxationFunction(self.red, self.blue, delta)
        self.D = _Diff()
        self.Fg = torch.tensor([[Fg[0]], [Fg[1]]])
        self.r_rho = r_rho.unsqueeze(-1)
        self.b_rho = b_rho.unsqueeze(-1)
        self.rho = self.r_rho + self.b_rho
        u = torch.zeros(r_rho.shape[0], r_rho.shape[1], 2)
        self.u = u + 0.5 * self.Fg.t() / self.red.rho_0   # scalar shift
        self.r_f = eval_equilibrium(self.r_rho, self.red.phi, self.red.eta,
                                    self.u)
        self.b_f = eval_equilibrium(self.b_rho, self.blue.phi, self.blue.eta,
                                    self.u)

    def step(self):
        r, b = self.red, self.blue
        r_equ = eval_equilibrium(self.r_rho, r.phi, r.eta, self.u)
        b_equ = eval_equilibrium(self.b_rho, b.phi, b.eta, self.u)

        psi = eval_phase_field(r.rho_0, self.r_rho, b.rho_0, self.b_rho)
        s_nu = self.relax.eval(psi)
        r_C = update_C(self.D, r, self.r_rho, self.u, s_nu)
        b_C = update_C(self.D, b, self.b_rho, self.u, s_nu)

        R_, C_ = psi.shape[0], psi.shape[1]
        S = torch.diag(torch.tensor(
            [0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6, 0.0, 0.0])
        ).expand(R_, C_, 9, 9).clone()
        S[..., 7, 7] = s_nu.squeeze(-1)
        S[..., 8, 8] = s_nu.squeeze(-1)

        r_o1 = eval_mrt_operator(self.r_f, r_equ, r_C, S)
        b_o1 = eval_mrt_operator(self.b_f, b_equ, b_C, S)

        grad = self.D.grad(psi.squeeze(-1))
        grad_norm = torch.sqrt(
            grad[..., 0].pow(2) + grad[..., 1].pow(2)).unsqueeze(-1)

        # n, K, Fs, eta forcing (:509-516, :355-384)
        n = -grad / (1e-20 + grad_norm)
        K = (n[..., 0] * n[..., 1]
             * (self.D.y(n[..., 0]) + self.D.x(n[..., 1]))
             - n[..., 0].pow(2.0) * self.D.y(n[..., 1])
             - n[..., 1].pow(2.0) * self.D.x(n[..., 0])).unsqueeze(-1)
        interf_tension = -0.5 * self.sigma * K * grad
        E_rep = E.expand(R_, C_, 2, 9)
        uE = torch.matmul(self.u, E)
        eta = torch.mul(
            ((3.0 * (E_rep - self.u.unsqueeze(-1))
              + 9.0 * (uE.unsqueeze(-2) * E))
             * interf_tension.unsqueeze(-1)).sum(2), W)
        r_o2 = r.A * (1.0 - 0.5 * r.rlx) * eta
        b_o2 = b.A * (1.0 - 0.5 * b.rlx) * eta

        # PLAIN-E kappa (:304-320)
        kappa = ((self.r_rho * self.b_rho * grad.matmul(E)
                  * (self.r_rho * r.phi + self.b_rho * b.phi))
                 / (self.rho.pow(2) * (1e-20 + grad_norm)))
        total_f = self.r_f + r_o1 + r_o2 + self.b_f + b_o1 + b_o2
        r_o3 = eval_rec_operator(total_f, self.r_rho, self.rho, r.beta, kappa)
        b_o3 = eval_rec_operator(total_f, self.b_rho, self.rho, b.beta, kappa)

        # Guo gravity source (:526-530), ics2=3, ics4=9
        force_source = ((1 - 0.5 * s_nu)
                        * ((3.0 + 9.0 * torch.matmul(self.u, E))
                           * self.Fg.t().matmul(E)
                           - 3.0 * torch.matmul(self.u, self.Fg)) * W)
        r_col = r_o3 + force_source
        b_col = b_o3 + force_source

        r_adv = apply_boundary_conditions(advect(r_col), r_col)
        b_adv = apply_boundary_conditions(advect(b_col), b_col)

        self.r_f, self.b_f = r_adv, b_adv
        self.r_rho = r_adv.sum(-1).unsqueeze(-1)
        self.b_rho = b_adv.sum(-1).unsqueeze(-1)
        self.rho = self.r_rho + self.b_rho
        self.u = ((r_adv + b_adv).matmul(E.t()) / self.rho
                  + 0.5 * (self.Fg.t() + interf_tension) / self.rho)


def test_csf_algebra_matches_reference_transcription():
    from lbm_tpu.models.mrt_cg import TwoPhaseState
    from lbm_tpu.scenes.multiphase import init_rho_cosine

    R, C, steps = 24, 16, 4
    sigma, g = 1e-4, 6.25e-7
    red, blue = DEFAULT_RED, DEFAULT_BLUE
    r0 = init_rho_cosine(R, C, red.rho_0, fill_below=True,
                         amplitude_sign=1.0)
    b0 = init_rho_cosine(R, C, blue.rho_0, fill_below=False,
                         amplitude_sign=1.0)

    ref = _RefCSF(torch.tensor(r0), torch.tensor(b0), red, blue, sigma,
                  (g, 0.0))

    model = MRTCGModel(red=red, blue=blue, sigma=sigma, gravity=(g, 0.0),
                       apply_gravity_source=True, boundary=mrtcg_boundary,
                       surface_tension="csf")
    fg = np.asarray([g, 0.0])
    state = model.init_state(r0, b0, dtype=jnp.float64,
                             u0=(0.5 * fg / red.rho_0)[:, None, None])

    np.testing.assert_allclose(np.asarray(state.red.f), _to_planes(ref.r_f),
                               rtol=0, atol=1e-14)

    for t in range(steps):
        ref.step()
        state = model.step(state)
        for name, got, want in (
                ("red.f", state.red.f, ref.r_f),
                ("blue.f", state.blue.f, ref.b_f)):
            np.testing.assert_allclose(
                np.asarray(got), _to_planes(want), rtol=0, atol=1e-13,
                err_msg=f"step {t + 1}: {name}")
        np.testing.assert_allclose(
            np.asarray(state.u), np.moveaxis(ref.u.numpy(), -1, 0),
            rtol=0, atol=1e-13, err_msg=f"step {t + 1}: u")
