"""Rothman-Keller / Reis-Phillips colour-gradient model (second multiphase
family).

Two working formulations exist in the reference:

  * A per-colour BGK + Reis perturbation (recolouring disabled) inside the
    self-contained test/rk_static_droplet_test.cpp:110-285 — `RKDroplet*`
    functions below.
  * A colour-blind BGK + perturbation + recolouring split with per-cell
    mixture relaxation, in src/rk.cpp:5-238 driven by
    test/rk_rayleigh_taylor_test.cpp:75-177 — `RKMixtureModel` below.
    (src/rk.cpp itself does not compile in the reference — its `diff_op D`
    member is undefined, SURVEY.md section 2.1 #9 — so this follows the
    algebra with the 5x5 isotropic gradient of src/differential.cpp.)
"""

from __future__ import annotations

from ..utils.xmath import tdot

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import lattice as lat
from ..ops import d2q9, gradients
from .mrt_cg import RelaxationFunction
from ..utils.xmath import default_float

ICS2 = 3.0


def rk_phi(alpha) -> np.ndarray:
    """Rest-fraction vector [alpha, 0.2(1-a) x4, 0.05(1-a) x4].
    cites /root/reference/test/rk_static_droplet_test.cpp:270-275"""
    a = 0.2 * (1.0 - alpha)
    b = 0.05 * (1.0 - alpha)
    return np.array([alpha, a, a, a, a, b, b, b, b])


def rk_equilibrium(rho_k, u, phi):
    """f_eq = rho_k (phi + W (3 E.u + 4.5 (E.u)^2 - 1.5 u.u)).
    cites /root/reference/test/rk_static_droplet_test.cpp:183-199.
    ``phi`` may be a (9,) vector or a (9, R, C) field (rk.cpp:139-154)."""
    c = jnp.asarray(lat.C, u.dtype)
    cu = tdot(c.T, u, axes=([1], [0]))
    uu = (u * u).sum(axis=0)
    w = jnp.asarray(lat.W, u.dtype)[:, None, None]
    phi = jnp.asarray(phi, u.dtype)
    if phi.ndim == 1:
        phi = phi[:, None, None]
    return rho_k[None] * (phi + w * (3.0 * cu + 4.5 * cu * cu - 1.5 * uu[None]))


def reis_perturbation(F, F_norm, A, prefactor=0.5):
    """Reis-Phillips perturbation
    omega2 = prefactor * A * |F| (W (F.c)^2/(eps + |F|^2) - B).
    cites /root/reference/test/rk_static_droplet_test.cpp:239-245
    (prefactor 0.5, A scalar) and src/rk.cpp:19-30 (prefactor 1, A per-cell)."""
    c = jnp.asarray(lat.C, F.dtype)
    Fc = tdot(c.T, F, axes=([1], [0]))
    w = jnp.asarray(lat.W, F.dtype)[:, None, None]
    b = jnp.asarray(lat.B_CG, F.dtype)[:, None, None]
    return prefactor * A * F_norm[None] * (
        w * Fc * Fc / (1e-20 + (F_norm * F_norm)[None]) - b
    )


# ---------------------------------------------------------------------------
# Per-colour formulation (rk_static_droplet_test)
# ---------------------------------------------------------------------------

class RKColourFields(NamedTuple):
    f: jnp.ndarray
    rho: jnp.ndarray


class RKDropletState(NamedTuple):
    red: RKColourFields
    blue: RKColourFields
    u: jnp.ndarray


@dataclass(frozen=True)
class RKDropletColour:
    """Constants of the droplet-test colour class.
    cites /root/reference/test/rk_static_droplet_test.cpp:110-155"""

    rho_0: float
    alpha: float
    A: float
    nu: float
    beta: float

    @property
    def omega(self) -> float:
        return 1.0 / (0.5 + self.nu / lat.CS2)

    @property
    def cks2(self) -> float:
        return 0.6 * (1.0 - self.alpha)

    def phi(self):
        return rk_phi(self.alpha)


@dataclass(frozen=True)
class RKDropletModel:
    """The self-contained static-droplet RK step: per-colour
    omega3 = relax*(feq - f) + Reis perturbation, fully periodic streaming,
    CSF surface force via curvature of the (3x3-stencil) phase gradient.
    cites /root/reference/test/rk_static_droplet_test.cpp:475-615"""

    red: RKDropletColour
    blue: RKDropletColour
    sigma: float = 5e-3
    delta: float = 0.98
    # The driver's boundary block (rk_static_droplet_test.cpp:204-211)
    # copies ALL NINE populations of each edge line from the opposite
    # edge's post-collision values (utils::indices left/right/top/bottom
    # end in Ellipsis over k) — NOT just the periodic repair of the
    # boundary-crossing directions.  Reproduced by default (the far field
    # is uniform, so the difference is ~1e-9 per step, but it is not
    # bit-equal to periodic streaming); set exact_periodic=True for the
    # mathematically clean fully periodic variant.
    exact_periodic: bool = False

    def relax(self) -> RelaxationFunction:
        # droplet test interpolates relaxation *times*, then inverts
        # (rk_static_droplet_test.cpp:517, 587-588)
        return RelaxationFunction.from_values(
            1.0 / self.red.omega, 1.0 / self.blue.omega, self.delta
        )

    def init_state(self, r_rho, b_rho, u0=None, dtype=None):
        dtype = default_float(dtype)
        r_rho = jnp.asarray(r_rho, dtype)
        b_rho = jnp.asarray(b_rho, dtype)
        u = jnp.zeros((2,) + r_rho.shape, dtype) if u0 is None else jnp.asarray(u0, dtype)
        rf = rk_equilibrium(r_rho, u, self.red.phi())
        bf = rk_equilibrium(b_rho, u, self.blue.phi())
        return RKDropletState(
            RKColourFields(rf, rf.sum(axis=0)),
            RKColourFields(bf, bf.sum(axis=0)),
            u,
        )

    def step(self, state: RKDropletState) -> RKDropletState:
        r, b, u = state
        psi = (r.rho / self.red.rho_0 - b.rho / self.blue.rho_0) / (
            r.rho / self.red.rho_0 + b.rho / self.blue.rho_0
        )
        grad = gradients.grad3(psi)  # reference-swapped 3x3 stencil
        grad_norm = jnp.sqrt(grad[0] ** 2 + grad[1] ** 2)

        # NOTE: the reference's droplet driver also computes the CSF
        # curvature force Fs = 0.5 sigma K grad(psi), but only as a snapshot
        # diagnostic — omega3 = omega1 + omega2 and the velocity shift are
        # disabled in its source (rk_static_droplet_test.cpp:232-236, 610).
        # See ``curvature_diagnostics`` for the diagnostic quantities.

        # relaxation parameter (interpolated tau -> rate)
        relax = 1.0 / self.relax()(psi)

        def colour_step(col: RKColourFields, params: RKDropletColour):
            feq = rk_equilibrium(col.rho, u, params.phi())
            omega1 = relax[None] * (feq - col.f)
            omega2 = reis_perturbation(grad, grad_norm, params.A, prefactor=0.5)
            f_col = col.f + omega1 + omega2
            f_adv = d2q9.stream(f_col)
            if not self.exact_periodic:
                # faithful full-edge wrap copy of all 9 populations
                # (rk_static_droplet_test.cpp:204-211; see class docstring)
                f_adv = f_adv.at[:, 1:-1, 0].set(f_col[:, 1:-1, -1])
                f_adv = f_adv.at[:, 1:-1, -1].set(f_col[:, 1:-1, 0])
                f_adv = f_adv.at[:, 0, :].set(f_col[:, -1, :])
                f_adv = f_adv.at[:, -1, :].set(f_col[:, 0, :])
            return RKColourFields(f_adv, f_adv.sum(axis=0))

        r_new = colour_step(r, self.red)
        b_new = colour_step(b, self.blue)
        rho_mix = r_new.rho + b_new.rho
        u_new = d2q9.calc_u(r_new.f + b_new.f, rho_mix)
        return RKDropletState(r_new, b_new, u_new)

    def curvature_diagnostics(self, state: RKDropletState):
        """Unit normal, curvature and CSF force as the reference snapshots
        them (rk_static_droplet_test.cpp:544-576); not part of the dynamics."""
        r, b, _ = state
        psi = (r.rho / self.red.rho_0 - b.rho / self.blue.rho_0) / (
            r.rho / self.red.rho_0 + b.rho / self.blue.rho_0
        )
        grad = gradients.grad3(psi)
        grad_norm = jnp.sqrt(grad[0] ** 2 + grad[1] ** 2)
        masked = jnp.where(grad_norm[None] <= 0.1 * grad_norm.max(), 0.0, grad)
        mnorm = jnp.sqrt(masked[0] ** 2 + masked[1] ** 2)
        n = -masked / jnp.where(mnorm == 0.0, 1.0, mnorm)[None]
        K = (
            n[0] * n[1] * (gradients.dy3(n[0]) + gradients.dx3(n[1]))
            - n[0] ** 2 * gradients.dy3(n[1])
            - n[1] ** 2 * gradients.dx3(n[0])
        )
        Fs = 0.5 * self.sigma * K[None] * grad
        return n, K, Fs


# ---------------------------------------------------------------------------
# Colour-blind mixture formulation (src/rk.cpp + rk_rayleigh_taylor_test)
# ---------------------------------------------------------------------------

class RKMixtureState(NamedTuple):
    f: jnp.ndarray       # colour-blind populations (9, R, C)
    r_rho: jnp.ndarray
    b_rho: jnp.ndarray
    u: jnp.ndarray


@dataclass(frozen=True)
class RKMixtureModel:
    """Colour-blind RK step with per-cell mixture relaxation and
    recolouring, following src/rk.cpp's algebra and the
    rk_rayleigh_taylor_test.cpp loop (:133-177)."""

    r_alpha: float
    r_rho_0: float
    r_nu: float
    b_alpha: float
    b_rho_0: float
    b_nu: float
    sigma: float
    beta: float = 0.7
    gravity: tuple[float, float] = (0.0, 0.0)
    # post-stream boundary rule fn(f_adve, f_coll) applied per colour
    boundary: object = None

    def omega_rp(self, r_rho, b_rho, rho):
        """Mixture relaxation rate.  cites src/rk.cpp:184-194"""
        return rho / (3.0 * r_rho * self.r_nu + 3.0 * b_rho * self.b_nu + 0.5 * rho)

    def alpha_field(self, r_rho, b_rho, rho):
        """cites src/rk.cpp:127-137"""
        return (self.r_alpha * r_rho + self.b_alpha * b_rho) / rho

    def phi_field(self, alpha):
        """(9, R, C) rest-fraction field.  cites src/rk.cpp:139-154"""
        return jnp.stack(
            [alpha]
            + [0.2 - 0.2 * alpha] * 4
            + [0.05 - 0.05 * alpha] * 4,
            axis=0,
        )

    def colour_gradient(self, r_rho, b_rho, rho):
        """F_kl = b grad(r/rho)/rho - r grad(b/rho)/rho (5x5 stencil).
        cites src/rk.cpp:94-125"""
        F = (b_rho[None] * gradients.grad5(r_rho / rho)
             - r_rho[None] * gradients.grad5(b_rho / rho)) / rho[None]
        F_norm = jnp.sqrt(F[0] ** 2 + F[1] ** 2)
        return F, F_norm

    def init_state(self, r_rho, b_rho, dtype=None) -> RKMixtureState:
        dtype = default_float(dtype)
        r_rho = jnp.asarray(r_rho, dtype)
        b_rho = jnp.asarray(b_rho, dtype)
        rho = r_rho + b_rho
        u = jnp.zeros((2,) + r_rho.shape, dtype)
        alpha = self.alpha_field(r_rho, b_rho, rho)
        f = rk_equilibrium(rho, u, self.phi_field(alpha))
        return RKMixtureState(f, r_rho, b_rho, u)

    def step(self, state: RKMixtureState) -> RKMixtureState:
        f, r_rho, b_rho, u = state
        rho = r_rho + b_rho
        omega = self.omega_rp(r_rho, b_rho, rho)
        alpha = self.alpha_field(r_rho, b_rho, rho)
        phi = self.phi_field(alpha)
        F, F_norm = self.colour_gradient(r_rho, b_rho, rho)

        feq = rk_equilibrium(rho, u, phi)
        omega1 = (1.0 - omega)[None] * f + omega[None] * feq

        fg = jnp.asarray(self.gravity, u.dtype)
        src = d2q9.guo_source(u, fg, omega)

        # perturbation with interface concentration factor C_kl
        # (src/rk.cpp:166-182) and A_kl = 4.5 sigma omega (:156-164)
        C_kl = 1.0 - jnp.abs((r_rho - b_rho) / (r_rho + b_rho))
        A_kl = 4.5 * self.sigma * omega
        omega2 = reis_perturbation(F, F_norm, (A_kl * C_kl)[None], prefactor=1.0)
        post = omega1 + src + omega2

        # recolouring flux (src/rk.cpp:82-92): kappa uses the normalised
        # colour gradient dotted with the unit velocity set, scaled by phi
        uc = jnp.asarray(lat.NORM_C, u.dtype)
        Fn = F / (F_norm + 1e-20)[None]
        kappa = (r_rho * b_rho / rho)[None] * tdot(
            uc.T, Fn, axes=([1], [0])
        ) * phi

        def colour_advect(k_rho, beta):
            omega3 = (k_rho / rho)[None] * post + beta * kappa
            adv = d2q9.stream(omega3)
            if self.boundary is not None:
                adv = self.boundary(adv, omega3)
            return adv

        r_adv = colour_advect(r_rho, self.beta)
        b_adv = colour_advect(b_rho, -self.beta)
        r_rho_new = r_adv.sum(axis=0)
        b_rho_new = b_adv.sum(axis=0)
        f_new = r_adv + b_adv
        rho_new = r_rho_new + b_rho_new
        u_new = d2q9.calc_u(f_new, rho_new)
        return RKMixtureState(f_new, r_rho_new, b_rho_new, u_new)
