"""MRT colour-gradient multiphase model (the reference's flagship).

Re-implements the physics embedded in test/mrtcg_static_droplet.cpp,
test/mrtcg_rayleigh_taylor.cpp and the CSF variant test/mrt_rayleigh_taylor.cpp
as pure functions over planes-layout fields.

Key TPU-first deviation from the reference: the reference materialises a
per-cell {R,C,9,9} relaxation matrix S and does batched 9x9 matmuls
(mrtcg_static_droplet.cpp:301-313).  S is diagonal, so here the MRT operator
is  Mi @ (s ⊙ (M @ (feq - f)) + C)  with s a (9,R,C) vector — two 9x9
tensordots that XLA maps onto the MXU, and no {R,C,9,9} traffic.
"""

from __future__ import annotations

from ..utils.xmath import tdot

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import lattice as lat
from ..core.params import ColourParams
from ..ops import d2q9, gradients
from ..utils.xmath import default_float


class ColourFields(NamedTuple):
    """Dynamic per-colour state (static constants live in ColourParams)."""

    f: jnp.ndarray    # (9, R, C) populations
    rho: jnp.ndarray  # (R, C)


class TwoPhaseState(NamedTuple):
    red: ColourFields
    blue: ColourFields
    u: jnp.ndarray    # (2, R, C) mixture velocity


# ---------------------------------------------------------------------------
# Scalar fields
# ---------------------------------------------------------------------------

def phase_field(r_rho, r_rho_0, b_rho, b_rho_0):
    """psi = (r/r0 - b/b0)/(r/r0 + b/b0).
    cites /root/reference/test/mrtcg_static_droplet.cpp:264-277"""
    a = r_rho / r_rho_0
    b = b_rho / b_rho_0
    return (a - b) / (a + b)


@dataclass(frozen=True)
class RelaxationFunction:
    """Quadratic interface interpolation of the relaxation rate s_nu(psi).

    cites /root/reference/test/mrtcg_static_droplet.cpp:34-101.  The mrtcg
    drivers interpolate *rates* (init_omega results); the rk/CSF droplet
    drivers interpolate *times* then invert — use ``from_omegas`` /
    ``from_taus`` accordingly.
    """

    delta: float
    r_val: float
    b_val: float
    s1: float
    s2: float
    s3: float
    t2: float
    t3: float

    @classmethod
    def from_values(cls, r_val: float, b_val: float, delta: float):
        s1 = 2.0 * r_val * b_val / (r_val + b_val)
        s2 = 2.0 * (r_val - s1) / delta
        s3 = -s2 / (2.0 * delta)
        t2 = 2.0 * (s1 - b_val) / delta
        t3 = t2 / (2.0 * delta)
        return cls(delta, r_val, b_val, s1, s2, s3, t2, t3)

    @classmethod
    def from_omegas(cls, red: ColourParams, blue: ColourParams, delta: float):
        return cls.from_values(red.rlx, blue.rlx, delta)

    def __call__(self, psi: jnp.ndarray) -> jnp.ndarray:
        pos = self.s1 + self.s2 * psi + self.s3 * psi * psi
        neg = self.s1 + self.t2 * psi + self.t3 * psi * psi
        out = jnp.where(psi > self.delta, self.r_val, pos)
        out = jnp.where(psi <= 0.0, neg, out)
        out = jnp.where(psi < -self.delta, self.b_val, out)
        return out


# ---------------------------------------------------------------------------
# Collision operators
# ---------------------------------------------------------------------------

def cg_equilibrium(rho_k, phi, eta, u):
    """Colour-gradient equilibrium
    f_eq = rho_k (phi_k + W (3 (u.c) eta_k + 9 (u.c)^2 - 3 u.u)).
    cites /root/reference/test/mrtcg_static_droplet.cpp:285-299"""
    c = jnp.asarray(lat.C, u.dtype)
    cu = tdot(c.T, u, axes=([1], [0]))
    uu = (u * u).sum(axis=0)
    w = jnp.asarray(lat.W, u.dtype)[:, None, None]
    phi = jnp.asarray(phi, u.dtype)[:, None, None]
    eta = jnp.asarray(eta, u.dtype)[:, None, None]
    return rho_k[None] * (phi + w * (3.0 * cu * eta + 9.0 * cu * cu - 3.0 * uu[None]))


def s_vector(s_nu, dtype):
    """Diagonal of the MRT relaxation matrix as a (9, R, C) stack:
    diag(0, 1.25, 1.14, 0, 1.6, 0, 1.6, s_nu, s_nu).
    cites /root/reference/test/mrtcg_static_droplet.cpp:432-435 + 279-283"""
    base = np.array([0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6, 0.0, 0.0])
    zero = jnp.zeros_like(s_nu)
    rows = [jnp.full_like(s_nu, v) if v != 0.0 else zero for v in base[:7]]
    return jnp.stack(rows + [s_nu, s_nu], axis=0).astype(dtype)


def mrt_omega1(f, f_eq, corr_C, s_nu):
    """omega1 = Mi (s ⊙ M (feq - f) + C).
    cites /root/reference/test/mrtcg_static_droplet.cpp:301-313"""
    m = jnp.asarray(lat.M_MRT, f.dtype)
    mi = jnp.asarray(lat.MI_MRT, f.dtype)
    dm = tdot(m, f_eq - f, axes=([1], [0]))
    dm = dm * s_vector(s_nu, f.dtype)
    return tdot(mi, dm + corr_C, axes=([1], [0]))


def correction_C(alpha, rho_k, u, s_nu):
    """Correction moments for the quartic-term error: only moments 1 and 7
    are nonzero.  cites /root/reference/test/mrtcg_static_droplet.cpp:372-388"""
    q = (1.8 * alpha - 0.8) * rho_k
    dxqx = gradients.dx5(q * u[0])
    dyqy = gradients.dy5(q * u[1])
    zeros = jnp.zeros_like(dxqx)
    c1 = 3.0 * (1.0 - 0.5 * 1.25) * (dxqx + dyqy)
    c7 = (1.0 - 0.5 * s_nu) * (dxqx - dyqy)
    return jnp.stack(
        [zeros, c1] + [zeros] * 5 + [c7, zeros], axis=0
    )


def xi_perturbation(grad, grad_norm):
    """xi = 0.5 |grad| (W ((grad.c)/(eps+|grad|))^2 - B).
    cites /root/reference/test/mrtcg_static_droplet.cpp:342-352"""
    c = jnp.asarray(lat.C, grad.dtype)
    gc = tdot(c.T, grad, axes=([1], [0]))
    w = jnp.asarray(lat.W, grad.dtype)[:, None, None]
    b = jnp.asarray(lat.B_CG, grad.dtype)[:, None, None]
    unit = gc / (1e-20 + grad_norm[None])
    return 0.5 * grad_norm[None] * (w * unit * unit - b)


def kappa_recolour(r_rho, b_rho, rho, grad, grad_norm, r_phi, b_phi,
                   unit_e: bool = True):
    """Recolouring flux kappa.
    cites /root/reference/test/mrtcg_static_droplet.cpp:354-370 and
    mrtcg_rayleigh_taylor.cpp:302-318 (grad.matmul(unit_E), the default);
    the CSF driver's active eval_kappa instead dots grad with the PLAIN E
    set — no 1/sqrt(2) on diagonals (mrt_rayleigh_taylor.cpp:304-320,
    its unit_E-free form) — selected with ``unit_e=False``."""
    uc = jnp.asarray(lat.UNIT_C if unit_e else lat.C, grad.dtype)
    guc = tdot(uc.T, grad, axes=([1], [0]))
    r_phi = jnp.asarray(r_phi, grad.dtype)[:, None, None]
    b_phi = jnp.asarray(b_phi, grad.dtype)[:, None, None]
    num = (r_rho * b_rho)[None] * guc * (r_rho[None] * r_phi + b_rho[None] * b_phi)
    return num / ((rho * rho)[None] * (1e-20 + grad_norm[None]))


def recolour(total_f, rho_k, rho, beta_k, kappa):
    """omega3 = rho_k f/rho + beta_k kappa.
    cites /root/reference/test/mrtcg_static_droplet.cpp:327-340"""
    return (rho_k / rho)[None] * total_f + beta_k * kappa


# --- CSF (continuum surface force) variant pieces --------------------------

def local_curvature(n):
    """K = nx ny (dy nx + dx ny) - nx^2 dy ny - ny^2 dx nx, with the 5x5
    isotropic stencil.  cites /root/reference/test/mrt_rayleigh_taylor.cpp:355-363"""
    nx, ny = n[0], n[1]
    return (
        nx * ny * (gradients.dy5(nx) + gradients.dx5(ny))
        - nx * nx * gradients.dy5(ny)
        - ny * ny * gradients.dx5(nx)
    )


def csf_eta(u, fs):
    """Colour-independent perturbation of the CSF forcing:
    eta_k = W_k (3 (c_k - u).F + 9 (u.c_k)(c_k.F)).
    cites /root/reference/test/mrt_rayleigh_taylor.cpp:365-384"""
    c = jnp.asarray(lat.C, u.dtype)
    cu = tdot(c.T, u, axes=([1], [0]))
    cF = tdot(c.T, fs, axes=([1], [0]))
    uF = (u * fs).sum(axis=0)
    w = jnp.asarray(lat.W, u.dtype)[:, None, None]
    return w * (3.0 * cF - 3.0 * uF[None] + 9.0 * cu * cF)


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MRTCGModel:
    """One MRT-CG two-phase step with either the perturbation-operator
    surface tension ('perturbation', mrtcg_* drivers) or the CSF curvature
    force ('csf', mrt_rayleigh_taylor.cpp)."""

    red: ColourParams
    blue: ColourParams
    sigma: float
    gravity: tuple[float, float] = (0.0, 0.0)
    delta: float = 0.1
    surface_tension: str = "perturbation"  # or "csf"
    apply_gravity_source: bool = True
    # post-stream boundary rule applied to each colour: fn(f_adve, f_coll)
    boundary: object = None

    def relax(self) -> RelaxationFunction:
        return RelaxationFunction.from_omegas(self.red, self.blue, self.delta)

    def init_state(self, r_rho, b_rho, dtype=None,
                   u_init_gravity_shift: bool = False,
                   u0=None) -> TwoPhaseState:
        """``u0`` (broadcastable to (2, R, C)) sets the initial velocity the
        equilibria are evaluated at — the CSF RT driver initialises at the
        scalar shift 0.5 Fg/red.rho_0 BEFORE building the equilibria
        (mrt_rayleigh_taylor.cpp:464-467)."""
        dtype = default_float(dtype)
        r_rho = jnp.asarray(r_rho, dtype)
        b_rho = jnp.asarray(b_rho, dtype)
        rho = r_rho + b_rho
        u = jnp.zeros((2,) + r_rho.shape, dtype)
        if u0 is not None:
            u = u + jnp.asarray(u0, dtype)
        if u_init_gravity_shift:
            # static droplet driver: u = 0.5 Fg / rho at t=0
            # cites mrtcg_static_droplet.cpp:452-457
            fg = jnp.asarray(self.gravity, dtype)
            u = u + 0.5 * fg[:, None, None] / rho[None]
        rf = cg_equilibrium(r_rho, self.red.phi(), self.red.eta(), u)
        bf = cg_equilibrium(b_rho, self.blue.phi(), self.blue.eta(), u)
        return TwoPhaseState(ColourFields(rf, r_rho), ColourFields(bf, b_rho), u)

    def step(self, state: TwoPhaseState) -> TwoPhaseState:
        r, b, u = state
        dtype = u.dtype
        relax_fn = self.relax()
        fg = jnp.asarray(self.gravity, dtype)

        r_eq = cg_equilibrium(r.rho, self.red.phi(), self.red.eta(), u)
        b_eq = cg_equilibrium(b.rho, self.blue.phi(), self.blue.eta(), u)

        psi = phase_field(r.rho, self.red.rho_0, b.rho, self.blue.rho_0)
        s_nu = relax_fn(psi)
        rho = r.rho + b.rho

        r_C = correction_C(self.red.alpha, r.rho, u, s_nu)
        b_C = correction_C(self.blue.alpha, b.rho, u, s_nu)
        r_o1 = mrt_omega1(r.f, r_eq, r_C, s_nu)
        b_o1 = mrt_omega1(b.f, b_eq, b_C, s_nu)

        grad = gradients.grad5(psi)
        grad_norm = jnp.sqrt(grad[0] ** 2 + grad[1] ** 2)

        fst = None
        if self.surface_tension == "perturbation":
            xi = xi_perturbation(grad, grad_norm)
            A = 4.5 * self.sigma * s_nu
            r_o2 = A[None] * xi
            b_o2 = A[None] * xi
        else:  # CSF
            n = -grad / (1e-20 + grad_norm[None])
            K = local_curvature(n)
            fst = -0.5 * self.sigma * K[None] * grad
            eta_f = csf_eta(u, fst)
            r_o2 = self.red.A * (1.0 - 0.5 * self.red.rlx) * eta_f
            b_o2 = self.blue.A * (1.0 - 0.5 * self.blue.rlx) * eta_f

        kap = kappa_recolour(r.rho, b.rho, rho, grad, grad_norm,
                             self.red.phi(), self.blue.phi(),
                             unit_e=self.surface_tension != "csf")
        total = r.f + r_o1 + r_o2 + b.f + b_o1 + b_o2
        r_o3 = recolour(total, r.rho, rho, self.red.beta, kap)
        b_o3 = recolour(total, b.rho, rho, self.blue.beta, kap)

        if self.apply_gravity_source:
            src = d2q9.guo_source(u, fg, s_nu[None])
            r_col = r_o3 + src
            b_col = b_o3 + src
        else:
            r_col = r_o3
            b_col = b_o3

        r_adv = d2q9.stream(r_col)
        b_adv = d2q9.stream(b_col)
        if self.boundary is not None:
            r_adv = self.boundary(r_adv, r_col)
            b_adv = self.boundary(b_adv, b_col)

        r_rho = r_adv.sum(axis=0)
        b_rho = b_adv.sum(axis=0)
        rho = r_rho + b_rho
        u_new = d2q9.calc_u(r_adv + b_adv, rho)
        shift = fg[:, None, None]
        if fst is not None:
            shift = shift + fst
        u_new = u_new + 0.5 * shift / rho[None]

        return TwoPhaseState(
            ColourFields(r_adv, r_rho), ColourFields(b_adv, b_rho), u_new
        )
