"""Moment-space MRT + CSF static-droplet formulation (the reference's
test/static_droplet_test.cpp, SURVEY.md section 2.2 'CSF variant ... also
static_droplet_test.cpp:598-633').

Distinct from models/mrt_cg.py in three ways, all per the reference driver:
  * the MRT collision is written in moment space with an explicit
    alpha-dependent equilibrium moment vector m_eq
    (static_droplet_test.cpp:363-378) instead of Mi S M (feq - f);
  * the CSF surface force enters in moment space:
    F_m = M (W ((3(c-u) + 9(c.u)c) . Fs)) scaled per colour by
    A (1 - omega/2) (build_F :598-624, mrtp_operator :312-344);
  * gradients/curvature use the driver-local 3x3 stencil with the
    reference's swapped axes (:79-139), and the recolouring term is
    beta * (rho_k/rho) * rho_other * W * (n.c) (:295-310).

Parity note: the reference multiplies its moment pipeline as row-vectors
against the UNtransposed M/Mi (`f.matmul(M)`, :320, despite its own
"use the transpose" comment :141), i.e. it relaxes in a scrambled basis.
This implementation uses the evidently intended standard basis
(m = M f, out = Mi(...)); set no flag — the scrambled form is considered a
WIP bug of the reference driver, documented here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import lattice as lat
from ..ops import d2q9, gradients
from ..utils.xmath import tdot
from .mrt_cg import RelaxationFunction
from .rk_cg import rk_phi
from ..utils.xmath import default_float


class CSFColourFields(NamedTuple):
    f: jnp.ndarray
    rho: jnp.ndarray


class CSFState(NamedTuple):
    red: CSFColourFields
    blue: CSFColourFields
    u: jnp.ndarray


@dataclass(frozen=True)
class CSFColour:
    """Per-colour constants.  cites static_droplet_test.cpp:215-435:
    cs2 = 0.6(1-alpha) (:434), omega = 1/(0.5 + nu/cs2) (:411 — note the
    driver names it omega but builds tau; the relaxation function then
    inverts, :554-555), s_e=1.25, s_zeta=1.14, s_q=1.6 (:232-234)."""

    rho_0: float
    alpha: float
    nu: float
    A: float
    beta: float

    @property
    def cs2(self) -> float:
        return 0.6 * (1.0 - self.alpha)

    @property
    def tau(self) -> float:
        return 0.5 + self.nu / self.cs2

    @property
    def omega(self) -> float:
        return 1.0 / self.tau

    def phi(self):
        return rk_phi(self.alpha)

    def equ_factor(self):
        c_sq = (lat.C.astype(np.float64) ** 2).sum(axis=0)
        return 1.0 + 0.5 * (3.0 * self.cs2 - 1.0) * (3.0 * c_sq - 4.0)


def csf_equilibrium(rho_k, u, phi, equ_factor):
    """f_eq = rho_k (phi + W (3 (c.u) eta + 4.5 (c.u)^2 - 1.5 u.u)).
    cites static_droplet_test.cpp:380-388 (note 4.5, not the CG drivers' 9)."""
    c = jnp.asarray(lat.C, u.dtype)
    cu = tdot(c.T, u, axes=([1], [0]))
    uu = (u * u).sum(axis=0)
    w = jnp.asarray(lat.W, u.dtype)[:, None, None]
    phi = jnp.asarray(phi, u.dtype)[:, None, None]
    ef = jnp.asarray(equ_factor, u.dtype)[:, None, None]
    return rho_k[None] * (phi + w * (3.0 * cu * ef + 4.5 * cu * cu - 1.5 * uu[None]))


def m_eq(rho_k, u, alpha):
    """Equilibrium moment vector (9, R, C).
    cites static_droplet_test.cpp:363-378."""
    ux, uy = u[0], u[1]
    uu = ux * ux + uy * uy
    a2 = -1.8 * alpha - 0.2
    rows = [
        jnp.ones_like(ux),
        -3.6 * alpha - 0.4 + 3.0 * uu,
        5.4 * alpha - 1.4 - 3.0 * uu,
        ux,
        a2 * ux,
        uy,
        a2 * uy,
        ux * ux - uy * uy,
        ux * uy,
    ]
    return rho_k[None] * jnp.stack(rows, axis=0)


def force_moments(u, fs):
    """CSF force in moment space: M (W ((3(c-u) + 9(c.u)c) . Fs)).
    cites static_droplet_test.cpp:598-624 (build_F)."""
    c = jnp.asarray(lat.C, u.dtype)
    cu = tdot(c.T, u, axes=([1], [0]))
    cF = tdot(c.T, fs, axes=([1], [0]))
    uF = (u * fs).sum(axis=0)
    w = jnp.asarray(lat.W, u.dtype)[:, None, None]
    Fq = w * (3.0 * cF - 3.0 * uF[None] + 9.0 * cu * cF)
    m = jnp.asarray(lat.M_MRT, u.dtype)
    return tdot(m, Fq, axes=([1], [0]))


@dataclass(frozen=True)
class CSFDropletModel:
    """Full step per static_droplet_test.cpp:520-576: phase field, 3x3
    gradient, thresholded unit normal, curvature, Fs = 0.5 sigma K grad,
    per-colour moment-space MRT with CSF forcing, recolouring, fully
    periodic streaming (:449-456), macroscopics with u += 0.5 Fs/rho."""

    red: CSFColour
    blue: CSFColour
    sigma: float = 0.1
    delta: float = 0.1

    def relax(self) -> RelaxationFunction:
        # interpolates taus, inverted to rates per cell (:486, 554-555)
        return RelaxationFunction.from_values(self.red.tau, self.blue.tau,
                                              self.delta)

    def init_state(self, r_rho, b_rho, dtype=None) -> CSFState:
        dtype = default_float(dtype)
        r_rho = jnp.asarray(r_rho, dtype)
        b_rho = jnp.asarray(b_rho, dtype)
        u = jnp.zeros((2,) + r_rho.shape, dtype)
        rf = csf_equilibrium(r_rho, u, self.red.phi(), self.red.equ_factor())
        bf = csf_equilibrium(b_rho, u, self.blue.phi(), self.blue.equ_factor())
        return CSFState(CSFColourFields(rf, rf.sum(0)),
                        CSFColourFields(bf, bf.sum(0)), u)

    def step(self, state: CSFState) -> CSFState:
        r, b, u = state
        dtype = u.dtype
        rho_mix = r.rho + b.rho

        psi = (r.rho / self.red.rho_0 - b.rho / self.blue.rho_0) / (
            r.rho / self.red.rho_0 + b.rho / self.blue.rho_0)
        grad = gradients.grad3(psi)  # reference-swapped axes
        gn = jnp.sqrt(grad[0] ** 2 + grad[1] ** 2)
        # thresholded, normalised inward normal (:540-544)
        n = -jnp.where(gn[None] >= 1e-1,
                       grad / jnp.where(gn == 0.0, 1.0, gn)[None], 0.0)
        K = (n[0] * n[1] * (gradients.dy3(n[0]) + gradients.dx3(n[1]))
             - n[0] ** 2 * gradients.dy3(n[1])
             - n[1] ** 2 * gradients.dx3(n[0]))
        fs = 0.5 * self.sigma * K[None] * grad  # (:548-550, K from -n)

        s_nu = 1.0 / self.relax()(psi)  # tau field -> rate (:554-555)
        F_m = force_moments(u, fs)
        m_mat = jnp.asarray(lat.M_MRT, dtype)
        mi_mat = jnp.asarray(lat.MI_MRT, dtype)
        c = jnp.asarray(lat.C, dtype)
        w = jnp.asarray(lat.W, dtype)[:, None, None]
        nc = tdot(c.T, n, axes=([1], [0]))

        def colour_step(col: CSFColourFields, other_rho, params: CSFColour):
            # moment-space MRT with per-cell s_nu on rows 7, 8 (:346-350);
            # fixed rates diag(0, s_e=1.25, s_zeta=1.14, 0, s_q=1.6, 0, s_q)
            base = jnp.asarray([0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6],
                               dtype)
            m = tdot(m_mat, col.f, axes=([1], [0]))
            # relax TOWARD equilibrium: dm = m_eq - m (see sign note below)
            dm = m_eq(col.rho, u, params.alpha) - m
            forcing = params.A * (1.0 - 0.5 * params.omega) * F_m
            relaxed_rows = [
                (base[i] * (dm[i] + forcing[i]))[None] for i in range(7)
            ]
            relaxed = jnp.concatenate(
                relaxed_rows
                + [(s_nu * (dm[7] + forcing[7]))[None],
                   (s_nu * (dm[8] + forcing[8]))[None]], axis=0)
            # correction moments C1/C7 from the 3x3 gradient of Q (:352-361)
            a = 1.8 * params.alpha - 0.8
            qx = a * col.rho * u[0]
            qy = a * col.rho * u[1]
            c1 = 3.0 * (1.0 - 0.5 * 1.25) * (gradients.dx3(qx) + gradients.dy3(qy))
            c7 = (1.0 - 0.5 * s_nu) * (gradients.dx3(qx) - gradients.dy3(qy))
            relaxed = relaxed.at[1].add(c1).at[7].add(c7)
            mrtp = tdot(mi_mat, relaxed, axes=([1], [0]))
            # recolouring (:295-310): Omega = ratio*mrtp + beta*ratio*rho_other*W*(n'.c)
            # with n' = +grad(psi)/|grad| (toward the red phase).  The
            # reference feeds its OUTWARD normal here, which advects red
            # mass out of the droplet and dissolves it — the de-mixing
            # direction (matching the mrtcg kappa, mrtcg_static_droplet.cpp
            # :354-370) is used instead.
            ratio = (col.rho / rho_mix)[None]
            reco = ratio * mrtp + params.beta * ratio * other_rho[None] * w * (-nc)
            f_coll = col.f + reco
            f_adv = d2q9.stream(f_coll)  # fully periodic (:449-456)
            return CSFColourFields(f_adv, f_adv.sum(0))

        # Sign note: the reference literally computes (f M - m_eq) S + ...
        # and ADDS it to f (:292, :319-323) — with its positive S diagonal
        # that relaxes AWAY from equilibrium, one more sign of this driver
        # being WIP (never run with asserts).  The stable intended MRT form
        # f + Mi(S(m_eq - m) + ...) is used here.
        r_new = colour_step(r, b.rho, self.red)
        b_new = colour_step(b, r.rho, self.blue)
        rho_new = r_new.rho + b_new.rho
        u_new = d2q9.calc_u(r_new.f + b_new.f, rho_new)
        u_new = u_new + 0.5 * fs / rho_new[None]
        return CSFState(r_new, b_new, u_new)
