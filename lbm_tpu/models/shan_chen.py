"""Shan-Chen pseudopotential multiphase: single-component liquid-vapor.

BEYOND THE REFERENCE: the reference's multiphase models are the
colour-gradient family (MRT-CG / RK-CG, immiscible two-fluid mixtures
with an imposed surface tension, src/colour.cpp) — they cannot represent
a liquid coexisting with its own vapor.  This module adds the other
classical multiphase LBM: the Shan & Chen (1993) pseudopotential model,
where a density-dependent interaction force

    F(x) = -G psi(x) sum_k w_k psi(x + c_k) c_k,   psi(rho) = 1 - e^-rho

yields a non-ideal equation of state

    P(rho) = rho cs^2 + (G cs^2 / 2) psi(rho)^2,   cs^2 = 1/3

with a van-der-Waals loop for G < G_c = -4 (the maximum of psi psi' is
1/4 at rho = ln 2): below-critical interactions separate the fluid into
liquid and vapor phases whose densities emerge from the EOS rather than
being imposed.  Surface tension and interface width emerge likewise.

Forcing is Guo (ops.d2q9.guo_source with the standard ics2=3 — not the
reference's 9x-weak gravity variant) with the half-force velocity shift,
so the macroscopic velocity is u = (sum_k f_k c_k + F/2) / rho and the
model is second-order accurate in the force.  All neighbor access is
periodic rolls — the model fuses like the colour-gradient kernels
(kernels/shan_chen_pallas.py) and shards with one halo row per sweep
side.

w_k are the D2Q9 weights, so sum_k w_k c_ka c_kb = cs^2 delta_ab and the
stencil is the same 3x3 isotropic gradient family the reference's
droplet drivers use (ops/gradients.py KERNEL_X3 up to the 1/cs^2
normalisation).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from ..ops import d2q9

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)

G_CRITICAL = -4.0  # for psi = 1 - e^-rho at cs^2 = 1/3
RHO_CRITICAL = 0.6931471805599453  # ln 2, where psi * psi' peaks

# Carnahan-Starling EOS constants (Yuan & Schaefer 2006 lattice
# convention a=1, b=4, R=1): eta = b rho / 4 = rho, critical point at
# T_c = 0.0943, rho_c = 0.5218 b/4... = 0.1304 (eta_c = 0.1304)
CS_A = 1.0
CS_B = 4.0
CS_TC = 0.094330
CS_RHOC = 0.13044


def psi(rho: jnp.ndarray) -> jnp.ndarray:
    """The Shan-Chen pseudopotential psi(rho) = 1 - exp(-rho)."""
    return 1.0 - jnp.exp(-rho)


def cs_eos_pressure(rho, T: float, a: float = CS_A, b: float = CS_B):
    """Carnahan-Starling equation of state
    P = rho T (1 + eta + eta^2 - eta^3)/(1 - eta)^3 - a rho^2,
    eta = b rho / 4 — a realistic liquid-vapor EOS with a stiff liquid
    branch (density ratios of 50-1000 at T/T_c = 0.5-0.8, far beyond
    the exponential pseudopotential's ~15)."""
    eta = 0.25 * b * rho
    e2 = eta * eta
    return rho * T * (1.0 + eta + e2 - e2 * eta) / (1.0 - eta) ** 3 \
        - a * rho * rho


def cs_psi(rho, T: float, a: float = CS_A, b: float = CS_B):
    """Pseudopotential realising the Carnahan-Starling EOS through the
    interaction force (Yuan & Schaefer 2006): solving
    P = rho/3 + (G/6) psi^2 for psi with G = -1 gives
    psi = sqrt(6 (rho/3 - P_cs)); the bulk pressure of the discrete
    model is then EXACTLY cs_eos_pressure.  The radicand is positive on
    the whole coexistence range (rho <~ 0.47 at a=1, b=4) but turns
    negative on the stiff liquid branch beyond it — transient
    overshoots are clamped to psi = 0 (the ideal-gas pressure alone
    pushes back) instead of NaNing the sqrt."""
    return jnp.sqrt(jnp.maximum(
        6.0 * (rho / 3.0 - cs_eos_pressure(rho, T, a, b)), 0.0))


def make_psi(eos: str = "sc", T: float | None = None):
    """(psi_fn, G) for an EOS family: ``'sc'`` is the classic
    exponential pseudopotential (caller supplies G < -4 for
    coexistence); ``'cs'`` is Carnahan-Starling at temperature ``T``
    (G is fixed at -1 — its magnitude is absorbed into psi)."""
    if eos == "sc":
        return psi, None
    if eos == "cs":
        if T is None:
            raise ValueError("eos='cs' needs a temperature T")
        return (lambda rho: cs_psi(rho, T)), -1.0
    raise ValueError(f"unknown eos {eos!r} (want 'sc' or 'cs')")


def pressure(rho: jnp.ndarray, G: float) -> jnp.ndarray:
    """Bulk (non-ideal) equation of state P = rho/3 + G psi^2 / 6 of
    the exponential pseudopotential (for eos='cs' the bulk EOS is
    cs_eos_pressure directly)."""
    p = psi(rho)
    return rho / 3.0 + (G / 6.0) * p * p


def sc_force(rho: jnp.ndarray, G: float, psi_fn=psi) -> jnp.ndarray:
    """Interaction force (2, R, C) on the periodic grid.

    F_a(x) = -G psi(x) sum_k w_k psi(x + c_k) c_ka; neighbors are
    jnp.roll by -c_k (axis 0 = x/rows).  Opposite directions pair into
    (psi_+ - psi_-) differences, so global momentum is conserved
    exactly (each bond's contribution cancels between its endpoints).
    """
    p = psi_fn(rho)
    fx = jnp.zeros_like(p)
    fy = jnp.zeros_like(p)
    for kp in (1, 2, 5, 8):  # pair leaders; opposite is -c
        shift = (-CX[kp], -CY[kp])
        diff = jnp.roll(p, shift, axis=(0, 1)) \
            - jnp.roll(p, (-shift[0], -shift[1]), axis=(0, 1))
        w = WQ[kp]
        fx = fx + w * CX[kp] * diff
        fy = fy + w * CY[kp] * diff
    return jnp.stack([-G * p * fx, -G * p * fy], axis=0)


def macroscopics(f: jnp.ndarray, G: float, psi_fn=psi):
    """(rho, u, F) with the Guo half-force velocity shift."""
    rho = d2q9.calc_rho(f)
    F = sc_force(rho, G, psi_fn)
    u = (d2q9.calc_momentum(f) + 0.5 * F) / rho
    return rho, u, F


def collide(f: jnp.ndarray, omega: float, G: float,
            psi_fn=psi, forcing: str = "guo") -> jnp.ndarray:
    """One Shan-Chen BGK collision (pre-streaming).

    ``forcing='guo'`` (default for the exponential EOS): standard
    equilibrium at the half-force-shifted velocity + the standard Guo
    source — second-order accurate in the force.

    ``forcing='shift'`` (the original Shan & Chen 1993 scheme, default
    for the stiff Carnahan-Starling EOS): the whole force enters as an
    equilibrium-velocity shift u_eq = u_bare + F/(omega rho), no source
    term.  Measured essential for eos='cs': Guo forcing NaNs within
    4000 steps on the Tr = 0.7 flat interface, the shift scheme is
    stable down to Tr = 0.5 with rho_l within 0.2% of the Maxwell
    construction (the vapor branch under-predicts — the scheme's known
    thermodynamic inconsistency, e.g. 0.0055 vs 0.0093 at Tr = 0.7)."""
    rho = d2q9.calc_rho(f)
    F = sc_force(rho, G, psi_fn)
    if forcing == "shift":
        u_eq = (d2q9.calc_momentum(f) + (1.0 / omega) * F) / rho
        return d2q9.bgk_collision(f, d2q9.equilibrium(u_eq, rho), omega)
    if forcing != "guo":
        raise ValueError(f"unknown forcing {forcing!r}")
    u = (d2q9.calc_momentum(f) + 0.5 * F) / rho
    f_eq = d2q9.equilibrium(u, rho)
    return d2q9.bgk_collision(f, f_eq, omega) + d2q9.guo_source(u, F, omega)


def step(f: jnp.ndarray, omega: float, G: float, psi_fn=psi,
         forcing: str = "guo") -> jnp.ndarray:
    """One full periodic collide-stream step (the jnp oracle for the
    fused kernel)."""
    return d2q9.stream(collide(f, omega, G, psi_fn, forcing))


def maxwell_coexistence(T: float, a: float = CS_A, b: float = CS_B):
    """(rho_v, rho_l) from the Maxwell equal-area construction on the
    Carnahan-Starling EOS at temperature ``T`` (numpy bisection on the
    saturation pressure; the thermodynamically consistent target the
    discrete pseudopotential model approximates)."""
    import numpy as np

    def P(rho):
        eta = 0.25 * b * rho
        return rho * T * (1.0 + eta + eta * eta - eta ** 3) \
            / (1.0 - eta) ** 3 - a * rho * rho

    # spinodal bracket: dP/drho = 0 has two roots below T_c
    rho = np.linspace(1e-6, 0.999 * 4.0 / b, 200001)
    p = P(rho)
    dp = np.gradient(p, rho)
    sp = np.where(np.diff(np.sign(dp)) != 0)[0]
    if len(sp) < 2:
        raise ValueError(f"T={T} is above the critical point")
    p_min, p_max = p[sp[1]], p[sp[0]]  # local min (liq side), max (vap)
    # the vapor branch only reaches P = ps for ps > 0 (P(0) = 0, rising)
    lo = max(p_min, 1e-12)

    def branches(ps):
        """Outermost intersections of P = ps (vapor and liquid bulk)."""
        idx = np.where(np.diff(np.sign(p - ps)) != 0)[0]
        return rho[idx[0]], rho[idx[-1]]

    def area(ps):
        rv, rl = branches(ps)
        m = (rho >= rv) & (rho <= rl)
        # integral of (P - ps) dv with v = 1/rho: dv = -drho/rho^2
        return np.trapezoid((p[m] - ps) / rho[m] ** 2, rho[m])

    hi = p_max
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if area(mid) > 0.0:
            lo = mid
        else:
            hi = mid
    rv, rl = branches(0.5 * (lo + hi))
    return float(rv), float(rl)
