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


def psi(rho: jnp.ndarray) -> jnp.ndarray:
    """The Shan-Chen pseudopotential psi(rho) = 1 - exp(-rho)."""
    return 1.0 - jnp.exp(-rho)


def pressure(rho: jnp.ndarray, G: float) -> jnp.ndarray:
    """Bulk (non-ideal) equation of state P = rho/3 + G psi^2 / 6."""
    p = psi(rho)
    return rho / 3.0 + (G / 6.0) * p * p


def sc_force(rho: jnp.ndarray, G: float) -> jnp.ndarray:
    """Interaction force (2, R, C) on the periodic grid.

    F_a(x) = -G psi(x) sum_k w_k psi(x + c_k) c_ka; neighbors are
    jnp.roll by -c_k (axis 0 = x/rows).  Opposite directions pair into
    (psi_+ - psi_-) differences, so global momentum is conserved
    exactly (each bond's contribution cancels between its endpoints).
    """
    p = psi(rho)
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


def macroscopics(f: jnp.ndarray, G: float):
    """(rho, u, F) with the Guo half-force velocity shift."""
    rho = d2q9.calc_rho(f)
    F = sc_force(rho, G)
    u = (d2q9.calc_momentum(f) + 0.5 * F) / rho
    return rho, u, F


def collide(f: jnp.ndarray, omega: float, G: float) -> jnp.ndarray:
    """One Shan-Chen BGK collision (pre-streaming): standard equilibrium
    at the half-force-shifted velocity + the standard Guo source."""
    rho, u, F = macroscopics(f, G)
    f_eq = d2q9.equilibrium(u, rho)
    return d2q9.bgk_collision(f, f_eq, omega) + d2q9.guo_source(u, F, omega)


def step(f: jnp.ndarray, omega: float, G: float) -> jnp.ndarray:
    """One full periodic collide-stream step (the jnp oracle for the
    fused kernel)."""
    return d2q9.stream(collide(f, omega, G))
