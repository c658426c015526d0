"""Smagorinsky large-eddy BGK: per-cell effective relaxation from the
non-equilibrium stress.

BEYOND THE REFERENCE: the reference's only stabilisation for
under-resolved flows is the entropic KBC operator (src/ulbm.cpp); this
module adds the other classical family — the Smagorinsky subgrid
closure of Hou et al. (1996), where the eddy viscosity comes for free
from data the collision already has:

    Q_ab    = sum_k c_ka c_kb (f_k - f_k^eq)       (non-eq stress)
    |Q|     = sqrt(Q_ab Q_ab)
    tau_eff = (tau0 + sqrt(tau0^2 + 18 sqrt(2) Cs^2 |Q| / rho)) / 2

which solves nu_total = nu0 + (Cs Delta)^2 |S_bar| exactly in lattice
units (Delta = 1, |S_bar| = sqrt(2 S_ab S_ab), using the LBM relation
Q_ab = -2 rho cs^2 tau_eff S_ab).  Everything is per-cell local
algebra — no gradients — so the model fuses like plain BGK and scales
under any sharding with zero extra halo.

Cs = 0 reduces EXACTLY to BGK (tested).  Typical Cs ~ 0.1-0.2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat
from ..ops import d2q9

_SQRT2_18 = 18.0 * 2.0 ** 0.5


def smagorinsky_tau(f: jnp.ndarray, f_eq: jnp.ndarray, rho: jnp.ndarray,
                    tau0: float, cs_smag: float) -> jnp.ndarray:
    """Per-cell effective relaxation time (R, C).  ``f``/``f_eq`` are
    (9, R, C) population planes."""
    cx = jnp.asarray(lat.C[0], f.dtype)[:, None, None]
    cy = jnp.asarray(lat.C[1], f.dtype)[:, None, None]
    dq = f - f_eq
    qxx = (cx * cx * dq).sum(axis=0)
    qxy = (cx * cy * dq).sum(axis=0)
    qyy = (cy * cy * dq).sum(axis=0)
    qn = jnp.sqrt(qxx * qxx + 2.0 * qxy * qxy + qyy * qyy)
    disc = tau0 * tau0 + _SQRT2_18 * cs_smag * cs_smag * qn / rho
    return 0.5 * (tau0 + jnp.sqrt(disc))


def les_collide(f: jnp.ndarray, u: jnp.ndarray, rho: jnp.ndarray,
                tau0: float, cs_smag: float) -> jnp.ndarray:
    """One Smagorinsky-BGK collision: standard equilibrium
    (solver.cpp:51-62 form), per-cell omega = 1/tau_eff."""
    f_eq = d2q9.equilibrium(u, rho)
    tau_eff = smagorinsky_tau(f, f_eq, rho, tau0, cs_smag)
    return d2q9.bgk_collision(f, f_eq, 1.0 / tau_eff)
