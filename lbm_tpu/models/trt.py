"""Two-relaxation-time (TRT) collision: even/odd parts over opposite
direction pairs relaxed at independent rates.

BEYOND THE REFERENCE: the reference ships BGK (src/solver.cpp:65), the
entropic KBC cascade (src/ulbm.cpp) and the multiphase MRT operators;
TRT (Ginzburg / d'Humieres) is the other canonical single-phase
operator, and the practically important one for wall-bounded flows: the
"magic" combination

    Lambda = (tau_plus - 1/2)(tau_minus - 1/2)

controls where halfway bounce-back places the wall.  Lambda = 3/16
makes the parabolic Poiseuille solution EXACT at any viscosity — the
reference's own L2 <= 1e-11 gate (test/horizontal_poiseuille_test.cpp:175)
only passes because its tau = sqrt(3/16) + 1/2 happens to satisfy
Lambda_BGK = (tau - 1/2)^2 = 3/16.  TRT decouples the two: tau_plus
sets nu, tau_minus restores the magic at any tau_plus (tested in
tests/test_trt.py against the same analytic parabola).

Decomposition (OPP pairs (1,3),(2,4),(5,7),(6,8); k=0 is pure even):

    f_k^+   = (f_k + f_opp(k)) / 2        f_k^- = (f_k - f_opp(k)) / 2
    f_k'    = f_k - omega_plus (f_k^+ - feq_k^+)
                  - omega_minus (f_k^- - feq_k^-)

omega_minus = omega_plus reduces EXACTLY to BGK (tested).  The split is
the same even/odd structure the fused kernels already exploit
(kernels/collide_stream.d2q9_pairs), so the Pallas collide_fn costs
barely more than BGK.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import lattice as lat

MAGIC_POISEUILLE = 3.0 / 16.0


def omega_minus_from_magic(omega_plus: float,
                           magic: float = MAGIC_POISEUILLE) -> float:
    """The odd relaxation rate that realises Lambda = magic:
    tau_minus = 1/2 + magic / (tau_plus - 1/2)."""
    tau_plus = 1.0 / omega_plus
    tau_minus = 0.5 + magic / (tau_plus - 0.5)
    return 1.0 / tau_minus


def trt_collision(f: jnp.ndarray, f_eq: jnp.ndarray,
                  omega_plus: float, omega_minus: float) -> jnp.ndarray:
    """One TRT relaxation on (9, R, C) population planes (jnp oracle;
    the fused form lives in kernels/trt_pallas.py)."""
    opp = tuple(int(k) for k in lat.OPP)
    fo = jnp.stack([f[k] for k in opp], axis=0)
    eo = jnp.stack([f_eq[k] for k in opp], axis=0)
    ne_even = 0.5 * ((f + fo) - (f_eq + eo))
    ne_odd = 0.5 * ((f - fo) - (f_eq - eo))
    return f - omega_plus * ne_even - omega_minus * ne_odd
