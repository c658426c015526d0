"""Fused truncated power-law collide-stream kernel (models.power_law).

BEYOND THE REFERENCE (every reference operator is Newtonian).  The
collision is plain BGK plus the non-equilibrium stress reductions and a
clipped Picard fixed point for the per-cell apparent relaxation time —
all local algebra, so it slots straight into the generic fused/sharded
machinery as a ``collide_fn``:

  * single-chip: ``make_power_law_fused_step`` delegates to
    kernels.collide_stream.make_fused_step — the same tuned block
    pipeline and temporal blocking (up to 8 sweeps/launch) as the BGK
    kernel;
  * multi-chip: pass ``power_law_collide_fn(...)`` to
    sharded_pallas.make_sharded_fused_step (1-D, communication-avoiding
    ppermute halos) or sharded2d_pallas.make_sharded_fused_step_2d.

The Steffensen-accelerated Picard sweeps cost one exp + one log each
(Mosaic-legal transcendentals, scalar constants only); at the default
8 sweeps the kernel stays well above the throughput target because
the BGK pipeline it rides is HBM-bound, not compute-bound.  Mosaic
compiles of the unrolled transcendental chain are slow (~2 min
first-compile at 256x256) — cached thereafter.

Pinned to the jnp oracle (models.power_law.power_law_collide +
d2q9.stream) at 1e-13 in f64 by tests/test_power_law.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import lattice as lat
from ..models.power_law import _SQ32
from . import collide_stream

WQ = tuple(float(v) for v in lat.W)


def power_law_collide_fn(cons_K: float, n: float, tau_min: float,
                         tau_max: float, iters: int, dtype,
                         sigma_y: float = 0.0, m_pap: float = 1e4):
    """Truncated power-law / Herschel-Bulkley collision on a
    (9, rows, C) slab — same contract as bgk_pallas.bgk_collide_fn
    (models.power_law.apparent_tau algebra, paired-direction
    equilibria)."""
    dt = jnp.dtype(dtype).type
    yielded = float(sigma_y) > 0.0
    newtonian = float(n) == 1.0 and not yielded
    if newtonian:
        om_const = dt(1.0 / min(max(0.5 + 3.0 * cons_K, tau_min), tau_max))
    else:
        log_k = dt(math.log(cons_K))
        nu_lo = dt((tau_min - 0.5) / 3.0)
        nu_hi = dt((tau_max - 0.5) / 3.0)
        nm1 = dt(n - 1.0)
        nn = dt(n)
        tau0 = dt(tau_max if n < 1.0 else tau_min)
        # subnormal-safe floors (models.power_law.apparent_tau)
        tiny = dt(1e-250 if jnp.dtype(dtype) == jnp.float64 else 1e-30)
        sq32 = dt(_SQ32)
        sy = dt(sigma_y)
        mp = dt(m_pap)
        tmax = dt(tau_max)
        tmin = dt(tau_min)

    def fn(slab):
        rho = slab[0]
        for k in range(1, 9):
            rho = rho + slab[k]
        mx = slab[1] - slab[3] + slab[5] - slab[6] - slab[7] + slab[8]
        my = slab[2] - slab[4] + slab[5] + slab[6] - slab[7] - slab[8]
        inv_rho = 1.0 / rho
        ux = mx * inv_rho
        uy = my * inv_rho

        t0, pairs = collide_stream.d2q9_pairs(ux, uy)
        feq = [None] * 9
        feq[0] = dt(WQ[0]) * rho * t0
        for kp, km, w, cu, cc in pairs:
            wr = dt(w) * rho
            even = wr * (t0 + 4.5 * cc)
            odd = wr * (3.0 * cu)
            feq[kp] = even + odd
            feq[km] = even - odd
        dq = [slab[k] - feq[k] for k in range(9)]

        if newtonian:
            om = om_const
        else:
            # |Q| (models.power_law.nonequilibrium_stress_norm):
            # cx^2 = 1 on {1,3,5,6,7,8}, cy^2 = 1 on {2,4,5,6,7,8},
            # cx*cy = +1 on {5,7}, -1 on {6,8}
            qxx = dq[1] + dq[3] + dq[5] + dq[6] + dq[7] + dq[8]
            qyy = dq[2] + dq[4] + dq[5] + dq[6] + dq[7] + dq[8]
            qxy = dq[5] - dq[6] + dq[7] - dq[8]
            qn = jnp.sqrt(qxx * qxx + 2.0 * qxy * qxy + qyy * qyy)
            a = jnp.maximum(sq32 * qn * inv_rho, tiny)
            log_a = jnp.log(a)

            if yielded:
                # bracket-clamped Newton on F(gdot) = gdot/2 + 3
                # sigma(gdot) = a (models.power_law.apparent_tau)
                gd_lo, gd_hi = a / tmax, a / tmin
                gd = gd_lo
                for _ in range(iters):
                    q = jnp.exp(log_k + nm1 * jnp.log(gd))
                    e = jnp.exp(-mp * gd)
                    h = 0.5 * gd + 3.0 * (sy * (1.0 - e) + q * gd) - a
                    hp = 0.5 + 3.0 * (sy * mp * e + nn * q)
                    gd = jnp.clip(gd - h / hp, gd_lo, gd_hi)
                nu = jnp.exp(log_k + nm1 * jnp.log(gd)) \
                    + sy * (-jnp.expm1(-mp * gd)) / gd
                om = 1.0 / (0.5 + 3.0 * jnp.clip(nu, nu_lo, nu_hi))
            else:
                def picard(t):
                    lg = log_a - jnp.log(t)          # log gdot
                    nu = jnp.exp(log_k + nm1 * lg)
                    return 0.5 + 3.0 * jnp.clip(nu, nu_lo, nu_hi)

                # Steffensen: two Picard sweeps + clipped Aitken per
                # round (same association as models.power_law)
                tau = jnp.full_like(rho, tau0)
                for i in range(iters):
                    t1 = picard(tau)
                    if i % 2 == 0:
                        tprev = tau
                        tau = t1
                        continue
                    den = t1 - 2.0 * tau + tprev
                    accel = t1 - (t1 - tau) * (t1 - tau) / jnp.where(
                        den == 0.0, dt(1.0), den)
                    tau = jnp.where(
                        den == 0.0, t1,
                        jnp.clip(accel, dt(tau_min), dt(tau_max)))
                om = 1.0 / tau
        return jnp.stack([slab[k] - om * dq[k] for k in range(9)],
                         axis=0)

    return fn


def make_power_law_fused_step(R: int, C: int, *, cons_K: float, n: float,
                              tau_min: float = 0.52, tau_max: float = 50.0,
                              iters: int = 8, sigma_y: float = 0.0,
                              m_pap: float = 1e4, substeps: int = 1,
                              dtype=jnp.float32,
                              block_rows: int | None = None,
                              interpret: bool = False):
    """Fused power-law / Herschel-Bulkley step: f (9, R, C) ->
    (9, R, C), ``substeps`` steps per launch (the BGK kernel's tuned
    temporal blocking)."""
    return collide_stream.make_fused_step(
        R, C, power_law_collide_fn(cons_K, n, tau_min, tau_max, iters,
                                   dtype, sigma_y, m_pap),
        dtype=dtype, block_rows=block_rows, interpret=interpret,
        flops_per_cell=130 + 40 * iters, substeps=substeps)
