"""ULBM (KBC) scenes.

  * ulbm_poiseuille       — test/ulbm_poiseuille.cpp:61-147
  * ulbm_double_shear     — test/ulbm_double_shear_flow.cpp:42-143
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary import bc
from ..models import kbc
from ..ops import d2q9
from ..utils import observe
from ..utils.xmath import default_float, launch_cap, resolve_fused


@dataclass
class ULBMResult:
    f: jnp.ndarray
    m0: jnp.ndarray
    m1: jnp.ndarray
    steps: int
    l2: float | None = None  # vs the analytic parabola (poiseuille only)
    #: (step, |mean/old_mean - 1|) samples from the convergence watcher
    #: (tolerance mode only) — the long-horizon f32 floor diagnostic
    watch: list | None = None


def _ulbm_l2(u_x, u_max: float) -> float:
    """Reference's row-averaged relative L2 vs the analytic parabola —
    same metric as the hard horizontal_poiseuille gate
    (horizontal_poiseuille_test.cpp:163-173), applied to the KBC
    channel's cross-channel (columns) profile."""
    from .channel import poiseuille_l2

    return poiseuille_l2(np.asarray(u_x), u_max)


def ulbm_poiseuille(H: int = 128, W: int = 128, T: int = 300000,
                    nu: float = 1e-4, u_max: float = 0.05,
                    fused: bool | None = None,
                    tolerance: float | None = None,
                    t_interval: int = 100,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 10000,
                    dtype=None) -> ULBMResult:
    """KBC channel with pressure-periodic inlet/outlet and no-slip side
    walls.  Parameters cite /root/reference/test/ulbm_poiseuille.cpp:64-85.
    ``fused=True`` runs the whole step (BCs included) as one Pallas kernel
    (f32, W%128==0, H%8==0).

    The reference driver runs a FLAT 300k steps (ulbm_poiseuille.cpp:
    105-147, no stop test); ``tolerance`` optionally adds the 1e-12
    relative-mean-ux convergence watcher its single-phase siblings use
    (horizontal_poiseuille_test.cpp:95,112-120) at the same ``t_interval``
    = 100 cadence, so long-horizon steady-state studies stop when
    converged.  ``l2`` on the result is the reference's row-averaged
    relative L2 of u_x vs the analytic parabola.  ``checkpoint_dir``
    enables uniform checkpoint/resume (utils.observe.drive_chunked)."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / (0.5 + 3.0 * nu)
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet
    model = kbc.KBCModel(s2=omega)

    def watched_drive(step_or_chunk, carry, mean_ux):
        """Convergence-watched loop (tolerance mode): chunked at
        ``t_interval`` so the stop step matches the reference cadence."""
        steps, old_mean = 0, 1.0
        watch = []
        carry = step_or_chunk(carry, 1)
        steps += 1
        while steps < T:
            mean = float(mean_ux(carry))
            rel = abs(mean / old_mean - 1.0) if old_mean != 0.0 else np.inf
            watch.append((steps, rel))
            if rel < tolerance:
                break
            old_mean = mean
            n = min(t_interval, T - steps)
            carry = step_or_chunk(carry, n)
            steps += n
            observe.check_finite(carry, steps)
        return carry, steps, watch

    if fused:
        from ..kernels.channel_pallas import make_channel_fused_step

        step = make_channel_fused_step(H, W, omega, rho_inlet, rho_outlet,
                                       dtype=dtype, family="kbc")
        f = model.equilibrium(jnp.ones((H, W), dtype),
                              jnp.zeros((2, H, W), dtype))
        chunk = jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1)
        watch = None
        if tolerance is not None:
            mean_ux = jax.jit(lambda g: jnp.mean(d2q9.calc_momentum(g)[0]))
            f, steps, watch = watched_drive(chunk, f, mean_ux)
        else:
            f, _ = observe.drive_chunked(
                step, f, T, 0, H * W, 0.12, None,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every)
            steps = T
        m0, u = model.macroscopics(f)
        return ULBMResult(f=f, m0=m0, m1=u, steps=steps,
                          l2=_ulbm_l2(u[0], u_max), watch=watch)

    def step(carry):
        f, m0, u = carry
        f_coll = model.collide(f, m0, u)
        # pressure BC uses the KBC equilibrium as f_equi
        # (the driver passes iequi_f^-1, ulbm_poiseuille.cpp:120)
        f_equi = model.equilibrium(m0, u)
        f_coll = bc.pressure_periodic(
            f_coll, f_equi, u, rho_inlet, rho_outlet, axis=0,
            eq_fn=d2q9.incomp_equilibrium)
        f_new = d2q9.stream(f_coll)
        f_new = bc.bounce_back(f_new, f_coll, "colN")
        f_new = bc.bounce_back(f_new, f_coll, "col0")
        m0, u = model.macroscopics(f_new)
        return f_new, m0, u

    m0 = jnp.ones((H, W), dtype=dtype)
    u = jnp.zeros((2, H, W), dtype=dtype)
    f = jnp.zeros((9, H, W), dtype=dtype)  # driver starts from zero f
    # The driver never initialises adve_f explicitly; it relies on m0=1 and
    # the first collide.  We initialise at equilibrium, which is the stable
    # equivalent (the zero-init in the reference only works because the
    # first collide rebuilds f from moments).
    f = model.equilibrium(m0, u)

    carry = (f, m0, u)
    watch = None
    if tolerance is not None:
        chunk = jax.jit(
            lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
            static_argnums=1)
        mean_ux = jax.jit(lambda c: jnp.mean(c[2][0]))
        carry, steps, watch = watched_drive(chunk, carry, mean_ux)
    else:
        carry, _ = observe.drive_chunked(
            step, carry, T, 0, H * W, 0.8, None,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every)
        steps = T
    f, m0, u = carry
    return ULBMResult(f=f, m0=m0, m1=u, steps=steps,
                      l2=_ulbm_l2(u[0], u_max), watch=watch)


def ulbm_poiseuille_df64(H: int = 128, W: int = 128, T: int = 500000,
                         nu: float = 0.05, u_max: float = 0.01,
                         tolerance: float = 1e-10,
                         t_interval: int = 500) -> ULBMResult:
    """The KBC channel in double-single ("df64") arithmetic
    (models.kbc_df64 over utils.df64.DD): f64-class precision from f32
    pairs, so the reference's double-precision convergence watcher can
    run ON the TPU.

    This is the runnable command the round-4 long-horizon study
    prescribes (docs/BENCHMARKS.md "Long-horizon f32 error budget"): at
    the convergent parameters (defaults nu=0.05, u_max=0.01 — the
    `ulbm_floor` leg) the f32 watcher FLOORS at ~1.3e-6, never reaching
    the reference's 1e-12-class criterion
    (ulbm_poiseuille.cpp:63-77 via horizontal_poiseuille_test.cpp:95);
    the df64 path drives the same flow to a watcher tail BELOW 1e-10.
    Same physics chain as ulbm_poiseuille's jnp step: KBC collide ->
    pressure-periodic rows (incompressible virtual lines) -> periodic
    stream -> halfway bounce-back side walls; every arithmetic op is an
    error-free-transformation df64 op (streaming/edge writes act on the
    (hi, lo) pair exactly)."""
    import numpy as np

    from ..core import lattice as lat
    from ..models import kbc_df64
    from ..utils.df64 import DD, from_f64, to_f64

    from ..utils.df64 import resolve_guard

    resolve_guard()  # settle the EFT guard eagerly (outside jit)

    omega = 1.0 / (0.5 + 3.0 * nu)
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_outlet = 1.0
    rho_inlet = 3.0 * (H - 1) * p_grad + rho_outlet
    CXl = [int(v) for v in lat.C[0]]
    CYl = [int(v) for v in lat.C[1]]
    OPPl = [int(v) for v in lat.OPP]
    E_W = [float(w) for w in lat.W]

    def cu_k(k, ux, uy):
        acc = None
        if CXl[k] == 1:
            acc = ux
        elif CXl[k] == -1:
            acc = -ux
        if CYl[k] == 1:
            acc = uy if acc is None else acc + uy
        elif CYl[k] == -1:
            acc = -uy if acc is None else acc - uy
        return acc

    def incomp_eq_k(k, rho, ux, uy):
        """(rho + 3 c.u) E_k — the virtual-line equilibrium
        (bc.pressure_periodic's eq_fn, solver.cpp:39-49)."""
        cu = cu_k(k, ux, uy)
        base = rho if cu is None else rho + 3.0 * cu
        return E_W[k] * base

    # mask-select edge writes instead of .at[].set: XLA's scatter
    # expansion emits an HLO transpose that the TPU AOT path cannot
    # lower when algsimp is disabled (the documented df64-on-chip
    # configuration) — broadcasted-iota selects are elementwise and
    # transpose-free, and bitwise-identical to the overwrite semantics
    row = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(W, dtype=jnp.int32)[None, None, :]

    def step(g):
        """g (9, 2, H, W) -> (9, 2, H, W): one df64 KBC channel step."""
        fs = [DD(g[k]) for k in range(9)]
        m0, ux, uy = kbc_df64.macroscopics(fs)
        coll = kbc_df64.collide(fs, m0, ux, uy, omega)
        feq = kbc_df64.equilibrium(m0, ux, uy)
        # pressure-drop periodic rows (virtual inlet row 0 from row H-2,
        # virtual outlet row H-1 from row 1) on the post-collision state
        ux_out, uy_out = ux[H - 2:H - 1, :], uy[H - 2:H - 1, :]
        ux_in, uy_in = ux[1:2, :], uy[1:2, :]
        for k in range(9):
            vin = incomp_eq_k(k, DD.of(rho_inlet), ux_out, uy_out) \
                + (coll[k][H - 2:H - 1, :] - feq[k][H - 2:H - 1, :])
            vout = incomp_eq_k(k, DD.of(rho_outlet), ux_in, uy_in) \
                + (coll[k][1:2, :] - feq[k][1:2, :])
            v = jnp.where(row == 0, vin.v, coll[k].v)
            coll[k] = DD(jnp.where(row == H - 1, vout.v, v))
        # periodic streaming on the (hi, lo) pairs (exact), then halfway
        # bounce-back on the side walls (cols 0 and W-1)
        new = [jnp.roll(coll[k].v, (CXl[k], CYl[k]), (1, 2))
               for k in range(9)]
        for k in (2, 5, 6):      # outgoing at col W-1
            new[OPPl[k]] = jnp.where(lane == W - 1, coll[k].v,
                                     new[OPPl[k]])
        for k in (4, 7, 8):      # outgoing at col 0
            new[OPPl[k]] = jnp.where(lane == 0, coll[k].v, new[OPPl[k]])
        return jnp.stack(new, axis=0)

    # init at the KBC equilibrium (m0=1, u=0): feq = E (df64-exact split)
    g = jnp.stack([from_f64(np.full((H, W), E_W[k])) for k in range(9)])
    chunk = jax.jit(
        lambda x, n: jax.lax.fori_loop(0, n, lambda _, y: step(y), x),
        static_argnums=1)

    def mean_ux_host(g):
        fs = [DD(g[k]) for k in range(9)]
        _, ux, _ = kbc_df64.macroscopics(fs)
        return float(np.mean(to_f64(ux.v)))

    steps, old_mean = 0, 1.0
    watch = []
    g = chunk(g, 1)
    steps += 1
    while steps < T:
        mean = mean_ux_host(g)
        rel = abs(mean / old_mean - 1.0) if old_mean != 0.0 else np.inf
        watch.append((steps, rel))
        if rel < tolerance:
            break
        old_mean = mean
        n = min(t_interval, T - steps)
        g = chunk(g, n)
        steps += n
        observe.check_finite(g, steps)

    f64 = np.asarray(g[:, 0], np.float64) + np.asarray(g[:, 1], np.float64)
    m0 = f64.sum(axis=0)
    ux = (f64[1] + f64[5] + f64[8] - f64[3] - f64[6] - f64[7]) / m0
    uy = (f64[2] + f64[5] + f64[6] - f64[4] - f64[7] - f64[8]) / m0
    return ULBMResult(f=g, m0=jnp.asarray(m0),
                      m1=jnp.asarray(np.stack([ux, uy])), steps=steps,
                      l2=_ulbm_l2(ux, u_max), watch=watch)


def double_shear_init(H: int, W: int, u_max: float, alpha: float = 80.0,
                      delta: float = 0.05, dtype=None):
    """Double shear layer initial condition.
    cites /root/reference/test/ulbm_double_shear_flow.cpp:42-63"""
    dtype = default_float(dtype)
    r = np.arange(H)[:, None] * np.ones((1, W))
    c = np.ones((H, 1)) * np.arange(W)[None, :]
    ux = u_max * np.tanh(alpha * (0.25 * H - np.abs(c - 0.5 * H)))
    uy = u_max * delta * np.sin(6.2832 * (r + 0.25 * H) / H)
    m0 = np.ones((H, W))
    u = np.stack([ux, uy], axis=0)
    return jnp.asarray(m0, dtype=dtype), jnp.asarray(u, dtype=dtype)


def ulbm_double_shear(H: int = 128, W: int = 128, T: int = 10000,
                      nu: float = 1.70766666e-4, u_max: float = 0.02,
                      fused: bool | None = None,
                      dtype=None) -> ULBMResult:
    """Doubly periodic double shear layer.
    cites /root/reference/test/ulbm_double_shear_flow.cpp:65-143.
    The driver's per-edge periodic copies are identical to fully periodic
    streaming, so no post-stream BCs are needed.  ``fused=True`` uses the
    one-launch KBC Pallas kernel (f32, W%128==0).

    Precision envelope (measured): the reference's default workload is an
    under-resolved Re~1.5e4 shear (tanh(80 x) layers ~0.01 cells wide).
    In f64 it stays finite through the full 10k steps (population max grows
    0.445->0.505); the f32 fused path tracks f64 to ~4k steps and blows up
    near 6k — use the f64 (CPU) path for the full reference run, or resolve
    the layers (smaller alpha / larger nu) for f32."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    omega = 1.0 / (0.5 + 3.0 * nu)
    model = kbc.KBCModel(s2=omega)
    m0, u = double_shear_init(H, W, u_max, dtype=dtype)
    f = model.equilibrium(m0, u)

    if fused:
        from ..kernels.collide_stream import make_kbc_fused_step

        step = make_kbc_fused_step(H, W, omega, dtype)
        g = f.astype(dtype)
        chunk = jax.jit(
            lambda x, n: jax.lax.fori_loop(0, n, lambda _, y: step(y), x),
            static_argnums=1)
        done = 0
        meter = observe.StepMeter(H * W, total_steps=T)
        while done < T:
            n = min(launch_cap(H * W, 0.12), T - done)
            g = chunk(g, n)
            done += n
            meter.update(n)
        m0_f, u_f = model.macroscopics(g)
        return ULBMResult(f=g, m0=m0_f, m1=u_f, steps=T)

    def step(carry):
        f, m0, u = carry
        f_coll = model.collide(f, m0, u)
        f_new = d2q9.stream(f_coll)
        m0, u = model.macroscopics(f_new)
        return f_new, m0, u

    chunk = jax.jit(
        lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
        static_argnums=1,
    )
    carry = (f, m0, u)
    done = 0
    meter = observe.StepMeter(H * W, total_steps=T)
    while done < T:
        n = min(10000, T - done)
        carry = chunk(carry, n)
        done += n
        meter.update(n)
    f, m0, u = carry
    return ULBMResult(f=f, m0=m0, m1=u, steps=T)


def les_double_shear(H: int = 128, W: int = 128, T: int = 10000,
                     nu: float = 1.70766666e-4, u_max: float = 0.02,
                     cs_smag: float = 0.17, substeps: int = 1,
                     fused: bool | None = None, interpret: bool = False,
                     dtype=None) -> ULBMResult:
    """Doubly periodic double shear layer under the Smagorinsky-BGK
    model (models.les) — the same under-resolved workload as
    ulbm_double_shear (ulbm_double_shear_flow.cpp:42-63) stabilised by
    the subgrid closure instead of the entropic KBC operator (BEYOND
    THE REFERENCE; the framework now ships both classical
    stabilisation families).

    Measured at 64x64, u_max = 0.1, nu = 1.7e-4 in f64: plain BGK
    (cs_smag = 0) reaches |f| ~ 1e95 by t = 4000; cs_smag = 0.17 stays
    bounded (|f| = 0.45) — tests/test_les.py.  ``fused=True`` (f32,
    W % 128 == 0) runs the one-launch Pallas kernel
    (kernels.les_pallas) with optional temporal blocking ``substeps``
    (pure periodic body: up to 8 sweeps per launch, no masks at all).
    """
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=H, cols=W)
    tau0 = 0.5 + 3.0 * nu
    m0, u = double_shear_init(H, W, u_max, dtype=dtype)
    f = d2q9.equilibrium(u, m0)

    if fused:
        from ..kernels.les_pallas import make_les_fused_step

        if T % substeps:
            raise ValueError("T must be divisible by substeps")
        step = make_les_fused_step(H, W, tau0=tau0, cs_smag=cs_smag,
                                   substeps=substeps, dtype=dtype,
                                   interpret=interpret)
    else:
        if substeps != 1:
            raise ValueError("substeps requires the fused path")
        from ..models.les import les_collide

        def step(f):
            rho = d2q9.calc_rho(f)
            u = d2q9.calc_u(f, rho)
            return d2q9.stream(les_collide(f, u, rho, tau0, cs_smag))

    chunk = jax.jit(
        lambda x, n: jax.lax.fori_loop(0, n, lambda _, y: step(y), x),
        static_argnums=1)
    done = 0
    calls = T // substeps
    per_cell = 0.1 * substeps if fused else 0.6
    while done < calls:
        n = min(launch_cap(H * W, per_cell), calls - done)
        f = chunk(f, n)
        done += n
        observe.check_finite(f, done * substeps)
    rho = d2q9.calc_rho(f)
    return ULBMResult(f=f, m0=rho, m1=d2q9.calc_u(f, rho), steps=T)
