"""Throughput benchmark: fused D2Q9 collide-stream kernels, MLUPS per chip.

The reference publishes no performance numbers (SURVEY.md section 6); the
driver-set target is >= 2000 MLUPS/chip for the fused collide-stream kernel
(BASELINE.md).  Prints exactly ONE JSON line to stdout; all diagnostics go
to stderr.

By default the driver-recorded number (``value``) is measured on a
REPRESENTATIVE wide grid (4096x2048) and the tuned tall-narrow geometry
(7936x128 — column rolls confined to one 128-lane tile) is reported
alongside as ``value_peak``, so the headline is unambiguous about shape
generality.  Passing --rows/--cols explicitly benches just that geometry.
"""

from __future__ import annotations

import argparse
import json
import math
import numpy as np
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_step(args, H, W):
    """Build (step_fn, initial_state, impl, substeps) for one geometry."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.ops import d2q9

    dtype = jnp.dtype(args.dtype)
    omega = 1.0 / 0.8

    def jnp_step(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        feq = d2q9.equilibrium(u, rho)
        return d2q9.stream(d2q9.bgk_collision(f, feq, omega))

    if args.substeps is None:
        # data-driven defaults: the colour-gradient families take the
        # measured wide-shape optimum (mrtcg_pallas.default_geometry,
        # round-4 sweep in docs/BENCHMARKS.md); everything else keeps
        # the deepest generic cadence
        if args.model in ("mrtcg", "mrtcg_full", "csf", "csf_full"):
            from lbm_tpu.kernels.mrtcg_pallas import default_geometry

            st = "csf" if args.model.startswith("csf") else "perturbation"
            ss, bb = default_geometry(st, R=H, C=W)
            args.substeps = ss
            if args.block_rows is None:
                args.block_rows = bb
        else:
            args.substeps = 8

    impl = args.impl
    step = jnp_step

    rho0 = jnp.ones((H, W), dtype)
    u0 = jnp.zeros((2, H, W), dtype).at[0].set(0.05)
    f = d2q9.equilibrium(u0, rho0)

    if args.model == "kbc":
        from lbm_tpu.kernels.collide_stream import make_kbc_fused_step
        from lbm_tpu.models import kbc as kbc_model

        step = make_kbc_fused_step(H, W, omega, dtype,
                                   substeps=min(args.substeps, 8),
                                   gamma_impl=args.gamma)
        f = kbc_model.equilibrium(rho0, u0).astype(dtype)
        impl = "pallas"
    elif args.model in ("mrtcg", "mrtcg_full"):
        from lbm_tpu.kernels.mrtcg_pallas import (
            make_mrtcg_fused_step, make_mrtcg_reduced_step,
            reduce_mrtcg_state)
        from lbm_tpu.scenes.multiphase import (
            DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)
        from lbm_tpu.models.mrt_cg import MRTCGModel
        from lbm_tpu.scenes.multiphase import mrtcg_boundary

        if args.substeps > 8:
            log("mrtcg kernel caps substeps at 8 (3 halo rows/sweep on a "
                "24-row slab halo)")
            args.substeps = 8  # keep the MLUPS accounting honest
        kw = dict(dtype=dtype, block_rows=args.block_rows,
                  substeps=args.substeps)
        model = MRTCGModel(red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=1e-4,
                           gravity=(6.25e-7, 0.0), boundary=mrtcg_boundary)
        st = model.init_state(init_rho_cosine(H, W, 3.0, True, -1.0),
                              init_rho_cosine(H, W, 1.0, False, -1.0),
                              dtype=dtype)
        f = jnp.stack([st.red.f, st.blue.f])
        if args.model == "mrtcg_full":
            # the 18-plane kernel, kept for comparison; production scenes
            # run the reduced 10-plane state (scenes/multiphase.py)
            step = make_mrtcg_fused_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0), **kw)
        elif args.lane_block:
            from lbm_tpu.kernels.mrtcg_pallas import \
                make_mrtcg_reduced_lanes_step

            step = make_mrtcg_reduced_lanes_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0),
                lane_block=args.lane_block, **kw)
            f = reduce_mrtcg_state(f)
        else:
            step = make_mrtcg_reduced_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0), **kw)
            f = reduce_mrtcg_state(f)
        impl = "pallas"
    elif args.model in ("csf", "csf_full"):
        from lbm_tpu.kernels.mrtcg_pallas import (
            make_csf_fused_step, make_mrtcg_reduced_step,
            reduce_mrtcg_state)
        from lbm_tpu.models.mrt_cg import MRTCGModel
        from lbm_tpu.scenes.multiphase import (
            DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine, mrtcg_boundary)

        m = MRTCGModel(red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=1e-4,
                       gravity=(6.25e-7, 0.0), boundary=mrtcg_boundary,
                       surface_tension="csf")
        st = m.init_state(init_rho_cosine(H, W, 3.0, True, 1.0),
                          init_rho_cosine(H, W, 1.0, False, 1.0),
                          dtype=dtype)
        f = jnp.concatenate([st.red.f, st.blue.f,
                             jnp.zeros((2, H, W), dtype)], axis=0)
        if args.substeps > 4:
            log("csf kernel caps substeps at 4 (5 halo rows/sweep on a "
                "24-row slab halo)")
            args.substeps = 4  # keep the MLUPS accounting honest
        if args.model == "csf_full":
            step = make_csf_fused_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0),
                dtype=dtype, block_rows=args.block_rows,
                substeps=args.substeps)
        elif args.lane_block:
            from lbm_tpu.kernels.mrtcg_pallas import \
                make_mrtcg_reduced_lanes_step

            step = make_mrtcg_reduced_lanes_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0),
                dtype=dtype, surface_tension="csf",
                block_rows=args.block_rows, substeps=args.substeps,
                lane_block=args.lane_block)
            f = reduce_mrtcg_state(f, surface_tension="csf")
        else:
            # production path: reduced 12-plane CSF state
            step = make_mrtcg_reduced_step(
                H, W, DEFAULT_RED, DEFAULT_BLUE, 1e-4, (6.25e-7, 0.0),
                dtype=dtype, surface_tension="csf",
                block_rows=args.block_rows, substeps=args.substeps)
            f = reduce_mrtcg_state(f, surface_tension="csf")
        impl = "pallas"
    elif args.model == "rk":
        from lbm_tpu.kernels.rk_pallas import make_rk_fused_step
        from lbm_tpu.scenes.multiphase import init_rho_cosine

        if args.substeps != 1:
            log("rk kernel runs substeps=1 (gradient stencils consume "
                "3 halo rows/sweep)")
        step = make_rk_fused_step(
            H, W, r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=0.04, b_nu=0.04,
            sigma=0.1, beta=0.7, gravity=(-6.25e-6, 0.0), dtype=dtype)
        r0 = jnp.asarray(init_rho_cosine(H, W, 3.0, False, 1.0), dtype)
        b0 = jnp.asarray(init_rho_cosine(H, W, 1.0, True, 1.0), dtype)
        rho = r0 + b0
        f0 = d2q9.equilibrium(jnp.zeros((2, H, W), dtype), rho)
        f = jnp.concatenate([f0, r0[None], b0[None]], axis=0)
        impl = "pallas"
    elif args.model == "cavity":
        from lbm_tpu.kernels.cavity_pallas import make_cavity_fused_step

        L = min(H, W)
        if H != W:
            log(f"cavity kernel is square; using {L}x{L}")
        H = W = L
        step = make_cavity_fused_step(L, omega=omega, force=1e-5,
                                      substeps=args.substeps,
                                      dtype=dtype)
        f = d2q9.equilibrium(jnp.zeros((2, L, L), dtype),
                             jnp.ones((L, L), dtype))
        impl = "pallas"
    elif args.model == "cylinder":
        from lbm_tpu.kernels.cylinder_pallas import make_cylinder_fused_step
        from lbm_tpu.kernels.ibm_pallas import make_ibm_forcing_step
        from lbm_tpu.ops.ibm import IBM

        # the full scene chain: forcing kernel + grid kernel per step
        ib = IBM.circle(H // 4, W // 2, min(H, W) / 32.0, 64)
        fused = make_cylinder_fused_step(H, W, 1.0 / 0.55, dtype=dtype)
        kforce = make_ibm_forcing_step(H, W, ib, dtype=dtype)
        if kforce is None:
            raise SystemExit("cylinder bench: marker window does not fit "
                             "this grid; pick rows/cols >= 256")

        def step(c):
            g, F = c
            F = kforce(g, F)
            return fused(g, F), F

        f = (d2q9.incomp_equilibrium(u0, rho0),
             jnp.zeros((2, H, W), dtype))
        impl = "pallas"
    elif args.model == "falling":
        from lbm_tpu.kernels.cylinder_pallas import make_box_fused_step
        from lbm_tpu.kernels.moving_ibm_pallas import (
            make_moving_forcing_step, pack_state)

        # the full moving-body chain: dynamic-window forcing (in-kernel
        # rigid-body carry) + box grid kernel per step
        radius = min(H, W) / 32.0
        half = int(np.ceil(radius)) + 5
        nm = int(np.ceil(2 * np.pi * radius))
        theta = np.linspace(0.0, 2.0 * np.pi, nm, endpoint=False)
        area = np.pi * radius * radius
        kforce = make_moving_forcing_step(
            H, W, radius * np.cos(theta), radius * np.sin(theta),
            half=half, g_net=0.25 * area * 5e-5, m_eff=1.25 * area,
            dtype=dtype)
        if kforce is None:
            raise SystemExit("falling bench: moving window does not fit "
                             "this grid; pick rows/cols >= 256")
        box = make_box_fused_step(H, W, 1.0 / 0.6, dtype=dtype)

        def step(c):
            g, F, st = c
            F, st = kforce(g, st, F)
            return box(g, F), F, st

        f = (d2q9.incomp_equilibrium(u0, rho0),
             jnp.zeros((2, H, W), dtype),
             pack_state((H / 4.0, W / 2.0), dtype=dtype))
        impl = "pallas"
    elif args.model == "sediment":
        from lbm_tpu.kernels.sediment_pallas import make_sediment_fused_step

        u_in, w_s, C_w = 0.02, 3e-3, 1e-3
        step = make_sediment_fused_step(
            H, W, omega=1.0 / 0.55, u_in=u_in, w_s=w_s, C_w=C_w,
            R23=H - H // 3, C28=W // 4, C38=3 * W // 8,
            inlet_rows=min(50, H // 4), substeps=args.substeps,
            dtype=dtype)
        us = jnp.zeros((2, H, W), dtype).at[1].set(u_in)
        f0 = d2q9.incomp_equilibrium(us, rho0)
        g0 = d2q9.equilibrium(us, jnp.zeros((H, W), dtype))
        f = jnp.concatenate([f0, g0], axis=0)
        impl = "pallas"
    elif args.model == "d3q19":
        from lbm_tpu.kernels.d3q19_pallas import make_d3q19_fused_step
        from lbm_tpu.ops import d3q19 as _d3
        from lbm_tpu.scenes.three_d import _pack

        X3 = args.x3 or 16  # depth-as-planes; X*Z <= ~6400 (VMEM bound)
        if W > 128:
            log(f"d3q19 depth-as-planes needs X*Z <= ~6400; using Z=128")
            W = 128
        step = make_d3q19_fused_step(X3, H, W, omega=omega, force_z=1e-6,
                                     x_walls=True, substeps=args.substeps,
                                     block_rows=args.block_rows,
                                     dtype=dtype)
        f3 = _d3.equilibrium(jnp.zeros((3, X3, H, W), dtype),
                             jnp.ones((X3, H, W), dtype))
        f = _pack(f3, X3, H, W)
        H = X3 * H  # report MLUPS on the true 3-D cell count
        impl = "pallas"
    elif args.model == "d3q19l":
        from lbm_tpu.kernels.d3q19_lanes_pallas import (
            make_d3q19_lanes_step, pack_lanes)
        from lbm_tpu.ops import d3q19 as _d3

        X3 = args.x3 or 16
        if W > 128:
            log(f"d3q19l lanes layout benches at Z=128 (lanes = x3*Z)")
            W = 128
        step = make_d3q19_lanes_step(X3, H, W, omega=omega, force_z=1e-6,
                                     x_walls=True, substeps=args.substeps,
                                     block_rows=args.block_rows,
                                     dtype=dtype)
        f3 = _d3.equilibrium(jnp.zeros((3, X3, H, W), dtype),
                             jnp.ones((X3, H, W), dtype))
        f = pack_lanes(f3, X3, H, W)
        H = X3 * H  # report MLUPS on the true 3-D cell count
        impl = "pallas"
    elif args.model == "les":
        from lbm_tpu.kernels.les_pallas import make_les_fused_step
        from lbm_tpu.scenes.ulbm import double_shear_init

        step = make_les_fused_step(H, W, tau0=0.5 + 3e-4, cs_smag=0.17,
                                   substeps=args.substeps, dtype=dtype)
        m0, us = double_shear_init(H, W, 0.05, dtype=dtype)
        f = d2q9.equilibrium(us, m0)
        impl = "pallas"
    elif args.model == "sc":
        from lbm_tpu.kernels.shan_chen_pallas import make_sc_fused_step

        if args.substeps > 4:
            log("sc kernel caps substeps at 4 (2 halo rows/sweep)")
            args.substeps = 4  # keep the MLUPS accounting honest
        step = make_sc_fused_step(H, W, omega=1.0, G=-5.0,
                                  substeps=args.substeps, dtype=dtype)
        rho_sc = 0.7 + 0.02 * jax.random.normal(jax.random.PRNGKey(0),
                                                (H, W), dtype)
        f = d2q9.equilibrium(jnp.zeros((2, H, W), dtype), rho_sc)
        impl = "pallas"
    elif args.model == "plaw":
        from lbm_tpu.kernels.power_law_pallas import make_power_law_fused_step
        from lbm_tpu.scenes.ulbm import double_shear_init

        step = make_power_law_fused_step(H, W, cons_K=0.01, n=0.5,
                                         substeps=args.substeps, dtype=dtype)
        m0, us = double_shear_init(H, W, 0.05, dtype=dtype)
        f = d2q9.equilibrium(us, m0)
        impl = "pallas"
    elif args.model == "trt":
        from lbm_tpu.kernels.trt_pallas import make_trt_fused_step
        from lbm_tpu.models.trt import omega_minus_from_magic

        om_p = 1.0 / 0.9
        step = make_trt_fused_step(H, W, omega_plus=om_p,
                                   omega_minus=omega_minus_from_magic(om_p),
                                   substeps=args.substeps, dtype=dtype)
        f = d2q9.equilibrium(jnp.zeros((2, H, W), dtype),
                             jnp.ones((H, W), dtype))
        impl = "pallas"
    elif args.model in ("thermal", "thermal5"):
        from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
        from lbm_tpu.scenes.thermal import (
            CS2, conduction_profile, d2q5_equilibrium)

        tau_g = 0.8
        kappa = CS2 * (tau_g - 0.5)
        nu = 0.71 * kappa
        slat = "d2q5" if args.model == "thermal5" else "d2q9"
        step = make_thermal_fused_step(
            H, W, omega_f=1.0 / (nu / CS2 + 0.5), omega_g=1.0 / tau_g,
            g_beta=1e4 * nu * kappa / float(H) ** 3,
            substeps=args.substeps, dtype=dtype, scalar_lattice=slat)
        th0 = jnp.asarray(conduction_profile(H), dtype)[:, None] \
            * jnp.ones((1, W), dtype)
        u0 = jnp.zeros((2, H, W), dtype)
        geq = d2q5_equilibrium(u0, th0) if slat == "d2q5" \
            else d2q9.equilibrium(u0, th0)
        f = jnp.concatenate([d2q9.equilibrium(u0, rho0), geq], axis=0)
        impl = "pallas"
    elif impl in ("auto", "pallas"):
        try:
            from lbm_tpu.kernels.bgk_pallas import make_fused_step

            if not args.sharded:  # sharded replaces step below
                step = make_fused_step(H, W, omega, dtype,
                                       substeps=args.substeps)
            impl = "pallas"
        except Exception as e:  # pragma: no cover
            if args.impl == "pallas":
                raise
            log(f"pallas kernel unavailable ({e}); falling back to jnp")
            impl = "jnp"

    if args.sharded:
        from lbm_tpu.parallel import mesh as meshmod

        n_dev = len(jax.devices())
        m = meshmod.make_mesh(shape=(n_dev, 1))
        if impl == "pallas":
            # the production multi-chip path: ppermute halos + local
            # fused kernel, one exchange per `substeps` steps
            from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn
            from lbm_tpu.kernels.sharded_pallas import make_sharded_fused_step

            step = make_sharded_fused_step(
                m, H, W, bgk_collide_fn(omega, dtype), dtype=dtype,
                substeps=args.substeps)
        f = meshmod.shard_state(m, f)
        log(f"sharded over mesh {m.devices.shape} ({n_dev} devices, {impl})")

    substeps = args.substeps if (impl == "pallas"
                                 and args.model in ("bgk", "kbc", "thermal",
                                                    "thermal5", "sediment",
                                                    "cavity", "les", "trt",
                                                    "d3q19", "sc", "mrtcg",
                                                    "mrtcg_full", "csf",
                                                    "csf_full")) else 1
    return step, f, impl, substeps, H, W


def measure(args, H, W):
    """Bench one geometry; returns (median marginal MLUPS, impl, H, W) —
    H/W as actually run (models may clamp cols or fold depth into rows,
    e.g. d3q19), so records label the true geometry."""
    import jax

    step, f, impl, substeps, H, W = build_step(args, H, W)
    log(f"grid {H}x{W}, {args.steps} steps, {args.dtype}, impl={impl}")

    # DYNAMIC trip count: one executable serves every window size (a
    # traced fori_loop bound lowers to while_loop; measured identical
    # per-step rate to the static form), so window sizing below costs
    # probes, not recompiles, through the slow relay.
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g))

    def timed(n):
        """Full round-trip with a forced scalar read: through the axon relay
        block_until_ready can return before execution completes, so only a
        device->host read is trustworthy timing."""
        t0 = time.perf_counter()
        out = chunk(f, n)
        s = float(jax.tree.leaves(out)[0].sum())
        return time.perf_counter() - t0, s

    t0 = time.perf_counter()
    timed(2)
    timed(2)
    # Size the window for ~1.2 s launches, safely under the relay's ~2 s
    # single-launch hang ceiling.  Small windows are untrustworthy: the
    # relay's completion polling quantises launch cost by 10-20 ms
    # (measured cost(1000 steps) < cost(800) on the same kernel), which
    # depressed sub-0.2 s marginal windows by up to 27%.
    n = max(2, args.steps // substeps)
    dt, _ = timed(n)
    while dt < 0.25 and n < 500000:
        n = min(500000, max(n * 2, int(n * 0.4 / max(dt, 1e-3))))
        dt, _ = timed(n)
    n_full = min(500000, max(n, int(n * 1.2 / max(dt, 1e-3))))
    n_small = max(1, n_full // 8)
    timed(n_small)
    dt_probe, _ = timed(n_full)
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s "
        f"(n_full={n_full}, {dt_probe:.3f}s/launch)")

    # marginal rate removes the per-launch relay overhead (erratic through
    # the axon tunnel), measuring sustained kernel throughput; median of 3
    marginals = []
    ssum = 0.0
    for _ in range(3):
        dt_small, _ = timed(n_small)
        dt_full, ssum = timed(n_full)
        marginals.append(
            H * W * (n_full - n_small) * substeps
            / max(dt_full - dt_small, 1e-9) / 1e6)
        log(f"  {dt_full:.3f}s full / {dt_small:.3f}s small -> "
            f"{marginals[-1]:.0f} MLUPS")
    if not (ssum == ssum):  # NaN check on the forced read
        log("WARNING: non-finite state after benchmark run")
    marginal = sorted(marginals)[1]
    if dt_full - dt_small < 0.02:
        # marginal timing is below the relay's noise floor; report the
        # end-to-end rate instead of a meaningless difference
        marginal = H * W * n_full * substeps / dt_full / 1e6
        log("marginal window under noise floor; using end-to-end rate")
    log(f"median marginal {marginal:.0f} MLUPS ({impl}) at {H}x{W}")
    return marginal, impl, H, W


# (wide representative, tall-narrow peak) default geometries per model.
# Multiphase/stencil kernels use smaller trip-count-friendly grids so the
# two-geometry default run stays under the relay's launch ceiling.
WIDE_GRID = (4096, 2048)
PEAK_GRID = (7936, 128)
PEAK_GRID_STENCIL = (2048, 128)  # 128-lane tile confinement, stencil models
WIDE_GRID_STENCIL = (1024, 512)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=None,
                    help="explicit geometry (disables the two-grid default)")
    ap.add_argument("--cols", type=int, default=None)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--quick", action="store_true", help="small grid, few steps")
    ap.add_argument("--model", default="bgk",
                    choices=["bgk", "kbc", "mrtcg", "mrtcg_full",
                             "csf", "csf_full", "rk", "sc",
                             "cavity", "cylinder", "falling", "sediment",
                             "thermal", "thermal5", "les", "trt", "plaw",
                             "d3q19", "d3q19l"],
                    help="collision family / fused scene kernel to benchmark")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "jnp", "pallas"],
                    help="step implementation: XLA-fused jnp or Pallas kernel")
    ap.add_argument("--block-rows", type=int, default=None,
                    help="override the kernel's auto row-block pick "
                    "(mrtcg/csf/rk models)")
    ap.add_argument("--gamma", default="factored",
                    choices=["direct", "factored"],
                    help="kbc: entropic-gamma implementation (factored = "
                    "the separable-basis identity, the measured +4% "
                    "production default; direct = the term-for-term form)")
    ap.add_argument("--lane-block", type=int, default=None,
                    help="mrtcg/csf: run the lane-blocked experiment "
                    "kernel (make_mrtcg_reduced_lanes_step) with this "
                    "column tile size")
    ap.add_argument("--substeps", type=int, default=None,
                    help="LBM steps per kernel launch (temporal blocking; "
                         "pallas impl only, 1..8; default: 8, or the "
                         "measured wide-shape optimum for mrtcg/csf)")
    ap.add_argument("--x3", type=int, default=None,
                    help="d3q19 only: depth extent folded into planes "
                         "(P = 19*x3; default 16).  Shallower depth at "
                         "the same --rows*x3 cell count admits taller "
                         "row blocks (VMEM ~ P*B)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard the grid over all devices via the "
                         "production ppermute+Pallas kernel (or the GSPMD "
                         "jnp step with --impl jnp); weak-scaling harness "
                         "— needs a multi-chip slice to measure scaling)")
    args = ap.parse_args()

    import jax

    log(f"devices: {jax.devices()}")
    if args.model != "bgk" and args.sharded:
        ap.error("--sharded currently benchmarks the bgk model only")

    stencil = args.model in ("mrtcg", "csf", "rk")
    if args.quick:
        args.rows, args.cols, args.steps = 1024, 1024, 400
    if args.rows is not None or args.cols is not None:
        wide = (args.rows or 1024, args.cols or 1024)
        peak = None  # explicit geometry: single measurement
    else:
        wide = WIDE_GRID_STENCIL if stencil else WIDE_GRID
        peak = PEAK_GRID_STENCIL if stencil else PEAK_GRID

    baseline = 2000.0  # BASELINE.md north star, MLUPS/chip
    mlups, impl, H_run, W_run = measure(args, *wide)
    lattice = "" if args.model == "d3q19" else "_d2q9"  # model names lattice
    record = {
        "metric": args.model + lattice + "_collide_stream_mlups_" + impl
                  + ("_sharded" if args.sharded else ""),
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / baseline, 3),
        "grid": f"{H_run}x{W_run}",
    }
    if peak is not None:
        mlups_peak, _, Hp, Wp = measure(args, *peak)
        record["value_peak"] = round(mlups_peak, 1)
        record["grid_peak"] = f"{Hp}x{Wp}"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
