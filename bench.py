"""Throughput benchmark: fused D2Q9 BGK collide-stream, MLUPS per chip.

The reference publishes no performance numbers (SURVEY.md section 6); the
driver-set target is >= 2000 MLUPS/chip for the fused collide-stream kernel
(BASELINE.md).  Prints exactly ONE JSON line to stdout; all diagnostics go
to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--quick", action="store_true", help="small grid, few steps")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "jnp", "pallas"],
                    help="step implementation: XLA-fused jnp or Pallas kernel")
    ap.add_argument("--substeps", type=int, default=8,
                    help="LBM steps per kernel launch (temporal blocking; "
                         "pallas impl only, 1..8)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard the grid over all devices (GSPMD jnp step; "
                         "weak-scaling harness — needs a multi-chip slice "
                         "to measure scaling, single chip here)")
    args = ap.parse_args()
    if args.quick:
        args.rows, args.cols, args.steps = 1024, 1024, 20

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.ops import d2q9

    dtype = jnp.dtype(args.dtype)
    H, W = args.rows, args.cols
    log(f"devices: {jax.devices()}")
    log(f"grid {H}x{W}, {args.steps} steps, {args.dtype}, impl={args.impl}")

    omega = 1.0 / 0.8

    def jnp_step(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        feq = d2q9.equilibrium(u, rho)
        return d2q9.stream(d2q9.bgk_collision(f, feq, omega))

    impl = args.impl
    step = jnp_step
    if args.sharded:
        impl = "jnp"  # pallas sharding needs the shard_map halo variant
    if impl in ("auto", "pallas"):
        try:
            from lbm_tpu.kernels.bgk_pallas import make_fused_step

            step = make_fused_step(H, W, omega, dtype, substeps=args.substeps)
            impl = "pallas"
        except Exception as e:  # pragma: no cover
            if args.impl == "pallas":
                raise
            log(f"pallas kernel unavailable ({e}); falling back to jnp")
            impl = "jnp"

    rho0 = jnp.ones((H, W), dtype)
    u0 = jnp.zeros((2, H, W), dtype).at[0].set(0.05)
    f = d2q9.equilibrium(u0, rho0)

    if args.sharded:
        from lbm_tpu.parallel import mesh as meshmod

        m = meshmod.make_mesh()
        f = meshmod.shard_state(m, f)
        log(f"sharded over mesh {m.devices.shape} ({len(jax.devices())} devices)")

    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
        static_argnums=1,
    )

    substeps = args.substeps if impl == "pallas" else 1

    def timed(n):
        """Full round-trip with a forced scalar read: through the axon relay
        block_until_ready can return before execution completes, so only a
        device->host read is trustworthy timing."""
        t0 = time.perf_counter()
        out = chunk(f, n)
        s = float(out.sum())
        return time.perf_counter() - t0, s

    t0 = time.perf_counter()
    n_small = max(2, args.steps // substeps // 8)
    n_full = max(n_small + 1, args.steps // substeps)
    timed(2)
    timed(n_small)  # compile+warm both trip counts outside the timed region
    timed(n_full)
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s")

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
    log(f"median marginal {marginal:.0f} MLUPS ({impl})")
    mlups = marginal

    baseline = 2000.0  # BASELINE.md north star, MLUPS/chip
    print(json.dumps({
        "metric": "bgk_d2q9_collide_stream_mlups_" + impl + ("_sharded" if args.sharded else ""),
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / baseline, 3),
    }))


if __name__ == "__main__":
    main()
