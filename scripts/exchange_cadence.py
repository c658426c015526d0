"""Measured exchange-cadence model (single chip, synthetic-halo rank
emulation): effective MLUPS and the per-exchange overhead of the sharded
step vs the single-chip fused kernel at matching substeps.

On one chip the sharded step runs the SAME slab body as the single-chip
kernel; the extra cost per launch is the exchange skeleton — the halo
strip slices, the (self-)ppermute, the scalar-prefetch offset and the
separate halo-input launch.  On a real mesh the ppermute rides ICI
instead of self-copy, so the recorded overhead is a LOWER bound on the
per-exchange cost and the crossover substeps is a lower bound on the
optimum; the table still ranks cadences correctly because the ICI term
is the same for every substeps setting (one exchange per launch).

Usage (real TPU): python scripts/exchange_cadence.py [bgk|mrtcg] ...
Prints one JSON line per (family, substeps).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(step, f, substeps, cells):
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g))

    def timed(n):
        t0 = time.perf_counter()
        out = chunk(f, n)
        float(jax.tree.leaves(out)[0].sum())
        return time.perf_counter() - t0

    timed(2)
    timed(2)
    n = 200
    dt = timed(n)
    while dt < 0.25 and n < 500000:
        n = min(500000, max(n * 2, int(n * 0.4 / max(dt, 1e-3))))
        dt = timed(n)
    n_full = min(500000, max(n, int(n * 1.2 / max(dt, 1e-3))))
    n_small = max(1, n_full // 8)
    timed(n_small)
    marg, us = [], []
    for _ in range(3):
        dt_s = timed(n_small)
        dt_f = timed(n_full)
        d = max(dt_f - dt_s, 1e-9)
        marg.append(cells * (n_full - n_small) * substeps / d / 1e6)
        us.append(d / (n_full - n_small) * 1e6)  # us per launch
    return sorted(marg)[1], sorted(us)[1]


def bench_bgk(R, C, substeps_list):
    from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn
    from lbm_tpu.kernels.collide_stream import make_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_fused_step
    from lbm_tpu.parallel import mesh as meshmod

    om = 1.0 / 0.8
    m = meshmod.make_mesh(jax.devices()[:1], shape=(1, 1))
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    fs = meshmod.shard_state(m, f)
    for ss in substeps_list:
        single = make_fused_step(R, C, bgk_collide_fn(om, jnp.float32),
                                 dtype=jnp.float32, substeps=ss)
        sharded = make_sharded_fused_step(
            m, R, C, bgk_collide_fn(om, jnp.float32), dtype=jnp.float32,
            substeps=ss)
        yield ("bgk", ss, measure(single, f, ss, R * C),
               measure(sharded, fs, ss, R * C))


def bench_mrtcg(R, C, substeps_list):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.ops import d2q9
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    m = meshmod.make_mesh(jax.devices()[:1], shape=(1, 1))
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float32)
    r0 = jnp.asarray(init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0),
                     jnp.float32)
    b0 = jnp.asarray(init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0),
                     jnp.float32)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float32),
                           jnp.ones((R, C), jnp.float32))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    Fs = jax.device_put(F, NamedSharding(m, P(None, None, "x", None)))
    for ss in substeps_list:
        single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                       substeps=ss, **kw)
        sharded = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED,
                                          DEFAULT_BLUE, substeps=ss, **kw)
        yield ("mrtcg", ss, measure(single, F, ss, R * C),
               measure(sharded, Fs, ss, R * C))


def main():
    fams = sys.argv[1:] or ["bgk", "mrtcg"]
    runs = []
    if "bgk" in fams:
        runs.append(bench_bgk(2048, 512, [1, 2, 4, 8]))
    if "mrtcg" in fams:
        runs.append(bench_mrtcg(1024, 512, [1, 2, 4]))
    for gen in runs:
        for fam, ss, (m1, us1), (m2, us2) in gen:
            rec = {
                "family": fam, "substeps": ss,
                "single_mlups": round(m1, 1), "sharded_mlups": round(m2, 1),
                "single_us_per_launch": round(us1, 2),
                "sharded_us_per_launch": round(us2, 2),
                "exchange_overhead_us": round(us2 - us1, 2),
            }
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
