"""MRT-CG kernel stage ablation + op-count roofline (the ablate_kbc.py
methodology applied to the multiphase flagship, VERDICT r3 item 6/1).

Ablations stub ONE stage each with shape-preserving cheap math
(mrtcg_pallas `_ablate` — measurement only, NOT physics):

  grad   the three 5x5 isotropic stencil groups (psi gradient + the two
         correction-field derivatives)
  mrt    the moment-space omega1 chain
  bc     the streaming BC masks (pure periodic rolls remain)

Also traces the reduced body with jax.make_jaxpr and counts per-cell
vector arithmetic ops, giving the sustained vector T-op/s for the full
kernel (compare: v5e VPU peak ~7.1 T-op/s f32, the KBC family sustains
4.9-5.3 — docs/BENCHMARKS.md "KBC roofline").

Usage (real TPU): python scripts/ablate_mrtcg.py [rows cols substeps block]
"""
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(step, f, substeps):
    H, W = f.shape[-2], f.shape[-1]
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g))

    def timed(n):
        t0 = time.perf_counter()
        out = chunk(f, n)
        float(out.sum())  # forced device->host read (relay-safe timing)
        return time.perf_counter() - t0

    timed(2)
    timed(2)
    n = 50
    dt = timed(n)
    while dt < 0.25 and n < 500000:
        n = min(500000, max(n * 2, int(n * 0.4 / max(dt, 1e-3))))
        dt = timed(n)
    n_full = min(500000, max(n, int(n * 1.2 / max(dt, 1e-3))))
    n_small = max(1, n_full // 8)
    timed(n_small)
    marginals = []
    for _ in range(3):
        dt_s = timed(n_small)
        dt_f = timed(n_full)
        marginals.append(H * W * (n_full - n_small) * substeps
                         / max(dt_f - dt_s, 1e-9) / 1e6)
    return sorted(marginals)[1]


_VECTOR_OPS = {
    "add", "sub", "mul", "div", "max", "min", "select_n", "sqrt", "rsqrt",
    "abs", "neg", "exp", "log", "sign", "integer_pow", "pow", "and", "or",
    "not", "xor", "lt", "le", "gt", "ge", "eq", "ne", "rem",
}


def count_vector_ops(run, planes, rows, C):
    """Per-cell arithmetic vector-op count of a slab body, from its jaxpr
    (reductions and iota/roll/copy excluded — matching the KBC roofline's
    counting convention)."""
    block = jnp.zeros((planes, rows, C), jnp.float32)
    abs_iota = jnp.zeros((rows, C), jnp.int32)
    jaxpr = jax.make_jaxpr(lambda b, a: run(b, a, False))(block, abs_iota)
    n = 0

    def walk(jx):
        nonlocal n
        for eqn in jx.eqns:
            for p in ("jaxpr", "call_jaxpr", "cond_jaxpr"):
                sub = eqn.params.get(p)
                if sub is not None:
                    walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
            if eqn.params.get("branches"):
                for br in eqn.params["branches"]:
                    walk(br.jaxpr if hasattr(br, "jaxpr") else br)
            if eqn.primitive.name in _VECTOR_OPS:
                out = eqn.outvars[0].aval
                if getattr(out, "ndim", 0) >= 2:
                    n += 1
    walk(jaxpr.jaxpr)
    return n


def main():
    from lbm_tpu.kernels.mrtcg_pallas import (
        halo_for, make_mrtcg_body, make_mrtcg_reduced_step,
        reduce_mrtcg_state)
    from lbm_tpu.ops import d2q9
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    substeps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    block = int(sys.argv[4]) if len(sys.argv) > 4 else None
    dtype = jnp.float32
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0))

    r0 = init_rho_cosine(H, W, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(H, W, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, H, W), dtype),
                           jnp.ones((H, W), dtype))
    tot = jnp.maximum(r0 + b0, 1e-30)[None].astype(dtype)
    F = jnp.stack([r0[None].astype(dtype) * feq / tot,
                   b0[None].astype(dtype) * feq / tot])
    G = reduce_mrtcg_state(F)

    # --- op count of one reduced sweep (substeps=1 body, interior path)
    halo = halo_for(1, 3)
    run1 = make_mrtcg_body(H, W, DEFAULT_RED, DEFAULT_BLUE, **kw,
                           dtype=dtype, reduced=True, substeps=1)
    rows = 64 + 2 * halo
    ops = count_vector_ops(run1, 10, rows, W)
    # jaxpr ops are per slab row; per KEPT cell multiply by the halo
    # redundancy the measured kernel pays
    log(f"jaxpr vector ops / slab cell (one sweep): {ops}")

    results = {}
    for name, ab in [("full", frozenset()),
                     ("grad_stub", frozenset({"grad"})),
                     ("mrt_stub", frozenset({"mrt"})),
                     ("bc_stub", frozenset({"bc"})),
                     ("fixups_stub", frozenset({"fixups"})),
                     ("stream_stub", frozenset({"stream"}))]:
        step = make_mrtcg_reduced_step(
            H, W, DEFAULT_RED, DEFAULT_BLUE, **kw, dtype=dtype,
            block_rows=block, substeps=substeps, _ablate=ab)
        m = measure(step, G, substeps)
        results[name] = round(m, 1)
        log(f"{name:10s} {m:8.0f} MLUPS")

    full = results["full"]
    tops = full * 1e6 * ops / 1e12
    log(f"sustained vector throughput (interior-op count x full rate): "
        f"{tops:.2f} T-op/s")
    print({"grid": f"{H}x{W}", "substeps": substeps,
           "ops_per_cell_sweep": ops, **results,
           "sustained_tops": round(tops, 2),
           "stage_fractions": {
               k.replace("_stub", ""): round(1.0 - full / v, 3)
               for k, v in results.items() if k != "full" and v > 0}})


if __name__ == "__main__":
    main()
