"""Single-chip rate of the 2-D-sharded local kernel (combined column-halo
tile, kernels/sharded2d_pallas.py) vs the 1-D-sharded local kernel at the
same local shape — the column-halo overhead measurement (VERDICT r3 item
4: target within 1.7x of the 1-D rate at 4096x512-class locals; the
round-3 both-sides-padded layout measured 3.4x).

Self-halos stand in for the ICI exchange (same skeleton, no mesh), so
the ratio isolates the kernel-side cost: padded-lane compute + the
strip concats, with the exchange itself identical in both paths.

Usage (real TPU): python scripts/bench_2d.py [R_loc C_loc substeps]
       python scripts/bench_2d.py families [R_loc C_loc]   # mrtcg/csf/sc

The `families` mode extends the measurement beyond BGK (VERDICT r4
item 5): per multiphase family, the 2-D-sharded local body kernel
(make_local_2d_body_step at the combined-tile layout, global offsets
(0,0), self-halos) vs the 1-D-sharded local body kernel
(make_local_halo_body_step) running the SAME body at the same shape
and cadence.  Valid 2-D cadences are structural: the fixed 8-row slab
halo admits 8 // rows_per_sweep sweeps (mrtcg 3 -> 2, csf 5 -> 1,
sc 2 -> 4), all far under the combined-tile seam garbage-front bound
substeps * lanes_per_sweep <= 32 (mrtcg 6/32, csf 5/32, sc 8/32) —
the row halo, not the seam, is the binding cadence limit for every
stencil family.
"""
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ablate_mrtcg import log, measure  # noqa: E402


def main():
    from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn
    from lbm_tpu.kernels.sharded2d_pallas import (
        CHALF, make_local_2d_step)
    from lbm_tpu.kernels.sharded_pallas import make_local_halo_step
    from lbm_tpu.kernels.collide_stream import HALO
    from lbm_tpu.ops import d2q9

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    substeps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dtype = jnp.float32
    fn = bgk_collide_fn(1.0 / 0.8, dtype)

    f = d2q9.equilibrium(
        jnp.zeros((2, R, C), dtype).at[0].set(0.02),
        jnp.ones((R, C), dtype))

    # --- 1-D local kernel with self-halos
    inner1 = make_local_halo_step(R, C, fn, dtype=dtype, substeps=substeps)

    def step1(g):
        return inner1(g, g[:, -HALO:], g[:, :HALO])

    m1 = measure(step1, f, substeps)
    log(f"1-D local: {m1:.0f} MLUPS")

    # --- 2-D local kernel, self-halos (periodic both axes)
    inner2 = make_local_2d_step(R, C, fn, dtype=dtype, substeps=substeps)

    def step2(g):
        top, bot = g[:, -HALO:], g[:, :HALO]
        rowpad = jnp.concatenate([top, g, bot], axis=1)
        combined = jnp.concatenate(
            [rowpad[:, :, :CHALF], rowpad[:, :, -CHALF:]], axis=2)
        return inner2(g, top, bot, combined)

    m2 = measure(step2, f, substeps)
    log(f"2-D local: {m2:.0f} MLUPS")
    print(json.dumps({"grid": f"{R}x{C}", "substeps": substeps,
                      "mlups_1d": round(m1, 1), "mlups_2d": round(m2, 1),
                      "ratio": round(m1 / m2, 2)}))


def families():
    """2-D vs 1-D local body kernels for the multiphase families."""
    import numpy as np

    from lbm_tpu.kernels.collide_stream import HALO
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_body
    from lbm_tpu.kernels.shan_chen_pallas import make_sc_body
    from lbm_tpu.kernels.sharded2d_pallas import CHALF, \
        make_local_2d_body_step
    from lbm_tpu.kernels.sharded_pallas import make_local_halo_body_step
    from lbm_tpu.ops import d2q9
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    dtype = jnp.float32

    def mp_state(csf):
        r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, 1.0)
        b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, 1.0)
        feq = d2q9.equilibrium(jnp.zeros((2, R, C), dtype),
                               jnp.ones((R, C), dtype))
        tot = jnp.maximum(r0 + b0, 1e-30)[None].astype(dtype)
        parts = [(r0[None] * feq / tot).astype(dtype),
                 (b0[None] * feq / tot).astype(dtype)]
        if csf:
            parts.append(jnp.zeros((2, R, C), dtype))
        return jnp.concatenate(parts, axis=0)

    def sc_state():
        rho = 0.7 + 0.01 * jnp.cos(
            jnp.arange(R, dtype=dtype))[:, None] * jnp.ones((1, C), dtype)
        return d2q9.equilibrium(jnp.zeros((2, R, C), dtype), rho)

    cases = []
    for st, ss_max in (("perturbation", 2), ("csf", 1)):
        planes = 20 if st == "csf" else 18
        for ss in {1, ss_max}:
            run = make_mrtcg_body(R, C, DEFAULT_RED, DEFAULT_BLUE, 1e-4,
                                  (6.25e-7, 0.0), dtype=dtype,
                                  surface_tension=st, substeps=ss)
            cases.append((f"mrtcg-{st}", ss, planes, run,
                          mp_state(st == "csf")))
    for ss in (1, 4):
        run = make_sc_body(R, C, omega=1.0, G=-5.0, substeps=ss)
        cases.append(("sc", ss, 9, run, sc_state()))

    from lbm_tpu.kernels.pipeline import resolve_block_rows

    rows = []
    offs = jnp.zeros((2,), jnp.int32)
    off1 = jnp.zeros((1,), jnp.int32)
    for name, ss, planes, run, S in cases:
        # SAME block geometry in both kernels (the 1-D body kernel's
        # bare default is B=8, which triples halo recompute and would
        # fake a 2-D win): the 1-D production pick, capped at 32 for
        # the 20-plane CSF body whose temporaries exceed the 2-D
        # kernel's scoped limit at taller blocks (measured 42.1M vs
        # 39M)
        B = resolve_block_rows((planes,), planes, R, C, dtype,
                               6 * 2 ** 20, None, False)
        if planes >= 20:
            B = min(B, 32)
        k1 = make_local_halo_body_step(planes, R, C, run, dtype=dtype,
                                       block_rows=B)

        def step1(g, k1=k1):
            return k1(off1, g, g[:, -HALO:], g[:, :HALO])

        m1 = measure(step1, S, ss)
        k2 = make_local_2d_body_step(planes, R, C, C, run, dtype=dtype,
                                     block_rows=B)

        def step2(g, k2=k2):
            top, bot = g[:, -HALO:], g[:, :HALO]
            rowpad = jnp.concatenate([top, g, bot], axis=1)
            combined = jnp.concatenate(
                [rowpad[:, :, :CHALF], rowpad[:, :, -CHALF:]], axis=2)
            return k2(offs, g, top, bot, combined)

        m2 = measure(step2, S, ss)
        row = {"family": name, "substeps": ss, "mlups_1d": round(m1, 1),
               "mlups_2d": round(m2, 1), "ratio": round(m1 / m2, 2)}
        log(f"{name} ss={ss}: 1-D {m1:.0f} / 2-D {m2:.0f} MLUPS "
            f"(ratio {m1 / m2:.2f})")
        rows.append(row)
    print(json.dumps({"grid": f"{R}x{C}", "rows": rows}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "families":
        families()
    else:
        main()
