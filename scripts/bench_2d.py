"""Single-chip rate of the 2-D-sharded local kernel (combined column-halo
tile, kernels/sharded2d_pallas.py) vs the 1-D-sharded local kernel at the
same local shape — the column-halo overhead measurement (VERDICT r3 item
4: target within 1.7x of the 1-D rate at 4096x512-class locals; the
round-3 both-sides-padded layout measured 3.4x).

Self-halos stand in for the ICI exchange (same skeleton, no mesh), so
the ratio isolates the kernel-side cost: padded-lane compute + the
strip concats, with the exchange itself identical in both paths.

Usage (real TPU): python scripts/bench_2d.py [R_loc C_loc substeps]
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


if __name__ == "__main__":
    main()
