"""KBC kernel stage ablation: measure the entropic-gamma stage's cost by
benching the SAME fused kernel with gamma frozen to 1/s2 (plain unit-rate
relaxation of the h-moments — NOT the KBC physics, measurement only).

Together with the jaxpr vector-op counts (docs/BENCHMARKS.md roofline
section) this pins down whether the fused KBC kernel's gap to BGK is
op-mix (VPU-bound) or an implementation defect.

Usage (real TPU): python scripts/ablate_kbc.py [rows cols]
"""
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(step, f, substeps):
    H, W = f.shape[1], f.shape[2]
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g))

    def timed(n):
        t0 = time.perf_counter()
        out = chunk(f, n)
        float(out.sum())  # forced device->host read (relay-safe timing)
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
    marginals = []
    for _ in range(3):
        dt_s = timed(n_small)
        dt_f = timed(n_full)
        marginals.append(H * W * (n_full - n_small) * substeps
                         / max(dt_f - dt_s, 1e-9) / 1e6)
    return sorted(marginals)[1]


def main():
    from lbm_tpu.kernels.collide_stream import (
        kbc_collide_fn, make_fused_step, pick_block_rows)
    from lbm_tpu.models import kbc as kbc_model

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 3968
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    s2 = 1.0 / (0.5 + 3.0 * 1e-4)
    substeps = 8
    dtype = jnp.float32

    rng = jax.random.PRNGKey(0)
    u0 = 0.01 * jax.random.normal(rng, (2, H, W), dtype)
    f = kbc_model.equilibrium(jnp.ones((H, W), dtype), u0)

    block = pick_block_rows(H, W, dtype, vmem_budget=5 * 2 ** 20)

    def gamma_const_fn(fb):
        """kbc.collide with the gamma stage skipped (g = 1/s2)."""
        m0 = fb[0]
        for k in range(1, 9):
            m0 = m0 + fb[k]
        mx = fb[1] - fb[3] + fb[5] - fb[6] - fb[7] + fb[8]
        my = fb[2] - fb[4] + fb[5] + fb[6] - fb[7] - fb[8]
        u = jnp.stack([mx / m0, my / m0], axis=0)
        cT = kbc_model.central_moments(fb, u)
        g = jnp.full_like(m0, 1.0 / s2)
        # replicate kbc.collide's tail with the frozen gamma
        return _tail(fb, cT, m0, u, g, s2)

    def _tail(fb, cT, m0, u, g, s2):
        CS2, CS4 = 1.0 / 3.0, 1.0 / 9.0
        import numpy as np

        from lbm_tpu.models.kbc import INV_M
        gs2 = g * s2
        T = jnp.stack(
            [cT[0] - m0, cT[1], cT[2],
             s2 * (cT[3] - 2.0 * CS2 * m0), s2 * cT[4], s2 * cT[5],
             gs2 * cT[6], gs2 * cT[7], gs2 * (cT[8] - CS4 * m0)], axis=0)
        ux, uy = u[0], u[1]
        x2, y2 = ux * ux, uy * uy
        icf = jnp.stack(
            [T[0],
             T[0] * ux + T[1],
             T[0] * uy + T[2],
             T[0] * (x2 + y2) + 2.0 * T[1] * ux + 2.0 * T[2] * uy + T[3],
             T[0] * (x2 - y2) + 2.0 * T[1] * ux - 2.0 * T[2] * uy + T[4],
             T[0] * ux * uy + T[1] * uy + T[2] * ux + T[5],
             T[0] * x2 * uy + 2.0 * T[1] * ux * uy + T[2] * x2
             + 0.5 * T[3] * uy + 0.5 * T[4] * uy + 2.0 * T[5] * ux + T[6],
             T[0] * ux * y2 + T[1] * y2 + 2.0 * T[2] * ux * uy
             + 0.5 * T[3] * ux - 0.5 * T[4] * ux + 2.0 * T[5] * uy + T[7],
             T[0] * x2 * y2 + 2.0 * T[1] * ux * y2 + 2.0 * T[2] * x2 * uy
             + 0.5 * T[3] * (x2 + y2) - 0.5 * T[4] * (x2 - y2)
             + 4.0 * T[5] * ux * uy + 2.0 * T[6] * uy + 2.0 * T[7] * ux
             + T[8]], axis=0)
        rows = []
        for m in range(9):
            acc = None
            for j in range(9):
                w = float(INV_M[m, j])
                if w == 0.0:
                    continue
                term = icf[j] if w == 1.0 else w * icf[j]
                acc = term if acc is None else acc + term
            rows.append(fb[m] - acc)
        return jnp.stack(rows, axis=0)

    log(f"grid {H}x{W}, block={block}, substeps={substeps}")
    full = make_fused_step(H, W, kbc_collide_fn(s2), dtype=dtype,
                           block_rows=block, substeps=substeps)
    m_full = measure(full, f, substeps)
    log(f"full KBC:        {m_full:.0f} MLUPS")
    ablt = make_fused_step(H, W, gamma_const_fn, dtype=dtype,
                           block_rows=block, substeps=substeps)
    m_ablt = measure(ablt, f, substeps)
    log(f"gamma ablated:   {m_ablt:.0f} MLUPS")
    print({"kbc_full_mlups": round(m_full, 1),
           "kbc_gamma_const_mlups": round(m_ablt, 1),
           "gamma_stage_fraction": round(1.0 - m_full / m_ablt, 3)})


if __name__ == "__main__":
    main()
