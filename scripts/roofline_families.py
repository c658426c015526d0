"""Roofline the >2x-headroom families the KBC analysis never covered:
d3q19, sediment, thermal/thermal5 (VERDICT r3 item 6; methodology =
scripts/ablate_kbc.py: jaxpr per-cell vector-op counts + sustained
vector T-op/s + HBM traffic at the measured rate, vs the v5e ceilings
measured elsewhere in this suite: ~7.1 T-op/s VPU peak f32 (KBC family
sustains 4.9-5.3 = the practical ceiling with in-VMEM streaming shifts
in the loop), ~819 GB/s HBM).

Usage (real TPU): python scripts/roofline_families.py [family ...]
Families: d3q19 sediment thermal thermal5  (default: all)
"""
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ablate_mrtcg import count_vector_ops, log, measure  # noqa: E402


def _capture_body(build, module):
    """Run ``build()`` with ``module``'s make_block_pipeline binding
    patched to grab the per-block body closure (the kernels bind the
    name at import time, so the patch must hit THEIR global, not
    kernels.pipeline's); returns (step, captured_kwargs)."""
    grabbed = {}
    orig = module.make_block_pipeline

    def spy(planes, R, C, body, **kw):
        grabbed["body"] = body
        grabbed["planes"] = planes if isinstance(planes, int) \
            else sum(planes)
        grabbed["C"] = C
        return orig(planes, R, C, body, **kw)

    module.make_block_pipeline = spy
    try:
        step = build()
    finally:
        module.make_block_pipeline = orig
    return step, grabbed


def _count_pipeline_body(grabbed, rows):
    body = grabbed["body"]
    block = jnp.zeros((grabbed["planes"], rows, grabbed["C"]), jnp.float32)
    ai = jnp.zeros((rows, grabbed["C"]), jnp.int32)
    jaxpr = jax.make_jaxpr(lambda b, a, i: body(b, a, i))(
        block, ai, jnp.int32(1))
    return _count(jaxpr)


def _count(jaxpr):
    from ablate_mrtcg import _VECTOR_OPS
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


def bench_family(name):
    from lbm_tpu.ops import d2q9

    dtype = jnp.float32
    substeps = 8
    if name == "sediment":
        from lbm_tpu.kernels.sediment_pallas import make_sediment_fused_step

        H, W = 1024, 512
        u_in, w_s, C_w = 0.02, 3e-3, 1e-3
        kw = dict(omega=1.0 / 0.55, u_in=u_in, w_s=w_s, C_w=C_w,
                  R23=H - H // 3, C28=W // 4, C38=3 * W // 8,
                  inlet_rows=min(50, H // 4), dtype=dtype)
        from lbm_tpu.kernels import sediment_pallas as _mod
        step1, grab = _capture_body(
            lambda: make_sediment_fused_step(H, W, substeps=1, **kw), _mod)
        ops = _count_pipeline_body(grab, 80)
        step = make_sediment_fused_step(H, W, substeps=substeps, **kw)
        us = jnp.zeros((2, H, W), dtype).at[1].set(u_in)
        f = jnp.concatenate(
            [d2q9.incomp_equilibrium(us, jnp.ones((H, W), dtype)),
             d2q9.equilibrium(us, jnp.zeros((H, W), dtype))], axis=0)
        planes, cells = 18, H * W
    elif name in ("thermal", "thermal5"):
        from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
        from lbm_tpu.scenes.thermal import (
            CS2, conduction_profile, d2q5_equilibrium)

        H, W = 1024, 512
        tau_g = 0.8
        kappa = CS2 * (tau_g - 0.5)
        nu = 0.71 * kappa
        slat = "d2q5" if name == "thermal5" else "d2q9"
        kw = dict(omega_f=1.0 / (nu / CS2 + 0.5), omega_g=1.0 / tau_g,
                  g_beta=1e4 * nu * kappa / float(H) ** 3, dtype=dtype,
                  scalar_lattice=slat)
        from lbm_tpu.kernels import thermal_pallas as _mod
        step1, grab = _capture_body(
            lambda: make_thermal_fused_step(H, W, substeps=1, **kw), _mod)
        ops = _count_pipeline_body(grab, 80)
        step = make_thermal_fused_step(H, W, substeps=substeps, **kw)
        th0 = jnp.asarray(conduction_profile(H), dtype)[:, None] \
            * jnp.ones((1, W), dtype)
        u0 = jnp.zeros((2, H, W), dtype)
        geq = d2q5_equilibrium(u0, th0) if slat == "d2q5" \
            else d2q9.equilibrium(u0, th0)
        f = jnp.concatenate(
            [d2q9.equilibrium(u0, jnp.ones((H, W), dtype)), geq], axis=0)
        planes, cells = (14 if slat == "d2q5" else 18), H * W
    elif name == "d3q19":
        from lbm_tpu.kernels.d3q19_pallas import (
            make_d3q19_body, make_d3q19_fused_step)
        from lbm_tpu.ops import d3q19 as _d3
        from lbm_tpu.scenes.three_d import _pack

        X3, H, W = 16, 512, 128
        substeps = 8
        body = make_d3q19_body(X3, H, W, omega=1.0 / 0.6, force_z=1e-6,
                               x_walls=True, substeps=1)
        block = jnp.zeros((19 * X3, 80, W), jnp.float32)
        ai = jnp.zeros((80, W), jnp.int32)
        # per 2-D slab cell; one slab cell = X3 3-D cells
        ops = _count(jax.make_jaxpr(
            lambda b, a: body(b, a, True))(block, ai)) / X3
        step = make_d3q19_fused_step(X3, H, W, omega=1.0 / 0.6,
                                     force_z=1e-6, x_walls=True,
                                     substeps=substeps, dtype=dtype)
        f3 = _d3.equilibrium(jnp.zeros((3, X3, H, W), dtype),
                             jnp.ones((X3, H, W), dtype))
        f = _pack(f3, X3, H, W)
        planes, cells = 19, X3 * H * W
    else:
        raise SystemExit(f"unknown family {name}")

    m = measure(step, f, substeps)
    # measure() reports slab-grid MLUPS; rescale to true cells for d3q19
    if name == "d3q19":
        m = m * 16
    tops = m * 1e6 * ops / 1e12
    hbm = m * 1e6 * planes * 2 * 4 / substeps / 1e9
    return {"family": name, "ops_per_cell": round(float(ops), 1),
            "mlups": round(m, 1), "sustained_tops": round(tops, 2),
            "hbm_gbps": round(hbm, 1), "substeps": substeps}


def main():
    fams = sys.argv[1:] or ["d3q19", "sediment", "thermal", "thermal5"]
    rows = []
    for f in fams:
        r = bench_family(f)
        log(r)
        rows.append(r)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
