"""Long-horizon f32 error budget at the reference's own workloads
(VERDICT r3 item 3; SURVEY.md section 7 "hard parts": f64 vs TPU).

Workload A — MRT-CG Rayleigh-Taylor at the reference's own shape and
horizon: 256x128 x 100k steps (mrtcg-rayleigh-taylor-gamma3.toml:4-7,
rk_rayleigh_taylor_test.cpp:81-87).  The f32 fused reduced kernel runs
on the TPU; the f64 oracle is the SAME-physics jnp model on CPU
(pinned to the fused kernel at 1e-12 by tests/test_mrtcg_pallas.py).
Both legs checkpoint macroscopic fields (psi, rho, ux, uy) at the same
steps; `rtcmp` prints the drift curve (L2/Linf vs step).

Workload B — ULBM/KBC Poiseuille at the reference's flat 300k-step
horizon (ulbm_poiseuille.cpp:64-69: 128x128, nu=1e-4), f32 fused on
chip under the 1e-12 relative-mean-ux convergence watcher: records
where the f32 watcher PLATEAUS (its precision floor) and the L2 shape
error vs the analytic parabola at the end of the horizon.

Usage:
  python scripts/long_horizon.py rt32  [outdir]   # TPU, ~minutes
  python scripts/long_horizon.py rt64  [outdir]   # CPU f64 oracle, HOURS
  python scripts/long_horizon.py rtcmp [outdir]   # drift table (JSON)
  python scripts/long_horizon.py ulbm300k         # TPU, ~minutes
"""
import json
import os
import sys
import time

import numpy as np

CHECKPOINTS = (1000, 2000, 5000, 10000, 20000, 50000, 100000)
R, C = 256, 128
SIGMA, GRAV = 1e-4, 6.25e-7
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/long_horizon"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_state(dtype):
    import jax.numpy as jnp

    from lbm_tpu.models.mrt_cg import MRTCGModel
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine, mrtcg_boundary)

    model = MRTCGModel(red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=SIGMA,
                       gravity=(GRAV, 0.0), apply_gravity_source=True,
                       boundary=mrtcg_boundary)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    return model, model.init_state(r0, b0, dtype=dtype)


def _macros_from_reduced(G):
    """(psi, rho, ux, uy) from the reduced 10-plane state, f64 host."""
    from lbm_tpu.scenes.multiphase import DEFAULT_BLUE, DEFAULT_RED

    mom = np.asarray(G[:9], np.float64)
    r_rho = np.asarray(G[9], np.float64)
    rho = mom.sum(0)
    b_rho = rho - r_rho
    a = r_rho / DEFAULT_RED.rho_0
    b = b_rho / DEFAULT_BLUE.rho_0
    psi = (a - b) / (a + b)
    ux = (mom[1] - mom[3] + mom[5] - mom[6] - mom[7] + mom[8]
          + 0.5 * GRAV) / rho
    uy = (mom[2] - mom[4] + mom[5] + mom[6] - mom[7] - mom[8]) / rho
    return dict(psi=psi, rho=rho, ux=ux, uy=uy)


def _macros_from_state(state):
    from lbm_tpu.kernels.mrtcg_pallas import reduce_mrtcg_state
    import jax.numpy as jnp

    F = jnp.stack([state.red.f, state.blue.f])
    return _macros_from_reduced(reduce_mrtcg_state(F))


def rt32():
    """f32 fused reduced kernel on the TPU, checkpointing macro fields."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.kernels.mrtcg_pallas import (
        make_mrtcg_reduced_step, reduce_mrtcg_state)
    from lbm_tpu.scenes.multiphase import DEFAULT_BLUE, DEFAULT_RED

    os.makedirs(OUTDIR, exist_ok=True)
    model, state = _init_state(jnp.float32)
    F = jnp.stack([state.red.f, state.blue.f]).astype(jnp.float32)
    G = reduce_mrtcg_state(F)
    step = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   sigma=SIGMA, gravity=(GRAV, 0.0),
                                   dtype=jnp.float32)
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
        static_argnums=1)
    done = 0
    t0 = time.perf_counter()
    for target in CHECKPOINTS:
        while done < target:
            n = min(2000, target - done)  # axon: cap device time/launch
            G = chunk(G, n)
            done += n
        float(G.sum())
        np.savez(os.path.join(OUTDIR, f"f32-{done}.npz"),
                 **_macros_from_reduced(G))
        log(f"f32 step {done} ({time.perf_counter() - t0:.1f}s)")
    log("rt32 done")


def rt64(perturb: float = 0.0, tag: str = "f64"):
    """f64 jnp-model oracle on CPU (the slow leg — run in background).

    ``perturb`` adds a relative rho_r rounding-scale perturbation at
    init: the drift of the perturbed f64 leg vs the base f64 leg is the
    pure CHAOS (Lyapunov) term of the error budget, separating "the RT
    instability amplifies any rounding difference" from "f32 arithmetic
    accumulates bias" (cmp the rt32-vs-rt64 and rt64p-vs-rt64 curves)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    os.makedirs(OUTDIR, exist_ok=True)
    model, state = _init_state(jnp.float64)
    if perturb:
        state = state._replace(
            red=state.red._replace(f=state.red.f * (1.0 + perturb)))
    step = jax.jit(model.step)
    chunk = jax.jit(
        lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), s),
        static_argnums=1)
    done = 0
    t0 = time.perf_counter()
    for target in CHECKPOINTS:
        while done < target:
            n = min(1000, target - done)
            state = chunk(state, n)
            done += n
            if done % 5000 == 0:
                el = time.perf_counter() - t0
                log(f"f64 step {done} ({el:.0f}s, "
                    f"{1e3 * el / done:.1f} ms/step)")
        jax.block_until_ready(state)
        np.savez(os.path.join(OUTDIR, f"{tag}-{done}.npz"),
                 **_macros_from_state(state))
        log(f"{tag} checkpoint {done}")
    log(f"rt64[{tag}] done")


def rtcmp(tag_a: str = "f32", tag_b: str = "f64"):
    rows = []
    for step in CHECKPOINTS:
        p32 = os.path.join(OUTDIR, f"{tag_a}-{step}.npz")
        p64 = os.path.join(OUTDIR, f"{tag_b}-{step}.npz")
        if not (os.path.exists(p32) and os.path.exists(p64)):
            continue
        a, b = np.load(p32), np.load(p64)
        row = {"step": step}
        for k in ("psi", "rho", "ux", "uy"):
            d = a[k] - b[k]
            scale = max(np.abs(b[k]).max(), 1e-30)
            row[f"{k}_l2"] = float(np.sqrt((d * d).mean()))
            row[f"{k}_linf_rel"] = float(np.abs(d).max() / scale)
        rows.append(row)
        log(f"step {step:>7d}  psi_l2 {row['psi_l2']:.3e}  "
            f"ux_linf_rel {row['ux_linf_rel']:.3e}")
    print(json.dumps(rows))


#: the reference's LARGEST single-domain grid: rk_rayleigh_taylor_test
#: .cpp:81-87 (R = 4L, L = 256, 100k steps)
RK_R, RK_C = 1024, 256
RK_NU, RK_SIGMA, RK_GRAV = 0.04, 0.1, -6.25e-6


def _rk_init(dtype):
    import jax.numpy as jnp

    from lbm_tpu.models.rk_cg import RKMixtureModel
    from lbm_tpu.scenes.multiphase import init_rho_cosine, mrtcg_boundary

    model = RKMixtureModel(
        r_alpha=11.0 / 15.0, r_rho_0=3.0, r_nu=RK_NU,
        b_alpha=0.2, b_rho_0=1.0, b_nu=RK_NU,
        sigma=RK_SIGMA, beta=0.7, gravity=(RK_GRAV, 0.0),
        boundary=mrtcg_boundary)
    r0 = init_rho_cosine(RK_R, RK_C, 3.0, fill_below=False,
                         amplitude_sign=1.0)
    b0 = init_rho_cosine(RK_R, RK_C, 1.0, fill_below=True,
                         amplitude_sign=1.0)
    return model, model.init_state(r0, b0, dtype=dtype)


def _rk_macros(f, r_rho, b_rho):
    f = np.asarray(f, np.float64)
    r = np.asarray(r_rho, np.float64)
    b = np.asarray(b_rho, np.float64)
    rho = r + b
    a_ = r / 3.0
    b_ = b / 1.0
    psi = (a_ - b_) / (a_ + b_)
    ux = (f[1] - f[3] + f[5] - f[6] - f[7] + f[8]) / rho
    uy = (f[2] - f[4] + f[5] + f[6] - f[7] - f[8]) / rho
    return dict(psi=psi, rho=rho, ux=ux, uy=uy)


def rk32():
    """The RK-CG family's full-scale leg: f32 fused on chip at the
    reference's largest grid (1024x256), checkpointing macro fields up
    to the full 100k horizon (VERDICT r4 item 6)."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.kernels.rk_pallas import make_rk_fused_step

    os.makedirs(OUTDIR, exist_ok=True)
    model, state = _rk_init(jnp.float32)
    S = jnp.concatenate(
        [state.f, state.r_rho[None], state.b_rho[None]], axis=0
    ).astype(jnp.float32)
    step = make_rk_fused_step(
        RK_R, RK_C, r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=RK_NU,
        b_nu=RK_NU, sigma=RK_SIGMA, beta=0.7, gravity=(RK_GRAV, 0.0),
        dtype=jnp.float32)
    chunk = jax.jit(
        lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
        static_argnums=1)
    done = 0
    t0 = time.perf_counter()
    for target in CHECKPOINTS:
        while done < target:
            n = min(1000, target - done)  # axon: cap device time/launch
            S = chunk(S, n)
            done += n
        float(S.sum())
        np.savez(os.path.join(OUTDIR, f"rk32-{done}.npz"),
                 **_rk_macros(S[:9], S[9], S[10]))
        log(f"rk32 step {done} ({time.perf_counter() - t0:.1f}s)")
    log("rk32 done")


def rk64(limit: int = 5000):
    """f64 jnp RK oracle on CPU at the full 1024x256 shape — the drift
    reference for the early checkpoints (the full 100k horizon is
    CPU-infeasible on this 1-core box; beyond a few k steps the drift
    is Lyapunov-dominated anyway, per the MRT-CG chaos control)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    os.makedirs(OUTDIR, exist_ok=True)
    model, state = _rk_init(jnp.float64)
    step = jax.jit(model.step)
    chunk = jax.jit(
        lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), s),
        static_argnums=1)
    done = 0
    t0 = time.perf_counter()
    for target in [t for t in CHECKPOINTS if t <= limit]:
        while done < target:
            n = min(500, target - done)
            state = chunk(state, n)
            done += n
            el = time.perf_counter() - t0
            log(f"rk64 step {done} ({el:.0f}s, {el / done * 1e3:.0f} "
                "ms/step)")
        jax.block_until_ready(state)
        np.savez(os.path.join(OUTDIR, f"rk64-{done}.npz"),
                 **_rk_macros(state.f, state.r_rho, state.b_rho))
        log(f"rk64 checkpoint {done}")
    log("rk64 done")


def rkcmp():
    rtcmp("rk32", "rk64")


def ulbm300k(H=128, W=128, T=300000, nu=1e-4, u_max=0.05, ti=100):
    """The reference's flat 300k-step ULBM Poiseuille (128x128, nu=1e-4)
    f32 fused on chip with the 1e-12 convergence watcher.

    MEASURED VERDICT (2026-08-20): at the reference's own parameters the
    watcher tail is ~3.2e-4 = ti/T exactly — the kinematic signature of
    ballistic acceleration (a = p_grad/rho = 2.4e-9/cell, a*T = 7.3e-4 =
    1.5% of u_max; the viscous convergence time is W^2-class/nu ~ 1.6e8
    steps).  The reference's horizon never reaches steady state in ANY
    precision, so no f32 floor is observable here; `ulbm_floor` measures
    it at a convergent parameter set instead."""
    from lbm_tpu.scenes import ulbm

    res = ulbm.ulbm_poiseuille(H=H, W=W, T=T, nu=nu, u_max=u_max,
                               tolerance=1e-12, t_interval=ti)
    out = {"steps_run": int(res.steps), "l2_parabola": float(res.l2),
           "mean_ux": float(np.asarray(res.m1[0], np.float64).mean())}
    if res.watch:
        w = res.watch
        out["watch_floor"] = float(min(r for _, r in w if np.isfinite(r)))
        out["watch_tail"] = [[int(s), float(r)] for s, r in w[-5:]]
        # decade-crossing steps: when did the watcher first dip below 1e-k?
        out["first_below"] = {
            f"1e-{k}": next((int(s) for s, r in w if r < 10.0 ** -k), None)
            for k in (4, 5, 6, 7, 8, 9, 10, 11, 12)}
    print(json.dumps(out))


def ulbm_floor():
    """Where DOES the f32 watcher floor out?  Strongly-damped
    convergent parameters (nu=0.05, Re=25: viscous time (W/pi)^2/nu
    ~ 33k steps, so the true watcher signal is ~1e-10 by 400k and
    anything measured above it is the f32 rounding floor).

    MEASURED (2026-08-20, artifacts/long_horizon/ulbm_floor.json):
    floor ~1.3e-6 (tail 1.3-1.7e-6; below 1e-5 at 308k; never below
    1e-6) — the reference's 1e-12 criterion is f64-only.  NOTE: the
    first attempt at nu=5e-3 (omega=1.94) found a real low-dissipation
    instability instead: the watcher tail GROWS past 650k and the run
    leaves the stability envelope at ~702k steps (pressure-BC O(u^3)
    quirk + omega->2; see docs/BENCHMARKS.md)."""
    ulbm300k(T=400_000, nu=0.05, u_max=0.01, ti=500)


if __name__ == "__main__":
    {"rt32": rt32, "rt64": rt64, "rtcmp": rtcmp,
     "rt64p": lambda: rt64(perturb=1e-13, tag="f64p"),
     "rtcmpp": lambda: rtcmp("f64p", "f64"),
     "ulbm300k": ulbm300k, "ulbm_floor": ulbm_floor,
     "rk32": rk32, "rk64": rk64, "rkcmp": rkcmp}[sys.argv[1]]()
