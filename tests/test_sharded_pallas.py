"""Sharded fused kernel (ppermute halo exchange + Pallas with halo inputs)
vs the single-device jnp oracle, on the 8-virtual-device CPU mesh in
interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn
from lbm_tpu.kernels.sharded_pallas import make_local_halo_step, make_sharded_fused_step
from lbm_tpu.ops import d2q9
from lbm_tpu.parallel import mesh as meshmod

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _oracle(f, omega, steps=1):
    for _ in range(steps):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_u(f, rho)
        feq = d2q9.equilibrium(u, rho)
        f = d2q9.stream(d2q9.bgk_collision(f, feq, omega))
    return f


def test_local_halo_step_matches_periodic():
    """With self-halos (single rank), the halo-input kernel equals the
    periodic oracle."""
    R, C = 16, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step = make_local_halo_step(R, C, bgk_collide_fn(omega, jnp.float32),
                                block_rows=8, interpret=True)
    got = step(f, f[:, -8:], f[:, :8])
    want = _oracle(f.astype(jnp.float64), omega).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@needs_8
def test_sharded_fused_step_matches_oracle():
    m = meshmod.make_mesh(shape=(8, 1))
    R, C = 64, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step = make_sharded_fused_step(m, R, C, bgk_collide_fn(omega, jnp.float32),
                                   block_rows=8, interpret=True)
    fs = meshmod.shard_state(m, f)
    got = step(step(fs))
    want = _oracle(f.astype(jnp.float64), omega, steps=2).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-6)


@needs_8
def test_sharded_fused_temporal_blocking():
    """substeps=4 per exchange == 4 plain steps (communication-avoiding)."""
    m = meshmod.make_mesh(shape=(8, 1))
    R, C = 64, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step4 = make_sharded_fused_step(m, R, C,
                                    bgk_collide_fn(omega, jnp.float32),
                                    block_rows=8, substeps=4, interpret=True)
    got = step4(meshmod.shard_state(m, f))
    want = _oracle(f.astype(jnp.float64), omega, steps=4).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-6)


@needs_8
def test_sharded_mrtcg_matches_single_chip():
    """The flagship MRT-CG two-phase kernel, row-sharded over 8 ranks
    with ppermute halos + global-position masks, equals the single-chip
    fused kernel (same body, same arithmetic; 1e-13 in f64) over 3 steps."""
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R, C = 192, 128
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), delta=0.1,
              apply_gravity_source=True, dtype=jnp.float64)
    single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                      interpret=True, **kw)

    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), jnp.ones((R, C)))
    F = jnp.stack([r0[None] * feq / jnp.maximum(r0 + b0, 1e-30)[None],
                   b0[None] * feq / jnp.maximum(r0 + b0, 1e-30)[None]])
    Fs = jax.device_put(
        F, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, None, "x", None)))
    a, b = F, Fs
    for _ in range(3):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
@pytest.mark.parametrize("surface_tension,substeps",
                         [("perturbation", 1), ("perturbation", 2),
                          ("csf", 2)])
def test_sharded_mrtcg_reduced_matches_single_chip(surface_tension,
                                                   substeps):
    """The production REDUCED-state sharded step (10/12 planes of state
    and ICI payload) equals the single-chip reduced kernel bit-for-bit
    in f64 (same body, same arithmetic), including the
    communication-avoiding substeps>1 cadences and the CSF fst carry."""
    from lbm_tpu.kernels.mrtcg_pallas import (
        make_mrtcg_reduced_step, reduce_mrtcg_state)
    from lbm_tpu.kernels.sharded_pallas import (
        make_sharded_mrtcg_reduced_step)
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    csf = surface_tension == "csf"
    # csf ss=2 exchanges a 16-row strip: the alias-free slab needs
    # R_loc >= block + 2*16, so the 8-rank grid deepens to 48-row shards
    R, C = (384 if csf else 192), 128
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), delta=0.1,
              apply_gravity_source=True, dtype=jnp.float64,
              surface_tension=surface_tension, substeps=substeps)
    single = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                     interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_mrtcg_reduced_step(
        m, R, C, DEFAULT_RED, DEFAULT_BLUE, interpret=True, **kw)

    sgn = 1.0 if csf else -1.0
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, sgn)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, sgn)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    if csf:
        F = jnp.concatenate([F[0], F[1], jnp.zeros((2, R, C))], axis=0)
    G = reduce_mrtcg_state(F, surface_tension=surface_tension)
    Gs = jax.device_put(
        G, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    a, b = G, Gs
    for _ in range(2):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_rk_matches_single_chip():
    """The RK mixture kernel row-sharded over 8 ranks equals the
    single-chip fused kernel (1e-13 in f64) over 3 steps."""
    from lbm_tpu.kernels.rk_pallas import make_rk_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_rk_step
    from lbm_tpu.scenes.multiphase import init_rho_cosine

    R, C = 192, 128
    kw = dict(r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=0.04, b_nu=0.04,
              sigma=0.1, beta=0.7, gravity=(-6.25e-6, 0.0))
    single = make_rk_fused_step(R, C, dtype=jnp.float64, interpret=True,
                                **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_rk_step(m, R, C, dtype=jnp.float64,
                                   interpret=True, **kw)

    r0 = jnp.asarray(init_rho_cosine(R, C, 3.0, False, 1.0))
    b0 = jnp.asarray(init_rho_cosine(R, C, 1.0, True, 1.0))
    f0 = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), r0 + b0)
    S = jnp.concatenate([f0, r0[None], b0[None]], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    a, b = S, Ss
    for _ in range(3):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_kbc_matches_single_chip():
    """The cascaded-KBC collision through the sharded collide_fn path
    (periodic double-shear setting) equals the single-chip fused kernel."""
    from lbm_tpu.kernels.collide_stream import kbc_collide_fn, make_fused_step
    from lbm_tpu.models import kbc as kbc_model

    R, C = 64, 128
    s2 = 1.6
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(0.05 * rng.standard_normal((2, R, C)))
    rho0 = jnp.asarray(1.0 + 0.02 * rng.standard_normal((R, C)))
    f = kbc_model.equilibrium(rho0, u0)

    single = make_fused_step(R, C, kbc_collide_fn(s2), dtype=jnp.float64,
                             block_rows=8, interpret=True)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_fused_step(m, R, C, kbc_collide_fn(s2),
                                      dtype=jnp.float64, block_rows=8,
                                      interpret=True)
    fs = meshmod.shard_state(m, f)
    a, b = f, fs
    for _ in range(2):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_csf_matches_single_chip():
    """The CSF-mode two-phase kernel (20-plane state incl. the fst
    carry) sharded over 8 ranks equals the single-chip fused kernel
    (1e-13 in f64) over 2 steps."""
    from lbm_tpu.kernels.mrtcg_pallas import make_csf_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R, C = 192, 128
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                 interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                      interpret=True,
                                      surface_tension="csf", **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, 1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, 1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    S = jnp.concatenate([r0[None] * feq / tot, b0[None] * feq / tot,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    a, b = S, Ss
    for _ in range(2):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_mrtcg_temporal_blocking():
    """substeps=2 per halo exchange equals two plain single-chip steps
    (communication-avoiding multiphase: one ICI exchange per 2 steps)."""
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R, C = 192, 128
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded2 = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                       interpret=True, substeps=2, **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    Fs = jax.device_put(
        F, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, None, "x", None)))
    got = sharded2(sharded2(Fs))               # 2 exchanges, 4 steps
    want = F
    for _ in range(4):
        want = single(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_thermal_matches_single_chip():
    """The Rayleigh-Benard coupled kernel (18-plane fluid+temperature
    state) sharded over 8 ranks equals the single-chip fused kernel
    (1e-13 in f64) over 3 steps."""
    from lbm_tpu.kernels.sharded_pallas import make_sharded_thermal_step
    from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
    from lbm_tpu.scenes.thermal import CS2, conduction_profile

    R, C = 192, 128
    tau_g = 0.8
    kappa = CS2 * (tau_g - 0.5)
    nu = 0.71 * kappa
    kw = dict(omega_f=1.0 / (nu / CS2 + 0.5), omega_g=1.0 / tau_g,
              g_beta=4e3 * nu * kappa / float(R) ** 3,
              dtype=jnp.float64, interpret=True)
    single = make_thermal_fused_step(R, C, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded = make_sharded_thermal_step(m, R, C, **kw)

    x = (np.arange(R) + 0.5) / R
    y = np.arange(C) / C
    th0 = jnp.asarray(conduction_profile(R)[:, None]
                      + 1e-3 * np.sin(np.pi * x)[:, None]
                      * np.cos(2.0 * np.pi * y)[None, :], jnp.float64)
    u0 = jnp.zeros((2, R, C), jnp.float64)
    S = jnp.concatenate([d2q9.equilibrium(u0, jnp.ones((R, C))),
                         d2q9.equilibrium(u0, th0)], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    a, b = S, Ss
    for _ in range(3):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_thermal_substeps():
    """Communication-avoiding thermal: substeps=4 per ppermute exchange
    equals 4 plain single-chip steps (1 ICI exchange per 4 steps; the
    stencil-free body consumes 1 of the 8 halo rows per sweep)."""
    from lbm_tpu.kernels.sharded_pallas import make_sharded_thermal_step
    from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
    from lbm_tpu.scenes.thermal import CS2, conduction_profile

    R, C = 192, 128
    kap = CS2 * 0.3
    kw = dict(omega_f=1.0 / (0.71 * kap / CS2 + 0.5), omega_g=1.25,
              g_beta=4e3 * 0.71 * kap * kap / float(R) ** 3,
              dtype=jnp.float64, interpret=True)
    single = make_thermal_fused_step(R, C, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    shard4 = make_sharded_thermal_step(m, R, C, substeps=4, **kw)
    x = (np.arange(R) + 0.5) / R
    y = np.arange(C) / C
    th0 = jnp.asarray(conduction_profile(R)[:, None]
                      + 1e-3 * np.sin(np.pi * x)[:, None]
                      * np.cos(2.0 * np.pi * y)[None, :])
    u0 = jnp.zeros((2, R, C), jnp.float64)
    S = jnp.concatenate([d2q9.equilibrium(u0, jnp.ones((R, C))),
                         d2q9.equilibrium(u0, th0)], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    Ss = shard4(Ss)
    for _ in range(4):
        S = single(S)
    np.testing.assert_allclose(np.asarray(Ss), np.asarray(S), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_mrtcg_deep_temporal_blocking():
    """substeps=4 per halo exchange on a 16-row exchanged strip equals
    four plain single-chip steps: the deep-halo communication-avoiding
    mode lifted from the old substeps<=2 ceiling (VERDICT r2 item 2)."""
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R, C = 384, 128   # R_loc = 48 admits 16-row blocks + 16-row strips
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded4 = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                       interpret=True, substeps=4, **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    Fs = jax.device_put(
        F, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, None, "x", None)))
    got = sharded4(Fs)                        # 1 exchange, 4 steps
    want = F
    for _ in range(4):
        want = single(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-13)


@needs_8
def test_sharded_csf_temporal_blocking():
    """CSF substeps=2 per halo exchange (16-row strip; 5 halo rows/sweep
    + the sweep-threaded fst carry) equals two plain single-chip CSF
    steps."""
    from lbm_tpu.kernels.mrtcg_pallas import make_csf_fused_step
    from lbm_tpu.kernels.sharded_pallas import make_sharded_mrtcg_step
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)

    R, C = 384, 128
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                 interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    sharded2 = make_sharded_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                       interpret=True, substeps=2,
                                       surface_tension="csf", **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, 1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, 1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    S = jnp.concatenate([r0[None] * feq / tot, b0[None] * feq / tot,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", None)))
    got = sharded2(Ss)                        # 1 exchange, 2 steps
    want = single(single(S))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-13)


def test_cadence_picker_ici_monotone():
    """ICI-aware cadence picker (VERDICT r3 item 5): the analytic
    exchange term only ever pushes the pick to DEEPER cadences as the
    collective latency grows or the link bandwidth shrinks, and the
    zero-cost limit reproduces the bare measured-table argmax."""
    from lbm_tpu.kernels import sharded_pallas as sp

    base = dict(sp.ICI)
    try:
        # zero-cost ICI == measured-table argmax
        sp.ICI["test0"] = {"bw_oneway": 1e30, "latency": 0.0}
        for fam, table in sp._CADENCE_MLUPS.items():
            assert sp.pick_substeps(fam, generation="test0") == \
                max(table, key=table.get)

        # cadence is non-decreasing in latency ...
        lats = [0.0, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2]
        for fam in ("bgk", "mrtcg", "csf", "thermal", "sediment", "rk"):
            picks = []
            for i, lat in enumerate(lats):
                sp.ICI[f"lat{i}"] = {"bw_oneway": 4.5e10, "latency": lat}
                picks.append(sp.pick_substeps(fam, generation=f"lat{i}"))
            assert picks == sorted(picks), (fam, picks)
            # ... and saturates at the deepest measured cadence
            key = fam if fam in sp._CADENCE_MLUPS else (
                "bgk" if sp._ROWS_PER_SWEEP[fam] <= 2 else "mrtcg")
            assert picks[-1] == max(sp._CADENCE_MLUPS[key]), (fam, picks)

        # ... and non-decreasing as bandwidth shrinks
        for i, bw in enumerate([1e30, 4.5e10, 4.5e9, 4.5e8, 4.5e7]):
            sp.ICI[f"bw{i}"] = {"bw_oneway": bw, "latency": 1e-6}
        for fam in ("bgk", "mrtcg"):
            picks = [sp.pick_substeps(fam, generation=f"bw{i}")
                     for i in range(5)]
            assert picks == sorted(picks), (fam, picks)

        # structural caps survive any ICI pressure
        sp.ICI["harsh"] = {"bw_oneway": 4.5e7, "latency": 1e-2}
        assert sp.default_substeps("sc") == 4      # 2 rows/sweep cap
        # deeper strips cost more once the cadence outgrows the 8-row
        # minimum (mrtcg: 3 rows/sweep -> 16-row strip at substeps=4)
        assert sp.exchange_seconds(4, "mrtcg", 512) > \
            sp.exchange_seconds(1, "mrtcg", 512)
    finally:
        sp.ICI.clear()
        sp.ICI.update(base)


def test_default_substeps_families():
    """Every sharded family resolves to a legal cadence for its body."""
    from lbm_tpu.kernels.sharded_pallas import default_substeps

    for fam, cap in [("bgk", 8), ("thermal", 8), ("cavity", 8),
                     ("sediment", 8), ("les", 8), ("trt", 8), ("plaw", 8),
                     ("d3q19", 8), ("sc", 4), ("mrtcg", 5), ("rk", 5),
                     ("csf", 4)]:
        s = default_substeps(fam)
        assert 1 <= s <= cap, (fam, s)


def test_resolve_substeps_auto():
    """The product-surface "auto" cadence (VERDICT r4 item 4): resolves
    through the ICI-aware picker, ints pass through untouched, caps
    clamp, junk strings are rejected."""
    from lbm_tpu.kernels.sharded_pallas import (default_substeps,
                                                resolve_substeps)

    assert resolve_substeps(3, "bgk") == 3
    assert resolve_substeps("auto", "bgk", C=128) == \
        default_substeps("bgk", C=128)
    assert resolve_substeps("auto", "mrtcg", C=128, cap=2) == 2
    assert resolve_substeps("auto", "sc", C=128, cap=4) <= 4
    with pytest.raises(ValueError):
        resolve_substeps("fast", "bgk")


@needs_8
def test_sharded_fused_auto_equals_explicit():
    """substeps="auto" builds exactly the explicitly-resolved step: the
    factory resolves through resolve_substeps and nothing else changes
    (bitwise equality on the 8-device mesh)."""
    from lbm_tpu.kernels.sharded_pallas import resolve_substeps

    m = meshmod.make_mesh(shape=(8, 1))
    R, C = 64, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    collide = bgk_collide_fn(omega, jnp.float32)
    auto = make_sharded_fused_step(m, R, C, collide, block_rows=8,
                                   substeps="auto", interpret=True)
    s = resolve_substeps("auto", "bgk", C=C, cap=8)
    assert s > 1  # the picker actually picks a deep cadence
    explicit = make_sharded_fused_step(m, R, C, collide, block_rows=8,
                                       substeps=s, interpret=True)
    fs = meshmod.shard_state(m, f)
    np.testing.assert_array_equal(np.asarray(auto(fs)),
                                  np.asarray(explicit(fs)))
