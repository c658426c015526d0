"""2-D (rows x cols) sharded fused kernel vs the single-device jnp oracle
on the 8-virtual-device CPU mesh in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn
from lbm_tpu.kernels.sharded2d_pallas import make_local_2d_step, make_sharded_fused_step_2d
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


def test_local_2d_step_self_halos_match_periodic():
    """Single rank in both axes: self-halos reproduce the periodic oracle."""
    R, C = 32, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    top, bot = f[:, -8:], f[:, :8]
    rowpad = jnp.concatenate([top, f, bot], axis=1)
    # combined tile: right halo (own leading 64 cols, periodic) then left
    combined = jnp.concatenate([rowpad[:, :, :64], rowpad[:, :, -64:]],
                               axis=2)
    step = make_local_2d_step(R, C, bgk_collide_fn(omega, jnp.float32),
                              block_rows=8, interpret=True)
    got = step(f, top, bot, combined)
    want = _oracle(f.astype(jnp.float64), omega).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@needs_8
def test_sharded_2d_matches_oracle():
    """2x4 mesh (rows AND cols sharded), two exchanged steps."""
    m = meshmod.make_mesh(shape=(2, 4))
    R, C = 32, 512
    omega = 1.0 / 0.8
    rng = np.random.default_rng(12)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step = make_sharded_fused_step_2d(m, R, C,
                                      bgk_collide_fn(omega, jnp.float32),
                                      block_rows=8, interpret=True)
    got = step(step(meshmod.shard_state(m, f)))
    want = _oracle(f.astype(jnp.float64), omega, steps=2).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-6)


@needs_8
def test_sharded_2d_temporal_blocking():
    """substeps=4 per exchange == 4 plain steps on a 4x2 mesh."""
    m = meshmod.make_mesh(shape=(4, 2))
    R, C = 64, 256
    omega = 1.0 / 0.8
    rng = np.random.default_rng(13)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step4 = make_sharded_fused_step_2d(m, R, C,
                                       bgk_collide_fn(omega, jnp.float32),
                                       block_rows=8, substeps=4,
                                       interpret=True)
    got = step4(meshmod.shard_state(m, f))
    want = _oracle(f.astype(jnp.float64), omega, steps=4).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-6)


def test_sharded_2d_validates_geometry():
    m = meshmod.make_mesh(shape=(2, 4))
    fn = bgk_collide_fn(1.0, jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_fused_step_2d(m, 30, 512, fn)
    with pytest.raises(ValueError, match=">= 128"):
        # C_loc = 64 < CHALO
        make_sharded_fused_step_2d(m, 32, 256, fn)


def test_sharded2d_mrtcg_matches_single_chip():
    """The flagship MRT-CG kernel sharded over a 4x2 (rows x cols) mesh
    equals the single-chip fused kernel (1e-13, f64) over 3 steps —
    the pod-scale 2-D decomposition of the multiphase solver."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_mrtcg_step
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)
    from lbm_tpu.ops import d2q9

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   interpret=True, **kw)
    sharded = make_sharded2d_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
                                        interpret=True, **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    Fs = jax.device_put(
        F, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, None, "x", "y")))
    a, b = F, Fs
    for _ in range(3):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


def test_sharded2d_rk_matches_single_chip():
    """The RK mixture kernel 2-D sharded over a 4x2 mesh equals the
    single-chip fused kernel (1e-13, f64) over 2 steps."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.rk_pallas import make_rk_fused_step
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_rk_step
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.multiphase import init_rho_cosine
    from lbm_tpu.ops import d2q9

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    kw = dict(r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=0.04, b_nu=0.04,
              sigma=0.1, beta=0.7, gravity=(-6.25e-6, 0.0))
    single = make_rk_fused_step(R, C, dtype=jnp.float64, interpret=True,
                                **kw)
    sharded = make_sharded2d_rk_step(m, R, C, dtype=jnp.float64,
                                     interpret=True, **kw)
    r0 = jnp.asarray(init_rho_cosine(R, C, 3.0, False, 1.0))
    b0 = jnp.asarray(init_rho_cosine(R, C, 1.0, True, 1.0))
    f0 = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), r0 + b0)
    S = jnp.concatenate([f0, r0[None], b0[None]], axis=0)
    Ss = jax.device_put(
        S, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", "y")))
    a, b = S, Ss
    for _ in range(2):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


def test_sharded2d_mrtcg_temporal_blocking():
    """substeps=2 per 2-D halo exchange equals two plain single-chip
    steps (one rows+cols exchange per 2 multiphase steps)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_mrtcg_step
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)
    from lbm_tpu.ops import d2q9

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   interpret=True, **kw)
    sharded2 = make_sharded2d_mrtcg_step(m, R, C, DEFAULT_RED,
                                         DEFAULT_BLUE, interpret=True,
                                         substeps=2, **kw)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    F = jnp.stack([r0[None] * feq / tot, b0[None] * feq / tot])
    Fs = jax.device_put(
        F, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, None, "x", "y")))
    got = sharded2(Fs)
    want = single(single(F))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-13)


def test_sharded2d_csf_matches_single_chip():
    """The CSF-mode two-phase kernel (20-plane state incl. the fst carry)
    sharded over a 4x2 (rows x cols) mesh equals the single-chip fused
    kernel (1e-13, f64) over 2 steps — closes the last 2-D sharding gap
    (every multiphase family now rides the pod-scale wrapper)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.mrtcg_pallas import make_csf_fused_step
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_mrtcg_step
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine)
    from lbm_tpu.ops import d2q9

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64)
    single = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                 interpret=True, **kw)
    sharded = make_sharded2d_mrtcg_step(m, R, C, DEFAULT_RED, DEFAULT_BLUE,
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
            m, jax.sharding.PartitionSpec(None, "x", "y")))
    a, b = S, Ss
    for _ in range(2):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


def test_sharded2d_thermal_matches_single_chip():
    """The Rayleigh-Benard coupled kernel 2-D sharded over a 4x2 mesh
    equals the single-chip fused kernel (1e-13, f64) over 3 steps."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_thermal_step
    from lbm_tpu.kernels.thermal_pallas import make_thermal_fused_step
    from lbm_tpu.ops import d2q9
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.thermal import CS2, conduction_profile

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    kap = CS2 * 0.3
    kw = dict(omega_f=1.0 / (0.71 * kap / CS2 + 0.5), omega_g=1.25,
              g_beta=4e3 * 0.71 * kap * kap / float(R) ** 3,
              dtype=jnp.float64, interpret=True)
    single = make_thermal_fused_step(R, C, **kw)
    sharded = make_sharded2d_thermal_step(m, R, C, **kw)
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
            m, jax.sharding.PartitionSpec(None, "x", "y")))
    a, b = S, Ss
    for _ in range(3):
        a = single(a)
        b = sharded(b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=1e-13)


def test_sharded2d_sc_matches_single_chip():
    """The Shan-Chen pseudopotential kernel 2-D sharded over a 4x2 mesh
    equals the single-chip fused kernel (1e-13, f64), substeps=4 (one
    two-phase exchange per 4 steps)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.shan_chen_pallas import make_sc_fused_step
    from lbm_tpu.kernels.sharded2d_pallas import make_sharded2d_sc_step
    from lbm_tpu.ops import d2q9
    from lbm_tpu.parallel import mesh as meshmod

    R, C = 96, 512
    m = meshmod.make_mesh(shape=(4, 2))
    rng = np.random.default_rng(13)
    rho0 = jnp.asarray(0.7 + 0.1 * rng.standard_normal((R, C)))
    f = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64), rho0)
    kw = dict(omega=1.0, G=-5.0, substeps=4, dtype=jnp.float64,
              interpret=True)
    single = make_sc_fused_step(R, C, **kw)
    sharded = make_sharded2d_sc_step(m, R, C, **kw)
    fs = jax.device_put(
        f, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, "x", "y")))
    got = sharded(fs)
    want = single(f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)
