"""Multi-device sharding tests on the virtual 8-device CPU mesh.

These replace the reference's in-process domain decomposition A/B tests
(decompose_domain.cpp compares a 2-domain split against the single-domain
result; SURVEY.md section 3.5/4): the sharded step must equal the
single-device step to round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d2q9
from lbm_tpu.parallel import halo, mesh as meshmod, sharded
from lbm_tpu.scenes import channel

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _rand_f(shape=(9, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.5, 1.5, shape))


def _single_device_periodic_step(f, omega):
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    feq = d2q9.equilibrium(u, rho)
    return d2q9.stream(d2q9.bgk_collision(f, feq, omega))


@needs_8
def test_halo_pad_2d_matches_global_roll():
    m = meshmod.make_mesh(shape=(4, 2))
    f = _rand_f((9, 16, 8))

    def padded_interior_roll(x):
        p = halo.halo_pad_2d(x, width=1)
        out = [jnp.roll(p[k], (1, -1), (0, 1))[1:-1, 1:-1] for k in range(9)]
        return jnp.stack(out)

    fn = jax.shard_map(padded_interior_roll, mesh=m,
                       in_specs=meshmod.FIELD_SPEC,
                       out_specs=meshmod.FIELD_SPEC)
    got = np.asarray(fn(meshmod.shard_state(m, f)))
    want = np.stack([np.roll(np.asarray(f[k]), (1, -1), (0, 1)) for k in range(9)])
    np.testing.assert_array_equal(got, want)


@needs_8
def test_shardmap_periodic_step_equals_single_device():
    m = meshmod.make_mesh(shape=(4, 2))
    omega = 1.0 / 0.8
    f = _rand_f((9, 32, 16), seed=3)
    step = jax.jit(sharded.make_periodic_bgk_step(m, omega))
    f_sharded = meshmod.shard_state(m, f)
    got = f_sharded
    want = f
    for _ in range(5):
        got = step(got)
        want = _single_device_periodic_step(want, omega)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-14)


@needs_8
def test_auto_gspmd_step_equals_single_device():
    m = meshmod.make_mesh(shape=(8, 1))
    omega = 1.0 / 0.7
    f = _rand_f((9, 40, 24), seed=4)
    chunk = sharded.auto_sharded(lambda s: _single_device_periodic_step(s, omega), m)
    got = chunk(meshmod.shard_state(m, f), 5)
    want = f
    for _ in range(5):
        want = _single_device_periodic_step(want, omega)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-14)


@needs_8
def test_auto_gspmd_mrtcg_equals_single_device():
    """The flagship MRT-CG two-phase step under GSPMD sharding (2-cell
    gradient halos handled by XLA's partitioner) must match the
    single-device step — the multiphase analog of the decompose_domain
    A/B comparison (SURVEY.md section 7.6)."""
    from lbm_tpu.models.mrt_cg import MRTCGModel
    from lbm_tpu.scenes.multiphase import (
        DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine, mrtcg_boundary)

    R, C = 32, 16
    model = MRTCGModel(red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=1e-4,
                       gravity=(6.25e-7, 0.0), apply_gravity_source=True,
                       boundary=mrtcg_boundary)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    state = model.init_state(r0, b0)

    want = state
    for _ in range(5):
        want = model.step(want)

    m = meshmod.make_mesh(shape=(4, 2))
    chunk = sharded.auto_sharded(model.step, m)
    got = chunk(meshmod.shard_state(m, state), 5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-12),
        got, want)


@needs_8
def test_sharded_channel_reproduces_poiseuille():
    """8-way row decomposition of the horizontal Poiseuille channel must
    match the single-device scene exactly (the TPU version of the
    decompose_domain A/B comparison)."""
    H = W = 24  # H divisible by 8
    import math
    tau = channel.TAU_DEFAULT
    omega = 1.0 / tau
    u_max = 1.030985714e-1
    nu = (2.0 * tau - 1.0) / 6.0
    p_grad = 8.0 * nu * u_max / (W * W)
    rho_in = 3.0 * (H - 1) * p_grad + 1.0

    # single-device oracle
    from lbm_tpu.boundary import bc
    from lbm_tpu.models.single_phase import SinglePhaseModel
    model = SinglePhaseModel(
        omega=omega, incompressible=True,
        pre_stream_bcs=(lambda fc, fe, u, rho: bc.pressure_periodic(
            fc, fe, u, rho_in, 1.0, axis=0, eq_fn=d2q9.incomp_equilibrium),),
        post_stream_bcs=(lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
                         lambda fa, fc: bc.bounce_back(fa, fc, "col0")),
    )
    f0 = model.init(H, W)
    want = f0
    for _ in range(50):
        want = model.step(want)

    m = meshmod.make_mesh(shape=(8, 1))
    step = sharded.make_channel_bgk_step(m, omega, rho_in, 1.0)
    chunk = jax.jit(lambda s: jax.lax.fori_loop(0, 50, lambda _, x: step(x), s))
    got = jax.device_put(
        f0, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec(None, "x", None)))
    got = chunk(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-13)
