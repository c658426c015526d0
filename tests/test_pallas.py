"""Pallas fused kernel vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels import bgk_pallas
from lbm_tpu.ops import d2q9


def oracle_step(f, omega):
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    feq = d2q9.equilibrium(u, rho)
    return d2q9.stream(d2q9.bgk_collision(f, feq, omega))


@pytest.mark.parametrize("shape,block", [((32, 128), 8), ((16, 256), 16)])
def test_fused_step_matches_oracle(shape, block):
    R, C = shape
    omega = 1.0 / 0.8
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    step = bgk_pallas.make_fused_step(R, C, omega, jnp.float32,
                                      block_rows=block, interpret=True)
    got = np.asarray(step(f))
    want = np.asarray(oracle_step(f.astype(jnp.float64), omega)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fused_step_multi_iteration():
    R, C = 16, 128
    omega = 1.0
    f0 = d2q9.equilibrium(
        jnp.zeros((2, R, C), jnp.float32).at[0].set(0.03),
        jnp.ones((R, C), jnp.float32))
    step = bgk_pallas.make_fused_step(R, C, omega, jnp.float32,
                                      block_rows=8, interpret=True)
    f = f0
    g = f0.astype(jnp.float64)
    for _ in range(3):
        f = step(f)
        g = oracle_step(g, omega)
    np.testing.assert_allclose(np.asarray(f), np.asarray(g), rtol=1e-4, atol=1e-6)
    # mass conserved exactly per plane totals
    assert float(jnp.sum(f)) == pytest.approx(float(jnp.sum(f0)), rel=1e-5)


def test_pick_block_rows():
    assert bgk_pallas.pick_block_rows(1024, 1024) in (32, 64, 128, 256)
    b = bgk_pallas.pick_block_rows(4096, 2048)
    assert 4096 % b == 0


def test_temporal_blocking_matches_repeated_steps():
    """substeps=k in one launch == k single-step launches (periodic)."""
    from lbm_tpu.kernels import collide_stream
    from lbm_tpu.kernels.bgk_pallas import bgk_collide_fn

    R, C = 32, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, R, C)), jnp.float32)
    fn = bgk_collide_fn(omega, jnp.float32)
    one = collide_stream.make_fused_step(R, C, fn, block_rows=8,
                                         interpret=True)
    four = collide_stream.make_fused_step(R, C, fn, block_rows=8,
                                          interpret=True, substeps=4)
    want = f
    for _ in range(4):
        want = one(want)
    got = four(f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_channel_fused_matches_model():
    """Fused pressure-BC channel kernel vs the SinglePhaseModel step."""
    from lbm_tpu.boundary import bc
    from lbm_tpu.kernels.channel_pallas import make_channel_fused_step
    from lbm_tpu.models.single_phase import SinglePhaseModel

    R, C = 24, 128
    omega = 1.0 / 0.9
    rho_in, rho_out = 1.02, 1.0
    model = SinglePhaseModel(
        omega=omega, incompressible=True,
        pre_stream_bcs=(lambda fc, fe, u, rho: bc.pressure_periodic(
            fc, fe, u, rho_in, rho_out, axis=0,
            eq_fn=d2q9.incomp_equilibrium),),
        post_stream_bcs=(lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
                         lambda fa, fc: bc.bounce_back(fa, fc, "col0")),
    )
    f = model.init(R, C, dtype=jnp.float64)
    step = make_channel_fused_step(R, C, omega, rho_in, rho_out,
                                   dtype=jnp.float32, block_rows=8,
                                   interpret=True)
    got = f.astype(jnp.float32)
    want = f
    for _ in range(4):
        got = step(got)
        want = model.step(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-7)


def test_kbc_channel_fused_matches_model():
    """Fused KBC channel kernel vs the jnp ulbm_poiseuille step."""
    from lbm_tpu.boundary import bc
    from lbm_tpu.kernels.channel_pallas import make_channel_fused_step
    from lbm_tpu.models import kbc as kbc_model

    R, C = 24, 128
    omega = 1.0 / (0.5 + 3.0 * 1e-2)
    rho_in, rho_out = 1.01, 1.0
    m0 = jnp.ones((R, C), jnp.float64)
    u = jnp.zeros((2, R, C), jnp.float64)
    f = kbc_model.equilibrium(m0, u)

    def jnp_step(g):
        m = d2q9.calc_rho(g)
        v = d2q9.calc_u(g, m)
        fc = kbc_model.collide(g, m, v, omega)
        fe = kbc_model.equilibrium(m, v)
        fc = bc.pressure_periodic(fc, fe, v, rho_in, rho_out, axis=0,
                                  eq_fn=d2q9.incomp_equilibrium)
        fn = d2q9.stream(fc)
        fn = bc.bounce_back(fn, fc, "colN")
        fn = bc.bounce_back(fn, fc, "col0")
        return fn

    step = make_channel_fused_step(R, C, omega, rho_in, rho_out,
                                   dtype=jnp.float32, block_rows=8,
                                   interpret=True, family="kbc")
    got = f.astype(jnp.float32)
    want = f
    for _ in range(3):
        got = step(got)
        want = jnp_step(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-6)


def test_channel_kernel_rejects_aliasing_blocks():
    """Regression: with wrapped absolute rows, B + 2*HALO > R makes halo
    rows alias interior rows and double-counts the BC row extractions —
    such configurations must be rejected."""
    from lbm_tpu.kernels.channel_pallas import make_channel_fused_step

    with pytest.raises(ValueError, match="block"):
        make_channel_fused_step(24, 128, 1.0, 1.01, 1.0,
                                block_rows=16, interpret=True)
    # auto-pick shrinks the block instead of failing
    step = make_channel_fused_step(32, 128, 1.0, 1.01, 1.0, interpret=True)
    assert step is not None


def test_pick_block_rows_safe_scope():
    from lbm_tpu.kernels.collide_stream import pick_block_rows

    # slabs fill 10 MiB of the penalty-free 48 MiB SAFE_SCOPE (the
    # pallas_call requests the matching adaptive scoped-VMEM limit);
    # taller blocks than the default-scope picks cut halo redundancy
    assert pick_block_rows(4096, 2048) == 64
    assert pick_block_rows(4096, 1024) == 128
    assert pick_block_rows(8192, 512) == 256


@pytest.mark.parametrize("variant", ["gravity", "specular", "free_stream",
                                     "vertical"])
def test_channel_variant_fused_matches_model(variant):
    """The generalized channel-variant kernel equals the SinglePhaseModel
    step (interpret mode, f64) for each driver configuration."""
    from lbm_tpu.boundary import bc
    from lbm_tpu.kernels.channel_pallas import make_channel_variant_step
    from lbm_tpu.models.single_phase import SinglePhaseModel

    R, C = 32, 128
    om = 1.0 / 0.933
    rho_in, rho_out = 1.02, 1.0
    uw = jnp.asarray([0.1, 0.0])
    if variant == "gravity":
        kw = dict(incompressible=True, pressure=(1.0, 1.0, 0),
                  force=(-3e-4, 0.0), col_walls="bounce")
        model = SinglePhaseModel(
            omega=om, incompressible=True, force=(-3e-4, 0.0),
            pre_stream_bcs=(lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, 1.0, 1.0, axis=0,
                eq_fn=d2q9.incomp_equilibrium),),
            post_stream_bcs=(lambda fa, fc: bc.bounce_back(fa, fc, "colN"),
                             lambda fa, fc: bc.bounce_back(fa, fc, "col0")))
    elif variant == "specular":
        kw = dict(incompressible=False, pressure=(rho_in, rho_out, 0),
                  col_walls="specular")
        model = SinglePhaseModel(
            omega=om, incompressible=False,
            pre_stream_bcs=(lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_in, rho_out, axis=0,
                eq_fn=d2q9.equilibrium),),
            post_stream_bcs=(lambda fa, fc: bc.specular(fa, fc, "colN"),
                             lambda fa, fc: bc.specular(fa, fc, "col0")))
    elif variant == "free_stream":
        kw = dict(incompressible=True, row_walls="abb", abb_u=(0.1, 0.0),
                  col_walls="specular")
        model = SinglePhaseModel(
            omega=om, incompressible=True,
            post_stream_bcs=(
                lambda fa, fc: bc.anti_bounce_back(fa, fc, "row0", uw),
                lambda fa, fc: bc.anti_bounce_back(fa, fc, "rowN", uw),
                lambda fa, fc: bc.specular(fa, fc, "colN"),
                lambda fa, fc: bc.specular(fa, fc, "col0")))
    else:  # vertical
        kw = dict(incompressible=False, pressure=(rho_in, rho_out, 1),
                  row_walls="bounce")
        model = SinglePhaseModel(
            omega=om, incompressible=False,
            pre_stream_bcs=(lambda fc, fe, u, rho: bc.pressure_periodic(
                fc, fe, u, rho_in, rho_out, axis=1,
                eq_fn=d2q9.equilibrium),),
            post_stream_bcs=(lambda fa, fc: bc.bounce_back(fa, fc, "rowN"),
                             lambda fa, fc: bc.bounce_back(fa, fc, "row0")))

    step = make_channel_variant_step(R, C, omega=om, dtype=jnp.float64,
                                     block_rows=8, interpret=True, **kw)
    rng_ = np.random.default_rng(11)
    u0 = jnp.asarray(0.03 * rng_.standard_normal((2, R, C)))
    f = model.init(R, C, dtype=jnp.float64, u0=u0)
    # develop a few steps through the model, then compare one fused step
    for _ in range(3):
        f = model.step(f)
    got = np.asarray(step(f))
    want = np.asarray(model.step(f))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)
