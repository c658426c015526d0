"""TRT two-relaxation-time operator (models.trt, kernels.trt_pallas —
beyond the reference, which relies on the magic BGK tau for its
Poiseuille exactness gate)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.kernels.trt_pallas import make_trt_fused_step
from lbm_tpu.models.trt import (MAGIC_POISEUILLE, omega_minus_from_magic,
                                trt_collision)
from lbm_tpu.ops import d2q9
from lbm_tpu.scenes import channel


def _rand_state(rng, R, C):
    rho = 1.0 + 0.05 * rng.standard_normal((R, C))
    u = 0.05 * rng.standard_normal((2, R, C))
    f = d2q9.equilibrium(jnp.asarray(u), jnp.asarray(rho))
    return f + 0.01 * jnp.asarray(rng.standard_normal(f.shape))


def test_trt_equal_rates_is_bgk():
    """omega_minus = omega_plus reduces to BGK (to f64 round-off; the
    even/odd split reassociates the sum, so not bitwise)."""
    rng = np.random.default_rng(3)
    f = _rand_state(rng, 16, 24)
    rho = d2q9.calc_rho(f)
    feq = d2q9.equilibrium(d2q9.calc_u(f, rho), rho)
    om = 1.0 / 0.8
    np.testing.assert_allclose(
        np.asarray(trt_collision(f, feq, om, om)),
        np.asarray(d2q9.bgk_collision(f, feq, om)), rtol=0, atol=1e-15)


def test_magic_lambda_algebra():
    """omega_minus_from_magic realises Lambda = (t+ - 1/2)(t- - 1/2)."""
    for tau_plus in (0.6, 0.933, 1.2, 3.0):
        w_m = omega_minus_from_magic(1.0 / tau_plus)
        lam = (tau_plus - 0.5) * (1.0 / w_m - 0.5)
        assert abs(lam - MAGIC_POISEUILLE) < 1e-14
    # the reference's tau is exactly the BGK magic point:
    tau_ref = np.sqrt(3.0 / 16.0) + 0.5
    assert abs(omega_minus_from_magic(1.0 / tau_ref) - 1.0 / tau_ref) < 1e-14


def test_trt_magic_poiseuille_exact_at_any_tau():
    """The reference's L2 <= 1e-11 analytic-parabola gate
    (horizontal_poiseuille_test.cpp:175) passes under TRT at tau = 1.2 —
    far from the BGK magic tau, where plain BGK misses by ~9 orders."""
    r = channel.trt_poiseuille(dtype=jnp.float64, fused=False)
    assert r.l2 <= 1e-11, r.l2
    r_bgk = channel.horizontal_poiseuille(tau=1.2, T=6000,
                                          dtype=jnp.float64, fused=False)
    assert r_bgk.l2 > 1e-4, r_bgk.l2


def test_trt_fused_kernel_matches_oracle():
    """make_trt_fused_step (interpret) == trt_collision + stream, f64."""
    rng = np.random.default_rng(11)
    f = _rand_state(rng, 32, 128).astype(jnp.float64)
    om_p = 1.0 / 0.9
    om_m = omega_minus_from_magic(om_p)
    step = make_trt_fused_step(32, 128, omega_plus=om_p, omega_minus=om_m,
                               dtype=jnp.float64, interpret=True)
    g = f
    for _ in range(3):
        rho = d2q9.calc_rho(g)
        feq = d2q9.equilibrium(d2q9.calc_u(g, rho), rho)
        g = d2q9.stream(trt_collision(g, feq, om_p, om_m))
    np.testing.assert_allclose(np.asarray(step(step(step(f)))),
                               np.asarray(g), rtol=0, atol=1e-13)


def test_trt_fused_temporal_blocking_matches_single_steps():
    """substeps=4 launch == 4 substeps=1 launches (periodic, f64)."""
    rng = np.random.default_rng(5)
    f = _rand_state(rng, 32, 128).astype(jnp.float64)
    om_p, om_m = 1.0 / 1.1, omega_minus_from_magic(1.0 / 1.1)
    s1 = make_trt_fused_step(32, 128, omega_plus=om_p, omega_minus=om_m,
                             dtype=jnp.float64, interpret=True)
    s4 = make_trt_fused_step(32, 128, omega_plus=om_p, omega_minus=om_m,
                             substeps=4, dtype=jnp.float64, interpret=True)
    np.testing.assert_allclose(np.asarray(s4(f)),
                               np.asarray(s1(s1(s1(s1(f))))),
                               rtol=0, atol=1e-14)


def test_trt_channel_variant_fused_matches_jnp():
    """The TRT branch of make_channel_variant_step (interpret, f32)
    reproduces the jnp trt_poiseuille scene path."""
    from lbm_tpu.kernels import channel_pallas

    orig = channel_pallas.make_channel_variant_step

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    channel_pallas.make_channel_variant_step = patched
    try:
        rf = channel.trt_poiseuille(H=32, W=128, T=40, fused=True)
        rj = channel.trt_poiseuille(H=32, W=128, T=40, fused=False,
                                    dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(rf.u), np.asarray(rj.u),
                                   rtol=2e-4, atol=2e-6)
    finally:
        channel_pallas.make_channel_variant_step = orig


def test_trt_collide_fn_rides_sharded_wrapper():
    """trt_collide_fn through the 1-D sharded factory == single-chip
    fused kernel (virtual 8-device mesh would be exercised by the
    dryrun; here: the halo-input body on one shard, f64)."""
    from lbm_tpu.kernels.sharded_pallas import make_sharded_fused_step
    from lbm_tpu.kernels.trt_pallas import trt_collide_fn
    from lbm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    f = _rand_state(rng, 64, 128).astype(jnp.float64)
    om_p, om_m = 1.0 / 1.3, omega_minus_from_magic(1.0 / 1.3)
    mesh = make_mesh(shape=(8, 1))
    sharded = make_sharded_fused_step(
        mesh, 64, 128, trt_collide_fn(om_p, om_m, jnp.float64),
        dtype=jnp.float64, interpret=True)
    single = make_trt_fused_step(64, 128, omega_plus=om_p, omega_minus=om_m,
                                 dtype=jnp.float64, interpret=True)
    np.testing.assert_allclose(np.asarray(sharded(f)),
                               np.asarray(single(f)), rtol=0, atol=1e-13)
