"""Ring-cavity (decompose_domain_loop equivalent) tests."""

import numpy as np
import pytest

import jax

from lbm_tpu.scenes.cavity import ring_cavity

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_ring_cavity_circulates():
    res = ring_cavity(L=64, T=400, force=3e-3)
    u = np.asarray(res.u / res.rho[None])
    assert np.isfinite(u).all()
    # forced left strip flows +x (down); right strip returns -x (up)
    left = u[0, 24:40, 4:12].mean()
    right = u[0, 24:40, 52:60].mean()
    assert left > 1e-4
    assert right < -1e-5
    # block interior stays quiescent relative to the annulus
    assert np.abs(u[0, 28:36, 28:36]).max() < np.abs(left)


@needs_8
def test_ring_cavity_sharded_equals_single():
    r1 = ring_cavity(L=32, T=60, force=3e-3)
    r2 = ring_cavity(L=32, T=60, force=3e-3, mesh_shape=(4, 2))
    np.testing.assert_allclose(
        np.asarray(r2.f), np.asarray(r1.f), rtol=0, atol=1e-13)


def test_ring_cavity_fused_matches_jnp():
    import jax.numpy as jnp
    from lbm_tpu.kernels import cavity_pallas

    orig = cavity_pallas.make_cavity_fused_step

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    cavity_pallas.make_cavity_fused_step = patched
    try:
        rf = ring_cavity(L=128, T=30, fused=True)
    finally:
        cavity_pallas.make_cavity_fused_step = orig
    rj = ring_cavity(L=128, T=30, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(rf.u), np.asarray(rj.u),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(rf.rho), np.asarray(rj.rho),
                               rtol=5e-5, atol=5e-6)


def test_ring_cavity_fused_substeps_equivalence():
    """Temporal blocking: substeps=4 per launch equals 4 plain steps at
    machine precision (f64, interpret)."""
    import jax.numpy as jnp
    from lbm_tpu.kernels.cavity_pallas import make_cavity_fused_step
    from lbm_tpu.ops import d2q9

    L = 128
    kw = dict(omega=1.0 / (np.sqrt(3.0 / 16.0) + 0.5), force=3e-5,
              dtype=jnp.float64, interpret=True)
    s1 = make_cavity_fused_step(L, **kw)
    s4 = make_cavity_fused_step(L, substeps=4, **kw)
    f0 = d2q9.equilibrium(jnp.zeros((2, L, L), jnp.float64),
                          jnp.ones((L, L), jnp.float64))
    S = f0
    for _ in range(8):
        S = s1(S)
    np.testing.assert_allclose(np.asarray(s4(s4(f0))), np.asarray(S),
                               rtol=0, atol=1e-13)
    # and through the scene API
    a = ring_cavity(L=128, T=24, force=3e-5, fused=True, interpret=True,
                    substeps=1, dtype=jnp.float64)
    b = ring_cavity(L=128, T=24, force=3e-5, fused=True, interpret=True,
                    substeps=4, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-13)
