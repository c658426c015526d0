"""Fused sedimentation kernel vs the jnp scene path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.scenes import obstacles


def test_sediment_scene_fused_matches_jnp():
    from lbm_tpu.kernels import sediment_pallas

    orig = sediment_pallas.make_sediment_fused_step

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    sediment_pallas.make_sediment_fused_step = patched
    try:
        kwargs = dict(H=64, W=128, T=40, R23=-30, C28=60, C38=80,
                      inlet_rows=16)
        rf = obstacles.rectangle_sedimentation(fused=True, **kwargs)
    finally:
        sediment_pallas.make_sediment_fused_step = orig
    rj = obstacles.rectangle_sedimentation(fused=False, dtype=jnp.float32,
                                           **kwargs)
    np.testing.assert_allclose(np.asarray(rf.u), np.asarray(rj.u),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(rf.C), np.asarray(rj.C),
                               rtol=5e-4, atol=5e-7)
    np.testing.assert_allclose(np.asarray(rf.rho), np.asarray(rj.rho),
                               rtol=5e-5, atol=5e-6)


def test_sediment_fused_substeps_equivalence():
    """Temporal blocking: substeps=4 per launch equals 4 plain steps at
    machine precision.  (The g row-0 side has a live periodic wrap, so
    the multi-sweep body runs on WRAPPED abs_iota — this test is red if
    the halo rows are swept at unwrapped positions.)"""
    import jax.numpy as jnp

    from lbm_tpu.kernels.sediment_pallas import make_sediment_fused_step
    from lbm_tpu.ops import d2q9

    R, C = 64, 128
    kw = dict(omega=1.0 / 0.55, u_in=0.02, w_s=3e-3, C_w=1e-3,
              R23=R - 20, C28=40, C38=56, inlet_rows=16,
              dtype=jnp.float64, interpret=True)
    s1 = make_sediment_fused_step(R, C, **kw)
    s4 = make_sediment_fused_step(R, C, substeps=4, **kw)
    us = jnp.zeros((2, R, C), jnp.float64).at[1].set(0.02)
    f0 = d2q9.incomp_equilibrium(us, jnp.ones((R, C)))
    cw0 = np.zeros((R, C))
    cw0[-16:, 0] = 1e-3
    g0 = d2q9.equilibrium(us, jnp.asarray(cw0))
    S0 = jnp.concatenate([f0, g0], axis=0)
    S = S0
    for _ in range(8):
        S = s1(S)
    np.testing.assert_allclose(np.asarray(s4(s4(S0))), np.asarray(S),
                               rtol=0, atol=1e-13)
