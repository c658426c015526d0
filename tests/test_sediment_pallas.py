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
