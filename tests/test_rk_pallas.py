"""Fused RK mixture kernel vs models.rk_cg.RKMixtureModel (interpret)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.kernels.rk_pallas import make_rk_fused_step
from lbm_tpu.models.rk_cg import RKMixtureModel
from lbm_tpu.scenes.multiphase import init_rho_cosine, mrtcg_boundary


def test_rk_fused_matches_model():
    R, C = 32, 128
    model = RKMixtureModel(
        r_alpha=11.0 / 15.0, r_rho_0=3.0, r_nu=0.04,
        b_alpha=0.2, b_rho_0=1.0, b_nu=0.06,
        sigma=0.01, beta=0.7, gravity=(-6.25e-6, 0.0),
        boundary=mrtcg_boundary)
    r0 = init_rho_cosine(R, C, 3.0, False, 1.0)
    b0 = init_rho_cosine(R, C, 1.0, True, 1.0)
    st = model.init_state(r0, b0)

    step = make_rk_fused_step(
        R, C, r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=0.04, b_nu=0.06,
        sigma=0.01, beta=0.7, gravity=(-6.25e-6, 0.0),
        dtype=jnp.float32, block_rows=8, interpret=True)

    S = jnp.concatenate(
        [st.f, st.r_rho[None], st.b_rho[None]], axis=0).astype(jnp.float32)
    want = st
    for _ in range(3):
        S = step(S)
        want = model.step(want)
    np.testing.assert_allclose(np.asarray(S[:9]), np.asarray(want.f),
                               rtol=3e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(S[9]), np.asarray(want.r_rho),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S[10]), np.asarray(want.b_rho),
                               rtol=1e-4, atol=1e-5)
