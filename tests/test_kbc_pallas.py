"""Fused KBC Pallas kernel vs the model-layer oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.kernels import collide_stream
from lbm_tpu.models import kbc
from lbm_tpu.ops import d2q9


def test_kbc_fused_matches_model():
    R, C = 16, 128
    s2 = 1.0 / 0.9
    m0 = jnp.ones((R, C), jnp.float32)
    u = jnp.zeros((2, R, C), jnp.float32).at[0].set(
        (0.02 * jnp.sin(jnp.linspace(0, 6.28, C))[None, :])
        .astype(jnp.float32))
    f = kbc.equilibrium(m0, u).astype(jnp.float32)
    # perturb so gamma is nontrivial
    f = f + 1e-3 * jnp.asarray(
        np.random.default_rng(0).standard_normal(f.shape), jnp.float32)

    step = collide_stream.make_kbc_fused_step(R, C, s2, jnp.float32,
                                              block_rows=8, interpret=True)
    got = np.asarray(step(f))

    f64 = f.astype(jnp.float64)
    m064 = d2q9.calc_rho(f64)
    u64 = d2q9.calc_u(f64, m064)
    want = np.asarray(d2q9.stream(kbc.collide(f64, m064, u64, s2)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-6)
