"""Fused MRT-CG two-phase kernel vs the jnp model step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels.mrtcg_pallas import make_mrtcg_fused_step
from lbm_tpu.models.mrt_cg import MRTCGModel, TwoPhaseState, ColourFields
from lbm_tpu.scenes.multiphase import (
    DEFAULT_BLUE, DEFAULT_RED, init_rho_cosine, mrtcg_boundary)


def _setup(R, C, dtype=jnp.float64):
    model = MRTCGModel(
        red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=1e-4,
        gravity=(6.25e-7, 0.0), apply_gravity_source=True,
        boundary=mrtcg_boundary)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, -1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, -1.0)
    state = model.init_state(r0, b0, dtype=dtype)
    # the kernel derives u = calc_u(f) + 0.5 Fg/rho; seed the model state
    # with the same convention so trajectories align from step 0
    from lbm_tpu.ops import d2q9

    rho = state.red.rho + state.blue.rho
    fg = jnp.asarray([6.25e-7, 0.0], dtype)
    u = d2q9.calc_u(state.red.f + state.blue.f, rho) + 0.5 * fg[:, None, None] / rho
    return model, TwoPhaseState(state.red, state.blue, u)


def test_mrtcg_fused_matches_model_interpret():
    R, C = 32, 128
    model, state = _setup(R, C)
    step = make_mrtcg_fused_step(
        R, C, DEFAULT_RED, DEFAULT_BLUE, sigma=1e-4,
        gravity=(6.25e-7, 0.0), dtype=jnp.float32,
        block_rows=8, interpret=True)

    F = jnp.stack([state.red.f, state.blue.f]).astype(jnp.float32)
    want = state
    for _ in range(3):
        F = step(F)
        want = model.step(want)
    got_r, got_b = np.asarray(F[0]), np.asarray(F[1])
    np.testing.assert_allclose(got_r, np.asarray(want.red.f), rtol=2e-4, atol=3e-6)
    np.testing.assert_allclose(got_b, np.asarray(want.blue.f), rtol=2e-4, atol=3e-6)
    # macroscopic agreement (the reproduction bar that actually matters)
    np.testing.assert_allclose(got_r.sum(0), np.asarray(want.red.rho),
                               rtol=1e-5, atol=1e-6)
