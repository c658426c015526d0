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


def test_csf_fused_matches_model_interpret():
    """The CSF-mode fused kernel (20-plane state: populations + surface
    -force carry) tracks the jnp MRTCGModel('csf') step over several
    steps (f64, interpret).

    Tolerance note: the CSF formulation itself (faithful to the
    reference's WIP driver) is roundoff-chaotic — where grad(psi)
    underflows, n = -grad/(1e-20+|grad|) is a noise direction, and the
    curvature stencil reads those cells from interface-adjacent points,
    so ANY reassociated evaluation differs at ~1e-7 in f (measured; K
    differs a few % on the interface fringe).  The gate is therefore a
    physical-agreement bound, not bit parity."""
    from lbm_tpu.kernels.mrtcg_pallas import make_csf_fused_step
    from lbm_tpu.ops import d2q9

    R, C = 48, 128
    model = MRTCGModel(
        red=DEFAULT_RED, blue=DEFAULT_BLUE, sigma=1e-4,
        gravity=(6.25e-7, 0.0), apply_gravity_source=True,
        boundary=mrtcg_boundary, surface_tension="csf")
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, 1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, 1.0)
    state = model.init_state(r0, b0, dtype=jnp.float64)
    rho = state.red.rho + state.blue.rho
    fg = jnp.asarray([6.25e-7, 0.0], jnp.float64)
    u0 = d2q9.calc_u(state.red.f + state.blue.f, rho) \
        + 0.5 * fg[:, None, None] / rho
    state = TwoPhaseState(state.red, state.blue, u0)

    step = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE, 1e-4,
                               (6.25e-7, 0.0), dtype=jnp.float64,
                               block_rows=8, interpret=True)
    S = jnp.concatenate([state.red.f, state.blue.f,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    for _ in range(4):
        state = model.step(state)
        S = step(S)
    np.testing.assert_allclose(np.asarray(S[:9]), np.asarray(state.red.f),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(S[9:18]),
                               np.asarray(state.blue.f), rtol=0, atol=1e-6)
    # carried fst equals the model's u shift: u_model = calc_u + 0.5(Fg+fst)/rho
    rho_n = S[:18].sum(0)
    u_k = d2q9.calc_u(S[:9] + S[9:18], rho_n) \
        + 0.5 * (fg[:, None, None] + S[18:]) / rho_n
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(state.u),
                               rtol=0, atol=1e-6)
    # mass is conserved exactly per colour by the recolouring split
    np.testing.assert_allclose(float(S[:9].sum()),
                               float(state.red.f.sum()), rtol=1e-12)


def test_csf_droplet_fused_matches_model_interpret():
    """The fused 3x3 CSF droplet kernel (moment-space MRT, thresholded
    normal, fs carry) equals CSFDropletModel to f64 round-off — the
    threshold makes this formulation well-conditioned, so unlike the RT
    CSF mode bit-level agreement holds."""
    from lbm_tpu.kernels.csf_droplet_pallas import (
        make_csf_droplet_fused_step)
    from lbm_tpu.models.mrt_csf_droplet import CSFColour, CSFDropletModel
    from lbm_tpu.scenes.multiphase import init_rho_droplet

    R, C = 48, 128
    red = CSFColour(rho_0=1.0, alpha=0.92, nu=0.1667, A=1.0, beta=0.7)
    blue = CSFColour(rho_0=1.0, alpha=0.2, nu=0.1667, A=1.0, beta=0.7)
    model = CSFDropletModel(red=red, blue=blue, sigma=0.1, delta=0.1)
    r0 = init_rho_droplet(R, C, red.rho_0, True, 10.0)
    b0 = init_rho_droplet(R, C, blue.rho_0, False, 10.0)
    state = model.init_state(r0, b0, dtype=jnp.float64)
    step = make_csf_droplet_fused_step(R, C, red, blue, 0.1,
                                       dtype=jnp.float64, block_rows=8,
                                       interpret=True)
    S = jnp.concatenate([state.red.f, state.blue.f,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    for _ in range(3):
        state = model.step(state)
        S = step(S)
    np.testing.assert_allclose(np.asarray(S[:9]), np.asarray(state.red.f),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(S[9:18]),
                               np.asarray(state.blue.f), rtol=0,
                               atol=1e-13)


def test_mrtcg_reduced_matches_full_interpret():
    """The reduced 10-plane kernel tracks the 18-plane kernel exactly
    (f64, interpret): the step consumes the per-colour populations only
    through their sum and the densities, so the reduced layout is closed
    under the update.  The split step materialises per-colour
    populations that match the full kernel's at round-off."""
    from lbm_tpu.kernels.mrtcg_pallas import (
        make_mrtcg_reduced_step, make_mrtcg_split_step, reduce_mrtcg_state)

    R, C = 32, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              block_rows=8, interpret=True)
    full = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    red = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    split = make_mrtcg_split_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)

    F = jnp.stack([state.red.f, state.blue.f])
    G = reduce_mrtcg_state(F)
    for _ in range(3):
        F = full(F)
        G = red(G)
        np.testing.assert_allclose(np.asarray(G[:9]),
                                   np.asarray(F[0] + F[1]),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(G[9]),
                                   np.asarray(F[0].sum(0)),
                                   rtol=0, atol=1e-12)
    # final-step split: exact per-colour materialisation
    F_split = split(G)
    F_next = full(F)
    np.testing.assert_allclose(np.asarray(F_split), np.asarray(F_next),
                               rtol=0, atol=1e-12)


def test_csf_reduced_matches_full_interpret():
    """Reduced (12-plane) CSF kernel vs the 20-plane one (f64,
    interpret; atol matches the CSF roundoff-chaos note above)."""
    from lbm_tpu.kernels.mrtcg_pallas import (
        make_csf_fused_step, make_mrtcg_reduced_step,
        make_mrtcg_split_step, reduce_mrtcg_state)

    R, C = 48, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              block_rows=8, interpret=True)
    full = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    red = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                  surface_tension="csf", **kw)
    split = make_mrtcg_split_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                  surface_tension="csf", **kw)

    S = jnp.concatenate([state.red.f, state.blue.f,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    G = reduce_mrtcg_state(S, surface_tension="csf")
    for _ in range(3):
        S = full(S)
        G = red(G)
        np.testing.assert_allclose(np.asarray(G[:9]),
                                   np.asarray(S[:9] + S[9:18]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(G[9]),
                                   np.asarray(S[:9].sum(0)),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(G[10:]),
                                   np.asarray(S[18:]), rtol=0, atol=1e-6)
    S_split = split(G)
    S_next = full(S)
    np.testing.assert_allclose(np.asarray(S_split), np.asarray(S_next),
                               rtol=0, atol=1e-6)


def test_mrtcg_fused_substeps_matches_plain():
    """Single-chip temporal blocking: one substeps=3 launch (16-row slab
    halo, 3 collide-stream-BC sweeps in VMEM) equals three substeps=1
    launches bit-for-bit in f64 — the sweeps are the same arithmetic,
    sweep k+1 merely reads sweep k's in-slab halo rows instead of HBM."""
    R, C = 64, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              block_rows=8, interpret=True)
    step1 = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    # the 16-row halo needs block_rows >= 16 (strip-DMA contiguity)
    step3 = make_mrtcg_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                  substeps=3, **{**kw, "block_rows": 16})
    F = jnp.stack([state.red.f, state.blue.f])
    got = step3(F)
    want = step1(step1(step1(F)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)


def test_mrtcg_reduced_substeps_matches_plain():
    """Reduced-state (production-path) temporal blocking: substeps=2
    equals two plain launches (f64)."""
    from lbm_tpu.kernels.mrtcg_pallas import (
        make_mrtcg_reduced_step, reduce_mrtcg_state)

    R, C = 64, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              block_rows=8, interpret=True)
    red1 = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    red2 = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   substeps=2, **kw)
    G = reduce_mrtcg_state(jnp.stack([state.red.f, state.blue.f]))
    np.testing.assert_allclose(np.asarray(red2(G)),
                               np.asarray(red1(red1(G))),
                               rtol=0, atol=1e-13)


def test_csf_fused_substeps_matches_plain():
    """CSF temporal blocking: one substeps=2 launch (16-row halo, 5 halo
    rows/sweep, fst carry threaded sweep-to-sweep) equals two plain
    launches (f64)."""
    from lbm_tpu.kernels.mrtcg_pallas import make_csf_fused_step

    R, C = 64, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              block_rows=8, interpret=True)
    csf1 = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE, **kw)
    csf2 = make_csf_fused_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                               substeps=2, **{**kw, "block_rows": 16})
    S = jnp.concatenate([state.red.f, state.blue.f,
                         jnp.zeros((2, R, C), jnp.float64)], axis=0)
    np.testing.assert_allclose(np.asarray(csf2(S)),
                               np.asarray(csf1(csf1(S))),
                               rtol=0, atol=1e-13)


def test_resolve_geometry_auto_pairs():
    """substeps="auto" resolves the COUPLED (cadence, block) optimum
    (VERDICT r4 item 4): the measured B=256 deep-cadence pick where R
    admits it, the shallow fallback elsewhere, an explicit block always
    winning, ints passing through untouched."""
    from lbm_tpu.kernels.mrtcg_pallas import (default_geometry,
                                              resolve_geometry)

    assert resolve_geometry("auto", None, "perturbation", 512) == (5, 256)
    assert resolve_geometry("auto", None, "csf", 512) == (4, 256)
    # explicit block beats the optimum's block
    assert resolve_geometry("auto", 64, "perturbation", 512) == (5, 64)
    # R that does not admit the tall alias-free block -> shallow fallback
    assert resolve_geometry("auto", None, "perturbation", 320) == (2, None)
    # narrow grids fall back too: the optimum is width-dependent (the
    # r5 sweep measured the deep cadence LOSING at C=128)
    assert resolve_geometry("auto", None, "perturbation", 2048, 128) == \
        (2, None)
    assert resolve_geometry("auto", None, "perturbation", 1024, 512) == \
        (5, 256)
    assert resolve_geometry(3, 128, "perturbation", 512) == (3, 128)
    assert resolve_geometry("auto", None, "perturbation", 512) == \
        (default_geometry("perturbation", R=512))
    with pytest.raises(ValueError):
        resolve_geometry("fast", None, "perturbation", 512)


def test_reduced_auto_geometry_equals_explicit():
    """make_mrtcg_reduced_step(substeps="auto") builds exactly the
    explicitly-resolved kernel (bitwise; small R exercises the
    fallback branch end-to-end)."""
    from lbm_tpu.kernels.mrtcg_pallas import (make_mrtcg_reduced_step,
                                              reduce_mrtcg_state,
                                              resolve_geometry)

    R, C = 64, 128
    model, state = _setup(R, C)
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              interpret=True)
    auto = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   substeps="auto", **kw)
    ss, bb = resolve_geometry("auto", None, "perturbation", R)
    assert ss == 2 and bb is None  # 64 rows -> the shallow fallback
    explicit = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                       substeps=ss, block_rows=bb, **kw)
    F = jnp.stack([state.red.f, state.blue.f])
    G = reduce_mrtcg_state(F)
    np.testing.assert_array_equal(np.asarray(auto(G)),
                                  np.asarray(explicit(G)))


@pytest.mark.parametrize("surface_tension", ["perturbation", "csf"])
def test_reduced_lanes_step_matches_reduced(surface_tension):
    """The lane-blocked experiment kernel (make_mrtcg_reduced_lanes_step,
    VERDICT r4 item 1) is the SAME physics as the reduced kernel —
    per-tile col_iota windows reproduce the full-width result to
    roundoff (bitwise for most entries) including the no-diagonal-offset
    column repair at the global seam."""
    from lbm_tpu.kernels.mrtcg_pallas import (make_mrtcg_reduced_lanes_step,
                                              make_mrtcg_reduced_step,
                                              reduce_mrtcg_state)
    from lbm_tpu.ops import d2q9
    from lbm_tpu.scenes.multiphase import init_rho_cosine

    R, C = 48, 512
    csf = surface_tension == "csf"
    kw = dict(sigma=1e-4, gravity=(6.25e-7, 0.0), dtype=jnp.float64,
              interpret=True, surface_tension=surface_tension)
    r0 = init_rho_cosine(R, C, DEFAULT_RED.rho_0, True, 1.0)
    b0 = init_rho_cosine(R, C, DEFAULT_BLUE.rho_0, False, 1.0)
    feq = d2q9.equilibrium(jnp.zeros((2, R, C), jnp.float64),
                           jnp.ones((R, C)))
    tot = jnp.maximum(r0 + b0, 1e-30)[None]
    parts = [r0[None] * feq / tot, b0[None] * feq / tot]
    if csf:
        S = jnp.concatenate(parts + [jnp.zeros((2, R, C), jnp.float64)],
                            axis=0)
    else:
        S = jnp.stack(parts)
    G = reduce_mrtcg_state(S, surface_tension)
    base = make_mrtcg_reduced_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                   substeps=2, **kw)
    lanes = make_mrtcg_reduced_lanes_step(R, C, DEFAULT_RED, DEFAULT_BLUE,
                                          substeps=2, lane_block=256, **kw)
    np.testing.assert_allclose(np.asarray(lanes(G)), np.asarray(base(G)),
                               rtol=0, atol=1e-13)
