"""Literal-transcription oracle for the rectangle-sedimentation chain.

Same approach as tests/test_mrtcg_transcription.py: ``_ref_sediment``
below is a deliberately verbatim torch-f64 transcription of
/root/reference/test/rectangle_sedimentation_test.cpp:49-238 — same
(R, C, 9) layout, the coupled fluid f + ADE scalar g step in the
driver's exact order: equilibria (g at u + w_s, :125), BGK collisions
(:131-132), PRE-stream zero-gradient scalar outflows (:138-141, row 0
over ALL cols, col -1 over rows 1:-1), periodic advection, fluid ABB
inlet rows 1:-1 (:150-161, including the :154-157 direction 2/4 write
sequence) and extrapolated-velocity ABB outlet over ALL rows (:163-172),
specular top / no-slip bottom (:174-182), rectangle bounce-back
(:184-196), END-of-step macroscopics (:199-200), ADE Dirichlet inlet
with 2*g_eq at the UPDATED velocity (:204-218), rectangle scalar
anti-bounce-back with the first wall's rows running to the LAST row
(:222-224 Slice(R23+1,None) vs the fluid's Slice(R23+1,-1) — quirk),
and the plain (positive) scalar bottom bounce-back (:234-236).

The optimized planes-layout scene (scenes.obstacles.
rectangle_sedimentation) and the fused Pallas kernel
(kernels.sediment_pallas) must match it field-for-field at <= 1e-12
over 50 steps in f64, closing the end-to-end parity loop on this driver
chain (VERDICT r2 item 1).
"""

import numpy as np
import torch

import jax.numpy as jnp

from lbm_tpu.ops import d2q9
from lbm_tpu.scenes import obstacles

torch.set_default_dtype(torch.float64)

# --- literal constants (src/solver.cpp:12-21) -------------------------------

E = torch.tensor([4.0 / 9.0,
                  1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0, 1.0 / 9.0,
                  1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0, 1.0 / 36.0])

c = torch.tensor([[0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0],
                  [0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0]])


def _equilibrium(u, rho):
    """solver::equilibrium (src/solver.cpp:51-62)."""
    u_u = (u * u).sum(-1, keepdim=True)
    c_u = torch.matmul(u, c)
    return rho * (1.0 + 3.0 * c_u + 4.5 * c_u.pow(2) - 1.5 * u_u) * E


def _advect(f):
    """solver::advect (src/solver.cpp:76-131) == per-direction roll."""
    g = torch.empty_like(f)
    cx = [0, 1, 0, -1, 0, 1, -1, -1, 1]
    cy = [0, 0, 1, 0, -1, 1, 1, -1, -1]
    for k in range(9):
        g[..., k] = torch.roll(f[..., k], shifts=(cx[k], cy[k]), dims=(0, 1))
    return g


def _ref_sediment(H, W, T, omega, u_in, w_s, scalar_C_w, R23, C28, C38,
                  inlet_rows):
    """Verbatim main loop of rectangle_sedimentation_test.cpp:49-238
    (CPU torch f64; the driver's hardcoded -50 inlet band and -151/200/
    250 wall coordinates parametrized to fit a test-sized grid)."""
    u = torch.zeros(H, W, 2)
    rho = torch.ones(H, W, 1)
    C = torch.zeros(H, W, 1)

    fixed_u_w = torch.zeros(H, 2)
    fixed_u_w[:, 1] = u_in                              # :79-80
    u[..., 1] = u_in                                    # :83

    C_w = torch.zeros(H)
    C_w[-inlet_rows:] = scalar_C_w                      # :92-93
    C[:, 0, 0] = C_w                                    # :94
    g_adve = _equilibrium(u, C)                         # :95

    f_adve = (rho + 3.0 * torch.matmul(u, c)) * E       # :100 incomp_eq

    rho = f_adve.sum(-1, keepdim=True)                  # :103
    u = torch.matmul(f_adve, c.t()) / rho               # :104

    for _ in range(T):
        f_equi = _equilibrium(u, rho)                   # :124
        g_equi = _equilibrium(u + w_s, C)               # :125
        f_coll = (1.0 - omega) * f_adve + omega * f_equi    # :131
        g_coll = (1.0 - omega) * g_adve + omega * g_equi    # :132

        # zero-gradient scalar outflows, PRE-stream (:138-141)
        g_coll[0] = g_coll[1].clone()
        g_coll[1:-1, -1, :] = g_coll[1:-1, -2, :].clone()

        f_adve = _advect(f_coll)                        # :144
        g_adve = _advect(g_coll)                        # :145

        # fluid ABB inlet, rows 1:-1 at col 0, fixed wall velocity
        # (:150-161; writes dirs 3,4,1,2,7,8,5,6 — all reads from f_coll)
        abb = ((2.0 + 9.0 * torch.matmul(fixed_u_w, c).pow(2.0)
                - 3.0 * (fixed_u_w * fixed_u_w).sum(1).unsqueeze(1)) * E)
        opp = [0, 3, 4, 1, 2, 7, 8, 5, 6]
        for k in range(1, 9):
            f_adve[1:-1, 0, opp[k]] = -f_coll[1:-1, 0, k] + abb[1:-1, k]

        # fluid ABB outlet, ALL rows at col -1, extrapolated velocity
        # from the step-start u (:163-172)
        u_w = 1.5 * u[:, -1] - 0.5 * u[:, -2]
        abb = ((2.0 + 9.0 * torch.matmul(u_w, c).pow(2.0)
                - 3.0 * (u_w * u_w).sum(1).unsqueeze(1)) * E)
        for k in range(1, 9):
            f_adve[:, -1, opp[k]] = -f_coll[:, -1, k] + abb[:, k]

        # specular top (:175-177)
        f_adve[0, :, 8] = f_coll[0, :, 7]
        f_adve[0, :, 1] = f_coll[0, :, 3]
        f_adve[0, :, 5] = f_coll[0, :, 6]
        # bottom no slip (:180-182)
        f_adve[-1, :, 7] = f_coll[-1, :, 5]
        f_adve[-1, :, 3] = f_coll[-1, :, 1]
        f_adve[-1, :, 6] = f_coll[-1, :, 8]

        # rectangle walls, fluid (:186-196)
        f_adve[R23 + 1:-1, C28, 8] = f_coll[R23 + 1:-1, C28, 6]
        f_adve[R23 + 1:-1, C28, 4] = f_coll[R23 + 1:-1, C28, 2]
        f_adve[R23 + 1:-1, C28, 7] = f_coll[R23 + 1:-1, C28, 5]
        f_adve[R23, C28:C38 + 1, 6] = f_coll[R23, C28:C38 + 1, 8]
        f_adve[R23, C28:C38 + 1, 3] = f_coll[R23, C28:C38 + 1, 1]
        f_adve[R23, C28:C38 + 1, 7] = f_coll[R23, C28:C38 + 1, 5]
        f_adve[R23 + 1:-1, C38, 5] = f_coll[R23 + 1:-1, C38, 7]
        f_adve[R23 + 1:-1, C38, 2] = f_coll[R23 + 1:-1, C38, 4]
        f_adve[R23 + 1:-1, C38, 6] = f_coll[R23 + 1:-1, C38, 8]

        # END-of-step macroscopics feed the BCs below AND the next
        # step's equilibria (:199-201)
        rho = f_adve.sum(-1, keepdim=True)
        u = torch.matmul(f_adve, c.t()) / rho

        # ADE Dirichlet inlet with 2*g_eq at the UPDATED u (:204-218)
        uw = u[:, 0, :] + w_s
        g_abb = ((1.0 + 3.0 * torch.matmul(uw, c)
                  + 4.5 * torch.matmul(uw, c).pow(2)
                  - 1.5 * (uw * uw).sum(-1).unsqueeze(-1))
                 * E * C_w.unsqueeze(-1))
        for k in range(1, 9):
            g_adve[1:-1, 0, opp[k]] = (-g_coll[1:-1, 0, k]
                                       + 2.0 * g_abb[1:-1, k])

        # rectangle walls, scalar ANTI bounce-back (:222-232); note the
        # first wall's rows extend to the LAST row (Slice(R23+1,None))
        g_adve[R23 + 1:, C28, 8] = -g_coll[R23 + 1:, C28, 6]
        g_adve[R23 + 1:, C28, 4] = -g_coll[R23 + 1:, C28, 2]
        g_adve[R23 + 1:, C28, 7] = -g_coll[R23 + 1:, C28, 5]
        g_adve[R23, C28:C38 + 1, 6] = -g_coll[R23, C28:C38 + 1, 8]
        g_adve[R23, C28:C38 + 1, 3] = -g_coll[R23, C28:C38 + 1, 1]
        g_adve[R23, C28:C38 + 1, 7] = -g_coll[R23, C28:C38 + 1, 5]
        g_adve[R23 + 1:-1, C38, 5] = -g_coll[R23 + 1:-1, C38, 7]
        g_adve[R23 + 1:-1, C38, 2] = -g_coll[R23 + 1:-1, C38, 4]
        g_adve[R23 + 1:-1, C38, 6] = -g_coll[R23 + 1:-1, C38, 8]
        # scalar bottom: PLAIN bounce-back (positive sign, :234-236)
        g_adve[-1, :, 6] = g_coll[-1, :, 8]
        g_adve[-1, :, 3] = g_coll[-1, :, 1]
        g_adve[-1, :, 7] = g_coll[-1, :, 5]

        C = g_adve.sum(-1, keepdim=True)                # :237
    return f_adve, g_adve, u, rho, C


H, W, T = 64, 128, 50
OMEGA, U_IN = 1.0 / 0.55, 0.02
W_S, C_W = 3e-3, 1e-3
R23, C28, C38, INLET = 33, 60, 90, 20   # driver's -151/200/250/-50 scaled


def _scene_kwargs():
    return dict(H=H, W=W, T=T, u_in=U_IN, omega=OMEGA, w_s=W_S, C_w=C_W,
                R23=R23, C28=C28, C38=C38, inlet_rows=INLET)


def _check(res, ref):
    f_ref, g_ref, u_ref, rho_ref, C_ref = ref
    np.testing.assert_allclose(np.transpose(np.asarray(res.f), (1, 2, 0)),
                               f_ref.numpy(), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.transpose(np.asarray(res.g), (1, 2, 0)),
                               g_ref.numpy(), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.transpose(np.asarray(res.u), (1, 2, 0)),
                               u_ref.numpy(), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.rho),
                               rho_ref.squeeze(-1).numpy(),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.C),
                               C_ref.squeeze(-1).numpy(),
                               rtol=0, atol=1e-12)


def test_sediment_jnp_matches_transcription():
    """scenes.obstacles.rectangle_sedimentation (jnp path) equals the
    literal rectangle_sedimentation_test.cpp transcription at <= 1e-12
    after 50 steps: f, g, u, rho and the concentration field."""
    ref = _ref_sediment(H, W, T, OMEGA, U_IN, W_S, C_W, R23, C28, C38,
                        INLET)
    res = obstacles.rectangle_sedimentation(fused=False, dtype=jnp.float64,
                                            **_scene_kwargs())
    _check(res, ref)


def test_sediment_fused_matches_transcription():
    """The fused coupled kernel (kernels.sediment_pallas, f64 interpret
    mode) equals the literal transcription at <= 1e-12 after 50 steps."""
    from lbm_tpu.kernels.sediment_pallas import make_sediment_fused_step

    ref = _ref_sediment(H, W, T, OMEGA, U_IN, W_S, C_W, R23, C28, C38,
                        INLET)
    f_ref, g_ref, u_ref, rho_ref, C_ref = ref

    step = make_sediment_fused_step(
        H, W, omega=OMEGA, u_in=U_IN, w_s=W_S, C_w=C_W, R23=R23,
        C28=C28, C38=C38, inlet_rows=INLET, dtype=jnp.float64,
        interpret=True)
    u0 = jnp.zeros((2, H, W), jnp.float64).at[1].set(U_IN)
    cw0 = np.zeros((H, W))
    cw0[-INLET:, 0] = C_W
    f0 = d2q9.incomp_equilibrium(u0, jnp.ones((H, W), jnp.float64))
    g0 = d2q9.equilibrium(u0, jnp.asarray(cw0))
    S = jnp.concatenate([f0, g0], axis=0)
    for _ in range(T):
        S = step(S)
    f_got, g_got = np.asarray(S[:9]), np.asarray(S[9:])
    np.testing.assert_allclose(np.transpose(f_got, (1, 2, 0)),
                               f_ref.numpy(), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.transpose(g_got, (1, 2, 0)),
                               g_ref.numpy(), rtol=0, atol=1e-12)
    np.testing.assert_allclose(g_got.sum(0), C_ref.squeeze(-1).numpy(),
                               rtol=0, atol=1e-12)
