"""Moving-marker IBM: dense factors vs the static operator, the
momentum-exchange identity, and the falling-cylinder coupling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops.ibm import IBM
from lbm_tpu.ops.moving_ibm import (circle_markers, forcing_window,
                                    peskin4j, window_factors)


def _random_markers(rng, n, lo=12.0, hi=28.0):
    return (rng.uniform(lo, hi, n), rng.uniform(lo, hi, n))


def test_dense_factors_match_static_operator():
    # the dense evaluation X[i,j] = phi(row_i - x_j) must reproduce the
    # scatter-built static factors exactly (phi vanishes outside the
    # 4-point support, so the extra evaluations contribute zeros)
    rng = np.random.default_rng(7)
    xs, ys = _random_markers(rng, 17)
    ib = IBM.from_markers(xs, ys)
    ra0, ra1 = ib.roi_rows
    ca0, ca1 = ib.roi_cols
    Xs, Ys = ib.window_operators(ra0, ra1, ca0, ca1, m_pad=len(xs))
    Xd, Yd = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                            float(ra0), float(ca0),
                            ra1 - ra0, ca1 - ca0)
    np.testing.assert_allclose(np.asarray(Xd), Xs, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(Yd), Ys, rtol=0, atol=1e-14)


def test_partition_of_unity_dense():
    # each marker's dense factor column sums to 1 along each axis
    rng = np.random.default_rng(3)
    xs, ys = _random_markers(rng, 11)
    X, Y = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                          8.0, 8.0, 24, 24)
    np.testing.assert_allclose(np.asarray(X).sum(0), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Y).sum(0), 1.0, atol=1e-12)


def test_zero_target_matches_static_forcing():
    # with U_b = 0 the moving-marker forcing is the reference's static
    # multi-direct forcing (ibm.cpp:158-190) — compare against
    # ops.ibm.force_density_roi on the same window
    rng = np.random.default_rng(11)
    xs, ys = _random_markers(rng, 19)
    ib = IBM.from_markers(xs, ys, m_max=5)
    H = W = 40
    key = jax.random.PRNGKey(0)
    u = 0.05 * jax.random.normal(key, (2, H, W), jnp.float64)
    rho = 1.0 + 0.01 * jax.random.normal(key, (H, W), jnp.float64)
    F_static = ib.eulerian_force_density(u, rho)

    ra0, ra1 = ib.roi_rows
    ca0, ca1 = ib.roi_cols
    X, Y = window_factors(jnp.asarray(xs), jnp.asarray(ys),
                          float(ra0), float(ca0), ra1 - ra0, ca1 - ca0)
    F_dyn, f_sum = forcing_window(
        u[:, ra0:ra1, ca0:ca1], rho[ra0:ra1, ca0:ca1], X, Y,
        jnp.zeros(2, jnp.float64), m_max=5)
    np.testing.assert_allclose(np.asarray(F_dyn), np.asarray(F_static),
                               rtol=0, atol=1e-13)
    # momentum-exchange identity: partition of unity makes the window sum
    # of the spread force equal the Lagrangian force sum
    np.testing.assert_allclose(np.asarray(F_dyn.sum(axis=(1, 2))),
                               np.asarray(f_sum), rtol=0, atol=1e-13)


def test_drag_sign_and_slip_toward_target():
    # uniform stream past held markers: the fluid loses +x momentum
    # (f_sum_x < 0 => body reaction -f_sum is downstream drag), and the
    # corrected velocity at markers approaches the body target
    xs, ys = circle_markers(jnp.asarray([16.0, 16.0]), 6.0, 24)
    X, Y = window_factors(xs, ys, 6.0, 6.0, 20, 20)
    u = jnp.zeros((2, 20, 20), jnp.float64).at[0].set(0.08)
    rho = jnp.ones((20, 20), jnp.float64)
    ub = jnp.asarray([0.02, 0.0], jnp.float64)
    F, f_sum = forcing_window(u, rho, X, Y, ub, m_max=5)
    assert float(f_sum[0]) < 0.0          # fluid decelerated toward ub
    u_corr = u + 0.5 * F / rho[None]

    def interp(g):
        return np.asarray(jnp.sum((g @ Y) * X, axis=0))

    slip0 = np.abs(interp(u[0]) - 0.02).max()
    slip1 = np.abs(interp(u_corr[0]) - 0.02).max()
    assert slip1 < 0.5 * slip0
    # and more forcing iterations tighten it monotonically
    F2, _ = forcing_window(u, rho, X, Y, ub, m_max=2)
    slip2 = np.abs(interp((u + 0.5 * F2 / rho[None])[0]) - 0.02).max()
    assert slip1 < slip2 < slip0


def test_peskin4j_matches_numpy():
    from lbm_tpu.ops.ibm import peskin4

    r = np.linspace(-2.5, 2.5, 101)
    np.testing.assert_allclose(np.asarray(peskin4j(jnp.asarray(r))),
                               peskin4(r), rtol=0, atol=1e-15)


def test_falling_cylinder_falls():
    from lbm_tpu.scenes.obstacles import falling_cylinder

    res = falling_cylinder(H=96, W=64, T=120, center=(30.0, 32.0),
                           radius=6.0, rho_s=1.5, gravity=1e-4,
                           record_every=20, dtype=jnp.float64)
    assert np.isfinite(np.asarray(res.f)).all()
    cen = np.asarray(res.center)
    vel = np.asarray(res.velocity)
    assert cen[0] > 30.0 and vel[0] > 0.0       # falls along +rows
    assert abs(cen[1] - 32.0) < 0.2             # symmetric fall
    tr = res.trajectory
    assert tr.shape == (6, 6)
    assert (np.diff(tr[:, 0]) > 0).all()        # monotone descent
    # hydrodynamic reaction opposes the motion once falling
    assert tr[-1, 4] < 0.0


def test_moving_forcing_kernel_matches_jnp():
    """The fused moving-IBM kernel (dynamic-offset window DMA, in-kernel
    factor rebuild + rigid-body update) equals the jnp path to round-off,
    including the state-row rigid closure."""
    from lbm_tpu.kernels.moving_ibm_pallas import (
        make_moving_forcing_step, pack_state)

    H, W = 96, 256
    radius = 9.0
    n_markers = int(np.ceil(2 * np.pi * radius))
    half = int(np.ceil(radius)) + 5
    rho_s, gravity, m_max = 1.25, 5e-5, 5
    area = np.pi * radius * radius
    m_eff = rho_s * area
    g_net = (rho_s - 1.0) * area * gravity
    center = (30.3, 130.7)
    ub0 = (0.02, -0.01)

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(0.05, 0.3, (9, H, W)), jnp.float64)
    theta = np.linspace(0, 2 * np.pi, n_markers, endpoint=False)
    kf = make_moving_forcing_step(
        H, W, radius * np.cos(theta), radius * np.sin(theta), half=half,
        g_net=g_net, m_eff=m_eff, m_max=m_max, dtype=jnp.float64,
        interpret=True)
    assert kf is not None
    F_full, st2 = kf(f, pack_state(center, ub0, dtype=jnp.float64),
                     jnp.zeros((2, H, W), jnp.float64))

    # jnp oracle: the falling_cylinder step's forcing + rigid closure
    from lbm_tpu.ops import d2q9
    cen = jnp.asarray(center, jnp.float64)
    ub = jnp.asarray(ub0, jnp.float64)
    rho = d2q9.calc_rho(f)
    u = d2q9.calc_u(f, rho)
    wr = wc = 2 * half
    r0 = jnp.clip(jnp.round(cen[0]).astype(jnp.int32) - half, 0, H - wr)
    c0 = jnp.clip(jnp.round(cen[1]).astype(jnp.int32) - half, 0, W - wc)
    u_win = jax.lax.dynamic_slice(u, (jnp.int32(0), r0, c0), (2, wr, wc))
    rho_win = jax.lax.dynamic_slice(rho, (r0, c0), (wr, wc))
    xs, ys = circle_markers(cen, radius, n_markers, dtype=f.dtype)
    X, Y = window_factors(xs, ys, r0.astype(f.dtype), c0.astype(f.dtype),
                          wr, wc)
    F_win, f_sum = forcing_window(u_win, rho_win, X, Y, ub, m_max)
    F_ref = jax.lax.dynamic_update_slice(
        jnp.zeros((2, H, W), jnp.float64), F_win, (jnp.int32(0), r0, c0))
    np.testing.assert_allclose(np.asarray(F_full), np.asarray(F_ref),
                               rtol=0, atol=1e-12)
    F_h = -f_sum
    ub2 = ub + (F_h + jnp.asarray([g_net, 0.0], f.dtype)) / m_eff
    want = np.concatenate([np.asarray(cen + ub2), np.asarray(ub2),
                           np.asarray(F_h)])
    np.testing.assert_allclose(np.asarray(st2)[0, :6], want,
                               rtol=1e-12, atol=1e-12)


def test_falling_cylinder_fused_matches_jnp():
    """End-to-end: the two-launch fused falling-cylinder path (moving
    forcing kernel + box grid kernel) reproduces the jnp scene —
    fields, trajectory, and final rigid-body state."""
    from lbm_tpu.scenes.obstacles import falling_cylinder

    kw = dict(H=64, W=256, T=12, center=(20.0, 128.0), radius=8.0,
              rho_s=1.4, gravity=1e-4, record_every=4,
              dtype=jnp.float64)
    ref = falling_cylinder(fused=False, **kw)
    got = falling_cylinder(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got.trajectory, ref.trajectory,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.center),
                               np.asarray(ref.center), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.velocity),
                               np.asarray(ref.velocity), atol=1e-12)


def test_barrier_forces():
    """Glowinski barrier: Newton's third law on a close pair, correct
    push-apart and wall signs, exact zero beyond the activation range."""
    from lbm_tpu.ops.moving_ibm import barrier_forces

    H = W = 200
    # pair closer than 2r + zeta: equal/opposite, pointing apart
    cen = jnp.asarray([[100.0, 90.0], [100.0, 115.0]], jnp.float64)
    F = np.asarray(barrier_forces(cen, 12.0, H, W, zeta=2.0, eps=50.0))
    np.testing.assert_allclose(F[0] + F[1], 0.0, atol=1e-14)
    assert F[0, 1] < 0.0 and F[1, 1] > 0.0
    # beyond range: exactly zero
    cen = jnp.asarray([[100.0, 60.0], [100.0, 140.0]], jnp.float64)
    F = np.asarray(barrier_forces(cen, 12.0, H, W, zeta=2.0, eps=50.0))
    np.testing.assert_array_equal(F, 0.0)
    # wall: a body 1 cell off the low-row wall gets pushed to +rows
    cen = jnp.asarray([[13.0, 100.0]], jnp.float64)
    F = np.asarray(barrier_forces(cen, 12.0, H, W, zeta=2.0, eps=50.0))
    assert F[0, 0] > 0.0 and F[0, 1] == 0.0
    # and the mirror body off the high-row wall is pushed back equally
    cen2 = jnp.asarray([[H - 1 - 13.0, 100.0]], jnp.float64)
    F2 = np.asarray(barrier_forces(cen2, 12.0, H, W, zeta=2.0, eps=50.0))
    np.testing.assert_allclose(F2[0, 0], -F[0, 0], rtol=1e-12)


def test_falling_cylinders_single_matches_falling_cylinder():
    """The union-window multi-body scene with B=1 reproduces the
    established single-body falling_cylinder trajectory (the extra
    union-window rows only add exact zeros to the forcing sums)."""
    from lbm_tpu.scenes.obstacles import falling_cylinder, falling_cylinders

    kw = dict(H=96, W=64, T=60, radius=6.0, rho_s=1.5, gravity=1e-4,
              record_every=20, dtype=jnp.float64)
    a = falling_cylinder(center=(30.0, 32.0), **kw)
    b = falling_cylinders(centers=((30.0, 32.0),), fused=False, **kw)
    np.testing.assert_allclose(b.trajectory[:, 0, :], a.trajectory,
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-12)


def test_falling_cylinders_fused_matches_jnp():
    """End-to-end DKT pair: the multi-body fused path (union-window
    kernel with in-kernel barriers and per-body momentum exchange)
    equals the jnp scene."""
    from lbm_tpu.scenes.obstacles import falling_cylinders

    kw = dict(H=96, W=256, T=9, centers=((24.0, 120.0), (45.0, 128.0)),
              radius=8.0, rho_s=1.4, gravity=1e-4, record_every=3,
              dtype=jnp.float64)
    ref = falling_cylinders(fused=False, **kw)
    got = falling_cylinders(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got.trajectory, ref.trajectory,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.centers),
                               np.asarray(ref.centers), atol=1e-12)


def test_moving_kernel_factories_reject_oversized_windows():
    """Windows whose VMEM footprint exceeds the ~12 MB budget return
    None (documented jnp-fallback contract) instead of producing a
    Mosaic compile failure downstream."""
    from lbm_tpu.kernels.moving_ibm_pallas import (
        make_moving_forcing_step, make_moving_rot_step)

    th = np.linspace(0.0, 2.0 * np.pi, 1885, endpoint=False)
    r = 300.0
    kw = dict(half=305, g_net=-1.0, m_eff=1.0, dtype=jnp.float32)
    assert make_moving_forcing_step(2048, 1024, r * np.cos(th),
                                    r * np.sin(th), **kw) is None
    assert make_moving_rot_step(2048, 1024, r * np.cos(th),
                                r * np.sin(th), i_eff=1.0, **kw) is None
    # and a normal-size body still builds
    assert make_moving_forcing_step(
        400, 256, 12 * np.cos(th[:80]), 12 * np.sin(th[:80]),
        half=17, g_net=-1.0, m_eff=1.0, dtype=jnp.float32) is not None


def test_falling_cylinders_fused_matches_jnp_barriers_active():
    """Fused-vs-jnp parity with the Glowinski barrier terms ACTIVE: the
    pair sits inside the 2r+zeta activation range and one body inside
    the wall activation band, so the in-kernel rep_x/rep_y algebra
    (pairwise + wall branches) contributes nonzero forces every step —
    unlike the DKT-geometry test above, where every barrier term is
    exactly zero."""
    from lbm_tpu.ops.moving_ibm import barrier_forces
    from lbm_tpu.scenes.obstacles import falling_cylinders

    H, W, r, zeta = 64, 256, 8.0, 12.0
    centers = ((30.0, 120.0), (46.0, 140.0))
    # guard the premise: pairwise AND wall barriers nonzero at t=0
    F0 = np.asarray(barrier_forces(jnp.asarray(centers, jnp.float64),
                                   r, H, W, zeta=zeta, eps=50.0))
    assert abs(F0[0, 1]) > 0.0          # pairwise (column component)
    w_only = np.asarray(barrier_forces(jnp.asarray(centers[1:],
                                                   jnp.float64),
                                       r, H, W, zeta=zeta, eps=50.0))
    assert w_only[0, 0] < 0.0           # high-row wall pushes body 2 back

    kw = dict(H=H, W=W, T=9, centers=centers, radius=r, rho_s=1.4,
              gravity=1e-4, zeta=zeta, record_every=3,
              dtype=jnp.float64)
    ref = falling_cylinders(fused=False, **kw)
    got = falling_cylinders(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got.trajectory, ref.trajectory,
                               rtol=1e-9, atol=1e-12)


def test_falling_cylinders_barrier_prevents_overlap():
    """Two bodies dropped nearly touching stay non-overlapping: the
    barrier keeps the gap >= 0 for the whole (short) run."""
    from lbm_tpu.scenes.obstacles import falling_cylinders

    r = 6.0
    res = falling_cylinders(H=128, W=64, T=120,
                            centers=((40.0, 28.0), (40.0, 28.0 + 2 * r + 1.0)),
                            radius=r, rho_s=1.5, gravity=1e-4,
                            record_every=10, dtype=jnp.float64)
    tr = res.trajectory                     # (12, 2, 6)
    gap = np.hypot(tr[:, 0, 0] - tr[:, 1, 0],
                   tr[:, 0, 1] - tr[:, 1, 1]) - 2 * r
    assert np.isfinite(np.asarray(res.f)).all()
    assert gap.min() > 0.0


def test_ellipse_markers_arc_uniform():
    """ellipse_markers spaces markers uniformly in arc length: nearest-
    neighbour spacing spread stays within a few percent (uniform
    PARAMETER spacing on a 2:1 ellipse varies ~2x)."""
    from lbm_tpu.ops.moving_ibm import ellipse_markers

    dx, dy = ellipse_markers(16.0, 8.0)
    on = (dx / 16.0) ** 2 + (dy / 8.0) ** 2
    np.testing.assert_allclose(on, 1.0, rtol=1e-6)
    seg = np.hypot(np.diff(dx, append=dx[:1]), np.diff(dy, append=dy[:1]))
    assert seg.max() / seg.min() < 1.05
    assert abs(seg.mean() - 1.0) < 0.15          # ~1-cell resolution


def test_cayley_rotate_orthogonal():
    from lbm_tpu.ops.moving_ibm import cayley_rotate

    c, s = jnp.float64(np.cos(0.3)), jnp.float64(np.sin(0.3))
    for w in (0.0, 1e-3, -0.2, 2.5):
        c2, s2 = cayley_rotate(c, s, jnp.float64(w))
        assert abs(float(c2 * c2 + s2 * s2) - 1.0) < 1e-14
        got = float(jnp.arctan2(s2, c2)) - 0.3
        assert abs(got - 2 * np.arctan(w / 2)) < 1e-12


def test_falling_ellipse_spin_down_and_symmetry():
    """Angular-momentum exchange sanity (f64 jnp): a broadside ellipse
    (theta0=0) falls without rotating (symmetry), while a tilted one
    picks up torque and lateral drift."""
    from lbm_tpu.scenes.obstacles import falling_ellipse

    # center col 47.5 = the box's true mirror axis (W even: walls at
    # -0.5 and 95.5); an integer column would be 0.5 cells off-axis and
    # physically pick up a small torque
    kw = dict(H=128, W=96, T=400, center=(40.0, 47.5), a=10.0, b=5.0,
              rho_s=1.5, gravity=2e-4, record_every=100,
              dtype=jnp.float64)
    sym = falling_ellipse(theta0=0.0, **kw)
    assert np.isfinite(np.asarray(sym.f)).all()
    assert abs(float(sym.omega_body)) < 1e-12          # no symmetry break
    assert abs(float(sym.velocity[1])) < 1e-12
    assert float(sym.velocity[0]) > 0.0                # falls
    tilt = falling_ellipse(theta0=0.4, **kw)
    tr = tilt.trajectory                               # (4, 10)
    assert abs(tr[-1, 9]) > 0.0                        # torque exchanged
    assert abs(float(tilt.omega_body)) > 1e-8          # body rotates
    assert abs(float(tilt.velocity[1])) > 1e-8         # glides laterally


def test_falling_ellipse_fused_matches_jnp():
    """The rotating-body fused kernel (orientation through SMEM, world
    offsets + torque closure + Cayley update in-kernel) equals the jnp
    scene end-to-end."""
    from lbm_tpu.scenes.obstacles import falling_ellipse

    kw = dict(H=64, W=256, T=9, center=(24.0, 128.0), a=9.0, b=4.5,
              theta0=0.5, rho_s=1.4, gravity=2e-4, record_every=3,
              dtype=jnp.float64)
    ref = falling_ellipse(fused=False, **kw)
    got = falling_ellipse(fused=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got.trajectory, ref.trajectory,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.orientation),
                               np.asarray(ref.orientation), atol=1e-12)
    np.testing.assert_allclose(float(got.omega_body),
                               float(ref.omega_body), atol=1e-13)


def test_falling_cylinder_gspmd_matches_single():
    """The GSPMD multi-chip moving-IBM path (mesh=...: f row-sharded
    P(None,'x',None), rigid-body state replicated, XLA inserting the
    window gathers/scatters) equals the single-device jnp path at 1e-12
    over a real falling segment on the 8-virtual-device mesh —
    VERDICT r2 item 10."""
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.obstacles import falling_cylinder

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(H=96, W=64, T=60, center=(30.0, 32.0), radius=6.0,
              rho_s=1.5, gravity=1e-4, record_every=20,
              dtype=jnp.float64, fused=False)
    ref = falling_cylinder(**kw)
    m = meshmod.make_mesh(shape=(8, 1))
    got = falling_cylinder(mesh=m, **kw)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.center),
                               np.asarray(ref.center), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.velocity),
                               np.asarray(ref.velocity), atol=1e-12)
    np.testing.assert_allclose(got.trajectory, ref.trajectory,
                               rtol=1e-9, atol=1e-12)
