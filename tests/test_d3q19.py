"""D3Q19 3-D extension (ops.d3q19, scenes.three_d — beyond the
strictly-2-D reference) at the same quality bar as the 2-D families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d3q19
from lbm_tpu.scenes.three_d import poiseuille_3d, taylor_green_3d


def test_lattice_invariants():
    """Weights sum to 1; velocity moments isotropic to cs^2 = 1/3;
    OPP3 is the negation involution."""
    assert abs(d3q19.W3.sum() - 1.0) < 1e-15
    c, w = d3q19.C3, d3q19.W3
    np.testing.assert_allclose((w * c).sum(axis=1), 0.0, atol=1e-15)
    second = np.einsum("k,ak,bk->ab", w, c, c)
    np.testing.assert_allclose(second, np.eye(3) / 3.0, atol=1e-15)
    np.testing.assert_array_equal(c[:, d3q19.OPP3], -c)


def test_collision_conserves_mass_momentum():
    rng = np.random.default_rng(7)
    base = d3q19.equilibrium(
        jnp.asarray(rng.uniform(-0.03, 0.03, (3, 6, 8, 10))),
        jnp.asarray(rng.uniform(0.9, 1.1, (6, 8, 10))))
    f = (base * (1.0 + jnp.asarray(
        rng.uniform(-0.05, 0.05, base.shape)))).astype(jnp.float64)
    rho = d3q19.calc_rho(f)
    u = d3q19.calc_u(f, rho)
    out = d3q19.bgk_collision(f, d3q19.equilibrium(u, rho), 1.6)
    np.testing.assert_allclose(np.asarray(out.sum(0)), np.asarray(rho),
                               rtol=0, atol=1e-13)
    c = jnp.asarray(d3q19.C3, jnp.float64)
    mom_in = np.asarray(jnp.einsum("ak,kxyz->axyz", c, f))
    mom_out = np.asarray(jnp.einsum("ak,kxyz->axyz", c, out))
    np.testing.assert_allclose(mom_out, mom_in, rtol=0, atol=1e-13)


def test_stream_is_permutation():
    """Periodic streaming conserves every population's total exactly
    and round-trips under opposite-direction double streaming."""
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(0.1, 1.0, (19, 4, 6, 8)))
    g = d3q19.stream(f)
    np.testing.assert_allclose(np.asarray(g.sum(axis=(1, 2, 3))),
                               np.asarray(f.sum(axis=(1, 2, 3))),
                               rtol=1e-15)
    # stream then stream the reversed-velocity copy: identity
    h = d3q19.stream(g[d3q19.OPP3])[d3q19.OPP3]
    np.testing.assert_array_equal(np.asarray(h), np.asarray(f))


def test_poiseuille_3d_magic_tau_gate():
    """The reference's hard Poiseuille gate, in 3-D: L2 <= 1e-10 at the
    magic tau = sqrt(3/16) + 1/2 (measured 1.4e-11)."""
    res = poiseuille_3d(X=24, Y=8, Z=8, T=20000, dtype=jnp.float64)
    assert res.l2 <= 1e-10, res.l2


def test_taylor_green_3d_decay():
    """The z-invariant TGV (exact 3-D Navier-Stokes solution): decay
    amplitude within 1% of exp(-2 nu k^2 t), field L2 within the
    weak-compressibility O(Ma^2) class."""
    import math

    N, tau, u0, T = 32, 0.8, 0.02, 400
    nu = (tau - 0.5) / 3.0
    k = 2.0 * np.pi / N
    res = taylor_green_3d(N=N, T=T, tau=tau, u0=u0, dtype=jnp.float64)
    amp = float(np.abs(np.asarray(res.u[0])).max())
    expected = u0 * math.exp(-2.0 * nu * k * k * T)
    # 1.7% measured at N=32 (the 2-D TGV test's 1% is at N=64; the
    # discretisation error scales with k^2 = (2 pi / N)^2)
    assert abs(amp - expected) / expected < 0.025
    assert res.l2 < 1e-2
    # z-invariance is preserved exactly by the dynamics
    uz_spread = float(np.abs(np.asarray(res.u[2])).max())
    assert uz_spread < 1e-12


def test_sharded_3d_equals_single_device():
    """GSPMD over a (4, 2) mesh on the (y, z) axes reproduces the
    single-device run at 1e-13 (both scenes)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    a = taylor_green_3d(N=32, T=60, dtype=jnp.float64)
    b = taylor_green_3d(N=32, T=60, mesh_shape=(4, 2),
                        dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=0, atol=1e-13)
    p1 = poiseuille_3d(X=24, Y=8, Z=8, T=400, dtype=jnp.float64)
    p2 = poiseuille_3d(X=24, Y=8, Z=8, T=400, mesh_shape=(4, 2),
                       dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(p2.f), np.asarray(p1.f),
                               rtol=0, atol=1e-13)


def test_fused_3d_matches_jnp():
    """The depth-as-planes fused kernel equals the jnp oracle at
    machine precision in f64: the walled+forced (channel) variant
    through the scene API, and the fully periodic variant at the
    kernel level (a cubic TGV needs N % 128 == 0 — too large for CPU
    interpret), both incl. substeps."""
    from lbm_tpu.kernels.d3q19_pallas import make_d3q19_fused_step
    from lbm_tpu.scenes.three_d import _pack, _unpack

    kp = dict(X=8, Y=32, Z=128, T=12, dtype=jnp.float64)
    p1 = poiseuille_3d(fused=False, **kp)
    p2 = poiseuille_3d(fused=True, interpret=True, substeps=3, **kp)
    np.testing.assert_allclose(np.asarray(p2.f), np.asarray(p1.f),
                               rtol=0, atol=1e-13)

    X, Y, Z = 8, 32, 128
    omega = 1.0 / 0.8
    rng = np.random.default_rng(5)
    f = d3q19.equilibrium(
        jnp.asarray(rng.uniform(-0.02, 0.02, (3, X, Y, Z))),
        jnp.asarray(rng.uniform(0.95, 1.05, (X, Y, Z))))

    def jstep(g):
        rho = d3q19.calc_rho(g)
        u = d3q19.calc_u(g, rho)
        return d3q19.stream(d3q19.bgk_collision(
            g, d3q19.equilibrium(u, rho), omega))

    k1 = make_d3q19_fused_step(X, Y, Z, omega=omega,
                               dtype=jnp.float64, interpret=True)
    k3 = make_d3q19_fused_step(X, Y, Z, omega=omega, substeps=3,
                               dtype=jnp.float64, interpret=True)
    S = _pack(f, X, Y, Z)
    ref = f
    for _ in range(3):
        ref = jstep(ref)
        S = k1(S)
    np.testing.assert_allclose(np.asarray(_unpack(S, X, Y, Z)),
                               np.asarray(ref), rtol=0, atol=1e-13)
    S3 = k3(_pack(f, X, Y, Z))
    np.testing.assert_allclose(np.asarray(S3), np.asarray(S), rtol=0,
                               atol=1e-13)


def test_lid_cavity_3d_quasi2d_invariance_and_physics():
    """x-periodic 3-D lid cavity: the flow stays exactly x-invariant
    (every depth slice identical — the wall machinery introduces no
    x-dependence), a primary vortex forms (forward flow under the lid,
    return flow below), and mass is conserved."""
    from lbm_tpu.scenes.three_d import lid_cavity_3d

    r = lid_cavity_3d(X=4, Y=48, Z=48, T=3000, Re=100.0, u_lid=0.05,
                      x_walls=False, fused=False, dtype=jnp.float64)
    f = np.asarray(r.f)
    assert np.isfinite(f).all()
    # exact x-invariance of every population
    assert np.abs(f - f[:, :1]).max() < 1e-13
    assert abs(float(np.asarray(r.rho).sum()) / (4 * 48 * 48) - 1.0) < 1e-12
    uz = np.asarray(r.u[2, 0])           # (Y, Z) slice
    assert uz[-2].mean() > 0.01          # dragged along under the lid
    assert uz[12].mean() < -1e-3         # return flow in the lower half
    assert np.abs(np.asarray(r.u)).max() < 1.2 * 0.05


def test_lid_cavity_3d_x_mirror_symmetry():
    """With end walls on, the cavity dynamics are mirror-symmetric in x
    (symmetric geometry + BCs): f(x) equals its x-reflection with the
    x-reversed populations swapped, at machine precision."""
    from lbm_tpu.ops.d3q19 import C3
    from lbm_tpu.scenes.three_d import lid_cavity_3d

    r = lid_cavity_3d(X=8, Y=24, Z=24, T=1500, Re=50.0, u_lid=0.05,
                      x_walls=True, fused=False, dtype=jnp.float64)
    f = np.asarray(r.f)
    # mirror map: k -> k' with c_k' = (-cx, cy, cz)
    mirror = []
    for k in range(19):
        tgt = (-C3[0, k], C3[1, k], C3[2, k])
        mirror.append(next(j for j in range(19)
                           if tuple(C3[:, j]) == tgt))
    assert np.abs(f - f[mirror, ::-1]).max() < 1e-12


def test_lid_cavity_3d_fused_matches_jnp():
    """The fused kernel's y/z-wall + moving-lid masks equal the jnp
    oracle at 1e-13 in f64 (interpret), substeps 1 and 2, with and
    without x end walls."""
    from lbm_tpu.kernels.d3q19_pallas import make_d3q19_fused_step
    from lbm_tpu.ops import d3q19
    from lbm_tpu.scenes.three_d import _pack, _unpack, lid_cavity_3d

    X, Y, Z = 2, 32, 128
    for x_walls in (False, True):
        want = lid_cavity_3d(X=X, Y=Y, Z=Z, T=4, Re=100.0, u_lid=0.05,
                             x_walls=x_walls, fused=False,
                             dtype=jnp.float64).f
        for substeps in (1, 2):
            nu = 0.05 * Z / 100.0
            step = make_d3q19_fused_step(
                X, Y, Z, omega=1.0 / (3.0 * nu + 0.5), x_walls=x_walls,
                y_walls=True, z_walls=True, lid_u=0.05,
                substeps=substeps, dtype=jnp.float64, block_rows=8,
                interpret=True)
            S = _pack(d3q19.equilibrium(
                jnp.zeros((3, X, Y, Z), jnp.float64),
                jnp.ones((X, Y, Z), jnp.float64)), X, Y, Z)
            for _ in range(4 // substeps):
                S = step(S)
            got = _unpack(S, X, Y, Z)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0, atol=1e-13)


def test_sharded_d3q19_lid_cavity_matches_single_chip():
    """The depth-as-planes body rides the generic row-sharded wrapper
    (sharding the y axis over 8 ranks, ppermute halos): equal to the
    single-chip fused kernel at 1e-13 in f64, full cavity BC stack
    (x end walls + y walls + moving lid + z walls), substeps=2."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lbm_tpu.kernels.d3q19_pallas import (
        make_d3q19_body, make_d3q19_fused_step)
    from lbm_tpu.kernels.sharded_pallas import make_sharded_body_step
    from lbm_tpu.ops import d3q19
    from lbm_tpu.parallel import mesh as meshmod
    from lbm_tpu.scenes.three_d import _pack

    X, Y, Z = 2, 192, 128
    kw = dict(omega=1.0 / 0.8, x_walls=True, y_walls=True, z_walls=True,
              lid_u=0.05, substeps=2)
    single = make_d3q19_fused_step(X, Y, Z, dtype=jnp.float64,
                                   block_rows=8, interpret=True, **kw)
    m = meshmod.make_mesh(shape=(8, 1))
    run = make_d3q19_body(X, Y, Z, **kw)
    sharded = make_sharded_body_step(m, 19 * X, Y, Z, run,
                                     dtype=jnp.float64, block_rows=8,
                                     interpret=True)
    S0 = _pack(d3q19.equilibrium(
        jnp.zeros((3, X, Y, Z), jnp.float64),
        jnp.ones((X, Y, Z), jnp.float64)
        + 0.01 * jnp.cos(jnp.arange(Y, dtype=jnp.float64)
                         * (2 * np.pi / Y))[None, :, None]), X, Y, Z)
    want = single(single(S0))
    got = sharded(meshmod.shard_state(m, S0))
    got = sharded(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)


def test_lanes_3d_matches_jnp():
    """The depth-in-lanes fused kernel (lane = z*X + x) equals the jnp
    oracle at 1e-13 in f64 (interpret): periodic + x-walls channel
    (force_z), incl. substeps — the seam-roll x streaming and the
    static x-wall masks against ops.d3q19's explicit 4-D streaming."""
    from lbm_tpu.kernels.d3q19_lanes_pallas import (
        make_d3q19_lanes_step, pack_lanes, unpack_lanes)

    X, Y, Z = 4, 32, 32                  # X*Z = 128 lanes
    omega = 1.0 / 0.8
    rng = np.random.default_rng(11)
    f0 = d3q19.equilibrium(
        jnp.asarray(rng.uniform(-0.02, 0.02, (3, X, Y, Z))),
        jnp.asarray(rng.uniform(0.95, 1.05, (X, Y, Z))))

    def jstep(g, gz=0.0, x_walls=False):
        rho = d3q19.calc_rho(g)
        u = d3q19.calc_u(g, rho)
        fvec = jnp.asarray([0.0, 0.0, gz], jnp.float64)
        if gz:
            u = u + 0.5 * fvec[:, None, None, None] / rho[None]
        f_coll = d3q19.bgk_collision(g, d3q19.equilibrium(u, rho), omega)
        if gz:
            f_coll = f_coll + d3q19.guo_source(
                u, fvec[:, None, None, None] * jnp.ones_like(rho)[None],
                omega)
        f_new = d3q19.stream(f_coll)
        if x_walls:
            f_new = d3q19.bounce_back_x(f_new, f_coll, "lo")
            f_new = d3q19.bounce_back_x(f_new, f_coll, "hi")
        return f_new

    for x_walls, gz in ((False, 0.0), (True, 1e-5)):
        k1 = make_d3q19_lanes_step(X, Y, Z, omega=omega, force_z=gz,
                                   x_walls=x_walls, dtype=jnp.float64,
                                   interpret=True)
        k3 = make_d3q19_lanes_step(X, Y, Z, omega=omega, force_z=gz,
                                   x_walls=x_walls, substeps=3,
                                   dtype=jnp.float64, interpret=True)
        S = pack_lanes(f0, X, Y, Z)
        ref = f0
        for _ in range(3):
            ref = jstep(ref, gz, x_walls)
            S = k1(S)
        np.testing.assert_allclose(
            np.asarray(unpack_lanes(S, X, Y, Z)), np.asarray(ref),
            rtol=0, atol=1e-13)
        S3 = k3(pack_lanes(f0, X, Y, Z))
        np.testing.assert_allclose(np.asarray(S3), np.asarray(S),
                                   rtol=0, atol=1e-13)


def test_lanes_matches_planes_kernel_cavity():
    """Lanes kernel == planes kernel at 1e-15 in f64 (interpret) on the
    full 3-D lid-cavity BC stack (x end walls + y walls + moving lid +
    z walls), substeps 1 and 2, with and without x end walls — the two
    layouts are alternative schedules of the same update."""
    from lbm_tpu.kernels.d3q19_lanes_pallas import (
        make_d3q19_lanes_step, pack_lanes, unpack_lanes)
    from lbm_tpu.kernels.d3q19_pallas import make_d3q19_fused_step
    from lbm_tpu.scenes.three_d import _pack, _unpack

    X, Y, Z = 4, 32, 128
    kw = dict(omega=1.0 / 0.7, y_walls=True, z_walls=True, lid_u=0.05)
    f0 = d3q19.equilibrium(
        jnp.zeros((3, X, Y, Z), jnp.float64),
        jnp.ones((X, Y, Z), jnp.float64)
        + 0.01 * jnp.cos(jnp.arange(Z, dtype=jnp.float64)
                         * (2 * np.pi / Z))[None, None, :])
    for x_walls in (False, True):
        for substeps in (1, 2):
            kp = make_d3q19_fused_step(
                X, Y, Z, x_walls=x_walls, substeps=substeps,
                dtype=jnp.float64, block_rows=8, interpret=True, **kw)
            kl = make_d3q19_lanes_step(
                X, Y, Z, x_walls=x_walls, substeps=substeps,
                dtype=jnp.float64, block_rows=8, interpret=True, **kw)
            Sp = _pack(f0, X, Y, Z)
            Sl = pack_lanes(f0, X, Y, Z)
            for _ in range(4 // substeps):
                Sp = kp(Sp)
                Sl = kl(Sl)
            np.testing.assert_allclose(
                np.asarray(unpack_lanes(Sl, X, Y, Z)),
                np.asarray(_unpack(Sp, X, Y, Z)), rtol=0, atol=1e-15)
