"""Multiphase scenes: static droplets and Rayleigh-Taylor, in the MRT-CG,
MRT-CSF and RK-CG families.

Each reproduces one reference driver (grid sizes, initial fields, BCs and
constants cited per function).  All use fully vectorised initialisation in
numpy (the reference loops over cells on the host).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary import bc
from ..core.params import ColourParams, DomainParams, GeneralParams, load_toml
from ..models import mrt_cg
from ..utils import observe
from ..models.mrt_cg import MRTCGModel, TwoPhaseState
from ..models.rk_cg import RKDropletColour, RKDropletModel, RKMixtureModel
from ..utils.xmath import default_float, launch_cap, resolve_fused


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def init_rho_droplet(R: int, C: int, rho_0: float, inside: bool,
                     radius: float = 25.0, sharpness: float = 1.0) -> np.ndarray:
    """Sigmoid droplet of given radius centred at (R/2, R/2).
    cites /root/reference/test/mrtcg_static_droplet.cpp:182-203
    (sharpness=1) and test/rk_static_droplet_test.cpp:363-396 (sharpness=2,
    centre (L/2, L/2))."""
    center = R / 2.0
    r = np.arange(R)[:, None]
    c = np.arange(C)[None, :]
    s = np.sqrt((r - center) ** 2 + (c - center) ** 2)
    ans = 1.0 - _sigmoid(sharpness * (s - radius)) if inside else _sigmoid(
        sharpness * (s - radius))
    return rho_0 * ans


def init_rho_cosine(R: int, C: int, rho_0: float, fill_below: bool,
                    amplitude_sign: float = -1.0) -> np.ndarray:
    """Heavy/light layers separated by a cosine-perturbed interface at
    s(c) = R/2 + amplitude_sign*0.1*C*cos(2 pi c / C); fill_below selects
    rows r < s.  cites /root/reference/test/mrtcg_rayleigh_taylor.cpp:182-210
    (sign -1, red fills r<s) and test/mrt_rayleigh_taylor.cpp:184-212
    (sign +1)."""
    r = np.arange(R)[:, None] * np.ones((1, C))
    c = np.ones((R, 1)) * np.arange(C)[None, :]
    s = R / 2.0 + amplitude_sign * 0.1 * C * np.cos(2.0 * 3.141592 * c / C)
    mask = (r < s) if fill_below else (r >= s)
    return rho_0 * mask.astype(np.float64)


def init_rho_modes(R: int, C: int, rho_0: float, fill_below: bool,
                   modes=((1, -0.1), (3, 0.03), (5, 0.015))) -> np.ndarray:
    """Multi-mode RT interface: s(c) = R/2 + C * sum_m a_m cos(2 pi m c / C).

    The reference declares a driver for this study
    (`mrtcg_multiple_mode_rayleigh_taylor`, CMakeLists.txt:149-152) but its
    source file is absent from the snapshot (SURVEY.md section 4); this is
    the natural multi-mode generalisation of init_rho_cosine.  ``modes`` is
    a sequence of (mode_number, amplitude_fraction_of_C) pairs."""
    r = np.arange(R)[:, None] * np.ones((1, C))
    c = np.ones((R, 1)) * np.arange(C)[None, :]
    s = R / 2.0 + C * sum(
        a * np.cos(2.0 * 3.141592 * m * c / C) for m, a in modes)
    mask = (r < s) if fill_below else (r >= s)
    return rho_0 * mask.astype(np.float64)


def mrtcg_boundary(f_adve, f_coll):
    """The multiphase drivers' wall rule: periodic left-right (no diagonal
    offset, rows 1..-2) then bounce-back top/bottom.
    cites /root/reference/test/mrtcg_rayleigh_taylor.cpp:495-533"""
    f_adve = bc.periodic_edge(f_adve, f_coll, "col0", lane=slice(1, -1),
                              diagonal_shift=False)
    f_adve = bc.periodic_edge(f_adve, f_coll, "colN", lane=slice(1, -1),
                              diagonal_shift=False)
    f_adve = bc.bounce_back(f_adve, f_coll, "rowN")
    f_adve = bc.bounce_back(f_adve, f_coll, "row0")
    return f_adve


DEFAULT_RED = ColourParams(rho_0=3.0, alpha=0.7, A=0.5, nu=0.04, beta=0.7)
DEFAULT_BLUE = ColourParams(rho_0=1.0, alpha=0.1, A=0.5, nu=0.04, beta=-0.7)


@dataclass
class MultiphaseResult:
    state: object
    steps: int
    snapshots: dict


def _run_chunks(model, state, T: int, snapshot_every: int | None,
                record: dict[str, callable] | None = None,
                cells: int | None = None, writer=None):
    """Host loop over jitted chunks with optional snapshot recording.
    Progress (step count + MLUPS) is logged every ~10 s via StepMeter —
    the structured replacement for the reference's ``cout << t << "\\t\\r"``
    loops (e.g. mrtcg_rayleigh_taylor.cpp:229).

    With ``writer`` (an io.snapshots.SnapshotWriter) frames stream to disk
    incrementally — constant host memory, vs the reference's O(T)
    accumulate-then-torch::save (mrtcg_rayleigh_taylor.cpp:480-487) — and
    the returned snapshots dict is empty."""
    step = jax.jit(model.step)
    chunk_n = snapshot_every or max(1, min(T, 1000))
    chunk = jax.jit(
        lambda s, n: jax.lax.fori_loop(0, n, lambda _, x: model.step(x), s),
        static_argnums=1,
    )
    meter = observe.StepMeter(cells or _state_cells(state), total_steps=T)
    snaps: dict[str, list] = {k: [] for k in (record or {})}
    done = 0
    while done < T:
        if record and snapshot_every and done % snapshot_every == 0:
            for k, fn in record.items():
                if writer is not None:
                    writer.append(k, np.asarray(fn(state)))
                else:
                    snaps[k].append(np.asarray(fn(state)))
        n = min(chunk_n, T - done)
        state = chunk(state, n)
        done += n
        meter.update(n)
        observe.check_finite(state, done)
    return state, {k: np.stack(v) if v else None for k, v in snaps.items()}


def _capped_chunk(chunk, cap: int):
    """Wrap a jitted ``(state, n_static) -> state`` chunk so one host call
    may exceed the relay's per-launch trip cap (utils.xmath.launch_cap):
    the requested n runs in <=cap pieces, preserving callers' snapshot
    cadence arithmetic exactly."""
    def run(s, n):
        while n > cap:
            s = chunk(s, cap)
            n -= cap
        return chunk(s, n) if n else s
    return run


def _state_cells(state) -> int:
    """Grid size of a model state (rows*cols of the first array leaf)."""
    leaf = jax.tree.leaves(state)[0]
    return int(leaf.shape[-1] * leaf.shape[-2])


def mrtcg_static_droplet(R: int = 100, C: int = 100, T: int = 100,
                         red: ColourParams = DEFAULT_RED,
                         blue: ColourParams = DEFAULT_BLUE,
                         sigma: float = 0.1, radius: float = 25.0,
                         snapshot_every: int | None = None,
                         fused: bool | None = None,
                         dtype=None) -> MultiphaseResult:
    """MRT-CG static droplet (Laplace-law scene).
    Workload/constants cite /root/reference/test/mrtcg_static_droplet.cpp:
    L=100, T=100 (:463,500 via TOML), sigma=0.1 (:439),
    Fg=(0,-6.25e-6) with the force source disabled (:452,513).
    ``fused=True`` uses the one-launch Pallas kernel (f32, C%128==0).

    Calibration (measured, 40k steps fused on TPU, R=128, radius=25):
    the converged pressure jump is dp = 2.0 * sigma/radius — the
    formulation adds the colour-blind perturbation omega2 once per colour
    into the recoloured total (mrtcg_static_droplet.cpp:505), so the
    effective interfacial tension is 2x the nominal ``sigma``.  Mass drift
    3.8e-7 over 40k steps; spurious currents |u|max ~ 1.6e-3."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=R, cols=C)
    model = MRTCGModel(
        red=red, blue=blue, sigma=sigma, gravity=(0.0, -6.25e-6),
        apply_gravity_source=False, boundary=mrtcg_boundary,
    )
    r0 = init_rho_droplet(R, C, red.rho_0, inside=True, radius=radius)
    b0 = init_rho_droplet(R, C, blue.rho_0, inside=False, radius=radius)
    state = model.init_state(r0, b0, dtype=dtype, u_init_gravity_shift=True)

    if fused:
        # reduced-state production path: T-1 steps on the 10-plane state
        # (10/18ths the HBM traffic), one split step to materialise the
        # exact per-colour populations at the end
        from ..kernels.mrtcg_pallas import (
            make_mrtcg_reduced_step, make_mrtcg_split_step,
            reduce_mrtcg_state)
        from ..models.mrt_cg import ColourFields

        kw = dict(sigma=sigma, gravity=(0.0, -6.25e-6),
                  apply_gravity_source=False, dtype=jnp.float32)
        step = make_mrtcg_reduced_step(R, C, red, blue, **kw)
        split = make_mrtcg_split_step(R, C, red, blue, **kw)
        F = jnp.stack([state.red.f, state.blue.f]).astype(jnp.float32)
        G = reduce_mrtcg_state(F)
        chunk = _capped_chunk(jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1), launch_cap(R * C))
        done = 0
        snaps = {"rho": [], "psi": []}
        meter = observe.StepMeter(R * C, total_steps=T)
        while done < T:
            if snapshot_every and done % snapshot_every == 0:
                rho_f = np.asarray(G[:9].sum(0))
                r_rho = np.asarray(G[9])
                snaps["rho"].append(rho_f)
                snaps["psi"].append(np.asarray(mrt_cg.phase_field(
                    r_rho, red.rho_0, rho_f - r_rho, blue.rho_0)))
            if done == T - 1:  # final step materialises the colours
                F = split(G)
                done += 1
                meter.update(1)
                break
            n = min(snapshot_every or 5000, T - 1 - done)
            G = chunk(G, n)
            done += n
            meter.update(n)
        r_rho = F[0].sum(0)
        b_rho = F[1].sum(0)
        rho = r_rho + b_rho
        from ..ops import d2q9 as _d2q9

        fgv = jnp.asarray([0.0, -6.25e-6], F.dtype)
        u = _d2q9.calc_u(F[0] + F[1], rho) + 0.5 * fgv[:, None, None] / rho
        state = mrt_cg.TwoPhaseState(
            ColourFields(F[0], r_rho), ColourFields(F[1], b_rho), u)
        return MultiphaseResult(
            state=state, steps=T,
            snapshots={k: np.stack(v) if v else None for k, v in snaps.items()})

    record = {
        "rho": lambda s: s.red.rho + s.blue.rho,
        "psi": lambda s: mrt_cg.phase_field(s.red.rho, red.rho_0,
                                            s.blue.rho, blue.rho_0),
    }
    state, snaps = _run_chunks(model, state, T, snapshot_every, record)
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


def mrtcg_rayleigh_taylor(config_path: str | None = None,
                          R: int | None = None, C: int | None = None,
                          T: int | None = None,
                          red: ColourParams | None = None,
                          blue: ColourParams | None = None,
                          sigma: float | None = None,
                          gravity_magnitude: float | None = None,
                          snapshot_every: int | None = None,
                          fused: bool | None = None,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 10000,
                          modes=None,
                          snapshot_prefix: str | None = None,
                          dtype=None) -> MultiphaseResult:
    """MRT-CG Rayleigh-Taylor.  Defaults follow the shipped TOML
    (/root/reference/mrtcg-rayleigh-taylor-gamma3.toml:4-22) with a
    [general] table as required by mrtcg_rayleigh_taylor.cpp:360-362.
    Heavy (red) fluid on top (init_rho_cosine sign -1, fill r<s).
    Explicit keyword arguments take precedence over the config file.
    ``modes`` (sequence of (mode_number, amplitude) pairs) switches the
    interface to the multi-mode perturbation of init_rho_modes — the study
    the reference names but ships no source for (CMakeLists.txt:149-152).
    ``snapshot_prefix`` streams snapshot frames to {prefix}-{name}.npy
    incrementally (io.snapshots.SnapshotWriter; the native C++ writer
    thread when built) instead of accumulating them in host RAM — the
    production mode for the reference's 2000-snapshot 100k-step runs."""
    dtype = default_float(dtype)
    if config_path:
        tbl = load_toml(config_path)
        dom = DomainParams.from_toml(tbl)
        R = R if R is not None else dom.R
        C = C if C is not None else dom.C
        T = T if T is not None else dom.T
        red = red or ColourParams.from_toml(tbl, "red")
        blue = blue or ColourParams.from_toml(tbl, "blue")
        if "general" in tbl:
            gen = GeneralParams.from_toml(tbl)
            sigma = sigma if sigma is not None else gen.sigma
            if gravity_magnitude is None:
                gravity_magnitude = gen.gravity_magnitude
        snapshot_every = snapshot_every or dom.period_snapshots
    R = R if R is not None else 256
    C = C if C is not None else 128
    T = T if T is not None else 100000
    red = red or DEFAULT_RED
    blue = blue or DEFAULT_BLUE
    sigma = sigma if sigma is not None else 1e-4
    gravity_magnitude = gravity_magnitude if gravity_magnitude is not None else 6.25e-7
    fused = resolve_fused(fused, dtype, rows=R, cols=C)

    model = MRTCGModel(
        red=red, blue=blue, sigma=sigma,
        gravity=(gravity_magnitude, 0.0),
        apply_gravity_source=True, boundary=mrtcg_boundary,
    )
    if modes is not None:
        r0 = init_rho_modes(R, C, red.rho_0, fill_below=True, modes=modes)
        b0 = init_rho_modes(R, C, blue.rho_0, fill_below=False, modes=modes)
    else:
        r0 = init_rho_cosine(R, C, red.rho_0, fill_below=True,
                             amplitude_sign=-1.0)
        b0 = init_rho_cosine(R, C, blue.rho_0, fill_below=False,
                             amplitude_sign=-1.0)
    state = model.init_state(r0, b0, dtype=dtype)

    writer = None
    if snapshot_prefix:
        from ..io.snapshots import SnapshotWriter

        writer = SnapshotWriter(snapshot_prefix)

    if fused:
        # fully fused two-phase Pallas step (f32; 630x faster than the jnp
        # path on the axon v5e at 256x128), on the REDUCED 10-plane state
        # (kernels.mrtcg_pallas: 10/18ths the HBM traffic, +38% at
        # 1024x512); the final step materialises the per-colour
        # populations exactly via the split kernel
        from ..kernels.mrtcg_pallas import (
            make_mrtcg_reduced_step, make_mrtcg_split_step,
            reduce_mrtcg_state)
        from ..models.mrt_cg import ColourFields

        kw = dict(sigma=sigma, gravity=(gravity_magnitude, 0.0),
                  dtype=jnp.float32)
        step = make_mrtcg_reduced_step(R, C, red, blue, **kw)
        split = make_mrtcg_split_step(R, C, red, blue, **kw)
        F = jnp.stack([state.red.f, state.blue.f]).astype(jnp.float32)
        G = reduce_mrtcg_state(F)
        chunk = _capped_chunk(jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1), launch_cap(R * C))
        snaps = {"psi": [], "ux": []}
        done = 0
        meter = observe.StepMeter(R * C, total_steps=T)
        ckpt = None
        last_ckpt = 0
        if checkpoint_dir:
            from ..io.checkpoint import Checkpointer

            ckpt = Checkpointer(checkpoint_dir, every=checkpoint_every)
            restored, at_step = ckpt.restore_latest(G)
            if restored is not None:
                restored = jnp.asarray(restored)
                if restored.shape == (2, 9, R, C):
                    # checkpoint from a pre-reduced-state run
                    restored = reduce_mrtcg_state(restored)
                G = restored
                done = last_ckpt = int(at_step)
                if writer is not None:
                    # a fresh SnapshotWriter would overwrite the previous
                    # run's stream; move it aside so no frames are lost
                    import glob as _glob
                    import os as _os

                    for old in _glob.glob(f"{snapshot_prefix}-*.npy") + \
                            _glob.glob(f"{snapshot_prefix}-meta.json"):
                        base = _os.path.basename(old)
                        _os.replace(old, _os.path.join(
                            _os.path.dirname(old) or ".",
                            f"upto{done}-{base}"))
                    observe.logger.info(
                        f"resumed at step {done}; previous snapshot stream "
                        f"preserved as upto{done}-*")
                meter.steps = meter.start = done  # absolute progress lines
        while done < T:
            if ckpt is not None and done - last_ckpt >= checkpoint_every:
                ckpt.force_save(done, np.asarray(G))
                last_ckpt = done
            if snapshot_every and done % snapshot_every == 0:
                mom = np.asarray(G[:9])
                r_rho = np.asarray(G[9])
                rho_fr = mom.sum(0)
                psi_fr = np.asarray(mrt_cg.phase_field(
                    r_rho, red.rho_0, rho_fr - r_rho, blue.rho_0))
                ux_fr = (mom[1] - mom[3] + mom[5] - mom[6] - mom[7]
                         + mom[8]) / rho_fr
                if writer is not None:
                    writer.append("psi", psi_fr)
                    writer.append("ux", ux_fr)
                else:
                    snaps["psi"].append(psi_fr)
                    snaps["ux"].append(ux_fr)
            if done == T - 1:  # final step materialises the colours
                F = split(G)
                done += 1
                meter.update(1)
                break
            n = min(snapshot_every or 1000, T - 1 - done)
            G = chunk(G, n)
            done += n
            meter.update(n)
        r_rho = F[0].sum(0)
        b_rho = F[1].sum(0)
        rho = r_rho + b_rho
        from ..ops import d2q9 as _d2q9

        fgv = jnp.asarray([gravity_magnitude, 0.0], F.dtype)
        u = _d2q9.calc_u(F[0] + F[1], rho) + 0.5 * fgv[:, None, None] / rho
        state = mrt_cg.TwoPhaseState(
            ColourFields(F[0], r_rho), ColourFields(F[1], b_rho), u)
        if writer is not None:
            writer.close()
        return MultiphaseResult(
            state=state, steps=T,
            snapshots={k: np.stack(v) if v else None for k, v in snaps.items()})

    record = {
        "psi": lambda s: mrt_cg.phase_field(s.red.rho, red.rho_0,
                                            s.blue.rho, blue.rho_0),
        "ux": lambda s: s.u[0],
    }
    state, snaps = _run_chunks(model, state, T, snapshot_every, record,
                               writer=writer)
    if writer is not None:
        writer.close()
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


def mrtcg_multimode_rayleigh_taylor(
        modes=((1, -0.1), (3, 0.03), (5, 0.015)), **kwargs):
    """Multi-mode MRT-CG Rayleigh-Taylor — the reference's declared-but-
    unshipped `mrtcg_multiple_mode_rayleigh_taylor` study
    (CMakeLists.txt:149-152): mrtcg_rayleigh_taylor with a superposition of
    interface perturbation modes.

    Note the capillary cutoff: with the default sigma=1e-4 / g=6.25e-7 only
    wavelengths above ~80 cells are RT-unstable, so on C=128 the extra modes
    correctly *decay* (measured: mode-3 amp 244->39 over 20k steps).  For
    all-mode growth use e.g. sigma=1e-5, gravity_magnitude=5e-6 (measured:
    interface std 9.6->24.9, mode-1 amp 821->2157 over 20k steps)."""
    return mrtcg_rayleigh_taylor(modes=modes, **kwargs)


def mrt_csf_rayleigh_taylor(R: int = 256, C: int = 128, T: int = 10000,
                            red: ColourParams = DEFAULT_RED,
                            blue: ColourParams = DEFAULT_BLUE,
                            sigma: float = 1e-4,
                            gravity_magnitude: float = 6.25e-7,
                            snapshot_every: int | None = None,
                            fused: bool | None = None,
                            dtype=None) -> MultiphaseResult:
    """CSF-curvature variant of the MRT colour-gradient RT.
    cites /root/reference/test/mrt_rayleigh_taylor.cpp:392-545 (interface
    sign +1, initial u = 0.5 Fg/red.rho_0, u shift includes the surface
    force).  ``fused`` (auto on TPU) runs the one-launch CSF kernel with
    the surface-force carry (kernels.mrtcg_pallas.make_csf_fused_step).
    Stability envelope (measured, fused f32, 256x128): finite through
    50k steps with 0.4% mass drift and a developed interface."""
    dtype = default_float(dtype)
    fused = resolve_fused(fused, dtype, rows=R, cols=C)

    if fused:
        # reduced-state production path (12 planes: 9 mixture + red rho +
        # fst carry vs the 20-plane full kernel); the final step
        # materialises the exact per-colour populations via the split
        # kernel (kernels.mrtcg_pallas.make_mrtcg_reduced_step)
        from ..kernels.mrtcg_pallas import (
            make_mrtcg_reduced_step, make_mrtcg_split_step,
            reduce_mrtcg_state)
        from ..models.mrt_cg import ColourFields

        kw = dict(sigma=sigma, gravity=(gravity_magnitude, 0.0),
                  surface_tension="csf", dtype=jnp.float32)
        step = make_mrtcg_reduced_step(R, C, red, blue, **kw)
        split = make_mrtcg_split_step(R, C, red, blue, **kw)
        r0 = init_rho_cosine(R, C, red.rho_0, True, 1.0)
        b0 = init_rho_cosine(R, C, blue.rho_0, False, 1.0)
        m = MRTCGModel(red=red, blue=blue, sigma=sigma,
                       gravity=(gravity_magnitude, 0.0),
                       boundary=mrtcg_boundary, surface_tension="csf")
        st = m.init_state(r0, b0, dtype=jnp.float32)
        # seed the fst carry so the kernel's derived first-step velocity
        # u = calc_u + 0.5 (Fg + fst)/rho equals the reference's scalar
        # initial shift 0.5 Fg/red.rho_0 (mrt_rayleigh_taylor.cpp:464):
        # fst0 = Fg (rho/red.rho_0 - 1)
        rho0_mix = (st.red.rho + st.blue.rho)[None]
        fg32 = jnp.asarray([gravity_magnitude, 0.0], jnp.float32)
        fst0 = fg32[:, None, None] * (rho0_mix / red.rho_0 - 1.0)
        S = jnp.concatenate([st.red.f, st.blue.f, fst0], axis=0)
        G = reduce_mrtcg_state(S, surface_tension="csf")
        chunk = _capped_chunk(jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1), launch_cap(R * C))
        snaps = None
        if snapshot_every:
            from ..models.mrt_cg import phase_field

            frames = []
            done = 0
            while done < T:
                n = min(snapshot_every, T - done)
                if done + n == T:  # final chunk ends in the split step
                    if n > 1:
                        G = chunk(G, n - 1)
                    S = split(G)
                    done = T
                    observe.check_finite(S, done)
                    frames.append(np.asarray(phase_field(
                        S[:9].sum(0), red.rho_0, S[9:18].sum(0),
                        blue.rho_0)))
                else:
                    G = chunk(G, n)
                    done += n
                    observe.check_finite(G, done)
                    r_rho = G[9]
                    rho = G[:9].sum(0)
                    frames.append(np.asarray(phase_field(
                        r_rho, red.rho_0, rho - r_rho, blue.rho_0)))
            snaps = {"psi": np.stack(frames)}
        else:
            done = 0
            while done < T:
                n = min(20000, T - done)
                if done + n == T:
                    if n > 1:
                        G = chunk(G, n - 1)
                    S = split(G)
                    done = T
                    observe.check_finite(S, done)
                else:
                    G = chunk(G, n)
                    done += n
                    observe.check_finite(G, done)
        from ..ops import d2q9 as _d2q9

        rf, bf, fst = S[:9], S[9:18], S[18:]
        r_rho = rf.sum(0)
        b_rho = bf.sum(0)
        rho = r_rho + b_rho
        fg = jnp.asarray([gravity_magnitude, 0.0], jnp.float32)
        u = _d2q9.calc_u(rf + bf, rho) \
            + 0.5 * (fg[:, None, None] + fst) / rho
        state = TwoPhaseState(ColourFields(rf, r_rho),
                              ColourFields(bf, b_rho), u)
        return MultiphaseResult(state=state, steps=T, snapshots=snaps)

    model = MRTCGModel(
        red=red, blue=blue, sigma=sigma,
        gravity=(gravity_magnitude, 0.0),
        apply_gravity_source=True, boundary=mrtcg_boundary,
        surface_tension="csf",
    )
    r0 = init_rho_cosine(R, C, red.rho_0, fill_below=True, amplitude_sign=1.0)
    b0 = init_rho_cosine(R, C, blue.rho_0, fill_below=False, amplitude_sign=1.0)
    # initial velocity = 0.5 Fg / red.rho_0 (scalar) BEFORE the equilibria
    # are built, mrt_rayleigh_taylor.cpp:464-467
    fg = np.asarray([gravity_magnitude, 0.0])
    state = model.init_state(r0, b0, dtype=dtype,
                             u0=(0.5 * fg / red.rho_0)[:, None, None])
    record = {
        "psi": lambda s: mrt_cg.phase_field(s.red.rho, red.rho_0,
                                            s.blue.rho, blue.rho_0),
    }
    state, snaps = _run_chunks(model, state, T, snapshot_every, record)
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


def rk_static_droplet(L: int = 101, T: int = 2000, radius: float = 25.0,
                      sigma: float = 5e-3,
                      snapshot_every: int | None = None,
                      exact_periodic: bool = False,
                      dtype=None) -> MultiphaseResult:
    """RK (Reis-Phillips) static droplet.
    Constants cite /root/reference/test/rk_static_droplet_test.cpp:504-506:
    red(rho_0=1.2, alpha=1/3, A=1e-4, nu=0.16, beta=+0.7),
    blue(rho_0=1.0, alpha=0.2, A=1e-4, nu=0.14, beta=-0.7), delta=0.98.

    The default edges reproduce the driver's full-edge wrap copy, which
    slowly exchanges colour mass (see RKDropletModel.exact_periodic);
    ``exact_periodic=True`` selects exactly mass-conserving periodic
    streaming instead."""
    dtype = default_float(dtype)
    red = RKDropletColour(rho_0=1.2, alpha=1.0 / 3.0, A=1e-4, nu=0.16, beta=0.7)
    blue = RKDropletColour(rho_0=1.0, alpha=0.2, A=1e-4, nu=0.14, beta=-0.7)
    model = RKDropletModel(red=red, blue=blue, sigma=sigma, delta=0.98,
                           exact_periodic=exact_periodic)
    r0 = init_rho_droplet(L, L, red.rho_0, inside=True, radius=radius, sharpness=2.0)
    b0 = init_rho_droplet(L, L, blue.rho_0, inside=False, radius=radius, sharpness=2.0)
    state = model.init_state(r0, b0, dtype=dtype)
    record = {"r_rho": lambda s: s.red.rho, "b_rho": lambda s: s.blue.rho}
    state, snaps = _run_chunks(model, state, T, snapshot_every, record)
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


def rk_rayleigh_taylor(L: int = 256, T: int = 100000, sigma: float = 0.1,
                       nu: float = 0.04,
                       gravity: tuple[float, float] = (-6.25e-6, 0.0),
                       snapshot_every: int | None = None,
                       fused: bool | None = None,
                       dtype=None) -> MultiphaseResult:
    """RK-CG Rayleigh-Taylor on a 4L x L grid.
    Constants cite /root/reference/test/rk_rayleigh_taylor_test.cpp:81-126:
    red(alpha=11/15, rho_0=3), blue(alpha=0.2, rho_0=1), beta=0.7,
    Fg=(-6.25e-6, 0).

    Deviation from the reference: its driver does not build (src/rk.cpp's
    `diff_op D` member is undefined, SURVEY.md section 2.1 #9) and its
    boundary block mixes up axes; this scene uses the physically consistent
    BCs of the MRT-CG RT driver (periodic cols + bounce-back rows) and the
    +/-beta recolouring split."""
    dtype = default_float(dtype)
    R, C = 4 * L, L
    fused = resolve_fused(fused, dtype, rows=R, cols=C)
    model = RKMixtureModel(
        r_alpha=11.0 / 15.0, r_rho_0=3.0, r_nu=nu,
        b_alpha=0.2, b_rho_0=1.0, b_nu=nu,
        sigma=sigma, beta=0.7, gravity=gravity,
        boundary=mrtcg_boundary,
    )
    r0 = init_rho_cosine(R, C, 3.0, fill_below=False, amplitude_sign=1.0)
    b0 = init_rho_cosine(R, C, 1.0, fill_below=True, amplitude_sign=1.0)
    state = model.init_state(r0, b0, dtype=dtype)

    if fused:
        # one-launch RK step (f32): 3996 MLUPS at 1024x256 on the v5e
        from ..kernels.rk_pallas import make_rk_fused_step
        from ..models.rk_cg import RKMixtureState

        step = make_rk_fused_step(
            R, C, r_alpha=11.0 / 15.0, b_alpha=0.2, r_nu=nu, b_nu=nu,
            sigma=sigma, beta=0.7, gravity=gravity, dtype=jnp.float32)
        S = jnp.concatenate(
            [state.f, state.r_rho[None], state.b_rho[None]], axis=0
        ).astype(jnp.float32)
        chunk = _capped_chunk(jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1), launch_cap(R * C))
        snaps = {"r_rho": [], "ux": []}
        done = 0
        meter = observe.StepMeter(R * C, total_steps=T)
        while done < T:
            if snapshot_every and done % snapshot_every == 0:
                Sn = np.asarray(S)
                snaps["r_rho"].append(Sn[9])
                rho = Sn[9] + Sn[10]
                snaps["ux"].append(
                    (Sn[1] - Sn[3] + Sn[5] - Sn[6] - Sn[7] + Sn[8]) / rho)
            n = min(snapshot_every or 1000, T - done)
            S = chunk(S, n)
            done += n
            meter.update(n)
        rho = S[9] + S[10]
        from ..ops import d2q9 as _d2q9

        u = _d2q9.calc_u(S[:9], rho)
        state = RKMixtureState(S[:9], S[9], S[10], u)
        return MultiphaseResult(
            state=state, steps=T,
            snapshots={k: np.stack(v) if v else None for k, v in snaps.items()})

    record = {"r_rho": lambda s: s.r_rho, "ux": lambda s: s.u[0]}
    state, snaps = _run_chunks(model, state, T, snapshot_every, record)
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


def csf_static_droplet(L: int = 100, T: int = 100, radius: float = 25.0,
                       sigma: float = 0.1,
                       snapshot_every: int | None = None,
                       fused: bool | None = None,
                       dtype=None) -> MultiphaseResult:
    """Moment-space MRT + CSF static droplet (EXPERIMENTAL — the reference
    driver is unvalidated WIP; see models/mrt_csf_droplet.py notes.  For
    Laplace-law physics use mrtcg_static_droplet).

    ``fused`` (auto on TPU, L%128==0) runs the one-launch kernel
    (kernels.csf_droplet_pallas), which matches this model to 1e-13 in
    f64.  Stability envelope (measured, L=128 f32, fused AND jnp agree):
    the formulation itself goes non-finite between steps 50 and 100 —
    consistent with its WIP status; the reference workload is T=100 at
    L=100, and the f64 path conserves mass there (test_multiphase).
    Constants cite /root/reference/test/static_droplet_test.cpp:476-486:
    L=100, R=25, sigma=0.1, red/blue (rho_0=1, alpha=0.2, nu=0.1667,
    A=0.5, beta=+/-0.7), T=100 (:500), sharpness-2 sigmoid init (:413-430)."""
    dtype = default_float(dtype)
    from ..models.mrt_csf_droplet import CSFColour, CSFDropletModel

    red = CSFColour(rho_0=1.0, alpha=0.2, nu=0.1667, A=0.5, beta=0.7)
    blue = CSFColour(rho_0=1.0, alpha=0.2, nu=0.1667, A=0.5, beta=-0.7)
    model = CSFDropletModel(red=red, blue=blue, sigma=sigma, delta=0.1)
    r0 = init_rho_droplet(L, L, red.rho_0, inside=True, radius=radius,
                          sharpness=2.0)
    b0 = init_rho_droplet(L, L, blue.rho_0, inside=False, radius=radius,
                          sharpness=2.0)
    fused = resolve_fused(fused, dtype, rows=L, cols=L)
    if fused:
        from ..kernels.csf_droplet_pallas import make_csf_droplet_fused_step
        from ..models.mrt_csf_droplet import CSFColourFields, CSFState
        from ..ops import d2q9 as _d2q9

        fdtype = dtype  # resolve_fused gated on f32 unless fused=True
        step = make_csf_droplet_fused_step(L, L, red, blue, sigma,
                                           dtype=fdtype)
        st_f = model.init_state(r0, b0, dtype=fdtype)
        S = jnp.concatenate([st_f.red.f, st_f.blue.f,
                             jnp.zeros((2, L, L), fdtype)], axis=0)
        chunk = _capped_chunk(jax.jit(
            lambda g, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), g),
            static_argnums=1), launch_cap(L * L))
        frames = {"rho": [], "psi": []} if snapshot_every else None
        done = 0
        while done < T:
            if frames is not None and done % snapshot_every == 0:
                dens = np.asarray(S[:9].sum(0) + S[9:18].sum(0))
                diff = np.asarray(S[:9].sum(0) - S[9:18].sum(0))
                frames["rho"].append(dens)
                frames["psi"].append(diff / dens)
            n = min(snapshot_every or 20000, T - done)
            S = chunk(S, n)
            done += n
            observe.check_finite(S, done)
        rf, bf, fs = S[:9], S[9:18], S[18:]
        rho = rf.sum(0) + bf.sum(0)
        u = _d2q9.calc_u(rf + bf, rho) + 0.5 * fs / rho[None]
        state = CSFState(CSFColourFields(rf, rf.sum(0)),
                         CSFColourFields(bf, bf.sum(0)), u)
        snaps = ({k: np.stack(v) for k, v in frames.items()}
                 if frames else None)
        return MultiphaseResult(state=state, steps=T, snapshots=snaps)

    state = model.init_state(r0, b0, dtype=dtype)
    record = {"rho": lambda s: s.red.rho + s.blue.rho,
              "psi": lambda s: (s.red.rho - s.blue.rho) / (s.red.rho + s.blue.rho)}
    state, snaps = _run_chunks(model, state, T, snapshot_every, record)
    return MultiphaseResult(state=state, steps=T, snapshots=snaps)


_DF64_DEBUG = None  # set to a list to capture per-step internals (debug)


def mrtcg_static_droplet_df64(R: int = 100, C: int = 100, T: int = 100,
                              red: ColourParams = DEFAULT_RED,
                              blue: ColourParams = DEFAULT_BLUE,
                              sigma: float = 0.1, radius: float = 25.0,
                              chunk_steps: int = 1000) -> MultiphaseResult:
    """The MRT-CG static droplet in double-single ("df64") arithmetic
    (utils.df64): f64-class precision from f32 pairs, so the reference's
    double-precision Laplace-law validation (mrtcg_static_droplet.cpp's
    implicit dp = sigma/R check) can run ON the TPU, which has no native
    f64.  Same algebra and step order as MRTCGModel (pinned to the
    literal transcription in tests/test_mrtcg_transcription.py): CG
    equilibria, diagonal-S MRT with the C correction, 5x5 isotropic
    gradients (replicate edges), xi perturbation, unit_E recolouring,
    the droplet BCs (no-diagonal-offset periodic cols + bounce-back
    rows) and Fg entering only through the 0.5 Fg/rho velocity shift
    (force source disabled, :513-515).  Every arithmetic op is an
    error-free-transformation df64 op; streaming/edge assignments act on
    the (hi, lo) pairs exactly."""
    from ..core import lattice as lat
    from ..utils import df64 as df

    df.resolve_guard()  # settle the EFT guard eagerly (outside jit)

    shape = (R, C)
    fg_y = -6.25e-6  # cites mrtcg_static_droplet.cpp:452 (Fg)
    CXl = [int(v) for v in lat.C[0]]
    CYl = [int(v) for v in lat.C[1]]
    W_ = np.asarray(lat.W, np.float64)
    B_ = np.asarray(lat.B_CG, np.float64)
    M_ = np.asarray(lat.M_MRT, np.float64)
    Mi_ = np.asarray(lat.MI_MRT, np.float64)
    UE = np.asarray(lat.UNIT_C, np.float64)  # (2, 9)
    phi_r = np.asarray(red.phi(), np.float64)
    phi_b = np.asarray(blue.phi(), np.float64)
    eta_r = np.asarray(red.eta(), np.float64)
    eta_b = np.asarray(blue.eta(), np.float64)

    # relaxation_function scalars (rates), mrtcg_static_droplet.cpp:34-101
    delta = 0.1
    r_om, b_om = red.rlx, blue.rlx
    s1 = 2.0 * r_om * b_om / (r_om + b_om)
    s2 = 2.0 * (r_om - s1) / delta
    s3 = -s2 / (2.0 * delta)
    t2 = 2.0 * (s1 - b_om) / delta
    t3 = t2 / (2.0 * delta)

    # 5x5 isotropic derivative taps (src/differential.hpp:9-40)
    XI = (1.0 / 5040.0) * np.array(
        [[1.0, 32.0, 84.0, 32.0, 1.0],
         [32.0, 448.0, 960.0, 448.0, 32.0],
         [84.0, 960.0, 0.0, 960.0, 84.0],
         [32.0, 448.0, 960.0, 448.0, 32.0],
         [1.0, 32.0, 84.0, 32.0, 1.0]])
    KY = np.array([[-2.0, -1.0, 0.0, 1.0, 2.0]] * 5)
    KX = -np.array([[2.0] * 5, [1.0] * 5, [0.0] * 5, [-1.0] * 5,
                    [-2.0] * 5])
    TAP_X = XI * KX
    TAP_Y = XI * KY

    def K(v):
        return df.const(v, shape)

    def conv5(a, taps):
        p = jnp.pad(a, ((0, 0), (2, 2), (2, 2)), mode="edge")
        acc = None
        for i in range(5):
            for j in range(5):
                w = taps[i, j]
                if w == 0.0:
                    continue
                term = df.mul(K(w), p[:, i:i + R, j:j + C])
                acc = term if acc is None else df.add(acc, term)
        return acc

    def cg_equilibrium(rho_k, phi, eta, ux, uy, uu):
        out = []
        for k in range(9):
            cu = None
            if CXl[k] == 1:
                cu = ux
            elif CXl[k] == -1:
                cu = df.neg(ux)
            if CYl[k] == 1:
                cu = uy if cu is None else df.add(cu, uy)
            elif CYl[k] == -1:
                cu = df.neg(uy) if cu is None else df.sub(cu, uy)
            if cu is None:
                poly = df.scale(df.neg(uu), 3.0)
            else:
                poly = df.add(
                    df.mul(K(3.0 * eta[k]), cu),
                    df.sub(df.scale(df.mul(cu, cu), 9.0),
                           df.scale(uu, 3.0)))
            out.append(df.mul(rho_k,
                              df.add(K(phi[k]), df.mul(K(W_[k]), poly))))
        return out

    def mrt_omega1(d, s_nu, c1, c7):
        # m = M d (integer coefficients), t = s*m (+C), o1 = Mi t
        m = []
        for j in range(9):
            acc = None
            for k in range(9):
                co = M_[j, k]
                if co == 0.0:
                    continue
                term = d[k] if co == 1.0 else (
                    df.neg(d[k]) if co == -1.0 else df.scale(d[k], co))
                acc = term if acc is None else df.add(acc, term)
            m.append(acc)
        t = [None] * 9
        t[1] = df.add(df.mul(K(1.25), m[1]), c1)
        t[2] = df.mul(K(1.14), m[2])
        # 1.6 is NOT exactly representable in f32 — df.scale would drop
        # 2.4e-8 relative (measured as a 6e-10 omega1 error); use the
        # split constant
        t[4] = df.mul(K(1.6), m[4])
        t[6] = df.mul(K(1.6), m[6])
        t[7] = df.add(df.mul(s_nu, m[7]), c7)
        t[8] = df.mul(s_nu, m[8])
        out = []
        for k in range(9):
            acc = None
            for j in (1, 2, 4, 6, 7, 8):
                co = Mi_[k, j]
                if co == 0.0:
                    continue
                term = df.mul(K(co), t[j])
                acc = term if acc is None else df.add(acc, term)
            out.append(acc)
        return out

    def step(carry):
        rf, bf, u_carry = carry
        ux, uy = u_carry[:, 0], u_carry[:, 1]
        r_rho = rf[0]
        b_rho = bf[0]
        for k in range(1, 9):
            r_rho = df.add(r_rho, rf[k])
            b_rho = df.add(b_rho, bf[k])
        rho = df.add(r_rho, b_rho)
        uu = df.add(df.mul(ux, ux), df.mul(uy, uy))

        r_eq = cg_equilibrium(r_rho, phi_r, eta_r, ux, uy, uu)
        b_eq = cg_equilibrium(b_rho, phi_b, eta_b, ux, uy, uu)

        # psi + s_nu
        a = df.div(r_rho, K(red.rho_0))
        b2 = df.div(b_rho, K(blue.rho_0))
        psi = df.div(df.sub(a, b2), df.add(a, b2))
        pos = df.add(K(s1), df.add(df.mul(K(s2), psi),
                                   df.mul(K(s3), df.mul(psi, psi))))
        neg_p = df.add(K(s1), df.add(df.mul(K(t2), psi),
                                     df.mul(K(t3), df.mul(psi, psi))))
        s_nu = df.where(psi[0] > delta, K(r_om), pos)
        s_nu = df.where(psi[0] <= 0.0, neg_p, s_nu)
        s_nu = df.where(psi[0] < -delta, K(b_om), s_nu)

        # C correction moments (1.8 alpha - 0.8) rho_k u
        def corr(alpha, rho_k):
            q = df.mul(K(1.8 * alpha - 0.8), rho_k)
            dxq = conv5(df.mul(q, ux), TAP_X)
            dyq = conv5(df.mul(q, uy), TAP_Y)
            c1 = df.scale(df.add(dxq, dyq), 3.0 * (1.0 - 0.5 * 1.25))
            c7 = df.mul(df.sub(K(1.0), df.scale(s_nu, 0.5)),
                        df.sub(dxq, dyq))
            return c1, c7

        rc1, rc7 = corr(red.alpha, r_rho)
        bc1, bc7 = corr(blue.alpha, b_rho)
        r_o1 = mrt_omega1([df.sub(r_eq[k], rf[k]) for k in range(9)],
                          s_nu, rc1, rc7)
        b_o1 = mrt_omega1([df.sub(b_eq[k], bf[k]) for k in range(9)],
                          s_nu, bc1, bc7)

        gx = conv5(psi, TAP_X)
        gy = conv5(psi, TAP_Y)
        gn = df.sqrt(df.add(df.mul(gx, gx), df.mul(gy, gy)))
        eps_gn = df.add(K(1e-20), gn)
        A_half_gn = df.mul(df.mul(K(4.5 * sigma), s_nu),
                           df.scale(gn, 0.5))

        coll_r, coll_b = [], []
        ratio_r = df.div(r_rho, rho)
        ratio_b = df.div(b_rho, rho)
        rb = df.mul(r_rho, b_rho)
        den_kap = df.mul(df.mul(rho, rho), eps_gn)
        for k in range(9):
            # xi perturbation
            gc = None
            if CXl[k]:
                gc = gx if CXl[k] == 1 else df.neg(gx)
            if CYl[k]:
                gc = (gy if CYl[k] == 1 else df.neg(gy)) if gc is None \
                    else (df.add(gc, gy) if CYl[k] == 1 else df.sub(gc, gy))
            if gc is None:
                o2 = df.mul(A_half_gn, K(-B_[k]))
            else:
                unit = df.div(gc, eps_gn)
                o2 = df.mul(A_half_gn,
                            df.sub(df.mul(K(W_[k]), df.mul(unit, unit)),
                                   K(B_[k])))
            total = df.add(df.add(df.add(rf[k], r_o1[k]), o2),
                           df.add(df.add(bf[k], b_o1[k]), o2))
            # kappa (unit_E)
            if UE[0, k] == 0.0 and UE[1, k] == 0.0:
                kap = None
            else:
                guc = None
                if UE[0, k] != 0.0:
                    guc = df.mul(K(UE[0, k]), gx)
                if UE[1, k] != 0.0:
                    term = df.mul(K(UE[1, k]), gy)
                    guc = term if guc is None else df.add(guc, term)
                num = df.mul(df.mul(rb, guc),
                             df.add(df.mul(r_rho, K(phi_r[k])),
                                    df.mul(b_rho, K(phi_b[k]))))
                kap = df.div(num, den_kap)
            o3r = df.mul(ratio_r, total)
            o3b = df.mul(ratio_b, total)
            if kap is not None:
                o3r = df.add(o3r, df.mul(K(red.beta), kap))
                o3b = df.add(o3b, df.mul(K(blue.beta), kap))
            coll_r.append(o3r)
            coll_b.append(o3b)

        if _DF64_DEBUG is not None:
            _DF64_DEBUG.append({"psi": psi, "s_nu": s_nu, "gx": gx,
                                "gy": gy, "gn": gn, "r_o1": r_o1,
                                "b_o1": b_o1, "coll_r": coll_r,
                                "r_eq": r_eq, "rc1": rc1, "rc7": rc7})

        # stream (periodic roll) + droplet BCs
        def advect_bc(coll):
            new = [jnp.roll(coll[k], (CXl[k], CYl[k]), (1, 2))
                   for k in range(9)]
            S = slice(1, -1)
            for k in (2, 5, 6):      # periodic cols, no diagonal offset
                new[k] = new[k].at[:, S, 0].set(coll[k][:, S, -1])
            for k in (4, 8, 7):
                new[k] = new[k].at[:, S, -1].set(coll[k][:, S, 0])
            OPP = [int(v) for v in lat.OPP]
            for k in (1, 5, 8):      # bounce-back row -1 (outgoing 1,5,8)
                new[OPP[k]] = new[OPP[k]].at[:, -1, :].set(coll[k][:, -1, :])
            for k in (3, 7, 6):      # bounce-back row 0 (outgoing 3,7,6)
                new[OPP[k]] = new[OPP[k]].at[:, 0, :].set(coll[k][:, 0, :])
            return new

        rf_n = advect_bc(coll_r)
        bf_n = advect_bc(coll_b)

        r_rho_n = rf_n[0]
        b_rho_n = bf_n[0]
        for k in range(1, 9):
            r_rho_n = df.add(r_rho_n, rf_n[k])
            b_rho_n = df.add(b_rho_n, bf_n[k])
        rho_n = df.add(r_rho_n, b_rho_n)
        fs = [df.add(rf_n[k], bf_n[k]) for k in range(9)]
        mx = df.sub(df.add(df.add(fs[1], fs[5]), fs[8]),
                    df.add(df.add(fs[3], fs[6]), fs[7]))
        my = df.sub(df.add(df.add(fs[2], fs[5]), fs[6]),
                    df.add(df.add(fs[4], fs[7]), fs[8]))
        ux_n = df.div(mx, rho_n)
        uy_n = df.add(df.div(my, rho_n),
                      df.div(K(0.5 * fg_y), rho_n))
        return (jnp.stack(rf_n), jnp.stack(bf_n),
                jnp.stack([ux_n, uy_n], axis=0).transpose(1, 0, 2, 3))

    # --- init (droplet sigmoid, u = 0.5 Fg/rho, equilibria at that u)
    r0 = init_rho_droplet(R, C, red.rho_0, inside=True, radius=radius)
    b0 = init_rho_droplet(R, C, blue.rho_0, inside=False, radius=radius)
    r_rho0 = df.from_f64(r0)
    b_rho0 = df.from_f64(b0)
    rho0 = df.add(r_rho0, b_rho0)
    ux0 = K(0.0)
    uy0 = df.div(K(0.5 * fg_y), rho0)
    uu0 = df.mul(uy0, uy0)
    rf0 = jnp.stack(cg_equilibrium(r_rho0, phi_r, eta_r, ux0, uy0, uu0))
    bf0 = jnp.stack(cg_equilibrium(b_rho0, phi_b, eta_b, ux0, uy0, uu0))
    u0 = jnp.stack([ux0, uy0], axis=0).transpose(1, 0, 2, 3)

    def unstack(carry):
        rf, bf, u = carry
        return ([rf[k] for k in range(9)], [bf[k] for k in range(9)], u)

    chunk = jax.jit(
        lambda c, n: jax.lax.fori_loop(
            0, n, lambda _, x: step(unstack(x)), c),
        static_argnums=1)
    carry = (rf0, bf0, u0)
    done = 0
    while done < T:
        n = min(chunk_steps, T - done)
        carry = chunk(carry, n)
        done += n
        observe.check_finite(carry, done)
    rf, bf, u = carry

    # host-side f64 macroscopics
    from ..utils.df64 import to_f64

    r_rho = sum(to_f64(rf[k]) for k in range(9))
    b_rho = sum(to_f64(bf[k]) for k in range(9))
    state = TwoPhaseState(
        mrt_cg.ColourFields(jnp.asarray([to_f64(rf[k]) for k in range(9)]),
                            jnp.asarray(r_rho)),
        mrt_cg.ColourFields(jnp.asarray([to_f64(bf[k]) for k in range(9)]),
                            jnp.asarray(b_rho)),
        jnp.asarray(np.stack([to_f64(u[:, 0]), to_f64(u[:, 1])])))
    return MultiphaseResult(state=state, steps=T, snapshots=None)
