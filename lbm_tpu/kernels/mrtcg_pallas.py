"""Fully fused MRT colour-gradient two-phase step as one Pallas kernel.

The flagship multiphase step (models/mrt_cg.py, reproducing
test/mrtcg_rayleigh_taylor.cpp) compiles to ~100 XLA fusions; through the
axon tunnel that costs ~7 ms/step at 256x128 regardless of grid size.  This
kernel runs the ENTIRE step — macroscopics, phase field, interface
relaxation, 5x5 isotropic gradients (replicate-padded), MRT omega1 with
correction moments, perturbation omega2, recolouring omega3, Guo gravity
source, periodic streaming, and the reference's wall rules — in one launch
over row blocks.

Only the 'perturbation' surface-tension mode with the standard RT boundary
stack (cols periodic without diagonal offset + rows bounce-back,
mrtcg_rayleigh_taylor.cpp:495-533) is fused; other combinations use the jnp
model.  u is derived in-kernel as calc_u(f) + 0.5 Fg/rho, which equals the
model's carried u for this mode.

Mosaic constraints shape the implementation: no captured array constants
(all lattice/MRT coefficients are python scalars), no sub-8-row slices
(edge rows/cols are extracted with masked reductions, shifts are rolls),
and validity accounting: one sweep consumes 3 halo rows (2 for the 5x5
stencils + 1 for streaming), well within the 8-row halo.

Cost breakdown (measured by stage ablation at 1024x512 on the v5e, f32,
before the grouped-row stencil rewrite): full kernel 1.95 GLUPS;
gradients stubbed 4.3; MRT algebra stubbed 4.1; stream/BC masks stubbed
2.4 — stencils ~55%, MRT moment algebra ~25%, BC masks ~19%.  Two levers
since applied: interior blocks skip the global-edge masks (1.95 -> 2.23),
and _corr5_multi's column-filter-first grouped-row evaluation (2.23 ->
2.47; stencils now ~40%); paired-direction algebra (shared even parts,
per-pair omega2, sign-flipped kappa — see collide_stream.d2q9_pairs)
took 2.47 -> 2.76.  Measured dead ends: fusing Mi*S_base*M into
one precomputed matrix is denser than the factored form (81 vs 76 FMAs),
and temporal blocking cannot pay while the kernel is compute-bound
(356 GB/s of 819 at 2.47 GLUPS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..core import lattice as lat
from ..core.params import ColourParams
from ..ops.gradients import KERNEL_X5, KERNEL_Y5
from .collide_stream import CHALO, HALO, PAIR_KS

CX = tuple(int(v) for v in lat.C[0])
CY = tuple(int(v) for v in lat.C[1])
WQ = tuple(float(v) for v in lat.W)
BQ = tuple(float(v) for v in lat.B_CG)
UCX = tuple(float(v) for v in lat.UNIT_C[0])
UCY = tuple(float(v) for v in lat.UNIT_C[1])
M_ROWS = tuple(tuple(float(v) for v in row) for row in lat.M_MRT)
MI_ROWS = tuple(tuple(float(v) for v in row) for row in lat.MI_MRT)
KX5 = tuple(tuple(float(v) for v in row) for row in KERNEL_X5)
KY5 = tuple(tuple(float(v) for v in row) for row in KERNEL_Y5)

# base MRT relaxation diagonal (rows 7, 8 replaced by s_nu per cell)
S_BASE = (0.0, 1.25, 1.14, 0.0, 1.6, 0.0, 1.6, None, None)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _edge_col(x, col: int, C: int):
    """(rows, 1) copy of column ``col`` extracted via a masked reduction
    (Mosaic cannot slice single lanes).  For wide grids the reduction is
    confined to one 128-lane tile: lane slices at 128-aligned offsets are
    legal, so only the tile containing the column is reduced."""
    col = col % C
    off = 0
    if C > 128:
        off = min(col - col % 128, C - 128)
        x = jax.lax.slice_in_dim(x, off, off + 128, axis=1)
    mask = _col_iota(x.shape) == (col - off)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True)


def _abs_row_val(x, abs_iota, abs_row: int):
    """(1, C) copy of the global row ``abs_row`` if present in this slab
    (zeros otherwise — callers only use it under a matching mask)."""
    mask = abs_iota == abs_row
    return jnp.sum(jnp.where(mask, x, 0.0), axis=0, keepdims=True)


def _abs_col_val(x, col_iota, abs_col: int):
    """(rows, 1) copy of the global column ``abs_col`` if present on this
    shard (zeros otherwise — callers only use it under a matching mask).
    Full-width masked reduce: under 2-D sharding the local lane position
    of a global column is rank-dependent, so the 128-tile confinement of
    _edge_col does not apply."""
    mask = col_iota == abs_col
    return jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True)


def _corr5_multi(x, kerns, abs_iota, R: int, C: int,
                 row_edges: bool = True, col_iota=None,
                 _col_edges: bool = True):
    """5x5 cross-correlations of ``x`` with each kernel in ``kerns``, with
    replicate padding on all four global edges, on a slab whose absolute row
    index is ``abs_iota`` (rows beyond the validity margin produce garbage
    the caller discards).

    Column-filter-first evaluation: the column shifts of x (the expensive
    ops — roll + edge-column reduction + replicate select) are hoisted and
    shared across ALL kernels; then each DISTINCT kernel row direction
    (rows grouped by proportionality — the isotropic 5x5 derivative
    kernels have only 2-3 distinct row vectors, e.g. KX5 rows are
    -2/-1/0/+1/+2 times the two XI rows) becomes one 5-tap column filter;
    each kernel output is a handful of scaled row-shifts of those filtered
    fields.  Replicate semantics are preserved exactly: column filtering
    commutes with row replication, so the row fixup uses the filtered
    field's own global edge rows (corners included).  vs the tap-by-tap
    form this cuts the KX5+KY5 pair from 20 row rolls + 40 FMAs to 8 row
    rolls + ~25 FMAs at the same 4 column shifts.

    Interior blocks pass row_edges=False and skip the edge-row
    extractions and replicate selects entirely.

    ``col_iota`` (GLOBAL column indices, same shape as x) enables the
    2-D-sharded mode: column rolls act on the local (halo-padded) width
    while the replicate fixups compare against global columns — on
    shards not containing a global column edge the fixup masks are empty
    and the extractions reduce to zeros, exactly like the row logic."""
    rows, width = x.shape
    local_cols = col_iota is None
    ci = _col_iota(x.shape) if local_cols else col_iota

    # ---- group kernel rows by direction (exact proportionality)
    bases, base_ids, plans = [], {}, []
    for k in kerns:
        plan = []
        for a in range(5):
            row = tuple(float(k[a][b]) for b in range(5))
            if not any(row):
                continue
            scale = next(v for v in row if v != 0.0)
            norm = tuple(v / scale for v in row)
            bid = base_ids.get(norm)
            if bid is None:
                bid = base_ids[norm] = len(bases)
                bases.append(norm)
            plan.append((scale, a - 2, bid))
        plans.append(plan)

    # ---- hoisted column shifts with column-replicate fixup
    used_db = sorted({b - 2 for base in bases for b in range(5) if base[b]})
    xs = {}
    if used_db != [0] and _col_edges:
        if local_cols:
            left = _edge_col(x, 0, C)
            right = _edge_col(x, C - 1, C)
        else:
            left = _abs_col_val(x, ci, 0)
            right = _abs_col_val(x, ci, C - 1)
    for db in used_db:
        if db == 0:
            xs[0] = x
        else:
            t = pltpu.roll(x, (-db) % width, axis=1)
            if not _col_edges:  # measurement-only ablation (NOT physics)
                xs[db] = t
                continue
            xs[db] = jnp.where(ci < -db, left, t) if db < 0 \
                else jnp.where(ci >= C - db, right, t)

    # ---- one 5-tap column filter per distinct row direction
    cf = []
    for base in bases:
        acc = None
        for b in range(5):
            w = base[b]
            if w == 0.0:
                continue
            term = xs[b - 2] if w == 1.0 else w * xs[b - 2]
            acc = term if acc is None else acc + term
        cf.append(acc)

    # ---- cached row shifts (with row replicate) of the filtered fields
    tops, bots, shifts = {}, {}, {}

    def rowshift(bid, da):
        key = (bid, da)
        if key not in shifts:
            y = cf[bid]
            t = y if da == 0 else pltpu.roll(y, (-da) % rows, axis=0)
            if row_edges and da < 0:
                if bid not in tops:
                    tops[bid] = _abs_row_val(y, abs_iota, 0)
                t = jnp.where(abs_iota + da < 0, tops[bid], t)
            elif row_edges and da > 0:
                if bid not in bots:
                    bots[bid] = _abs_row_val(y, abs_iota, R - 1)
                t = jnp.where(abs_iota + da >= R, bots[bid], t)
            shifts[key] = t
        return shifts[key]

    outs = []
    for plan in plans:
        acc = None
        for scale, da, bid in plan:
            t = rowshift(bid, da)
            term = t if scale == 1.0 else scale * t
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


def _corr5(x, kern, abs_iota, R: int, C: int):
    """Single-kernel 5x5 cross-correlation (see _corr5_multi)."""
    return _corr5_multi(x, (kern,), abs_iota, R, C)[0]


def _mrt_omega1(f0, fs_p, fd_p, m_eq, c1, c7, s_nu):
    """Mi (s * (M (feq - f)) + C), moment-space + pair-factored.

    Only moments 1,2,4,6,7,8 relax (S_BASE zeroes rows 0,3,5), and the
    surviving basis rows split by parity under k -> opp(k): rows 1,2,7,8
    of M are EVEN (M[row,kp] == M[row,km] for every opposite pair) and
    rows 4,6 are ODD (M[row,kp] == -M[row,km], zero at k=0).  So the
    forward map rides the 4 population pair sums ``fs_p`` / diffs
    ``fd_p`` (+ the rest plane ``f0``) instead of 9 planes, the
    equilibrium enters as its closed-form moments ``m_eq`` (a dict over
    the 6 relaxed rows — the 9 equilibrium planes are never built; see
    the caller), and the back map shares each pair's even part:
    Mi[km,j] equals Mi[kp,j] on even columns and -Mi[kp,j] on odd ones,
    giving o1[kp], o1[km] = even +/- odd.  ~60 vs 262 vector ops/cell
    by the jaxpr count (docs/BENCHMARKS.md multiphase roofline); the
    coefficients are read from the same M_MRT/MI_MRT tables as before
    (mrtcg_static_droplet.cpp:130-156), so the algebra is exact up to
    summation order."""
    EVEN, ODD = (1, 2, 7, 8), (4, 6)

    def mrow(row, parts, with_k0):
        acc = None
        if with_k0:
            w0 = M_ROWS[row][0]
            if w0 == 1.0:
                acc = f0
            elif w0 != 0.0:
                acc = w0 * f0
        for i, (kp, _) in enumerate(PAIR_KS):
            w = M_ROWS[row][kp]
            if w == 0.0:
                continue
            term = parts[i] if w == 1.0 else w * parts[i]
            acc = term if acc is None else acc + term
        return acc

    v = {}
    for row in EVEN:
        s = S_BASE[row]
        m = m_eq[row] - mrow(row, fs_p, True)
        v[row] = m * s_nu if s is None else m * s
    for row in ODD:
        s = S_BASE[row]
        m = m_eq[row] - mrow(row, fd_p, False)
        v[row] = m * s_nu if s is None else m * s
    v[1] = v[1] + c1
    v[7] = v[7] + c7

    def midot(k, rows):
        acc = None
        for j in rows:
            w = MI_ROWS[k][j]
            if w == 0.0:
                continue
            term = v[j] if w == 1.0 else w * v[j]
            acc = term if acc is None else acc + term
        return acc

    o1 = [None] * 9
    o1[0] = midot(0, EVEN)
    for kp, km in PAIR_KS:
        even = midot(kp, EVEN)
        odd = midot(kp, ODD)
        o1[kp] = even + odd
        o1[km] = even - odd
    return o1


def _make_collide(red: ColourParams, blue: ColourParams, sigma, gravity,
                  delta, apply_gravity_source, R, C, dtype,
                  surface_tension: str = "perturbation",
                  _ablate: frozenset = frozenset()):
    from ..models.mrt_cg import RelaxationFunction

    if surface_tension not in ("perturbation", "csf"):
        raise ValueError(surface_tension)
    csf = surface_tension == "csf"
    # per-colour CSF force prefactors A_k (1 - rlx_k/2) (models.mrt_cg
    # step, mrt_rayleigh_taylor.cpp:508-513)
    r_A_pref = red.A * (1.0 - 0.5 * red.rlx)
    b_A_pref = blue.A * (1.0 - 0.5 * blue.rlx)
    relax = RelaxationFunction.from_omegas(red, blue, delta)
    r_phi = tuple(float(v) for v in red.phi())
    b_phi = tuple(float(v) for v in blue.phi())
    r_eta = tuple(float(v) for v in red.eta())
    b_eta = tuple(float(v) for v in blue.eta())
    gx, gy = float(gravity[0]), float(gravity[1])
    r_alpha_c = 1.8 * red.alpha - 0.8
    b_alpha_c = 1.8 * blue.alpha - 0.8
    r0, b0 = red.rho_0, blue.rho_0
    beta_r, beta_b = red.beta, blue.beta

    # opposite-direction pairs (kp, km) with cu(kp) = -cu(km); phi/eta/W/B
    # depend only on |c| so each pair shares its even-polynomial parts
    # (kernels.collide_stream.PAIR_KS / pair_cu — the single source)
    from .collide_stream import PAIR_KS as PAIRS, pair_cu

    for kp, km in PAIRS:
        assert r_phi[kp] == r_phi[km] and b_phi[kp] == b_phi[km]
        assert r_eta[kp] == r_eta[km] and b_eta[kp] == b_eta[km]
        assert WQ[kp] == WQ[km] and BQ[kp] == BQ[km]

    def collide(fsum, rho, r_rho, b_rho, abs_iota, row_edges=True,
                fst=None, col_iota=None, reduced=False):
        """Colour-summed collision on the class fields.

        The per-colour populations enter ONLY through their colour sum
        ``fsum`` and the densities ``r_rho``/``b_rho`` (the split
        reappears only at the recolouring output), so callers may carry
        either the full 18-plane state or the reduced 10-plane one.

        ``reduced=False`` returns (coll_r, coll_b): the full recoloured
        per-colour post-collision populations.  ``reduced=True`` returns
        (coll_s, coll_r): the colour SUM and the red part — enough to
        advance the reduced state (the next step's b planes are never
        needed individually, only b_rho = rho - r_rho)."""
        inv_rho = 1.0 / rho
        # population pair sums/diffs: the momenta are combinations of the
        # diffs, and the MRT forward map rides both (see _mrt_omega1)
        fs_p = [fsum[kp] + fsum[km] for kp, km in PAIRS]
        fd_p = [fsum[kp] - fsum[km] for kp, km in PAIRS]
        mom_x = fd_p[0] + fd_p[2] + fd_p[3]   # pairs (1,3),(5,7),(8,6)
        mom_y = fd_p[1] + fd_p[2] - fd_p[3]
        if csf:
            # the carried-u shift includes the PREVIOUS step's surface
            # force (models.mrt_cg step tail: u += 0.5 (Fg + fst)/rho)
            ux = (mom_x + 0.5 * (gx + fst[0])) * inv_rho
            uy = (mom_y + 0.5 * (gy + fst[1])) * inv_rho
        else:
            ux = (mom_x + 0.5 * gx) * inv_rho
            uy = (mom_y + 0.5 * gy) * inv_rho
        x2, y2 = ux * ux, uy * uy
        uu = x2 + y2
        cu_p = pair_cu(ux, uy)

        a = r_rho * (1.0 / r0)
        b = b_rho * (1.0 / b0)
        psi = (a - b) / (a + b)
        s_nu = relax(psi)

        # gradients: phase field + colour-combined correction field
        if "grad" in _ablate:  # measurement-only stage stub (NOT physics)
            gpx, gpy = 0.01 * psi, 0.02 * psi
        else:
            gpx, gpy = _corr5_multi(psi, (KX5, KY5), abs_iota, R, C,
                                    row_edges=row_edges, col_iota=col_iota,
                                    _col_edges="fixups" not in _ablate)
        gn = jnp.sqrt(gpx * gpx + gpy * gpy)
        inv_gn = 1.0 / (1e-20 + gn)

        # --- colour-summed collision.  omega1/omega2 enter the step ONLY
        # through r_o1 + o2r + b_o1 + o2b inside total
        # (mrtcg_static_droplet.cpp:505: total_f = r.adv_f + r.omega1 +
        # r.omega2 + b.adv_f + b.omega1 + b.omega2; the per-colour split
        # reappears only in the recolouring), so the equilibria, the M/Mi
        # moment chain and the correction stencils all run ONCE on
        # colour-combined fields: the summed equilibrium uses the class
        # fields ab = rho_r phi_r + rho_b phi_b and
        # e = rho_r eta_r + rho_b eta_b (phi/eta take one value per
        # |c| class), and the correction gradients act on
        # (c_r rho_r + c_b rho_b) u — 2 stencil applications instead of 4
        # and one MRT chain instead of two.
        ab = {}
        ee = {}
        for cls in (0, 1, 5):   # class representatives: rest, axis, diag
            ab[cls] = r_phi[cls] * r_rho + b_phi[cls] * b_rho
            if cls:              # k=0 has no odd (eta) term
                ee[cls] = r_eta[cls] * r_rho + b_eta[cls] * b_rho
        # the equilibria enter the step ONLY through the moment-space
        # differences m_eq - M f (they were materialized solely to form
        # feq - f for the MRT chain), and the CG equilibrium's relaxed
        # MRT moments have closed forms in the class fields — exact sums
        # of the per-direction equilibria (mrtcg_static_droplet.cpp:
        # 233-247) over the M rows, using W0=4/9, W_ax=1/9, W_dg=1/36
        # and phi/eta constant per |c| class — so the 9 equilibrium
        # planes are never built:
        #   e:   -4 ab0 - 4 ab1 + 8 ab5 + 6 rho u^2
        #   eps:  4 ab0 - 8 ab1 + 4 ab5 - 6 rho u^2
        #   qx/qy: (ee5/3 - 4 ee1/3) * u        (jx/jy/rho never relax)
        #   pxx:  2 rho (ux^2 - uy^2),  pxy: 2 rho ux uy
        uu_rho6 = 6.0 * (uu * rho)
        rho2 = rho + rho
        gq = (1.0 / 3.0) * ee[5] - (4.0 / 3.0) * ee[1]
        m_eq = {
            1: 8.0 * ab[5] - 4.0 * (ab[0] + ab[1]) + uu_rho6,
            2: 4.0 * (ab[0] + ab[5]) - 8.0 * ab[1] - uu_rho6,
            4: ux * gq,
            6: uy * gq,
            7: rho2 * (x2 - y2),
            8: rho2 * (ux * uy),
        }
        q_c = r_alpha_c * r_rho + b_alpha_c * b_rho
        if "grad" in _ablate:  # measurement-only stage stub (NOT physics)
            dxqx, dyqy = 0.01 * (q_c * ux), 0.01 * (q_c * uy)
        else:
            ce = "fixups" not in _ablate
            dxqx = _corr5_multi(q_c * ux, (KX5,), abs_iota, R, C,
                                row_edges=row_edges, col_iota=col_iota,
                                _col_edges=ce)[0]
            dyqy = _corr5_multi(q_c * uy, (KY5,), abs_iota, R, C,
                                row_edges=row_edges, col_iota=col_iota,
                                _col_edges=ce)[0]
        c1 = 3.0 * (1.0 - 0.5 * 1.25) * (dxqx + dyqy)
        c7 = (1.0 - 0.5 * s_nu) * (dxqx - dyqy)
        if "mrt" in _ablate:  # measurement-only stage stub (NOT physics)
            o1s = [0.001 * f for f in fsum]
        else:
            o1s = _mrt_omega1(fsum[0], fs_p, fd_p, m_eq, c1, c7, s_nu)

        gc_p = pair_cu(gpx, gpy)         # {kp: c_kp . grad(psi)}
        fst_new = None
        if not csf:
            # perturbation omega2 SUMMED over colours: o2r == o2b (same
            # A = 4.5 sigma s_nu both, mrtcg_static_droplet.cpp:505-507)
            # so o2r + o2b = 2 * (0.5 A gn (...)) = A gn (...); unit^2 is
            # even under k -> opp(k) so one value per pair
            A_gn = ((4.5 * sigma) * s_nu) * gn
            o2s = [None] * 9
            o2s[0] = A_gn * (-BQ[0])
            for kp, km in PAIRS:
                unit = gc_p[kp] * inv_gn
                o2s[kp] = o2s[km] = A_gn * (WQ[kp] * unit * unit
                                            - BQ[kp])
        else:
            # CSF curvature force (models.mrt_cg local_curvature/csf_eta,
            # mrt_rayleigh_taylor.cpp:355-384): inward normal from the
            # psi gradient, K from 5x5 stencils of the normal (chained
            # replicate semantics — 4 halo rows + 1 streaming of the 8
            # available), fst = -sigma/2 K grad(psi), and the
            # colour-independent eta scaled per colour by A(1 - rlx/2)
            nx = -(gpx * inv_gn)
            ny = -(gpy * inv_gn)
            dxnx, dynx = _corr5_multi(nx, (KX5, KY5), abs_iota, R, C,
                                      row_edges=row_edges,
                                      col_iota=col_iota)
            dxny, dyny = _corr5_multi(ny, (KX5, KY5), abs_iota, R, C,
                                      row_edges=row_edges,
                                      col_iota=col_iota)
            K = nx * ny * (dynx + dxny) - nx * nx * dyny - ny * ny * dxnx
            fstx = (-0.5 * sigma) * (K * gpx)
            fsty = (-0.5 * sigma) * (K * gpy)
            fst_new = (fstx, fsty)
            uFs3 = 3.0 * (ux * fstx + uy * fsty)
            Fc_p = pair_cu(fstx, fsty)   # {kp: c_kp . fst}
            # colour-summed CSF perturbation: o2r + o2b =
            # (A_r(1 - rlx_r/2) + A_b(1 - rlx_b/2)) * eta_k
            s_A_pref = r_A_pref + b_A_pref
            o2s = [None] * 9
            o2s[0] = s_A_pref * (WQ[0] * (-uFs3))
            for kp, km in PAIRS:
                even = WQ[kp] * (9.0 * cu_p[kp] * Fc_p[kp] - uFs3)
                odd = WQ[kp] * (3.0 * Fc_p[kp])
                o2s[kp] = s_A_pref * (even + odd)
                o2s[km] = s_A_pref * (even - odd)

        # recolouring: guc flips sign with the direction while the phi
        # factor is shared, so kap(opp(k)) = -kap(k); the Guo source
        # splits even/odd like every other c-polynomial
        rb_gn = (r_rho * b_rho) * (inv_rho * inv_rho) * inv_gn
        r_frac = r_rho * inv_rho
        pref = (1.0 - 0.5 * s_nu) if apply_gravity_source and (gx or gy) \
            else None
        uF3 = None
        if pref is not None:
            uF3 = 3.0 * (ux * gx + uy * gy)
        coll_r = [None] * 9
        coll_s = [None] * 9  # colour SUM (reduced) or blue (full)
        beta_s = beta_r + beta_b

        if reduced:
            # reduced output: the SUM needs no r_frac multiply at all
            # (r_frac + b_frac = 1 analytically — the o3 recolouring is a
            # convex split of the colour-blind total) and the source adds
            # once per colour
            def o3(k, total, kap, src):
                cs = total if kap is None else total + beta_s * kap
                cr = r_frac * total if kap is None \
                    else r_frac * total + beta_r * kap
                if src is not None:
                    cs = cs + 2.0 * src
                    cr = cr + src
                coll_s[k] = cs
                coll_r[k] = cr
        else:
            b_frac = b_rho * inv_rho

            def o3(k, total, kap, src):
                o3r = r_frac * total + beta_r * kap if kap is not None \
                    else r_frac * total
                o3b = b_frac * total + beta_b * kap if kap is not None \
                    else b_frac * total
                if src is not None:
                    o3r = o3r + src
                    o3b = o3b + src
                coll_r[k] = o3r
                coll_s[k] = o3b

        total0 = fsum[0] + o1s[0] + o2s[0]
        o3(0, total0, None,
           pref * (-uF3) * WQ[0] if pref is not None else None)
        for kp, km in PAIRS:
            # unit-velocity c.grad(psi): diagonals carry the 1/sqrt(2) —
            # except in CSF mode, whose driver dots the PLAIN E set
            # (mrt_rayleigh_taylor.cpp:304-320 vs
            # mrtcg_rayleigh_taylor.cpp:302-318); the phi-weighted density
            # factor is exactly the equilibrium class field ab[cls]
            cls = 1 if kp in (1, 2) else 5
            unit_scale = 1.0 if (csf or kp in (1, 2)) else UCX[5]
            kap = (rb_gn * (unit_scale * gc_p[kp])) * ab[cls]
            src_p = src_m = None
            if pref is not None:
                cF = CX[kp] * gx + CY[kp] * gy  # scalar
                even_s = (pref * WQ[kp]) * (9.0 * cu_p[kp] * cF - uF3)
                odd_s = (pref * WQ[kp]) * (3.0 * cF)
                src_p = even_s + odd_s
                src_m = even_s - odd_s
            tot_p = fsum[kp] + o1s[kp] + o2s[kp]
            tot_m = fsum[km] + o1s[km] + o2s[km]
            o3(kp, tot_p, kap, src_p)
            o3(km, tot_m, -kap, src_m)
        if reduced:
            out = coll_s, coll_r
        else:
            out = coll_r, coll_s
        if csf:
            return out + (fst_new,)
        return out

    return collide


def _stream_with_bcs(coll, abs_iota, R, C, row_edges: bool = True,
                     col_iota=None, _skip_masks: bool = False):
    """Periodic streaming + the multiphase drivers' wall rules:
    cols periodic WITHOUT the diagonal row offset (rows 1..R-2), rows
    bounce-back.  cites mrtcg_rayleigh_taylor.cpp:495-533.

    ``row_edges=False`` (interior blocks) skips the row bounce-back masks
    and the interior-rows restriction on the column repair: every slab row
    the kept interior can read from lies in [1, R-2] there, so the result
    is identical where it matters.

    ``col_iota`` (global column indices) enables the 2-D-sharded mode:
    rolls act on the local padded width (the column halo strips supply
    globally-correct neighbours at the seams) and the periodic column
    repair masks compare against global columns."""
    rows, width = coll[0].shape
    ci = _col_iota(coll[0].shape) if col_iota is None else col_iota
    interior = ((abs_iota >= 1) & (abs_iota <= R - 2)) if row_edges else True
    out = [None] * 9
    col_rolled = [None] * 9
    for k in range(9):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % width, axis=1)
        col_rolled[k] = t
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        out[k] = t
    if _skip_masks:  # measurement-only ablation (NOT physics)
        return out
    # periodic col repair without diagonal offset, interior rows only
    for k in (2, 5, 6):  # entering through col 0
        out[k] = jnp.where((ci == 0) & interior, col_rolled[k], out[k])
    for k in (4, 7, 8):  # entering through col C-1
        out[k] = jnp.where((ci == C - 1) & interior, col_rolled[k], out[k])
    if row_edges:
        # bounce-back rows (full lanes, overwrite corners last)
        bottom = abs_iota == R - 1
        for k in (1, 5, 8):
            out[lat.OPP[k]] = jnp.where(bottom, coll[k], out[lat.OPP[k]])
        top = abs_iota == 0
        for k in (3, 6, 7):
            out[lat.OPP[k]] = jnp.where(top, coll[k], out[lat.OPP[k]])
    return out


def _stream_sum_with_bcs(coll, abs_iota, R, C, row_edges: bool = True,
                         col_iota=None, _skip_masks: bool = False):
    """``sum_k _stream_with_bcs(coll)[k]`` without materialising the 9
    streamed planes: the reduced state consumes the streamed red
    populations ONLY through their sum (= the next red density), so each
    plane's final value is computed in one expression and folded into a
    single accumulator — 1 live temporary instead of 9 in the kernel's
    port/VMEM-bound epilogue.  Exact: the per-plane finals match
    _stream_with_bcs (its col-repair and bounce-back writes touch
    disjoint masks per plane, so the overwrite order collapses into
    nested selects) and the accumulation runs in the same ascending-k
    order the callers used on the materialised planes."""
    rows, width = coll[0].shape
    ci = _col_iota(coll[0].shape) if col_iota is None else col_iota
    interior = ((abs_iota >= 1) & (abs_iota <= R - 2)) if row_edges else True
    bottom = (abs_iota == R - 1) if row_edges else None
    top = (abs_iota == 0) if row_edges else None
    acc = None
    for k in range(9):
        t = coll[k]
        if CY[k] != 0:
            t = pltpu.roll(t, CY[k] % width, axis=1)
        col_rolled = t
        if CX[k] != 0:
            t = pltpu.roll(t, CX[k] % rows, axis=0)
        v = t
        if not _skip_masks:
            if k in (2, 5, 6):     # entering through col 0
                v = jnp.where((ci == 0) & interior, col_rolled, v)
            elif k in (4, 7, 8):   # entering through col C-1
                v = jnp.where((ci == C - 1) & interior, col_rolled, v)
            if row_edges:
                if k in (3, 6, 7):     # targets of the bottom bounce-back
                    v = jnp.where(bottom, coll[lat.OPP[k]], v)
                elif k in (1, 5, 8):   # targets of the top bounce-back
                    v = jnp.where(top, coll[lat.OPP[k]], v)
        acc = v if acc is None else acc + v
    return acc


def reduced_planes(surface_tension: str = "perturbation") -> int:
    """Plane count of the reduced state: 9 colour-summed populations +
    1 red density (+ 2 surface-force carries in CSF mode)."""
    return 12 if surface_tension == "csf" else 10


def make_mrtcg_body(R: int, C: int, red: ColourParams, blue: ColourParams,
                    sigma: float, gravity=(0.0, 0.0), delta: float = 0.1,
                    apply_gravity_source: bool = True, dtype=jnp.float32,
                    surface_tension: str = "perturbation",
                    substeps: int = 1, reduced: bool = False,
                    split_out: bool = False, halo: int = HALO,
                    _ablate: frozenset = frozenset()):
    """The per-slab MRT-CG step body, shared by the single-chip pipeline
    and the sharded halo-input kernel: ``run(block (P, rows, C),
    abs_iota, row_edges) -> (P_out, rows - 2*halo, C)`` where abs_iota
    holds GLOBAL row indices (the row masks and replicate extractions are
    position-based, so the same body works on any shard given its
    offset).  P = 18 for the perturbation mode; the CSF mode carries the
    surface force as 2 extra planes (P = 20: the model's carried-u shift
    uses the PREVIOUS step's fst, so it is state).

    ``reduced=True`` runs on the REDUCED state (P = 10 / 12 CSF):
    planes 0..8 the colour-summed populations, plane 9 the red density
    (+ fst).  The step only ever consumes the per-colour populations
    through their sum and the densities (see collide's docstring), so
    this layout is closed under the update — it carries 10 planes of HBM
    traffic per step instead of 18 for identical physics.  The blue
    density is rho - r_rho; per-colour populations can be materialised
    exactly at any step with ``split_out=True`` (reduced input, full
    18/20-plane output: the same collide + per-colour streaming).

    ``substeps`` > 1 applies that many full collide-stream-BC sweeps per
    slab pass — communication-avoiding temporal blocking (one HBM
    round-trip / one ICI exchange per ``substeps`` steps).  Each sweep
    consumes 3 halo rows (2 for the 5x5 gradients + 1 for streaming) in
    perturbation mode and 5 in CSF mode (the chained curvature
    stencils), so ``substeps <= halo // rows_per_sweep``; the kept
    interior never reads a wall-stale halo row because the bounce-back
    masks and the replicate-pad gradient extractions cut every
    cross-wall dependency on every sweep (same validity argument as
    kernels.thermal_pallas).  In CSF mode the fst carry is threaded
    sweep-to-sweep (sweep k+1's carried-u shift uses sweep k's force,
    exactly the jnp model's dataflow)."""
    csf = surface_tension == "csf"
    rows_per_sweep = 5 if csf else 3
    if not 1 <= substeps <= halo // rows_per_sweep:
        raise ValueError(
            f"substeps must be in [1, {halo // rows_per_sweep}] "
            f"({rows_per_sweep} halo rows/sweep, halo={halo})")
    if split_out and (reduced or substeps != 1):
        raise ValueError("split_out takes the reduced layout in and "
                         "supports substeps=1")
    collide = _make_collide(red, blue, sigma, gravity, delta,
                            apply_gravity_source, R, C, dtype,
                            surface_tension=surface_tension,
                            _ablate=_ablate)
    reduced_in = reduced or split_out
    skip_bc = "bc" in _ablate

    def macros(block):
        """(fsum, rho, r_rho, b_rho, fst) from either state layout."""
        if reduced_in:
            fsum = [block[k] for k in range(9)]
            rho = fsum[0]
            for k in range(1, 9):
                rho = rho + fsum[k]
            r_rho = block[9]
            b_rho = rho - r_rho
            fst = (block[10], block[11]) if csf else None
        else:
            rf = [block[k] for k in range(9)]
            bf = [block[9 + k] for k in range(9)]
            r_rho, b_rho = rf[0], bf[0]
            for k in range(1, 9):
                r_rho = r_rho + rf[k]
                b_rho = b_rho + bf[k]
            rho = r_rho + b_rho
            fsum = [rf[k] + bf[k] for k in range(9)]
            fst = (block[18], block[19]) if csf else None
        return fsum, rho, r_rho, b_rho, fst

    def sweep(fsum, rho, r_rho, b_rho, fst, abs_iota, row_edges, col_iota):
        """One collide+stream; returns the next (fsum, rho, r_rho, b_rho,
        fst) in reduced form, or (new_r, new_b, fst) when materialising."""
        out = collide(fsum, rho, r_rho, b_rho, abs_iota,
                      row_edges=row_edges, fst=fst, col_iota=col_iota,
                      reduced=reduced)
        fst_new = out[2] if csf else None
        if "stream" in _ablate:  # measurement-only (NOT physics)
            if reduced:
                s = out[1][0]
                for k in range(1, 9):
                    s = s + out[1][k]
                return list(out[0]), s, fst_new
            return list(out[0]), list(out[1]), fst_new
        new_a = _stream_with_bcs(out[0], abs_iota, R, C,
                                 row_edges=row_edges, col_iota=col_iota,
                                 _skip_masks=skip_bc)
        if reduced:
            # the streamed red planes are only ever consumed through
            # their sum — fold streaming + sum into one accumulator
            new_b = _stream_sum_with_bcs(out[1], abs_iota, R, C,
                                         row_edges=row_edges,
                                         col_iota=col_iota,
                                         _skip_masks=skip_bc)
        else:
            new_b = _stream_with_bcs(out[1], abs_iota, R, C,
                                     row_edges=row_edges,
                                     col_iota=col_iota,
                                     _skip_masks=skip_bc)
        return new_a, new_b, fst_new

    def run(block, abs_iota, row_edges, col_iota=None):
        rows = block.shape[1]
        fsum, rho, r_rho, b_rho, fst = macros(block)
        new_a, new_b, fst_new = sweep(fsum, rho, r_rho, b_rho, fst,
                                      abs_iota, row_edges, col_iota)
        for _ in range(substeps - 1):
            if reduced:
                fsum = new_a
                rho = fsum[0]
                for k in range(1, 9):
                    rho = rho + fsum[k]
                r_rho = new_b   # already the streamed-red sum
                b_rho = rho - r_rho
            else:
                rf, bf = new_a, new_b
                r_rho, b_rho = rf[0], bf[0]
                for k in range(1, 9):
                    r_rho = r_rho + rf[k]
                    b_rho = b_rho + bf[k]
                rho = r_rho + b_rho
                fsum = [rf[k] + bf[k] for k in range(9)]
            new_a, new_b, fst_new = sweep(fsum, rho, r_rho, b_rho, fst_new,
                                          abs_iota, row_edges, col_iota)
        if reduced:
            # new_b IS the next red density (streamed-red sum)
            planes = new_a + [new_b]
        else:
            planes = new_a + new_b
        if csf:
            planes = planes + [fst_new[0], fst_new[1]]  # carried, unstreamed
        if col_iota is None:
            return jnp.stack([p[halo:rows - halo] for p in planes], axis=0)
        # 2-D sharded mode: drop the trailing combined column-halo tile
        # (interior lanes lead — kernels.sharded2d_pallas layout)
        width = planes[0].shape[1]
        return jnp.stack(
            [p[halo:rows - halo, 0:width - CHALO] for p in planes],
            axis=0)

    return run


def halo_for(substeps: int, rows_per_sweep: int) -> int:
    """Smallest 8-aligned slab halo admitting ``substeps`` sweeps that
    each consume ``rows_per_sweep`` halo rows."""
    return max(HALO, -(-substeps * rows_per_sweep // 8) * 8)


#: Measured wide-shape optima for the reduced colour-gradient kernels
#: (one v5e chip, 1024x512 f32, docs/BENCHMARKS.md "Multiphase
#: cadence/geometry optimum", round 4): family -> (substeps, block_rows).
#: Deep cadences only win at tall blocks — the auto-picked B=64 pays
#: (64+32)/64 = 1.5x redundant halo sweeps at halo=16 vs 1.125x at
#: B=256 (mrtcg ss=4: 3,766 at B=128 vs 4,574 at B=256); B=512 and
#: substeps=8 exceed the Mosaic scoped-VMEM temporaries ceiling
#: (~100 MB measured for the 12-plane CSF body at B=512).
_WIDE_OPT = {"perturbation": (5, 256), "csf": (4, 256)}


def default_geometry(surface_tension: str = "perturbation",
                     R: int | None = None,
                     C: int | None = None) -> tuple[int, int | None]:
    """Measured-optimal ``(substeps, block_rows)`` for the reduced
    colour-gradient kernels (_WIDE_OPT).  When ``R`` is given and does
    not admit the tall alias-free block (R % 256 != 0 or
    R < 256 + 2*halo), falls back to ``(2, None)`` — the round-3
    shallow-cadence default with the auto block pick.

    The optimum is WIDTH-dependent: it was measured at C=512, and at
    narrow grids the deep cadence LOSES — the round-5 sweep caught the
    width-blind pick regressing 2048x128 (mrtcg 3,443 at (5,256) vs
    4,899 at the shallow default; csf 2,480 vs 3,785), so when ``C``
    is given and < 512 the shallow fallback applies."""
    ss, B = _WIDE_OPT["csf" if surface_tension == "csf" else "perturbation"]
    if C is not None and C < 512:
        return 2, None
    if R is not None:
        halo = halo_for(ss, 5 if surface_tension == "csf" else 3)
        if R % B != 0 or R < B + 2 * halo:
            return 2, None
    return ss, B


def resolve_geometry(substeps, block_rows,
                     surface_tension: str = "perturbation",
                     R: int | None = None, C: int | None = None):
    """Resolve a factory ``(substeps, block_rows)`` pair:
    ``substeps="auto"`` opts into the measured wide-shape optimum
    (default_geometry — the cadence and the tall block are a COUPLED
    pick: deep cadences only pay at B=256 AND C >= 512), with an
    explicit ``block_rows`` always winning over the optimum's block.
    Integer ``substeps`` passes both through untouched."""
    if isinstance(substeps, str):
        if substeps != "auto":
            raise ValueError(
                f"substeps must be an int or 'auto', got {substeps!r}")
        ss, B = default_geometry(surface_tension, R=R, C=C)
        return ss, (block_rows if block_rows is not None else B)
    return substeps, block_rows


def _edge_gated(run, n_blocks: int, block_rows: int, reach: int):
    """Per-block body with the masked/mask-free edge gate: blocks whose
    kept interior can transitively read a global wall row within
    ``reach = substeps * rows_per_sweep`` rows run the masked body (the
    global-position masks are correct everywhere — the fast path is an
    optimisation worth ~19% per the module-docstring ablation); interior
    blocks take the mask-free path.  ``n_edge`` counts blocks whose
    reach-window [i*B - reach, (i+1)*B + reach) contains row 0 / R-1 —
    more than one block per side when reach >= B."""
    n_edge = reach // block_rows + 1

    def body(block, abs_iota, i):
        if n_blocks <= 2 * n_edge:
            return run(block, abs_iota, True)
        edge = (i < n_edge) | (i >= n_blocks - n_edge)
        return jax.lax.cond(
            edge,
            lambda b, a: run(b, a, True),
            lambda b, a: run(b, a, False),
            block, abs_iota)

    return body


def make_mrtcg_fused_step(R: int, C: int, red: ColourParams,
                          blue: ColourParams, sigma: float,
                          gravity=(0.0, 0.0), delta: float = 0.1,
                          apply_gravity_source: bool = True,
                          dtype=jnp.float32, block_rows: int | None = None,
                          substeps: int | str = 1,
                          interpret: bool = False):
    """Fused MRT-CG two-phase step: F (2, 9, R, C) -> (2, 9, R, C)
    (index 0 = red, 1 = blue), advanced ``substeps`` steps per launch
    (temporal blocking; the slab halo deepens to 3*substeps rows).
    Built on kernels.pipeline; the state is viewed as 18 planes for the
    block pipeline (a free reshape).  ``substeps="auto"`` opts into the
    measured wide-shape optimum (resolve_geometry)."""
    from .pipeline import make_block_pipeline, resolve_block_rows

    substeps, block_rows = resolve_geometry(substeps, block_rows,
                                            "perturbation", R, C)
    halo = halo_for(substeps, 3)
    block_rows = resolve_block_rows(
        (18,), 18, R, C, dtype, 6 * 2 ** 20, block_rows, False, halo=halo)
    n_blocks = R // block_rows

    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype, substeps=substeps,
                          halo=halo)
    body = _edge_gated(run, n_blocks, block_rows, 3 * substeps)

    step = make_block_pipeline(18, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=6 * 2 ** 20, halo=halo,
                               flops_per_cell=2000 * substeps,
                               interpret=interpret)

    def wrapped(F):
        return step(F.reshape(18, R, C)).reshape(2, 9, R, C)

    return wrapped


def make_csf_fused_step(R: int, C: int, red: ColourParams,
                        blue: ColourParams, sigma: float,
                        gravity=(0.0, 0.0), delta: float = 0.1,
                        apply_gravity_source: bool = True,
                        dtype=jnp.float32, block_rows: int | None = None,
                        substeps: int | str = 1,
                        interpret: bool = False):
    """Fused MRT-CSF two-phase step: S (20, R, C) -> (20, R, C) with
    S = [red f (9), blue f (9), fst (2)] — the CSF surface-force carry
    makes the fused step exactly the jnp model's dataflow (the carried u
    equals calc_u + 0.5 (Fg + fst_prev)/rho).  Validity: one sweep
    consumes 5 halo rows (4 for the chained curvature stencils + 1 for
    streaming); ``substeps`` sweeps deepen the halo to 5*substeps
    ("auto" opts into the measured wide-shape optimum)."""
    from .pipeline import make_block_pipeline, resolve_block_rows

    substeps, block_rows = resolve_geometry(substeps, block_rows, "csf",
                                            R, C)
    halo = halo_for(substeps, 5)
    # lift=False — CSF prefers the default-scope pick (see
    # _make_reduced_pipeline)
    block_rows = resolve_block_rows(
        (20,), 20, R, C, dtype, 6 * 2 ** 20, block_rows, False,
        lift=False, halo=halo)
    n_blocks = R // block_rows

    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype,
                          surface_tension="csf", substeps=substeps,
                          halo=halo)
    body = _edge_gated(run, n_blocks, block_rows, 5 * substeps)

    return make_block_pipeline(20, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=6 * 2 ** 20, halo=halo,
                               flops_per_cell=2600 * substeps,
                               interpret=interpret)


def reduce_mrtcg_state(F, surface_tension: str = "perturbation"):
    """Full state -> reduced state.

    Perturbation: F (2, 9, R, C) -> (10, R, C) = [red+blue populations,
    red density].  CSF: S (20, R, C) -> (12, R, C) (fst carried through).
    Exact (sums of the carried planes) — see make_mrtcg_body(reduced)."""
    if surface_tension == "csf":
        return jnp.concatenate(
            [F[:9] + F[9:18], F[:9].sum(0)[None], F[18:]], axis=0)
    return jnp.concatenate([F[0] + F[1], F[0].sum(0)[None]], axis=0)


def _make_reduced_pipeline(R, C, red, blue, sigma, gravity, delta,
                           apply_gravity_source, dtype, block_rows,
                           interpret, surface_tension, split_out,
                           substeps: int = 1,
                           _ablate: frozenset = frozenset(),
                           lift: bool = False):
    from .pipeline import make_block_pipeline, resolve_block_rows

    csf = surface_tension == "csf"
    rps = 5 if csf else 3
    halo = halo_for(substeps, rps)
    p_in = reduced_planes(surface_tension)
    p_out = (20 if csf else 18) if split_out else p_in
    # lift=False: both colour-gradient bodies measured FASTER at the
    # default-scope picks on the recorded bench harness (csf 3,785 at
    # B=128/16 MiB vs 3,208 lifted; mrtcg 4,957 at B=256/16 MiB vs
    # 4,677 lifted, 2048x128 — the short-window probe that preferred
    # the lift was within relay noise)
    block_rows = resolve_block_rows(
        (p_in,), p_out, R, C, dtype, 6 * 2 ** 20, block_rows, False,
        lift=lift, halo=halo)
    n_blocks = R // block_rows

    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype,
                          surface_tension=surface_tension,
                          reduced=not split_out, split_out=split_out,
                          substeps=substeps, halo=halo, _ablate=_ablate)
    body = _edge_gated(run, n_blocks, block_rows, rps * substeps)

    return make_block_pipeline(p_in, R, C, body, planes_out=p_out,
                               dtype=dtype, block_rows=block_rows,
                               vmem_budget=6 * 2 ** 20, halo=halo,
                               flops_per_cell=(2600 if csf else 2000)
                               * substeps,
                               interpret=interpret)


def make_mrtcg_reduced_step(R: int, C: int, red: ColourParams,
                            blue: ColourParams, sigma: float,
                            gravity=(0.0, 0.0), delta: float = 0.1,
                            apply_gravity_source: bool = True,
                            dtype=jnp.float32,
                            block_rows: int | None = None,
                            surface_tension: str = "perturbation",
                            substeps: int | str = 1,
                            interpret: bool = False,
                            _ablate: frozenset = frozenset(),
                            lift: bool = False):
    """Reduced-state fused MRT-CG step: G (10, R, C) -> (10, R, C)
    (12 planes in CSF mode, fst carried in planes 10-11), advanced
    ``substeps`` steps per launch (temporal blocking: one HBM round-trip
    per substeps steps; measured +13% at substeps=2, 1024x512 — the
    kernel is largely compute-bound, see the module docstring).  Same
    physics as make_mrtcg_fused_step on 10/18ths of the HBM traffic —
    the memory-optimal layout for long production runs; convert with
    reduce_mrtcg_state / make_mrtcg_split_step.  ``substeps="auto"``
    opts into the measured wide-shape optimum (resolve_geometry): the
    B=256 deep-cadence pick where R admits it, else (2, auto block)."""
    substeps, block_rows = resolve_geometry(substeps, block_rows,
                                            surface_tension, R, C)
    return _make_reduced_pipeline(
        R, C, red, blue, sigma, gravity, delta, apply_gravity_source,
        dtype, block_rows, interpret, surface_tension, split_out=False,
        substeps=substeps, _ablate=_ablate, lift=lift)


def make_mrtcg_reduced_lanes_step(R: int, C: int, red: ColourParams,
                                  blue: ColourParams, sigma: float,
                                  gravity=(0.0, 0.0), delta: float = 0.1,
                                  apply_gravity_source: bool = True,
                                  dtype=jnp.float32,
                                  block_rows: int | None = None,
                                  surface_tension: str = "perturbation",
                                  substeps: int = 1,
                                  lane_block: int = 256,
                                  interpret: bool = False):
    """LANE-BLOCKED reduced MRT-CG step — the ROADMAP candidate-3
    experiment (VERDICT r4 item 1): apply sharded2d's column-tiling idea
    INSIDE the single-chip kernel, so the ~50 port-binding full-width
    (B+2h, C) temporaries of the colour-gradient body shrink to
    (B+2h, lane_block+256) tiles.

    Same physics and state as make_mrtcg_reduced_step (the shared
    make_mrtcg_body in its global-column col_iota mode, which already
    carries the no-diagonal-offset column repair and the periodic
    gradient seams); per row block the body runs once per lane tile on
    an overlapping window [j*LB-128, (j+1)*LB+128) of wrapped global
    columns, keeping the middle LB lanes.  The 128-lane margins are the
    STRUCTURAL COST this experiment measures: Mosaic lane slices are
    128-granular, so any column tiling pays >= 256 redundant lanes per
    tile — overhead factor 1 + 256/LB (1.5x at LB=512, 2x at LB=256) —
    while the measured free-stencil ceiling of the full-width kernel is
    only ~1.3x above its optimum (docs/BENCHMARKS.md "Multiphase
    cadence/geometry optimum").  Margin validity: tile-seam garbage
    advances rows_per_sweep lanes per sweep, so substeps *
    rows_per_sweep <= 128 (never binding)."""
    from .pipeline import make_block_pipeline, resolve_block_rows

    csf = surface_tension == "csf"
    rps = 5 if csf else 3
    halo = halo_for(substeps, rps)
    p = reduced_planes(surface_tension)
    LB = lane_block
    if LB % 128 or C % LB:
        raise ValueError(f"lane_block must be a 128-multiple dividing C "
                         f"(lane_block={LB}, C={C})")
    if LB + 2 * CHALO > 2 * C:
        # the wrapped window is built from at most two contiguous lane
        # slices; margins may duplicate global columns (they hold valid
        # values and only the interior lanes are kept)
        raise ValueError(
            f"lane_block + 256 must be <= 2C ({LB + 256} > {2 * C})")
    block_rows = resolve_block_rows(
        (p,), p, R, C, dtype, 6 * 2 ** 20, block_rows, False,
        lift=False, halo=halo)
    n_blocks = R // block_rows
    run = make_mrtcg_body(R, C, red, blue, sigma, gravity, delta,
                          apply_gravity_source, dtype,
                          surface_tension=surface_tension, reduced=True,
                          substeps=substeps, halo=halo)

    def cyc_window(block, s, width):
        """Contiguous cyclic lane window [s, s+width) mod C as concat of
        128-aligned slices (s and C are 128-multiples)."""
        pieces, pos, rem = [], s, width
        while rem > 0:
            take = min(C - pos, rem)
            pieces.append(block[:, :, pos:pos + take])
            rem -= take
            pos = 0
        return pieces[0] if len(pieces) == 1 else \
            jnp.concatenate(pieces, axis=2)

    def lane_run(block, abs_iota, row_edges):
        rows = block.shape[1]
        width = LB + 2 * CHALO
        outs = []
        for j in range(C // LB):
            s = (j * LB - CHALO) % C
            tile = cyc_window(block, s, width)
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1) \
                + jnp.int32(s)
            ci = jax.lax.rem(ci, jnp.int32(C))
            o = run(tile, abs_iota[:, 0:width], row_edges, col_iota=ci)
            # the body's col_iota epilogue drops the trailing CHALO
            # lanes; the kept interior sits at [CHALO, CHALO + LB)
            outs.append(o[:, :, CHALO:CHALO + LB])
        return jnp.concatenate(outs, axis=2)

    body = _edge_gated(lane_run, n_blocks, block_rows, rps * substeps)
    # 4 MiB slab budget -> a taller scoped-VMEM request: the per-tile
    # bodies' temporaries STACK across the sequential tile loop
    # (measured 65 MB at B=256/LB=256 vs the 55 MB limit the 6 MiB
    # convention requests), so this factory needs the extra headroom
    return make_block_pipeline(p, R, C, body, dtype=dtype,
                               block_rows=block_rows,
                               vmem_budget=4 * 2 ** 20, halo=halo,
                               flops_per_cell=(2600 if csf else 2000)
                               * substeps * (1 + 2 * CHALO // LB),
                               interpret=interpret)


def make_mrtcg_split_step(R: int, C: int, red: ColourParams,
                          blue: ColourParams, sigma: float,
                          gravity=(0.0, 0.0), delta: float = 0.1,
                          apply_gravity_source: bool = True,
                          dtype=jnp.float32,
                          block_rows: int | None = None,
                          surface_tension: str = "perturbation",
                          interpret: bool = False):
    """One MRT-CG step that takes the REDUCED state and materialises the
    full per-colour populations: G (10, R, C) -> F (2, 9, R, C)
    ((12,..) -> (20, R, C) flat in CSF mode, fst last).  Running
    reduced_step T-1 times then this once equals the 18-plane fused step
    run T times (same collide, per-colour streaming on the last step)."""
    csf = surface_tension == "csf"
    step = _make_reduced_pipeline(
        R, C, red, blue, sigma, gravity, delta, apply_gravity_source,
        dtype, block_rows, interpret, surface_tension, split_out=True)
    if csf:
        return step

    def wrapped(G):
        return step(G).reshape(2, 9, R, C)

    return wrapped
