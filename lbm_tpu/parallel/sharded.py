"""Sharded LBM steps: GSPMD (automatic) and shard_map (explicit) paths.

Two equivalent multi-chip formulations, both reproducing the reference's
in-process domain decomposition (decompose_domain.cpp, SURVEY.md 3.5) the
TPU way:

  * ``auto``: jit the *unchanged* single-device step with NamedSharding
    constraints — XLA's SPMD partitioner turns the streaming rolls into
    edge-width collective-permutes over ICI automatically.  This is the
    default production path.
  * ``shard_map``: explicit per-shard step with lax.ppermute halo exchange
    (parallel.halo), mirroring the reference's "bind the domains" edge
    copies.  Useful as the ground truth for the auto path and as the
    scaffold for Pallas-level RDMA kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..boundary import bc
from ..core import lattice as lat
from ..ops import d2q9
from . import halo
from .mesh import FIELD_SPEC


# ---------------------------------------------------------------------------
# GSPMD path
# ---------------------------------------------------------------------------

def auto_sharded(step_fn, mesh: Mesh):
    """Wrap a single-device step into a jitted n-step chunk whose state keeps
    whatever NamedSharding the caller committed it with (see
    ``mesh.shard_state``); XLA's SPMD partitioner inserts the halo
    collectives for the streaming rolls.  ``mesh`` is kept for API symmetry
    and future layout hints."""
    del mesh

    def stepped(state, n):
        return jax.lax.fori_loop(0, n, lambda _, s: step_fn(s), state)

    return jax.jit(stepped, static_argnums=1, donate_argnums=0)


# ---------------------------------------------------------------------------
# shard_map path
# ---------------------------------------------------------------------------

def stream_halo(f_coll: jnp.ndarray, x_axis: str = "x", y_axis: str = "y") -> jnp.ndarray:
    """Periodic streaming of a locally-sharded block: 1-wide halo exchange in
    both mesh axes, roll the padded block, keep the interior.

    Equivalent to the reference's advect + "bind the domains" copies
    (decompose_domain.cpp:159-187) in one pass."""
    padded = halo.halo_pad_2d(f_coll, width=1, x_axis=x_axis, y_axis=y_axis)
    planes = [
        jnp.roll(padded[k], shift=(int(lat.C[0, k]), int(lat.C[1, k])), axis=(0, 1))[1:-1, 1:-1]
        for k in range(lat.Q)
    ]
    return jnp.stack(planes, axis=0)


def make_periodic_bgk_step(mesh: Mesh, omega: float,
                           incompressible: bool = False):
    """Fully periodic BGK step under shard_map (doubly periodic scenes)."""

    def local_step(f):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f) if incompressible else d2q9.calc_u(f, rho)
        feq = (d2q9.incomp_equilibrium if incompressible else d2q9.equilibrium)(u, rho)
        f_coll = d2q9.bgk_collision(f, feq, omega)
        return stream_halo(f_coll)

    return shard_map(
        local_step, mesh=mesh, in_specs=FIELD_SPEC, out_specs=FIELD_SPEC
    )


def make_channel_bgk_step(mesh: Mesh, omega: float, rho_inlet: float,
                          rho_outlet: float):
    """The horizontal-Poiseuille step sharded over rows ('x'), cols local:
    incompressible BGK + coupled pressure BC across the row cut + no-slip
    column walls.  The cross-rank pressure coupling reproduces
    decompose_domain.cpp:50-73 (domain A's virtual inlet built from domain
    B's outlet line) via two point-to-point ppermutes."""

    def local_step(f):
        n = lax.axis_size("x")
        idx = lax.axis_index("x")
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f)
        f_equi = d2q9.incomp_equilibrium(u, rho)
        f_coll = d2q9.bgk_collision(f, f_equi, omega)

        # ---- coupled pressure BC (global rows 0 / -1 live on ranks 0 / n-1)
        # outlet line (global row -2) -> rank 0; inlet line (global row 1)
        # -> rank n-1.  Packets: [u(2), f_coll(9), f_equi(9)] stacked.
        # Full-ring permutes (every rank participates; only the target rank
        # uses the payload): partial source-target pairs can deadlock the
        # collective rendezvous on some backends.
        pkt_out = jnp.concatenate([u[:, -2], f_coll[:, -2], f_equi[:, -2]], axis=0)
        pkt_in = jnp.concatenate([u[:, 1], f_coll[:, 1], f_equi[:, 1]], axis=0)
        if n == 1:
            recv_out, recv_in = pkt_out, pkt_in
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            recv_out = lax.ppermute(pkt_out, "x", fwd)  # rank 0 gets n-1's
            recv_in = lax.ppermute(pkt_in, "x", bwd)    # rank n-1 gets 0's

        def virtual_line(pkt, rho_target):
            u_line, fc_line, fe_line = pkt[:2], pkt[2:11], pkt[11:20]
            w = jnp.asarray(lat.W, f.dtype)[:, None]
            c = jnp.asarray(lat.C, f.dtype)
            cu = jnp.tensordot(c.T, u_line, axes=([1], [0]),
                               precision=lax.Precision.HIGHEST)
            eq = (rho_target + 3.0 * cu) * w
            return eq + fc_line - fe_line

        vin = virtual_line(recv_out, rho_inlet)
        vout = virtual_line(recv_in, rho_outlet)
        f_coll = jnp.where(idx == 0, f_coll.at[:, 0].set(vin), f_coll)
        f_coll = jnp.where(idx == n - 1, f_coll.at[:, -1].set(vout), f_coll)

        # ---- stream with row-halo exchange (cols are local: wrap is exact)
        f_new = stream_halo(f_coll)

        # ---- no-slip column walls (cols unsharded -> every rank applies)
        f_new = bc.bounce_back(f_new, f_coll, "colN")
        f_new = bc.bounce_back(f_new, f_coll, "col0")
        return f_new

    return shard_map(
        local_step, mesh=mesh,
        in_specs=P(None, "x", None), out_specs=P(None, "x", None),
    )
