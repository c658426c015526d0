"""Single-phase BGK step builder.

Composes the reference's exact step ordering (SURVEY.md section 0):

    macroscopics -> equilibrium -> BGK collide (+ optional Guo force)
    -> pre-stream BCs on f_coll -> fully periodic stream
    -> post-stream wall BCs overwrite f_adve from f_coll

Call stack parity: /root/reference/test/horizontal_poiseuille_test.cpp:128-152.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import d2q9
from ..utils.xmath import default_float

PreStreamBC = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
PostStreamBC = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class SinglePhaseModel:
    """A configurable BGK step.

    Attributes:
      omega: BGK relaxation rate (1/tau).
      incompressible: use the linearised equilibrium and momentum (not u)
        as the advected velocity, as in the horizontal Poiseuille driver.
      force: optional (2,) body-force density; applied as a velocity shift
        u += force (reference's gravity treatment,
        test/gravity_test.cpp:146) plus a Guo source on f_coll (:154).
      pre_stream_bcs: edits to f_coll before streaming (pressure BCs).
      post_stream_bcs: wall rules overwriting f_adve from f_coll.
      collision: optional (f, f_eq) -> f_coll override of the BGK
        relaxation (e.g. models.trt.trt_collision); omega is still used
        by the Guo source prefactor when a force is set.
    """

    omega: float
    incompressible: bool = False
    collision: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None
    force: Optional[tuple[float, float]] = None
    # Guo-source coefficients; the reference's gravity driver uses the
    # 9x-weaker (1/3, 1/9) variant (gravity_test.cpp:81-82,154).
    guo_coeffs: tuple[float, float] = (1.0 / 3.0, 1.0 / 9.0)
    pre_stream_bcs: Sequence[PreStreamBC] = field(default_factory=tuple)
    post_stream_bcs: Sequence[PostStreamBC] = field(default_factory=tuple)

    def macroscopics(self, f: jnp.ndarray):
        rho = d2q9.calc_rho(f)
        u = d2q9.calc_momentum(f) if self.incompressible else d2q9.calc_u(f, rho)
        return rho, u

    def eq(self, u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
        if self.incompressible:
            return d2q9.incomp_equilibrium(u, rho)
        return d2q9.equilibrium(u, rho)

    def step(self, f_adve: jnp.ndarray) -> jnp.ndarray:
        rho, u = self.macroscopics(f_adve)
        if self.force is not None:
            fg = jnp.asarray(self.force, dtype=f_adve.dtype)
            u = u + fg[:, None, None]
        f_equi = self.eq(u, rho)
        if self.collision is not None:
            f_coll = self.collision(f_adve, f_equi)
        else:
            f_coll = d2q9.bgk_collision(f_adve, f_equi, self.omega)
        if self.force is not None:
            f_coll = f_coll + d2q9.guo_source(
                u, fg, self.omega, ics2=self.guo_coeffs[0], ics4=self.guo_coeffs[1])
        for bc in self.pre_stream_bcs:
            f_coll = bc(f_coll, f_equi, u, rho)
        f_new = d2q9.stream(f_coll)
        for bc in self.post_stream_bcs:
            f_new = bc(f_new, f_coll)
        return f_new

    def init(self, R: int, C: int, dtype=None, rho0: float = 1.0,
             u0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dtype = default_float(dtype)
        rho = jnp.full((R, C), rho0, dtype=dtype)
        u = jnp.zeros((2, R, C), dtype=dtype) if u0 is None else u0.astype(dtype)
        return self.eq(u, rho)

    def run_chunk(self, f: jnp.ndarray, n: int) -> jnp.ndarray:
        """n jitted steps via fori_loop (one trace regardless of n)."""
        return jax.lax.fori_loop(0, n, lambda _, x: self.step(x), f)
