"""Double-single ("df64") arithmetic: f64-class precision from pairs of
f32 values, for running the reference's double-precision validation
gates ON the TPU (which has no native f64; SURVEY.md section 7 "hard
parts").

Each number is an unevaluated sum hi + lo with |lo| <= ulp(hi)/2,
carried as a (2, ...) stacked array.  The construction uses the classic
error-free transformations (Knuth two-sum, Dekker split/two-prod) — they
require EXACT f32 add/mul, which the TPU VPU provides for elementwise
ops (only dot_general lowers to bf16; none is used here).  Effective
precision ~2^-48, comfortably beyond the 1e-11 Poiseuille gate.

These are building blocks for validation-scale runs (the hot production
path stays plain f32): ~10-20x the flops of f32 per op, all VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splitting


#: EFT guard mode: None = auto-detect per backend (see _needs_guard),
#: True/False = force.  The guard is an optimization_barrier per EFT.
GUARD: bool | None = None

_GUARD_CACHE: dict[str, bool] = {}


def _needs_guard() -> bool:
    """Does the active backend's compiler fold ``x - (x - y) -> y``?

    Measured on the CPU backend: ``1.0 - ax`` through an unguarded
    _two_sum loses its lo correction entirely under jit (error jumps
    from 1e-16 to 3e-8, the f32 ulp) — XLA:CPU applies the
    real-arithmetic rewrite when a constant exposes the pattern.  The
    guard barriers are cheap per-op but make LARGE df64 graphs (the KBC
    channel step is ~1000 DD ops) explode the TPU Mosaic/XLA compile
    (a barriered 2-step graph never finished compiling in 9 min vs
    11 s for 1 step), so they are paid only where the canary below
    proves the backend needs them."""
    import jax

    backend = jax.default_backend()
    hit = _GUARD_CACHE.get(backend)
    if hit is None:
        def probe(b):
            s = jnp.float32(1.0) + b
            bb = s - jnp.float32(1.0)
            err = (jnp.float32(1.0) - (s - bb)) + (b - bb)
            return s, err

        b = jnp.float32(-(1.0 / 3.0 + 1e-9))
        try:
            se, ee = probe(b)
            sj, ej = jax.jit(probe)(b)
            hit = not (float(ee) == float(ej) and float(se) == float(sj))
        except Exception:
            # called under an ambient trace (float() on a tracer): be
            # conservative NOW but do not cache — an eager
            # resolve_guard() can still settle it properly
            return True
        _GUARD_CACHE[backend] = hit
    return hit


def resolve_guard() -> bool:
    """Resolve the auto EFT guard for the active backend NOW (outside
    any trace).  Scenes call this before jitting large df64 graphs so
    the canary runs eagerly; under a trace the auto mode conservatively
    guards."""
    return GUARD if GUARD is not None else _needs_guard()


def _ob(x):
    """Block XLA's real-arithmetic simplifier inside the EFTs (see
    _needs_guard): one optimization_barrier on the rounded intermediate
    breaks the structural match — the two ``x`` operands of the
    ``x - (x - y)`` pattern are no longer the same node."""
    guard = GUARD if GUARD is not None else _needs_guard()
    return lax.optimization_barrier(x) if guard else x


def dd(hi, lo=None):
    """Pack hi (+ optional lo) into a (2, ...) df64 value."""
    hi = jnp.asarray(hi, jnp.float32)
    lo = jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32)
    return jnp.stack([hi, lo])


def from_f64(x):
    """Split a float64 (numpy/python) value into df64 exactly."""
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = np.asarray(x, np.float32)
    lo = np.asarray(x - hi.astype(np.float64), np.float32)
    return dd(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(a):
    """Read back as float64 (host-side, for gates)."""
    import numpy as np

    return np.asarray(a[0], np.float64) + np.asarray(a[1], np.float64)


def _two_sum(a, b):
    s = a + b
    bb = _ob(s) - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    return s, b - (_ob(s) - a)


def _split(a):
    t = _SPLITTER * a
    hi = t - (_ob(t) - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def add(a, b):
    s, e = _two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    hi, lo = _quick_two_sum(s, e)
    return jnp.stack([hi, lo])


def sub(a, b):
    return add(a, neg(b))


def neg(a):
    return -a


def mul(a, b):
    p, e = _two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    hi, lo = _quick_two_sum(p, e)
    return jnp.stack([hi, lo])


def scale(a, s: float):
    """Multiply by an exactly-representable f32 scalar."""
    return mul(a, dd(jnp.full_like(a[0], jnp.float32(s))))


def div(a, b):
    # one Newton refinement on the f32 quotient: q1 = a/b;
    # r = a - q1*b (df64-exact); q = q1 + r/b
    q1 = a[0] / b[0]
    r = sub(a, mul(dd(q1), b))
    q2 = r[0] / b[0]
    hi, lo = _quick_two_sum(q1, q2)
    return jnp.stack([hi, lo])


def sqrt(a):
    """One Newton refinement on the f32 root (a >= 0; exact 0 at a == 0)."""
    s1 = jnp.sqrt(a[0])
    r = sub(a, mul(dd(s1), dd(s1)))
    s2 = jnp.where(s1 > 0.0, r[0] / (2.0 * s1), jnp.zeros_like(s1))
    hi, lo = _quick_two_sum(s1, s2)
    return jnp.stack([hi, lo])


def where(mask, a, b):
    """Elementwise select on df64 pairs (mask is a plain bool array)."""
    return jnp.where(mask[None], a, b)


def const(value, shape):
    """A df64 constant field from a python/numpy f64 scalar."""
    import numpy as np

    hi = jnp.float32(np.float64(value))
    lo = jnp.float32(np.float64(value) - np.float64(np.float32(value)))
    return jnp.stack([jnp.full(shape, hi), jnp.full(shape, lo)])


class DD:
    """Operator-overloaded df64 value: wraps a (2, ...) hi/lo pair so
    f64-class algebra reads like plain arithmetic.  Lets long collision
    polynomials (models.kbc_df64) be near-verbatim transcriptions of
    their f32/f64 originals — each `+`/`-`/`*`/`/` lowers to the
    error-free-transformation ops above; python scalars are split
    EXACTLY into hi+lo pairs (so 1/3-class constants keep f64 precision,
    unlike ``scale`` which truncates to f32)."""

    __slots__ = ("v",)
    __array_priority__ = 100  # beat ndarray reflected ops

    def __init__(self, v):
        self.v = v

    @property
    def hi(self):
        return self.v[0]

    @classmethod
    def of(cls, x):
        """Wrap a scalar/array: DD passes through, python/numpy floats
        split exactly, f32 arrays get a zero lo part."""
        if isinstance(x, DD):
            return x
        if isinstance(x, (int, float)):
            import numpy as np

            x64 = np.float64(x)
            hi = jnp.float32(x64)
            lo = jnp.float32(x64 - np.float64(np.float32(x64)))
            return cls(jnp.stack([jnp.asarray(hi), jnp.asarray(lo)]))
        return cls(dd(x))

    def __add__(self, o):
        return DD(add(self.v, DD.of(o).v))

    __radd__ = __add__

    def __sub__(self, o):
        return DD(add(self.v, -DD.of(o).v))

    def __rsub__(self, o):
        return DD(add(DD.of(o).v, -self.v))

    def __mul__(self, o):
        return DD(mul(self.v, DD.of(o).v))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return DD(div(self.v, DD.of(o).v))

    def __rtruediv__(self, o):
        return DD(div(DD.of(o).v, self.v))

    def __neg__(self):
        return DD(-self.v)

    def __getitem__(self, key):
        """Slice the trailing (grid) axes; the hi/lo axis is internal."""
        if not isinstance(key, tuple):
            key = (key,)
        return DD(self.v[(slice(None),) + key])

    def clip(self, lo: float, hi: float):
        """Clamp by the hi part (a stabiliser clamp, not an EFT op: at
        the boundary the value snaps to the exact f32 bound)."""
        import jax.numpy as _jnp

        lo32, hi32 = _jnp.float32(lo), _jnp.float32(hi)
        below = self.v[0] < lo32
        above = self.v[0] > hi32
        out_hi = _jnp.where(below, lo32, _jnp.where(above, hi32, self.v[0]))
        out_lo = _jnp.where(below | above, _jnp.zeros_like(self.v[1]),
                            self.v[1])
        return DD(_jnp.stack([out_hi, out_lo]))
