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

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splitting


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
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLITTER * a
    hi = t - (t - a)
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
