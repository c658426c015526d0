"""D2Q9 lattice constants — single source of truth.

The reference (cristian-jfv/lattice-boltzmann-method) duplicates these
constants in nearly every translation unit (src/solver.cpp:12-21,
test/mrtcg_static_droplet.cpp:130-178, src/ulbm.hpp:29-40, ...).  Here they
live in exactly one place, as numpy arrays that jnp broadcasts for free.

Conventions (identical to the reference):
  * axis 0 of the grid is "x"/rows, axis 1 is "y"/cols.
  * velocity set, column k of the 2x9 matrix C (src/solver.cpp:18-21):
      c = [(0,0),(1,0),(0,1),(-1,0),(0,-1),(1,1),(-1,1),(-1,-1),(1,-1)]
  * opposite-direction pairs: (1,3), (2,4), (5,7), (6,8).
  * weights W = [4/9, 1/9 x4, 1/36 x4] (src/solver.cpp:12-16).
"""

from __future__ import annotations

import numpy as np

Q = 9

# Velocity set: row 0 = x-displacement (grid rows), row 1 = y (grid cols).
# cites /root/reference/src/solver.cpp:18-21
C = np.array(
    [
        [0, 1, 0, -1, 0, 1, -1, -1, 1],
        [0, 0, 1, 0, -1, 1, 1, -1, -1],
    ],
    dtype=np.int64,
)

# Quadrature weights.  cites /root/reference/src/solver.cpp:12-16
W = np.array(
    [4.0 / 9.0] + [1.0 / 9.0] * 4 + [1.0 / 36.0] * 4,
    dtype=np.float64,
)

# Opposite-direction permutation: OPP[k] is the direction with -c_k.
OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int64)

# Specular (free-slip) permutations.
#   SPEC_Y mirrors the y (cols) component: used on walls normal to cols.
#   cites /root/reference/test/specular_boundary_test.cpp:122-128
SPEC_Y = np.array([0, 1, 4, 3, 2, 8, 7, 6, 5], dtype=np.int64)
#   SPEC_X mirrors the x (rows) component: used on walls normal to rows.
#   cites /root/reference/test/rectangle_sedimentation_test.cpp:175-177
SPEC_X = np.array([0, 3, 2, 1, 4, 6, 5, 8, 7], dtype=np.int64)

# Lattice speed of sound squared.
CS2 = 1.0 / 3.0
ICS2 = 3.0
ICS4 = 9.0

# MRT moment matrix (Gram-Schmidt d2q9) and its exact inverse.
# cites /root/reference/test/mrtcg_static_droplet.cpp:130-156
M_MRT = np.array(
    [
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [-4.0, -1.0, -1.0, -1.0, -1.0, 2.0, 2.0, 2.0, 2.0],
        [4.0, -2.0, -2.0, -2.0, -2.0, 1.0, 1.0, 1.0, 1.0],
        [0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0],
        [0.0, -2.0, 0.0, 2.0, 0.0, 1.0, -1.0, -1.0, 1.0],
        [0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0],
        [0.0, 0.0, -2.0, 0.0, 2.0, 1.0, 1.0, -1.0, -1.0],
        [0.0, 1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, -1.0, 1.0, -1.0],
    ],
    dtype=np.float64,
)

MI_MRT = (1.0 / 36.0) * np.array(
    [
        [4.0, -4.0, 4.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [4.0, -1.0, -2.0, 6.0, -6.0, 0.0, 0.0, 9.0, 0.0],
        [4.0, -1.0, -2.0, 0.0, 0.0, 6.0, -6.0, -9.0, 0.0],
        [4.0, -1.0, -2.0, -6.0, 6.0, 0.0, 0.0, 9.0, 0.0],
        [4.0, -1.0, -2.0, 0.0, 0.0, -6.0, 6.0, -9.0, 0.0],
        [4.0, 2.0, 1.0, 6.0, 3.0, 6.0, 3.0, 0.0, 9.0],
        [4.0, 2.0, 1.0, -6.0, -3.0, 6.0, 3.0, 0.0, -9.0],
        [4.0, 2.0, 1.0, -6.0, -3.0, -6.0, -3.0, 0.0, 9.0],
        [4.0, 2.0, 1.0, 6.0, 3.0, -6.0, -3.0, 0.0, -9.0],
    ],
    dtype=np.float64,
)

# Colour-gradient perturbation constant vector B.
# cites /root/reference/test/mrtcg_static_droplet.cpp:158-163
B_CG = np.array(
    [-4.0 / 27.0] + [2.0 / 27.0] * 4 + [5.0 / 108.0] * 4,
    dtype=np.float64,
)

# Unit velocity set (diagonals scaled by 1/sqrt(2)).
# cites /root/reference/test/mrtcg_static_droplet.cpp:176-178
UNIT_C = C / np.array([1.0, 1.0, 1.0, 1.0, 1.0] + [np.sqrt(2.0)] * 4)

# L2-normalised velocity set (torch nn.functional.normalize over dim 0 maps
# the rest direction to 0).  cites /root/reference/src/rk.hpp:91-92
NORM_C = np.where(
    np.linalg.norm(C.astype(np.float64), axis=0, keepdims=True) > 0,
    C / np.maximum(np.linalg.norm(C.astype(np.float64), axis=0, keepdims=True), 1e-300),
    0.0,
)


# ---------------------------------------------------------------------------
# D2Q5 (scalar transport) — BEYOND THE REFERENCE
# ---------------------------------------------------------------------------
# A passive scalar (temperature, concentration) needs only the first five
# directions' moments; the D2Q5 sub-lattice (rest + 4 axis directions,
# w = [1/3, 1/6 x4], cs^2 = 1/3 like D2Q9) carries the same
# advection-diffusion physics with 5 populations instead of 9 — a 4-plane
# HBM-traffic cut per coupled fluid+scalar step.  Directions 1..4 reuse
# D2Q9's ordering (C[:, :5]); opposite pairs (1,3), (2,4).
W5 = np.array([1.0 / 3.0] + [1.0 / 6.0] * 4)
OPP5 = np.array([0, 3, 4, 1, 2], dtype=np.int64)
