"""Multi-direct-forcing immersed boundary method (IBM).

Re-designs src/ibm.cpp (/root/reference/src/ibm.cpp:15-191) for TPU: the
reference loops over markers on the host, doing a 16-point gather + spread
per marker per forcing iteration (ibm.cpp:169-183).  Markers are static, so
here every marker's 4x4 support box becomes a row of a precomputed
(M, 16) index table; interpolation is one batched gather + einsum and
spreading is one deterministic scatter-add — no host loops, fully jittable.

Peskin 4-point kernel (ibm.cpp:39-45):
    phi(r) = 1/8 (3 - 2r + sqrt(1 + 4r - 4r^2))   for |r| <= 1
           = 1/8 (5 - 2r - sqrt(-7 + 12r - 4r^2)) for 1 < |r| <= 2
           = 0 otherwise

Parity note: the reference pairs the x-fraction weights with the *column*
axis of the support box (its phi vector is laid out transposed relative to
the reshaped box — ibm.cpp:47-57 vs :171).  The default here pairs x-weights
with rows (the mathematically intended pairing); pass
``reference_transposed_weights=True`` to reproduce the reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def peskin4(r: np.ndarray) -> np.ndarray:
    """Peskin 4-point kernel, vectorised.  cites /root/reference/src/ibm.cpp:39-45"""
    r = np.abs(np.asarray(r, dtype=np.float64))
    inner = 0.125 * (3.0 - 2.0 * r + np.sqrt(np.maximum(1.0 + 4.0 * r - 4.0 * r * r, 0.0)))
    outer = 0.125 * (5.0 - 2.0 * r - np.sqrt(np.maximum(-7.0 + 12.0 * r - 4.0 * r * r, 0.0)))
    return np.where(r <= 1.0, inner, np.where(r <= 2.0, outer, 0.0))


@dataclass(frozen=True)
class IBM:
    """Static-marker immersed boundary with precomputed gather/scatter maps.

    Attributes:
      weights: (M, 16) kernel weights per marker support point.
      flat_idx: (M, 16) int32 indices into the flattened ROI grid.
      roi_rows / roi_cols: ROI slice bounds (absolute grid coordinates).
      roi_shape: (rows, cols) of the ROI.
      m_max: forcing iterations + 1 (reference default 5 -> 4 iterations,
             ibm.cpp:59-66, :166).
    """

    weights: jnp.ndarray
    flat_idx: jnp.ndarray
    spread: jnp.ndarray
    roi_rows: tuple[int, int]
    roi_cols: tuple[int, int]
    roi_shape: tuple[int, int]
    m_max: int = 5
    # separable per-axis kernel factors (the Peskin 4-point kernel is a
    # tensor product; the reference stores the two 4-vectors separately,
    # ibm.cpp:47-57): row_w/col_w are (M, 4) weights along rows/cols and
    # rows0/cols0 the absolute grid coordinate of each support box corner.
    row_w: np.ndarray | None = None
    col_w: np.ndarray | None = None
    rows0: np.ndarray | None = None
    cols0: np.ndarray | None = None

    @classmethod
    def from_markers(cls, xs, ys, m_max: int = 5,
                     reference_transposed_weights: bool = False) -> "IBM":
        """Build from absolute marker coordinates (x along rows, y along
        cols, matching the [name].x/[name].y TOML arrays, ibm.cpp:78-101)."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        # ROI bounds.  cites ibm.cpp:95-99
        r_min = int(np.floor(xs).min()) - 2
        r_max = int(np.floor(xs).max()) + 2
        c_min = int(np.floor(ys).min()) - 2
        c_max = int(np.floor(ys).max()) + 2
        roi_shape = (r_max - r_min + 1, c_max - c_min + 1)

        # ROI-relative marker positions (ibm.cpp:101)
        xr = xs - r_min
        yr = ys - c_min
        offs = np.arange(4, dtype=np.float64)
        # fractional distances to the 4 support nodes along each axis
        sx = xr[:, None] - (offs[None, :] + np.floor(xr)[:, None] - 1.0)  # (M,4)
        sy = yr[:, None] - (offs[None, :] + np.floor(yr)[:, None] - 1.0)
        wx = peskin4(sx)
        wy = peskin4(sy)
        if reference_transposed_weights:
            # reference pairing: x-weights along cols (ibm.cpp:47-57)
            w = (wy[:, :, None] * wx[:, None, :]).reshape(len(xs), 16)
        else:
            w = (wx[:, :, None] * wy[:, None, :]).reshape(len(xs), 16)

        rows0 = (np.floor(xr) - 1.0).astype(np.int64)  # (M,)
        cols0 = (np.floor(yr) - 1.0).astype(np.int64)
        rr = rows0[:, None] + np.arange(4)[None, :]  # (M,4)
        cc = cols0[:, None] + np.arange(4)[None, :]
        flat = (rr[:, :, None] * roi_shape[1] + cc[:, None, :]).reshape(len(xs), 16)
        # dense (roi_cells, M) interpolation/spreading operator: column j
        # holds marker j's 16 kernel weights at their flat ROI positions.
        # Interp and spread become two small matmuls (MXU) instead of a
        # batched gather + scatter-add (slow serial lowering on TPU).
        M = len(xs)
        S = np.zeros((roi_shape[0] * roi_shape[1], M), dtype=np.float64)
        np.add.at(S, (flat.ravel(), np.repeat(np.arange(M), 16)), w.ravel())
        if reference_transposed_weights:
            row_w, col_w = wy, wx
        else:
            row_w, col_w = wx, wy
        return cls(
            weights=jnp.asarray(w),
            flat_idx=jnp.asarray(flat, dtype=jnp.int32),
            spread=jnp.asarray(S),
            roi_rows=(r_min, r_max + 1),
            roi_cols=(c_min, c_max + 1),
            roi_shape=roi_shape,
            m_max=m_max,
            row_w=row_w,
            col_w=col_w,
            rows0=rows0 + r_min,
            cols0=cols0 + c_min,
        )

    @classmethod
    def from_toml(cls, path: str, name: str, **kw) -> "IBM":
        """Read marker coordinates from a TOML table [name] with x/y arrays,
        the schema the reference's ibm ctor expects (ibm.cpp:78-101; no such
        file ships with the reference, SURVEY.md section 5.6)."""
        import tomllib

        with open(path, "rb") as fh:
            tbl = tomllib.load(fh)
        return cls.from_markers(tbl[name]["x"], tbl[name]["y"], **kw)

    @classmethod
    def circle(cls, center_x: float, center_y: float, radius: float,
               n_markers: int, **kw) -> "IBM":
        """Convenience constructor for a cylinder boundary (the marker TOML
        the reference expects does not ship; SURVEY.md section 5.6)."""
        theta = np.linspace(0.0, 2.0 * np.pi, n_markers, endpoint=False)
        return cls.from_markers(
            center_x + radius * np.cos(theta),
            center_y + radius * np.sin(theta),
            **kw,
        )

    def aligned_window(self, R: int, C: int,
                       row_align: int = 8, col_align: int = 128):
        """Smallest (row_align x col_align)-aligned window [ra0, ra1) x
        [ca0, ca1) containing the ROI, or None if it does not fit the
        grid.  Tile-aligned windows make the fused forcing kernel's DMAs
        legal (Mosaic: 8-row offsets, 128-lane columns)."""
        r0, r1 = self.roi_rows
        c0, c1 = self.roi_cols
        ra0 = (r0 // row_align) * row_align
        ra1 = -(-r1 // row_align) * row_align
        ca0 = (c0 // col_align) * col_align
        ca1 = -(-c1 // col_align) * col_align
        if ra0 < 0 or ca0 < 0 or ra1 > R or ca1 > C:
            return None
        return ra0, ra1, ca0, ca1

    def window_operators(self, ra0: int, ra1: int, ca0: int, ca1: int,
                         m_pad: int = 128):
        """Dense separable interpolation/spreading factors on an aligned
        window: X (rw, m_pad) row weights and Y (cw, m_pad) col weights
        with markers padded to m_pad (zero columns).  interp(g) =
        colsum(X * (g @ Y)); spread(s) = (X * s) @ Y.T — two MXU matmuls,
        exactly the tensor-product Peskin weights (ibm.cpp:47-57)."""
        M = self.row_w.shape[0]
        if m_pad < M:
            raise ValueError(f"m_pad {m_pad} < n_markers {M}")
        X = np.zeros((ra1 - ra0, m_pad), np.float64)
        Y = np.zeros((ca1 - ca0, m_pad), np.float64)
        for j in range(M):
            X[self.rows0[j] - ra0:self.rows0[j] - ra0 + 4, j] = self.row_w[j]
            Y[self.cols0[j] - ca0:self.cols0[j] - ca0 + 4, j] = self.col_w[j]
        return X, Y

    def roi(self, field: jnp.ndarray) -> jnp.ndarray:
        """Slice a (..., R, C) grid field down to the ROI."""
        return field[..., self.roi_rows[0]:self.roi_rows[1],
                     self.roi_cols[0]:self.roi_cols[1]]

    def eulerian_force_density(self, u: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
        """Multi-direct-forcing force density over the ROI from FULL-GRID
        u, rho; see force_density_roi."""
        return self.force_density_roi(self.roi(u), self.roi(rho))

    def force_density_roi(self, u_roi: jnp.ndarray,
                          rho_roi: jnp.ndarray) -> jnp.ndarray:
        """Multi-direct-forcing force density over the ROI, shape
        (2, roi_r, roi_c), from ROI-sized u, rho.
        cites /root/reference/src/ibm.cpp:158-190:
          per iteration: interpolate u at markers, f_j = -2 rho_j u_j,
          spread back with the same weights, u += 0.5 F_n / rho.

        Interpolation (u_flat @ S) and spreading (f_j @ S^T) use the dense
        precomputed operator — two tiny MXU matmuls per iteration instead
        of a 16-point gather + scatter-add; precision pinned HIGHEST so the
        f32 path keeps full accumulation accuracy."""
        from ..utils.xmath import HIGHEST

        dtype = u_roi.dtype
        nflat = self.roi_shape[0] * self.roi_shape[1]
        S = self.spread.astype(dtype)
        rho_j = jnp.matmul(rho_roi.reshape(nflat), S, precision=HIGHEST)

        def body(_, carry):
            u_work, F_total = carry
            u_flat = u_work.reshape(2, nflat)
            u_j = jnp.matmul(u_flat, S, precision=HIGHEST)   # (2, M)
            f_j = -2.0 * rho_j[None] * u_j                   # (2, M)
            F_n = jnp.matmul(f_j, S.T, precision=HIGHEST)    # (2, nflat)
            F_n = F_n.reshape((2,) + self.roi_shape)
            u_work = u_work + 0.5 * F_n / rho_roi[None]
            return u_work, F_total + F_n

        init = (u_roi, jnp.zeros((2,) + self.roi_shape, dtype))
        _, F = jax.lax.fori_loop(0, self.m_max - 1, body, init)
        return F
