"""Rectangle sedimentation scene (fluid + ADE scalar) sanity tests."""

import numpy as np
import pytest

from lbm_tpu.scenes.obstacles import rectangle_sedimentation


def test_sedimentation_short_run():
    res = rectangle_sedimentation(H=64, W=96, T=120, u_in=0.02,
                                  R23=-30, C28=50, C38=62, inlet_rows=16)
    assert np.isfinite(np.asarray(res.f)).all()
    assert np.isfinite(np.asarray(res.g)).all()
    C = np.asarray(res.C)
    # concentration enters near the bottom rows of the inlet and stays
    # non-negative-ish (ADE with ABB walls can slightly undershoot)
    assert C.max() > 1e-4
    assert C.min() > -1e-3
    # sediment plume exists downstream of the inlet in the bottom strip
    assert C[-16:, 1:20].mean() > C[:16, 1:20].mean()
    # fluid accelerates around the obstacle: flow within the constriction
    # (above the rectangle) is faster than the inlet speed
    uy = np.asarray(res.u[1] / res.rho)
    assert uy[:30, 55].mean() > 0.02
