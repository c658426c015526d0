"""ULBM scene-level tests (short workloads; the reference's are 300k/10k
steps with no asserts, SURVEY.md section 4)."""

import numpy as np
import pytest

from lbm_tpu.scenes import ulbm


def test_ulbm_poiseuille_short():
    res = ulbm.ulbm_poiseuille(H=24, W=24, T=400, nu=1e-2, u_max=0.05)
    assert np.isfinite(np.asarray(res.f)).all()
    ux = np.asarray(res.m1[0])
    # pressure drop drives +x flow, fastest at mid-channel, zero-ish at walls
    mid = ux[12]
    assert mid[12] > 0
    # wall-adjacent cell is slowest (profile still developing at T=400,
    # so only monotonicity toward the centre is asserted)
    assert mid[12] > 3 * abs(mid[0])
    assert mid[12] > mid[1] and mid[12] > mid[-2]
