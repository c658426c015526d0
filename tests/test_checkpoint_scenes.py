"""Uniform checkpoint/resume across scene families (VERDICT r2 item 6).

Pattern (mirrors tests/test_thermal.py::test_checkpoint_resume_roundtrip):
run interrupted at T1 with a checkpoint directory, re-invoke to the full T
with the same directory — the resumed run restores the newest checkpoint
and must be BIT-identical to the uninterrupted run (each step is the same
jitted pure function, so chunk boundaries don't matter).  The reference
has no restart path at all (SURVEY.md section 5.4).
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.scenes import obstacles, shan_chen, three_d, ulbm


def test_falling_cylinder_resume(tmp_path):
    """Moving-IBM rigid body: carry (f, cen, ub, Fh) AND the recorded
    trajectory survive the restart."""
    d = str(tmp_path / "ck")
    kw = dict(H=48, W=48, radius=5.0, center=(12.0, 24.0), rho_s=1.5,
              gravity=5e-5, record_every=10, fused=False,
              dtype=jnp.float64)
    ref = obstacles.falling_cylinder(T=100, **kw)
    obstacles.falling_cylinder(T=60, checkpoint_dir=d,
                               checkpoint_every=30, **kw)
    assert os.listdir(d), "no checkpoint written"
    res = obstacles.falling_cylinder(T=100, checkpoint_dir=d,
                                     checkpoint_every=30, **kw)
    np.testing.assert_array_equal(np.asarray(res.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(res.center),
                                  np.asarray(ref.center))
    np.testing.assert_array_equal(np.asarray(res.trajectory),
                                  np.asarray(ref.trajectory))


def test_shan_chen_resume(tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(H=32, W=16, G=-5.0, fused=False, dtype=jnp.float64)
    ref = shan_chen.sc_flat_interface(T=100, **kw)
    shan_chen.sc_flat_interface(T=60, checkpoint_dir=d,
                                checkpoint_every=30, **kw)
    res = shan_chen.sc_flat_interface(T=100, checkpoint_dir=d,
                                      checkpoint_every=30, **kw)
    np.testing.assert_array_equal(np.asarray(res.f), np.asarray(ref.f))
    assert res.p_jump == ref.p_jump


def test_three_d_resume(tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(N=8, tau=0.8, fused=False, dtype=jnp.float64)
    ref = three_d.taylor_green_3d(T=50, **kw)
    three_d.taylor_green_3d(T=30, checkpoint_dir=d,
                            checkpoint_every=10, **kw)
    res = three_d.taylor_green_3d(T=50, checkpoint_dir=d,
                                  checkpoint_every=10, **kw)
    np.testing.assert_array_equal(np.asarray(res.f), np.asarray(ref.f))
    assert res.l2 == ref.l2


def test_ulbm_poiseuille_resume(tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(H=12, W=12, fused=False, dtype=jnp.float64)
    ref = ulbm.ulbm_poiseuille(T=100, **kw)
    ulbm.ulbm_poiseuille(T=60, checkpoint_dir=d, checkpoint_every=30, **kw)
    res = ulbm.ulbm_poiseuille(T=100, checkpoint_dir=d,
                               checkpoint_every=30, **kw)
    np.testing.assert_array_equal(np.asarray(res.f), np.asarray(ref.f))


def test_cli_checkpoint_flags(tmp_path):
    """run.py surfaces --checkpoint-dir/--checkpoint-every/--resume;
    --resume fails fast on an empty directory and succeeds after a
    checkpointed run."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    d = str(tmp_path / "ck")
    base = [sys.executable, "-m", "lbm_tpu.run", "sc_phase_separation",
            "--x64", "--set", "H=16", "--set", "W=16", "--set",
            "fused=False", "--checkpoint-dir", d,
            "--checkpoint-every", "20"]
    r = subprocess.run(base + ["--set", "T=30", "--resume"],
                       capture_output=True, text=True, env=env)
    assert r.returncode != 0 and "no checkpoint" in r.stderr
    r = subprocess.run(base + ["--set", "T=30"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.listdir(d)
    r = subprocess.run(base + ["--set", "T=50", "--resume"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resumed" in r.stderr


def test_resume_requires_checkpoint_dir():
    from lbm_tpu import run as runner

    with pytest.raises(SystemExit):
        runner.main(["sc_phase_separation", "--resume"])
