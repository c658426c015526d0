"""Config-driven scene runner CLI.

The reference builds one standalone C++ executable per study case
(CMakeLists.txt:84-177), each with its own main().  Here every scenario is a
registered scene behind one CLI:

    python -m lbm_tpu.run <scene> [--config cfg.toml] [--set key=value ...]
           [--out prefix] [--profile dir] [--x64] [--yes]

`--set` overrides any scene keyword (ints/floats/bools parsed as python
literals).  Results and recorded snapshots are written as .npy files under
--out.  `--yes` exists for parity with the reference's interactive
continue gate (src/utils.cpp:7-19) and is the default.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import sys

from .utils.observe import confirm, logger, profile

SCENES = {}


def _register_all():
    from .scenes import cavity, channel, multiphase, obstacles, \
        shan_chen, thermal, three_d, ulbm

    SCENES.update({
        "horizontal_poiseuille": channel.horizontal_poiseuille,
        "vertical_poiseuille": channel.vertical_poiseuille,
        "gravity_channel": channel.gravity_channel,
        "specular_channel": channel.specular_channel,
        "trt_poiseuille": channel.trt_poiseuille,
        "power_law_channel": channel.power_law_channel,
        "free_stream": channel.free_stream,
        "ulbm_poiseuille": ulbm.ulbm_poiseuille,
        "ulbm_double_shear": ulbm.ulbm_double_shear,
        "les_double_shear": ulbm.les_double_shear,
        # df64 precision surface: f64-class runs ON the TPU (the
        # published recommendation of the long-horizon error budget,
        # docs/BENCHMARKS.md — the f32 watcher floors at ~1.3e-6; these
        # reach the reference's 1e-10-class criteria on chip)
        "horizontal_poiseuille_df64": channel.horizontal_poiseuille_df64,
        "ulbm_poiseuille_df64": ulbm.ulbm_poiseuille_df64,
        "mrtcg_static_droplet_df64": multiphase.mrtcg_static_droplet_df64,
        "mrtcg_static_droplet": multiphase.mrtcg_static_droplet,
        "mrtcg_rayleigh_taylor": multiphase.mrtcg_rayleigh_taylor,
        "mrtcg_multimode_rayleigh_taylor":
            multiphase.mrtcg_multimode_rayleigh_taylor,
        "mrt_csf_rayleigh_taylor": multiphase.mrt_csf_rayleigh_taylor,
        "rk_static_droplet": multiphase.rk_static_droplet,
        "csf_static_droplet": multiphase.csf_static_droplet,
        "rk_rayleigh_taylor": multiphase.rk_rayleigh_taylor,
        "cylinder_flow": obstacles.cylinder_flow,
        "rectangle_sedimentation": obstacles.rectangle_sedimentation,
        "falling_cylinder": obstacles.falling_cylinder,
        "falling_cylinders": obstacles.falling_cylinders,
        "falling_ellipse": obstacles.falling_ellipse,
        "ring_cavity": cavity.ring_cavity,
        "rayleigh_benard": thermal.rayleigh_benard,
        "heated_cavity": thermal.heated_cavity,
        "sc_phase_separation": shan_chen.sc_phase_separation,
        "sc_static_droplet": shan_chen.sc_static_droplet,
        "sc_flat_interface": shan_chen.sc_flat_interface,
        "sc_cs_interface": shan_chen.sc_cs_interface,
        "poiseuille_3d": three_d.poiseuille_3d,
        "taylor_green_3d": three_d.taylor_green_3d,
        "lid_cavity_3d": three_d.lid_cavity_3d,
    })


def _save_result(out: str, result) -> None:
    import numpy as np

    def save_array(name, arr):
        path = f"{out}-{name}.npy"
        np.save(path, np.asarray(arr))
        logger.info(f"wrote {path}")

    if dataclasses.is_dataclass(result):
        for fld in dataclasses.fields(result):
            val = getattr(result, fld.name)
            if fld.name == "snapshots" and isinstance(val, dict):
                for k, v in val.items():
                    if v is not None:
                        save_array(f"snap-{k}", v)
            elif hasattr(val, "shape"):
                save_array(fld.name, val)
            elif hasattr(val, "_fields") or dataclasses.is_dataclass(val):
                # nested states: flatten leaves
                import jax

                leaves, _ = jax.tree_util.tree_flatten(val)
                for i, leaf in enumerate(leaves):
                    save_array(f"{fld.name}{i}", leaf)


def _summarise(result) -> str:
    """One line of headline scalars from a scene result (drag, L2, step
    count, ...) so interactive runs end with numbers, not just 'finished'."""
    import numpy as np

    parts = []
    if dataclasses.is_dataclass(result):
        for fld in dataclasses.fields(result):
            val = getattr(result, fld.name)
            if isinstance(val, (int, float)):
                parts.append(f"{fld.name}={val:g}" if isinstance(val, float)
                             else f"{fld.name}={val}")
            elif hasattr(val, "shape") and getattr(val, "ndim", None) == 1 \
                    and val.shape[0] <= 4:
                vec = ", ".join(f"{float(x):.6g}" for x in np.asarray(val))
                parts.append(f"{fld.name}=({vec})")
    return "  ".join(parts) if parts else ""


def main(argv=None):
    _register_all()
    ap = argparse.ArgumentParser(
        prog="python -m lbm_tpu.run",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("scene", choices=sorted(SCENES))
    ap.add_argument("--config", help="TOML config (scenes that accept one)")
    ap.add_argument("--markers", help="IBM marker TOML (cylinder_flow), the "
                    "reference's second argv file (cylinder_test.cpp:27-28)")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="override a scene keyword, e.g. --set T=1000")
    ap.add_argument("--out", default=None, help="output prefix for .npy dumps")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable periodic checkpoint/resume (scenes that "
                    "support it): checkpoints land here, and a run started "
                    "with a non-empty dir resumes from its newest checkpoint")
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    metavar="N", help="checkpoint cadence in steps")
    ap.add_argument("--resume", action="store_true",
                    help="require an existing checkpoint in --checkpoint-dir "
                    "(fail fast instead of silently starting fresh)")
    ap.add_argument("--profile", default=None, help="jax.profiler trace dir")
    ap.add_argument("--x64", action="store_true",
                    help="enable float64 (the reference's precision)")
    ap.add_argument("--yes", action="store_true", default=True,
                    help="skip the interactive confirmation gate (default)")
    ap.add_argument("--confirm", dest="yes", action="store_false",
                    help="ask before running (reference's behaviour)")
    args = ap.parse_args(argv)

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import inspect

    kwargs = {}
    params = inspect.signature(SCENES[args.scene]).parameters
    if args.config:
        if "config_path" in params:
            kwargs["config_path"] = args.config
        else:
            ap.error(f"scene {args.scene} does not take --config")
    if args.markers:
        if "markers_path" in params:
            kwargs["markers_path"] = args.markers
        else:
            ap.error(f"scene {args.scene} does not take --markers")
    if args.checkpoint_dir:
        if "checkpoint_dir" not in params:
            ap.error(f"scene {args.scene} does not support --checkpoint-dir")
        kwargs["checkpoint_dir"] = args.checkpoint_dir
        if args.checkpoint_every is not None:
            kwargs["checkpoint_every"] = args.checkpoint_every
        if args.resume:
            from .io.checkpoint import latest

            if latest(args.checkpoint_dir) is None:
                ap.error(f"--resume: no checkpoint found in "
                         f"{args.checkpoint_dir}")
    elif args.resume:
        ap.error("--resume requires --checkpoint-dir")
    for item in args.set:
        key, _, val = item.partition("=")
        try:
            kwargs[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            kwargs[key] = val

    if not confirm(args.yes):
        return 0

    scene = SCENES[args.scene]
    logger.info(f"scene {args.scene} kwargs={kwargs}")
    with profile(args.profile):
        result = scene(**kwargs)
    summary = _summarise(result)
    logger.info(f"scene finished  {summary}" if summary else "scene finished")
    if args.out:
        _save_result(args.out, result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
