"""Test harness: force CPU with 8 virtual devices and enable float64.

The reference validates physics in double precision on a single GPU and
tests its domain decomposition fully in-process (SURVEY.md section 4); we
mirror that with x64 on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), which is how multi-chip sharding is
tested without hardware.
"""

import os

# The axon sitecustomize pins JAX_PLATFORMS=axon (single remote TPU); tests
# must run on the local CPU backend with virtual devices, so force-overwrite
# BEFORE jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the box has a single CPU core, so repeated
# pytest runs would otherwise pay every XLA compile again.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
