"""Test configuration: force an 8-device virtual CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices (xla_force_host_platform_device_count), matching the
driver's dryrun_multichip contract.
"""

import os

# The environment presets JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run on the local virtual-device CPU backend — force, not default.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# persistent compile cache: this box is compile-bound (2 CPUs)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
