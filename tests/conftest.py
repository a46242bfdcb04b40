"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers and INITIALIZES the remote-TPU
(axon) backend at interpreter start, so JAX_PLATFORMS set in-process (or
even at launch) is ignored — the backend cache is already pinned. We
clear the backend cache and re-resolve onto the CPU platform with 8
virtual devices, matching the driver's dryrun_multichip contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

if jax._src.xla_bridge.backends_are_initialized():
    _xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8

jax.config.update("jax_threefry_partitionable", True)
# NO persistent compile cache: XLA:CPU AOT entries on this box load
# with machine-feature mismatches ("prefer-no-scatter ... could lead to
# SIGILL") and twice segfaulted mid-suite (round-4 post-mortem) —
# cold compiles are slower but deterministic


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
