"""Worker for the 2-process jax.distributed localhost test
(tests/test_multihost.py) — the exercised analog of the reference's
mtssrv network rendering (sched_remote.h:50-197, mtssrv.cpp:238-330).

Each process contributes 4 virtual CPU devices; the 8-device global mesh
runs the sharded sppm pass over DCN loopback. Usage:
  python tests/multihost_worker.py <coordinator> <process_id> <nprocs>
Prints "MULTIHOST_OK <mean>" from every process on success.
"""

import os
import sys

coordinator, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    _xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from gvpm_tpu.core.config import PhotonConfig  # noqa: E402
from gvpm_tpu.integrators import sppm  # noqa: E402
from gvpm_tpu.parallel import dist, mesh as meshmod  # noqa: E402
from tests.test_sppm import make_box_scene  # noqa: E402

cfg = PhotonConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                   surface_photons=8192, volume_photons=8192,
                   grid_hash_size=1 << 12, volume_samples=1,
                   grid_max_photons_per_cell=160)
scene = make_box_scene(w=16, h=16)
mesh = meshmod.make_mesh()          # all 8 global devices, 2 processes
r_vol = sppm.base_volume_radius(scene, cfg)
img = dist.render_pass_sharded(mesh, scene, cfg, "distance", 8192,
                               0, 0, 1.0, 1.0, r_vol)
# the output is globally sharded; reduce to a replicated scalar so every
# process can assert on it without addressing remote shards
mean = float(jnp.mean(img))
finite = bool(jnp.isfinite(jnp.asarray(mean)))
assert finite and mean > 0, (pid, mean)
print(f"MULTIHOST_OK {mean:.6f}", flush=True)
