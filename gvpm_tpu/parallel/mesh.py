"""Device mesh management.

Replaces the reference's Scheduler/LocalWorker/RemoteWorker topology
(sched.h:354, sched_remote.h:50, mtssrv.cpp) with a jax.sharding.Mesh: the
work-unit queue disappears into SPMD — pixels shard over the mesh for
camera passes, light paths shard for shooting, photon partitions
all-gather over ICI, film slices live on their owning device.

One flat axis ("shards") is enough for the rendering workload: every
parallel quantity (pixels, photons) is embarrassingly divisible, and
collectives (all_gather of photons) ride a ring. Multi-host runs get the
same code via jax.distributed.initialize + all devices in the mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "shards"


def make_mesh(n_devices=None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def maybe_init_distributed():
    """jax.distributed.initialize when launched multi-host (the analog of
    `mitsuba -c hosts` / mtssrv, mitsuba.cpp:285-314). Safe no-op when
    single-process."""
    import os
    if "JAX_COORDINATOR_ADDRESS" in os.environ and \
            jax.process_count() == 1:
        jax.distributed.initialize()
