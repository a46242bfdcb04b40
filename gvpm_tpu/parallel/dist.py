"""Multi-chip SPPM: pixel-sharded gather + all-gathered photon partitions.

The mapping from the reference's parallel decomposition (SURVEY.md §2.8):

  Scheduler photon work-units  -> light paths sharded over mesh devices,
                                  deterministic per-shard fold_in keys
  photon map build (serial)    -> all_gather of photon partitions over
                                  ICI, grid built redundantly per device
                                  (build is cheap: one sort)
  BlockScheduler image blocks  -> pixel rows sharded over devices
  work-result accumulation     -> film slices stay device-local; pass
                                  accumulation is elementwise on the
                                  sharded film

Deterministic by construction: photon keys depend only on (seed, pass,
global path index), so any device count yields identical photons — the
TPU-native version of the reference's `deterministic` mode
(gvpm_proc.cpp:352-378).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import rng
from ..core.config import PhotonConfig
from ..integrators import sppm
from ..scene.types import Scene
from .mesh import AXIS


def render_pass_sharded(mesh, scene: Scene, cfg: PhotonConfig, volume,
                        n_photons, seed, it, surf_scale, vol_scale,
                        r_vol_base):
    """One progressive pass over the mesh; returns [H,W,3] (sharded rows).

    Requires H % n_devices == 0 and n_photons % n_devices == 0.
    """
    H, W = scene.height, scene.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0 and n_photons % n_dev == 0

    def body(scene_rep, seed_, it_, surf_s, vol_s, r_vol):
        me = lax.axis_index(AXIS)
        # ---- light pass: local photon partition, deterministic keys ----
        k_light = rng.pass_key(seed_[0], it_[0], rng.STREAM_LIGHT)
        k_light = jax.random.fold_in(k_light, me)
        photons, beams = sppm.shoot_photons(
            scene_rep, cfg, n_photons // n_dev, k_light)
        # ---- photon partitions ride ICI to every device ----
        photons = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), photons)
        beams = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), beams)
        # ---- camera pass: local pixel rows ----
        rows = H // n_dev
        y0 = me * rows
        py, px = jnp.mgrid[0:rows, 0:W]
        px = px.reshape(-1).astype(jnp.float32)
        py = (py + y0).reshape(-1).astype(jnp.float32)
        k_cam = jax.random.fold_in(
            rng.pass_key(seed_[0], it_[0], rng.STREAM_CAMERA), me)
        k_gather = jax.random.fold_in(
            rng.pass_key(seed_[0], it_[0], rng.STREAM_GATHER), me)
        img = sppm.gather_images(scene_rep, cfg, volume, photons, beams,
                                 n_photons, k_cam, k_gather, px, py,
                                 surf_s[0], vol_s[0], r_vol[0])
        return img.reshape(rows, W, 3)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P()),
                   out_specs=P(AXIS),
                   check_rep=False)
    args = (jnp.asarray([seed]), jnp.asarray([it]),
            jnp.asarray([surf_scale]), jnp.asarray([vol_scale]),
            jnp.asarray([r_vol_base]))
    return jax.jit(fn)(scene, *args)


def render(mesh, scene: Scene, cfg: PhotonConfig = PhotonConfig(),
           volume="distance", seed=0, passes=None):
    """Sharded progressive APA render (host driver)."""
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = max(cfg.volume_photons, cfg.surface_photons)
    n_dev = mesh.devices.size
    n_photons = ((n_photons + n_dev - 1) // n_dev) * n_dev
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    dim = sppm.KERNEL_DIM.get(volume, 3)

    accum = jnp.zeros((scene.height, scene.width, 3))
    surf_scale, vol_scale = 1.0, 1.0
    for it in range(n_passes):
        img = render_pass_sharded(mesh, scene, cfg, volume, n_photons,
                                  seed, it, surf_scale, vol_scale,
                                  r_vol_base)
        accum = accum + img
        ratio = sppm.radius_ratio(it, cfg.alpha)
        surf_scale *= ratio ** 0.5
        if dim > 0:
            vol_scale *= ratio ** (1.0 / dim)
    return dict(image=accum / n_passes, passes=n_passes)
