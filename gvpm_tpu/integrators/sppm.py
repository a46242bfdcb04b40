"""Progressive photon mapping with volumetric estimators (primal domain).

reference: SPPMIntegrator (photonmapper/sppm.cpp:161): per pass —
regenerate gather points, shoot photons/beams, build maps, run the
selected volume estimator, accumulate; APA (average-per-pass) radius
schedule scaleVolumeAPA (sppm.cpp:255, gvpm.cpp:181-215).

Structured as two stages so the multi-chip path can interleave an
all-gather of photon partitions between them (parallel/dist.py):

  shoot_photons(...)  -> flattened photon/beam SoA           (light pass)
  gather_images(...)  -> per-pixel radiance for a pixel slice (camera pass)

The whole pass is jitted: camera wavefront + light wavefront + hash-grid
builds + gathers fuse into a single XLA program per pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import PhotonConfig
from ..ops import hashgrid
from ..render import film
from . import estimators, gatherpoint, ptracer
from ..scene.types import Scene

VOLUME_ESTIMATORS = ("none", "distance", "bre", "beam1d",
                     "beam3d", "plane0d")

# kernel dimension per estimator -> APA radius exponent 1/dim; planes are
# 0D (no blur radius, no schedule)
# (reference: volume_utils.h:23-53 kernel-dimension helpers)
KERNEL_DIM = {"distance": 3, "bre": 2, "beam1d": 1, "beam3d": 3,
              "plane0d": 0}


def radius_ratio(it, alpha):
    """APA per-pass radius ratio after pass `it` (0-based):
    (k+alpha)/(k+1) with k = it+1 (gvpm.cpp:181-215)."""
    k = it + 1
    return (k + alpha) / (k + 1.0)


def base_volume_radius(scene: Scene, cfg: PhotonConfig):
    diag = float(jnp.linalg.norm(scene.medium_hi - scene.medium_lo))
    return 0.02 * diag * cfg.initial_scale_volume


def shoot_photons(scene: Scene, cfg: PhotonConfig, n_photons, key,
                  path_offset=None):
    """Light pass -> (photon dict, beam dict), flattened [S*P]/[S*P].
    path_offset: see ptracer.shoot (device-count-invariant sharding)."""
    lv, lbeams = ptracer.shoot(scene, cfg, n_photons, key,
                               path_offset=path_offset)
    pv, _ = ptracer.flatten_vertices(lv)
    photons = {f: getattr(pv, f) for f in pv.__dataclass_fields__}
    lb = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), lbeams)
    beams = dict(valid=lb.valid, o=lb.o, d=lb.d, length=lb.length,
                 alpha=lb.alpha, med=lb.med,
                 # shift caches (beam reconnection, gradient_gather)
                 parent_p=lb.parent_p, parent_type=lb.parent_type,
                 parent_wi=lb.parent_wi, parent_ns=lb.parent_ns,
                 parent_bsdf=lb.parent_bsdf, parent_med=lb.parent_med,
                 scatter_base=lb.scatter_base,
                 pdf_dir_base=lb.pdf_dir_base,
                 reconnectable=lb.reconnectable,
                 parent_idx=lb.parent_idx, at_origin=lb.at_origin)
    return photons, beams


def gather_images(scene: Scene, cfg: PhotonConfig, volume, photons, beams,
                  n_emitted, key_cam, key_gather, px, py,
                  surf_scale, vol_scale, r_vol_base,
                  emission_scale=1.0):
    """Camera pass over a pixel slice. Returns flat local image [n,3]
    indexed by lane (one lane per pixel in px/py order).

    emission_scale: weight of the directly-seen emission term — ring-
    pass callers (parallel.dist.render_pass_sharded_ring) gather the
    SAME camera paths against each photon partition in turn and pass
    1/n_steps so emission sums to exactly once."""
    n = px.shape[0]
    gps, cam_beams = gatherpoint.trace(scene, cfg, key_cam, px, py)
    # remap pixel ids to local lane ids so sharded slices stay local
    lane = jnp.arange(n, dtype=jnp.int32)
    pp = photons["p"]
    pv_dict = photons

    out = jnp.zeros((n, 3))

    # ---- surface gather (8-stencil: cell = 2*max radius) ----
    r_surf = gps.radius * surf_scale
    surf_valid = (photons["vtype"] == ptracer.VERT_SURFACE)
    cell_surf = 2.0 * jnp.maximum(
        jnp.max(jnp.where(gps.valid, r_surf, 0.0)), 1e-5)
    grid_s = hashgrid.build(pp, surf_valid, scene.world_lo, cell_surf,
                            hash_size=cfg.grid_hash_size)
    gps_scaled = gps.replace(radius=r_surf)
    L_surf = estimators.surface_gather(
        scene, gps_scaled, grid_s, pp, pv_dict, n_emitted, 1.0,
        max_per_cell=cfg.grid_max_photons_per_cell, stencil=8)
    out = out + L_surf + emission_scale * gps.emission

    # ---- volume estimator ----
    if volume != "none":
        cb = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), cam_beams)
        lane_grid = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :],
            cam_beams.valid.shape).reshape(-1)
        cb_dict = dict(valid=cb.valid, o=cb.o, d=cb.d, length=cb.length,
                       med=cb.med, thr=cb.thr, pixel=lane_grid)
        # compact: valid medium segments first, fixed per-pixel budget
        # (most segment slots are empty — skip their gather work)
        budget = min(cb.valid.shape[0],
                     n * cfg.vol_segments_per_pixel)
        order = jnp.argsort(~cb.valid)[:budget]
        cb_dict = {kk: vv[order] for kk, vv in cb_dict.items()}
        r_vol = r_vol_base * vol_scale
        if volume == "distance":
            med_valid = (photons["vtype"] == ptracer.VERT_MEDIUM)
            grid_v = hashgrid.build(pp, med_valid, scene.medium_lo,
                                    2.0 * r_vol,
                                    hash_size=cfg.grid_hash_size)
            Lv, pix = estimators.volume_distance_gather(
                scene, cb_dict, grid_v, pp, pv_dict, n_emitted, r_vol,
                key_gather, n_samples=cfg.volume_samples,
                max_per_cell=cfg.grid_max_photons_per_cell, stencil=8)
        elif volume == "bre":
            med_valid = (photons["vtype"] == ptracer.VERT_MEDIUM)
            grid_v = hashgrid.build(pp, med_valid, scene.medium_lo,
                                    2.0 * r_vol,
                                    hash_size=cfg.grid_hash_size)
            pr = None
            if cfg.bre_knn > 0:
                # per-photon radii from kNN density (bre.cpp:29-93)
                pr = estimators.knn_radii(
                    grid_v, pp, med_valid, r_vol, cfg.bre_knn,
                    max_per_cell=cfg.grid_max_photons_per_cell)
            Lv, pix = estimators.bre_gather(
                scene, cb_dict, grid_v, pp, pv_dict, n_emitted, r_vol,
                max_per_cell=cfg.grid_max_photons_per_cell, pr=pr)
        elif volume == "beam1d":
            Lv, pix = estimators.beam_beam_gather(
                scene, cb_dict, beams, n_emitted, r_vol_base * vol_scale,
                tile=cfg.beam_tile)
        elif volume == "beam3d":
            Lv, pix = estimators.beam_point_gather(
                scene, cb_dict, beams, n_emitted, r_vol_base * vol_scale,
                key_gather, n_samples=cfg.volume_samples,
                tile=cfg.beam_tile)
        elif volume == "plane0d":
            planes = estimators.make_planes(scene, beams, key_gather)
            Lv, pix = estimators.plane_gather(
                scene, cb_dict, planes, n_emitted, tile=cfg.beam_tile)
        else:
            raise ValueError(volume)
        out = out.at[pix].add(
            jnp.where(cb_dict["valid"][..., None], Lv, 0.0), mode="drop")
    del lane
    return out


@functools.partial(jax.jit,
                   static_argnames=("cfg", "volume", "n_photons"))
def render_pass(scene: Scene, cfg: PhotonConfig, volume, n_photons,
                seed, it, surf_scale, vol_scale, r_vol_base):
    """Single-device progressive pass; returns pass image [H,W,3]."""
    H, W = scene.height, scene.width
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_gather = rng.pass_key(seed, it, rng.STREAM_GATHER)

    photons, beams = shoot_photons(scene, cfg, n_photons, k_light)

    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    img = gather_images(scene, cfg, volume, photons, beams, n_photons,
                        k_cam, k_gather, px, py,
                        surf_scale, vol_scale, r_vol_base)
    return img.reshape(H, W, 3)


def render(scene: Scene, cfg: PhotonConfig = PhotonConfig(),
           volume="distance", seed=0, passes=None, callback=None,
           checkpoint_path=None, checkpoint_every=10):
    """Progressive APA render loop (host driver).

    Returns dict(image=[H,W,3] averaged, passes=n). checkpoint_path:
    atomic NPZ save every `checkpoint_every` passes + resume (see
    gvpm.render).
    """
    from ..utils import checkpoint as ckpt
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = max(cfg.volume_photons, cfg.surface_photons)
    r_vol_base = base_volume_radius(scene, cfg)
    dim = KERNEL_DIM.get(volume, 3)

    accum = jnp.zeros((scene.height, scene.width, 3))
    surf_scale, vol_scale = 1.0, 1.0
    it0 = 0
    if checkpoint_path:
        state = ckpt.load(checkpoint_path)
        if state is not None:
            it0, bufs, scal = state
            it0 += 1
            accum = jnp.asarray(bufs["accum"])
            surf_scale = scal["surf_scale"]
            vol_scale = scal["vol_scale"]
    for it in range(it0, n_passes):
        img = render_pass(scene, cfg, volume, n_photons, seed, it,
                          surf_scale, vol_scale, r_vol_base)
        accum = accum + img
        # APA radius reduction AFTER the pass (gvpm.cpp:875,983,1078)
        ratio = radius_ratio(it, cfg.alpha)
        surf_scale *= ratio ** 0.5
        if dim > 0:
            vol_scale *= ratio ** (1.0 / dim)
        if checkpoint_path and ((it + 1) % checkpoint_every == 0
                                or it == n_passes - 1):
            ckpt.save(checkpoint_path, it, dict(accum=accum),
                      dict(surf_scale=surf_scale, vol_scale=vol_scale))
        if callback is not None:
            callback(it, accum / (it + 1))
    return dict(image=accum / n_passes, passes=n_passes)
