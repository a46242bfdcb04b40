"""Classic two-pass photon mapper + Knaus-style PPM.

reference: src/integrators/photonmapper/photonmapper.cpp (two-pass:
photon shoot -> per-pixel direct NEE + map estimate at the first
diffuse hit) and ppm.cpp (Knaus & Zwicker probabilistic PPM — the
progressive loop with the global alpha radius schedule; surface only).

TPU design: both reuse the SPPM wavefront machinery (gather points via
gatherpoint.trace, photons via sppm.shoot_photons, hash-grid surface
gather via estimators.surface_gather). The classic mapper separates
direct light (per-pixel NEE) from the indirect map estimate by photon
depth, matching the reference's direct/global split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import PhotonConfig
from ..core.math import coordinate_system, dot, to_local
from ..ops import hashgrid
from ..render.bsdf import eval_bsdf
from ..render.emitter import sample_direct
from ..render.visibility import segment_transmittance
from . import estimators, gatherpoint, ptracer, sppm
from ..scene.types import Scene


@functools.partial(jax.jit, static_argnames=("cfg", "n_photons",
                                             "direct_nee"))
def render_pass(scene: Scene, cfg: PhotonConfig, n_photons, seed, it,
                radius_scale, direct_nee=True):
    """One photon-mapping pass: NEE direct + indirect photon estimate
    (photons with >= 2 light bounces) at the first diffuse hit."""
    H, W = scene.height, scene.width
    n = H * W
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_nee = rng.pass_key(seed, it, rng.STREAM_NEE)

    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    gps, _ = gatherpoint.trace(scene, cfg, k_cam, px, py)

    photons, _ = sppm.shoot_photons(scene, cfg, n_photons, k_light)
    pp = photons["p"]

    # indirect: photons that bounced at least once since emission
    indirect = (photons["vtype"] == ptracer.VERT_SURFACE) \
        & (photons["depth"] >= 2)
    r_surf = gps.radius * radius_scale
    cell = 2.0 * jnp.maximum(jnp.max(jnp.where(gps.valid, r_surf, 0.0)),
                             1e-5)
    grid = hashgrid.build(pp, indirect, scene.world_lo, cell,
                          hash_size=cfg.grid_hash_size)
    L_ind = estimators.surface_gather(
        scene, gps.replace(radius=r_surf), grid, pp, photons, n_photons,
        1.0, max_per_cell=cfg.grid_max_photons_per_cell, stencil=8)

    # direct: one NEE sample at the gather point (photonmapper.cpp's
    # sampleEmitterDirect path)
    if direct_nee:
        ns = gps.ns
        s_ax, t_ax = coordinate_system(ns)
        wo_loc = to_local(ns, s_ax, t_ax, gps.wo)
        ds = sample_direct(scene, gps.p,
                           jax.random.uniform(k_nee, (n, 3)))
        wl_loc = to_local(ns, s_ax, t_ax, ds.wl)
        f, _ = eval_bsdf(scene, gps.bsdf, wo_loc, wl_loc)
        tr = segment_transmittance(
            scene, gps.p + ns * jnp.sign(dot(ns, ds.wl,
                                             keepdims=True)) * 1e-4,
            ds.p_light, gps.med)
        cos_s = jnp.abs(dot(ns, ds.wl))
        L_dir = gps.thr * f * tr * ds.li_over_pdf * cos_s[..., None]
        L_dir = jnp.where((gps.valid & ds.valid)[..., None], L_dir, 0.0)
    else:
        L_dir = jnp.zeros((n, 3))

    out = L_ind + L_dir + gps.emission
    return out.reshape(H, W, 3)


def render(scene: Scene, cfg: PhotonConfig = PhotonConfig(), seed=0,
           passes=None, progressive=False, callback=None):
    """Classic photon mapper (progressive=False: fixed radius across
    passes, photonmapper.cpp) or Knaus-PPM (progressive=True: global
    APA alpha schedule, ppm.cpp:75)."""
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = cfg.surface_photons
    accum = jnp.zeros((scene.height, scene.width, 3))
    scale = 1.0
    for it in range(n_passes):
        accum = accum + render_pass(scene, cfg, n_photons, seed, it,
                                    scale)
        if progressive:
            scale *= sppm.radius_ratio(it, cfg.alpha) ** 0.5
        if callback is not None:
            callback(it, accum / (it + 1))
    return dict(image=accum / n_passes, passes=n_passes)


def render_ppm(scene: Scene, cfg: PhotonConfig = PhotonConfig(), seed=0,
               passes=None, callback=None):
    """Knaus-style progressive photon mapping (ppm.cpp)."""
    return render(scene, cfg, seed=seed, passes=passes, progressive=True,
                  callback=callback)
