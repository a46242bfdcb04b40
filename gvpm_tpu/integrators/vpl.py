"""VPL (instant-radiosity-style) integrator.

reference: src/integrators/vpl/vpl.cpp + librender/vpl.h
(generateVPLs): trace light paths, keep every vertex as a virtual point
light, then shade each pixel by summing the contribution of every VPL
with a clamped geometry term.

TPU design: VPLs come straight from the particle tracer's stored light
vertices (ptracer.shoot) — the scatter evaluation at the VPL toward the
shading point reuses the shift machinery's parent-style evaluator
(shift.parent_scatter). The pixel x VPL double loop streams VPL tiles
against the pixel wavefront with lax.scan (same blocking discipline as
the beam estimators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..core.config import PhotonConfig
from ..core.math import coordinate_system, dot, to_local
from ..render.bsdf import eval_bsdf
from ..render.emitter import sample_direct
from ..render.visibility import segment_transmittance
from . import gatherpoint, ptracer, shift
from ..scene.types import Scene


@functools.partial(jax.jit, static_argnames=("cfg", "n_paths", "tile"))
def render_pass(scene: Scene, cfg: PhotonConfig, n_paths, seed, it,
                clamp_dist=0.1, tile=128):
    """One VPL pass: per-pixel first-diffuse hit shaded by all VPLs
    of this pass + NEE direct light."""
    H, W = scene.height, scene.width
    n = H * W
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_nee = rng.pass_key(seed, it, rng.STREAM_NEE)

    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    gps, _ = gatherpoint.trace(scene, cfg, k_cam, px, py)
    ns = gps.ns
    s_ax, t_ax = coordinate_system(ns)
    wo_loc = to_local(ns, s_ax, t_ax, gps.wo)

    # ---- VPL generation: every stored light vertex is a VPL ----
    lv, _ = ptracer.shoot(scene, cfg, n_paths, k_light)
    pv, vmask = ptracer.flatten_vertices(lv)
    nv = pv.p.shape[0]
    n_tiles = -(-nv // tile)
    pad = n_tiles * tile - nv

    def padf(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    V = {k: padf(getattr(pv, k)).reshape((n_tiles, tile)
                                         + getattr(pv, k).shape[1:])
         for k in ("p", "wi", "ns", "bsdf", "med", "vtype", "alpha")}
    Vmask = padf(vmask.astype(jnp.int32)).reshape(n_tiles, tile) > 0

    def tile_step(acc, t):
        vp, vwi, vns, vbsdf, vmed, vtype, valpha, vok = t
        # geometry term pixel[n] x vpl[tile]
        seg = vp[None, :, :] - gps.p[:, None, :]          # [n,T,3]
        d2 = jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12)
        wl = seg / jnp.sqrt(d2)[..., None]
        cos_x = jnp.abs(jnp.sum(ns[:, None, :] * wl, axis=-1))
        # scatter at the VPL toward the pixel (importance transport)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        sc, _, ok_sc = shift.parent_scatter(
            scene,
            jnp.broadcast_to(vtype[None], d2.shape).reshape(-1),
            jnp.broadcast_to(vwi[None], wl.shape).reshape(-1, 3),
            jnp.broadcast_to(vns[None], wl.shape).reshape(-1, 3),
            jnp.broadcast_to(vbsdf[None], d2.shape).reshape(-1),
            jnp.broadcast_to(vmed[None], d2.shape).reshape(-1),
            flat(-wl))
        sc = sc.reshape(d2.shape + (3,))
        ok_sc = ok_sc.reshape(d2.shape)
        # BSDF at the pixel toward the VPL
        wl_loc = jnp.stack([jnp.sum(s_ax[:, None] * wl, -1),
                            jnp.sum(t_ax[:, None] * wl, -1),
                            jnp.sum(ns[:, None] * wl, -1)], axis=-1)
        f, _ = eval_bsdf(scene, jnp.broadcast_to(gps.bsdf[:, None],
                                                 d2.shape).reshape(-1),
                         jnp.broadcast_to(wo_loc[:, None], wl.shape
                                          ).reshape(-1, 3),
                         flat(wl_loc))
        f = f.reshape(d2.shape + (3,))
        # clamped geometry term (vpl.cpp clamping to bound singularities)
        G = cos_x / jnp.maximum(d2, clamp_dist * clamp_dist)
        ok = gps.valid[:, None] & vok[None, :] & ok_sc
        # visibility: one shadow ray per (pixel, vpl) is O(n*T) rays —
        # stream them as a flattened batch
        off = gps.p + ns * 1e-4
        tr = segment_transmittance(
            scene,
            jnp.broadcast_to(off[:, None], wl.shape).reshape(-1, 3),
            flat(jnp.broadcast_to(vp[None], wl.shape)),
            jnp.broadcast_to(gps.med[:, None], d2.shape).reshape(-1)
        ).reshape(d2.shape + (3,))
        contrib = gps.thr[:, None, :] * f * sc * valpha[None, :, :] \
            * G[..., None] * tr
        contrib = jnp.where(ok[..., None] & jnp.isfinite(contrib),
                            contrib, 0.0)
        return acc + jnp.sum(contrib, axis=1), None

    acc, _ = lax.scan(
        tile_step, jnp.zeros((n, 3)),
        (V["p"], V["wi"], V["ns"], V["bsdf"], V["med"], V["vtype"],
         V["alpha"], Vmask))
    L_vpl = acc / n_paths

    # direct light at the pixel (NEE), plus directly-seen emission
    ds = sample_direct(scene, gps.p, jax.random.uniform(k_nee, (n, 3)))
    wl_loc = to_local(ns, s_ax, t_ax, ds.wl)
    f, _ = eval_bsdf(scene, gps.bsdf, wo_loc, wl_loc)
    tr = segment_transmittance(scene, gps.p + ns * 1e-4, ds.p_light,
                               gps.med)
    L_dir = gps.thr * f * tr * ds.li_over_pdf \
        * jnp.abs(dot(ns, ds.wl))[..., None]
    L_dir = jnp.where((gps.valid & ds.valid)[..., None], L_dir, 0.0)

    return (L_vpl + L_dir + gps.emission).reshape(H, W, 3)


def render(scene: Scene, cfg: PhotonConfig = PhotonConfig(), seed=0,
           passes=4, vpls_per_pass=64, clamp_dist=0.1, callback=None):
    """VPL render: `vpls_per_pass` light paths per pass (each path
    yields up to max_depth VPLs)."""
    accum = jnp.zeros((scene.height, scene.width, 3))
    for it in range(passes):
        accum = accum + render_pass(scene, cfg, vpls_per_pass, seed, it,
                                    clamp_dist=clamp_dist)
        if callback is not None:
            callback(it, accum / (it + 1))
    return dict(image=accum / passes, passes=passes)
