"""Light tracer: photon paths connected to the camera (reference:
integrators/ptracer + PathVertex::sampleSensor, vertex.h:360).

Every stored light vertex (plus the emitter surface itself) is connected
to the pinhole: contribution = alpha * scatter(w->eye) * Tr(v->eye) *
We_pixel / d^2, splatted at the projected pixel. Validates the importance
transport path (emission, BSDF adjoint, media) independently of the
photon-density estimators — the reference's cross-validation role for
ptracer (data/tests/test_bidir uses it as ground truth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import PhotonConfig
from ..core.math import dot
from ..render import film
from ..render.emitter import sample_position
from ..render.visibility import segment_transmittance
from ..scene.camera import importance_weight, project
from ..scene.types import Scene
from . import ptracer, shift


def _connect(scene: Scene, p, alpha_times_scatter, med_at_v, valid):
    """Connect points p (with premultiplied alpha*scatter toward the
    camera) to the eye; returns (px, py, value, ok)."""
    eye = scene.cam_to_world[:3, 3]
    seg = eye - p
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    w = seg / jnp.sqrt(d2)[..., None]
    px, py, inside, _ = project(scene, p)
    we = importance_weight(scene, -w)
    tr = segment_transmittance(scene, p, jnp.broadcast_to(eye, p.shape),
                               med_at_v)
    val = alpha_times_scatter * tr * (we / d2)[..., None]
    return px, py, val, valid & inside & (we > 0)


@functools.partial(jax.jit, static_argnames=("cfg", "n_paths"))
def render_pass(scene: Scene, cfg: PhotonConfig, n_paths, seed, it):
    H, W = scene.height, scene.width
    key = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    lv, _ = ptracer.shoot(scene, cfg, n_paths, key)
    pv, vmask = ptracer.flatten_vertices(lv)

    img = film.new_film(H, W)

    # --- direct emitter-eye connections (path length 1) ---
    k_em = rng.pass_key(seed, it, rng.STREAM_NEE)
    es = sample_position(scene, jax.random.uniform(k_em, (n_paths, 3)))
    eye = scene.cam_to_world[:3, 3]
    seg = eye - es.p
    wl = seg / jnp.maximum(jnp.linalg.norm(seg, axis=-1,
                                           keepdims=True), 1e-12)
    cos_e = jnp.maximum(dot(es.n, wl), 0.0)
    alpha_em = es.radiance * (cos_e / jnp.maximum(es.pdf_area,
                                                  1e-20))[..., None]
    px, py, val, ok = _connect(
        scene, es.p + es.n * 1e-4, alpha_em,
        jnp.broadcast_to(scene.cam_medium, (n_paths,)),
        es.valid & (cos_e > 0))
    img = film.splat(img, px, py, val / n_paths, ok)

    # --- deterministic delta-light -> eye connections (point/spot) ---
    n_de = scene.de_type.shape[0]
    if n_de > 0:
        from ..render.emitter import _spot_falloff_dir
        from ..scene.types import DE_DIRECTIONAL, DE_SPOT
        eye2 = scene.cam_to_world[:3, 3]
        w_eye = eye2 - scene.de_p
        w_eye = w_eye / jnp.maximum(
            jnp.linalg.norm(w_eye, axis=-1, keepdims=True), 1e-12)
        k_all = jnp.arange(n_de)
        fall = jnp.where(scene.de_type == DE_SPOT,
                         _spot_falloff_dir(scene, k_all, w_eye), 1.0)
        alpha_de = scene.de_intensity * fall[..., None]
        px, py, val, ok = _connect(
            scene, scene.de_p, alpha_de, scene.de_medium,
            scene.de_type != DE_DIRECTIONAL)
        img = film.splat(img, px, py, val, ok)

    # --- scatter-vertex connections ---
    eye_b = jnp.broadcast_to(eye, pv.p.shape)
    wcam = eye_b - pv.p
    wcam = wcam / jnp.maximum(jnp.linalg.norm(wcam, axis=-1,
                                              keepdims=True), 1e-12)
    # scatter value at the vertex toward the camera: reuse the shift
    # machinery's parent-style evaluator on the vertex itself
    sc, _, ok_sc = shift.parent_scatter(
        scene, pv.vtype, pv.wi, pv.ns, pv.bsdf, pv.med, wcam)
    med_at = jnp.where(pv.vtype == ptracer.VERT_MEDIUM, pv.med,
                       scene.cam_medium)
    p_off = jnp.where((pv.vtype == ptracer.VERT_SURFACE)[..., None],
                      pv.p + pv.ns * jnp.sign(
                          dot(pv.ns, wcam, keepdims=True)) * 1e-4, pv.p)
    px, py, val, ok = _connect(scene, p_off, pv.alpha * sc, med_at,
                               vmask & ok_sc
                               & (pv.depth < cfg.max_depth))
    img = film.splat(img, px, py, val / n_paths, ok)
    return img


def render(scene: Scene, cfg: PhotonConfig = PhotonConfig(), seed=0,
           passes=8):
    img = film.new_film(scene.height, scene.width)
    n = max(cfg.surface_photons, cfg.volume_photons)
    for it in range(passes):
        img = img + render_pass(scene, cfg, n, seed, it)
    return img / passes
