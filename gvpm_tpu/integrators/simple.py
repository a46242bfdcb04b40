"""Small baseline integrators: direct illumination, ambient occlusion,
and the surface-only path tracer alias.

reference: src/integrators/direct/direct.cpp, misc/ao.cpp, path/path.cpp.
`path` is volpath restricted to surfaces (media ignored by construction
when the scene has none; with media it still runs volpath's machinery —
the reference's path.cpp likewise upgrades via volpath for media scenes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import VolPathConfig
from ..core.math import coordinate_system, dot, to_local, to_world
from ..core.warp import square_to_cosine_hemisphere
from ..render.bsdf import eval_bsdf
from ..render.emitter import env_le, eval_radiance, sample_direct
from ..render.visibility import segment_transmittance
from ..scene.camera import generate_rays
from ..scene.intersect import intersect, occluded
from ..scene.types import Scene
from . import volpath


def render_path(scene: Scene, cfg: VolPathConfig = VolPathConfig(),
                seed=0):
    """Surface path tracer (reference `path`): volpath shares the code."""
    return volpath.render(scene, cfg, seed=seed)


@functools.partial(jax.jit, static_argnames=("spp",))
def _direct_pass(scene: Scene, seed, it, spp):
    H, W = scene.height, scene.width
    n = H * W
    key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_pix, k_nee = jax.random.split(key)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    o, d, _ = generate_rays(scene, px, py,
                            jax.random.uniform(k_pix, (n, 2)))
    hit = intersect(scene, o, d)
    L = eval_radiance(scene, hit.prim, hit.ng, -d)
    ns = hit.ns * jnp.sign(dot(hit.ns, -d, keepdims=True))
    s_ax, t_ax = coordinate_system(ns)
    wi_loc = to_local(ns, s_ax, t_ax, -d)
    bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                  scene.bsdf_type.shape[0] - 1)
    u3 = jax.random.uniform(k_nee, (n, 3))
    ds = sample_direct(scene, hit.p, u3)
    f, _ = eval_bsdf(scene, bi, wi_loc, to_local(ns, s_ax, t_ax, ds.wl))
    tr = segment_transmittance(scene, hit.p + ns * 1e-4, ds.p_light,
                               jnp.broadcast_to(scene.cam_medium, (n,)))
    cos_s = jnp.abs(dot(ns, ds.wl))
    ok = hit.valid & ds.valid
    contrib = f * ds.li_over_pdf * tr * cos_s[..., None]
    L = L + jnp.where(ok[..., None], contrib, 0.0)
    L_esc = env_le(scene, d)
    return jnp.where(hit.valid[..., None], L, L_esc).reshape(H, W, 3)


def render_direct(scene: Scene, spp=16, seed=0):
    """Direct illumination only (emitter hit + one NEE sample)."""
    img = jnp.zeros((scene.height, scene.width, 3))
    for it in range(spp):
        img = img + _direct_pass(scene, seed, it, spp)
    return img / spp


@functools.partial(jax.jit, static_argnames=("ray_length",))
def _ao_pass(scene: Scene, seed, it, ray_length):
    H, W = scene.height, scene.width
    n = H * W
    key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_pix, k_dir = jax.random.split(key)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    o, d, _ = generate_rays(scene, px, py,
                            jax.random.uniform(k_pix, (n, 2)))
    hit = intersect(scene, o, d)
    ns = hit.ns * jnp.sign(dot(hit.ns, -d, keepdims=True))
    s_ax, t_ax = coordinate_system(ns)
    wo = to_world(ns, s_ax, t_ax, square_to_cosine_hemisphere(
        jax.random.uniform(k_dir, (n, 2))))
    far = hit.p + wo * ray_length
    blocked = occluded(scene, hit.p + ns * 1e-3, far)
    vis = jnp.where(hit.valid & ~blocked, 1.0, 0.0)
    return jnp.broadcast_to(vis[..., None], (n, 3)).reshape(H, W, 3)


def render_ao(scene: Scene, spp=16, seed=0, ray_length=0.5):
    """Ambient occlusion (reference misc/ao.cpp)."""
    img = jnp.zeros((scene.height, scene.width, 3))
    for it in range(spp):
        img = img + _ao_pass(scene, seed, it, ray_length)
    return img / spp
