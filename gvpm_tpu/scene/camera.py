"""Perspective pinhole camera with ray differentials.

reference: src/sensors/perspective.cpp; ray differentials drive the
gather-point radius initialization (gvpm_gatherpoint.h:238
getRadiusRayDifferential).

Conventions: camera space +x right, +y up, +z forward; pixel (0,0) is the
top-left corner of the film; fov is the horizontal field of view.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import cross, dot, normalize
from .types import Scene


def _cam_axes(scene: Scene):
    m = scene.cam_to_world
    right, up, fwd = m[:3, 0], m[:3, 1], m[:3, 2]
    origin = m[:3, 3]
    return origin, right, up, fwd


def generate_rays(scene: Scene, px, py, u, u_lens=None):
    """Primary rays through pixel (px, py) at in-pixel offset u in [0,1)^2.

    Returns (o, d, spread): spread is the angular pixel footprint growth
    rate — the world-space radius of the pixel at distance t along the ray
    is ~ spread * t (used for gather-point radius init).

    Thinlens (scene.cam_aperture > 0, src/sensors/thinlens.cpp): the
    pinhole ray is re-aimed from a sampled lens-disk point at its
    focal-plane intersection. u_lens defaults to the lens center
    (pinhole-through-center) when not supplied.
    """
    origin, right, up, fwd = _cam_axes(scene)
    W, H = scene.width, scene.height
    aspect = H / W
    thf = scene.cam_tan_half_fov_x
    # normalized film coords in [-1,1]
    sx = ((px + u[..., 0]) / W) * 2.0 - 1.0
    sy = 1.0 - ((py + u[..., 1]) / H) * 2.0
    dx = sx * thf
    dy = sy * thf * aspect
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    d = normalize(d_cam[..., 0:1] * right + d_cam[..., 1:2] * up
                  + d_cam[..., 2:3] * fwd)
    o = jnp.broadcast_to(origin, d.shape)
    if scene.cam_aperture > 0.0 and u_lens is not None:
        from ..core.warp import square_to_uniform_disk_concentric
        t_focus = scene.cam_focus / jnp.maximum(dot(d, fwd), 1e-6)
        pf = o + d * t_focus[..., None]
        lens = square_to_uniform_disk_concentric(u_lens) \
            * scene.cam_aperture
        o = origin + right * lens[..., 0:1] + up * lens[..., 1:2]
        d = normalize(pf - o)
    # one-pixel offset in x on the film plane (z=1): length of d(dir)
    pix_dx = (2.0 * thf / W)
    inv_len = jnp.reciprocal(jnp.sqrt(1.0 + dx * dx + dy * dy))
    spread = pix_dx * inv_len  # small-angle: |d d_hat / d px|
    return o, d, spread


def project(scene: Scene, p):
    """World point -> (px, py, valid, dist). Inverse of generate_rays.

    Used by the light tracer / particle tracer to splat onto the film
    (reference: PathVertex::sampleSensor, vertex.h:360).
    """
    origin, right, up, fwd = _cam_axes(scene)
    W, H = scene.width, scene.height
    aspect = H / W
    thf = scene.cam_tan_half_fov_x
    v = p - origin
    z = dot(v, fwd)
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    x = dot(v, right) / zs
    y = dot(v, up) / zs
    sx = x / thf
    sy = y / (thf * aspect)
    px = (sx + 1.0) * 0.5 * W
    py = (1.0 - sy) * 0.5 * H
    inside = valid & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    return px, py, inside, jnp.sqrt(jnp.maximum(dot(v, v), 1e-20))


def importance_weight(scene: Scene, d_world):
    """We(d): emitted-importance weight so that splatting integrates to the
    pixel-filter-normalized image (perspective.cpp importance math).

    For a pinhole with film mapped to [-1,1]^2 x focal plane, the measure
    conversion solid-angle -> film area gives We = 1 / (A_film * cos^3)
    with A_film = 4 * tan(fx/2) * tan(fy/2) in pixels / (W*H) ... we return
    the per-*pixel* importance: W*H / (4 thf^2 aspect cos^3 th).
    """
    _, _, _, fwd = _cam_axes(scene)
    cos_t = dot(d_world, fwd)
    W, H = scene.width, scene.height
    aspect = H / W
    thf = scene.cam_tan_half_fov_x
    film_area = 4.0 * thf * (thf * aspect)
    valid = cos_t > 1e-6
    c = jnp.where(valid, cos_t, 1.0)
    return jnp.where(valid, (W * H) / (film_area * c * c * c), 0.0)
