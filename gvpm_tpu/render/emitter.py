"""Area emitters: flux-weighted sampling + direct illumination (NEE).

reference: src/emitters/area.cpp and Scene::weightEmitterFlux
(src/librender/scene.cpp:322) — prims are picked proportionally to emitted
flux via the prebuilt `em_cdf`; positions uniformly over the prim; emission
directions cosine-distributed. Area lights are the only emitter type GVPM
supports (gvpm.cpp:148-158).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ..core import warp
from ..core.math import coordinate_system, cross, dot, normalize, to_world
from ..scene.types import Scene


@flax.struct.dataclass
class EmitterSample:
    p: jnp.ndarray          # [N,3] position on the light
    n: jnp.ndarray          # [N,3] light normal
    radiance: jnp.ndarray   # [N,3] emitted radiance
    pdf_area: jnp.ndarray   # [N] pdf of p (area measure, incl. prim pick)
    prim: jnp.ndarray       # [N] global prim id
    emitter: jnp.ndarray    # [N] emitter id
    valid: jnp.ndarray      # [N] bool


def _prim_geom(scene: Scene, prim, u2):
    """Uniform point+normal on emissive prim (tri or sphere)."""
    is_tri = prim < scene.n_tris
    ti = jnp.clip(prim, 0, scene.n_tris - 1)
    b = warp.square_to_uniform_triangle(u2)
    p_tri = (scene.tri_p0[ti] + b[..., 0:1] * scene.tri_e1[ti]
             + b[..., 1:2] * scene.tri_e2[ti])
    n_tri = normalize(cross(scene.tri_e1[ti], scene.tri_e2[ti]))
    if scene.n_spheres == 0:
        return p_tri, n_tri
    si = jnp.clip(prim - scene.n_tris, 0, scene.n_spheres - 1)
    d = warp.square_to_uniform_sphere(u2)
    p_sph = scene.sph_center[si] + scene.sph_radius[si][..., None] * d
    return (jnp.where(is_tri[..., None], p_tri, p_sph),
            jnp.where(is_tri[..., None], n_tri, d))


def sample_position(scene: Scene, u3) -> EmitterSample:
    """Flux-weighted position sample. u3: [N,3] (prim pick + 2D)."""
    n_em = scene.em_prim.shape[0]
    valid = jnp.full(u3.shape[:-1], n_em > 0)
    if n_em == 0:
        z3 = jnp.zeros(u3.shape[:-1] + (3,))
        z = jnp.zeros(u3.shape[:-1])
        zi = jnp.zeros(u3.shape[:-1], jnp.int32)
        return EmitterSample(p=z3, n=z3, radiance=z3, pdf_area=z, prim=zi,
                             emitter=zi, valid=valid)
    k = jnp.searchsorted(scene.em_cdf, u3[..., 0], side="right")
    k = jnp.clip(k, 0, n_em - 1)
    prim = scene.em_prim[k]
    pmf = scene.em_cdf[k] - jnp.where(k > 0, scene.em_cdf[k - 1], 0.0)
    p, n = _prim_geom(scene, prim, u3[..., 1:3])
    em = scene.prim_emitter(prim)
    rad = scene.em_radiance[jnp.clip(em, 0, scene.em_radiance.shape[0] - 1)]
    pdf_area = pmf / jnp.maximum(scene.em_prim_area[k], 1e-20)
    return EmitterSample(p=p, n=n, radiance=rad, pdf_area=pdf_area,
                         prim=prim, emitter=em, valid=valid & (pmf > 0))


def sample_direction(scene: Scene, es: EmitterSample, u2):
    """Cosine-weighted emission direction; returns (d_world, pdf_sa)."""
    d_local = warp.square_to_cosine_hemisphere(u2)
    s, t = coordinate_system(es.n)
    d = to_world(es.n, s, t, d_local)
    return d, warp.square_to_cosine_hemisphere_pdf(d_local)


def eval_radiance(scene: Scene, prim, n, wo):
    """Radiance leaving prim toward wo (front side only); [N,3]."""
    em = scene.prim_emitter(prim)
    is_em = em >= 0
    rad = scene.em_radiance[jnp.clip(em, 0, scene.em_radiance.shape[0] - 1)]
    front = dot(n, wo) > 0.0
    return jnp.where((is_em & front)[..., None], rad, 0.0)


def pdf_direct_area(scene: Scene, prim):
    """Area pdf that `sample_position` lands on this specific prim point."""
    n_em = scene.em_prim.shape[0]
    if n_em == 0:
        return jnp.zeros(prim.shape)
    # locate prim in emissive-prim list (small Te: scan match)
    match = scene.em_prim[None, :] == prim[..., None]
    k = jnp.argmax(match, axis=-1)
    found = jnp.any(match, axis=-1)
    pmf = scene.em_cdf[k] - jnp.where(k > 0, scene.em_cdf[k - 1], 0.0)
    pdf = pmf / jnp.maximum(scene.em_prim_area[k], 1e-20)
    return jnp.where(found, pdf, 0.0)
