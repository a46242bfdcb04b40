"""Emitters: flux-weighted sampling + direct illumination (NEE).

reference: src/emitters/{area,point,spot,directional,constant}.cpp and
Scene::weightEmitterFlux (src/librender/scene.cpp:322) — emitters are
picked proportionally to emitted flux; area positions uniformly over the
prim with cosine-distributed emission. The TPU design groups emitters as
(area | delta | env) with a static group-probability table
(scene.light_group_p) so every sampling routine is one branch-free
3-way select. Area lights remain the only kind the gradient shifts
reconnect to (gvpm.cpp:148-158 — same restriction as the reference).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..core import warp
from ..core.math import coordinate_system, cross, dot, normalize, to_world
from ..scene.types import DE_DIRECTIONAL, DE_POINT, DE_SPOT, Scene
from ..core.tables import take


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
    rad = take(scene.em_radiance, jnp.clip(em, 0, scene.em_radiance.shape[0] - 1))
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
    rad = take(scene.em_radiance, jnp.clip(em, 0, scene.em_radiance.shape[0] - 1))
    front = dot(n, wo) > 0.0
    return jnp.where((is_em & front)[..., None], rad, 0.0)


def pdf_direct_area(scene: Scene, prim):
    """Area pdf that NEE (`sample_direct`) lands on this specific prim
    point — includes the area-group pick probability."""
    n_em = scene.em_prim.shape[0]
    if n_em == 0:
        return jnp.zeros(prim.shape)
    # locate prim in emissive-prim list (small Te: scan match)
    match = scene.em_prim[None, :] == prim[..., None]
    k = jnp.argmax(match, axis=-1)
    found = jnp.any(match, axis=-1)
    pmf = scene.em_cdf[k] - jnp.where(k > 0, scene.em_cdf[k - 1], 0.0)
    pdf = pmf / jnp.maximum(scene.em_prim_area[k], 1e-20)
    return jnp.where(found, pdf * scene.light_group_p[0], 0.0)


# --------------------------------------------------------------------------
# environment (constant) emitter


def world_center_radius(scene: Scene):
    c = 0.5 * (scene.world_lo + scene.world_hi)
    r = jnp.linalg.norm(scene.world_hi - c) + 1e-6
    return c, r


def _env_is_map(scene: Scene):
    """Static: scene carries a real lat-long map (vs constant env)."""
    return scene.env_map.shape[0] * scene.env_map.shape[1] > 1


def _env_texel(scene: Scene, d):
    """(row, col) texel indices of direction d (toward the environment)
    in the y-up lat-long parameterization (emitters/envmap.cpp)."""
    He, We = scene.env_map.shape[:2]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    u = (phi * (0.5 / jnp.pi) + 0.5) % 1.0
    v = theta / jnp.pi
    yi = jnp.clip((v * He).astype(jnp.int32), 0, He - 1)
    xi = jnp.clip((u * We).astype(jnp.int32), 0, We - 1)
    return yi, xi


def env_le(scene: Scene, d):
    """Environment radiance for escaped rays in direction d [N,3]."""
    base = jnp.broadcast_to(scene.env_radiance, d.shape[:-1] + (3,))
    if not _env_is_map(scene):
        return base
    yi, xi = _env_texel(scene, d)
    return base * scene.env_map[yi, xi]


def pdf_env_sa(scene: Scene, d=None):
    """Solid-angle NEE pdf of the environment strategy, including the
    env-group pick probability. Constant env = uniform sphere; a map is
    sampled per-texel by sin-weighted luminance, uniform in (theta,phi)
    within the texel, so pdf(d) = lum(L(d)) * sin(theta_row) /
    (4pi * mean_lum * sin(theta))."""
    gp = scene.light_group_p[2]
    if d is None or not _env_is_map(scene):
        return gp * warp.INV_FOURPI
    from ..core.spectrum import luminance
    He = scene.env_map.shape[0]
    yi, xi = _env_texel(scene, d)
    lum_t = luminance(scene.env_radiance * scene.env_map[yi, xi])
    sin_row = jnp.sin((yi.astype(jnp.float32) + 0.5) / He * jnp.pi)
    sin_d = jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 0.0)),
                        1e-4)
    return gp * lum_t * sin_row / (4.0 * jnp.pi * sin_d
                                   * jnp.maximum(scene.env_mean_lum, 1e-20))


def sample_env_dir(scene: Scene, u2):
    """Sample a direction TOWARD the environment; returns (d, pdf_sa)
    where pdf_sa excludes the group pick probability."""
    if not _env_is_map(scene):
        d = warp.square_to_uniform_sphere(u2)
        return d, jnp.full(u2.shape[:-1], warp.INV_FOURPI)
    from ..core.spectrum import luminance
    He, We = scene.env_map.shape[:2]
    i = jnp.clip(jnp.searchsorted(scene.env_row_cdf, u2[..., 0],
                                  side="right"), 0, He - 1)
    c_lo = jnp.where(i > 0, scene.env_row_cdf[jnp.maximum(i - 1, 0)], 0.0)
    seg = jnp.maximum(scene.env_row_cdf[i] - c_lo, 1e-12)
    vf = jnp.clip((u2[..., 0] - c_lo) / seg, 0.0, 1.0 - 1e-6)
    rows = scene.env_cond_cdf[i]                              # [N,We]
    j = jnp.clip(jax.vmap(
        lambda r, u: jnp.searchsorted(r, u, side="right"))(
            rows, u2[..., 1]), 0, We - 1)
    cc_lo = jnp.where(j > 0,
                      jnp.take_along_axis(
                          rows, jnp.maximum(j - 1, 0)[..., None],
                          axis=-1)[..., 0], 0.0)
    cseg = jnp.maximum(
        jnp.take_along_axis(rows, j[..., None], axis=-1)[..., 0] - cc_lo,
        1e-12)
    uf = jnp.clip((u2[..., 1] - cc_lo) / cseg, 0.0, 1.0 - 1e-6)
    v = (i.astype(jnp.float32) + vf) / He
    u = (j.astype(jnp.float32) + uf) / We
    theta = v * jnp.pi
    phi = (u - 0.5) * (2.0 * jnp.pi)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta),
                   sin_t * jnp.sin(phi)], axis=-1)
    lum_t = luminance(scene.env_radiance * scene.env_map[i, j])
    sin_row = jnp.sin((i.astype(jnp.float32) + 0.5) / He * jnp.pi)
    pdf = lum_t * sin_row / (4.0 * jnp.pi * jnp.maximum(sin_t, 1e-4)
                             * jnp.maximum(scene.env_mean_lum, 1e-20))
    return d, pdf


# --------------------------------------------------------------------------
# unified NEE sampling (area | delta | env)


@flax.struct.dataclass
class DirectSample:
    """One next-event sample toward a light.

    contribution at the shading point = throughput * f(wl) * Tr * li_over_pdf
    * mis_weight, where mis_weight uses pdf_sa (0 for delta strategies =>
    weight 1, no competing BSDF strategy)."""
    wl: jnp.ndarray           # [N,3] unit direction to the light
    dist: jnp.ndarray         # [N] distance to the light point (shadow ray)
    p_light: jnp.ndarray      # [N,3] point on the light (shadow-ray target)
    li_over_pdf: jnp.ndarray  # [N,3] radiance-ish / pdf (all factors folded)
    pdf_sa: jnp.ndarray       # [N] solid-angle pdf (0 => delta strategy)
    valid: jnp.ndarray        # [N] bool
    n_light: jnp.ndarray      # [N,3] light normal (area group; else 0)
    grp: jnp.ndarray          # [N] emitter group: 0 area, 1 delta, 2 env
    falloff2: jnp.ndarray     # [N] bool: li carries a 1/d^2 falloff
                              #     (point/spot yes, directional/env no)


def _spot_falloff(scene: Scene, k, wl):
    """Spot falloff curve in emission direction -wl (spot.cpp)."""
    cos_t = dot(scene.de_dir[k], -wl)
    cc = scene.de_cos_cutoff[k]
    cf = scene.de_cos_falloff[k]
    lin = (cos_t - cc) / jnp.maximum(cf - cc, 1e-6)
    return jnp.where(cos_t <= cc, 0.0,
                     jnp.where(cos_t >= cf, 1.0, lin))


def _sample_direct_delta(scene: Scene, p_from, u):
    """NEE sample of the delta-light group (point/spot/directional)."""
    n_de = scene.de_type.shape[0]
    k = jnp.clip(jnp.searchsorted(scene.de_cdf, u, side="right"),
                 0, n_de - 1)
    pmf = scene.de_cdf[k] - jnp.where(k > 0, scene.de_cdf[k - 1], 0.0)
    _, wr = world_center_radius(scene)

    is_dir = scene.de_type[k] == DE_DIRECTIONAL
    seg = scene.de_p[k] - p_from
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    dist_pt = jnp.sqrt(d2)
    wl_pt = seg / dist_pt[..., None]
    wl = jnp.where(is_dir[..., None], -scene.de_dir[k], wl_pt)
    dist = jnp.where(is_dir, 2.0 * wr, dist_pt)
    p_light = jnp.where(is_dir[..., None], p_from + wl * dist[..., None],
                        scene.de_p[k])

    # point/spot: I * falloff / d^2; directional: irradiance E
    fall = jnp.where(scene.de_type[k] == DE_SPOT,
                     _spot_falloff(scene, k, wl), 1.0)
    li = scene.de_intensity[k] * fall[..., None]
    li = jnp.where(is_dir[..., None], li, li / d2[..., None])
    pick_p = scene.light_group_p[1] * pmf
    li_over_pdf = li / jnp.maximum(pick_p, 1e-20)[..., None]
    return DirectSample(wl=wl, dist=dist, p_light=p_light,
                        li_over_pdf=li_over_pdf,
                        pdf_sa=jnp.zeros_like(dist),
                        valid=(pmf > 0) & (n_de > 0),
                        n_light=jnp.zeros_like(wl),
                        grp=jnp.ones_like(dist, dtype=jnp.int32),
                        falloff2=~is_dir)


def sample_direct(scene: Scene, p_from, u3) -> DirectSample:
    """Unified NEE sample from point p_from; u3: [N,3] uniforms.

    Picks the emitter group by power (light_group_p), then an emitter
    within the group. The returned li_over_pdf folds every pdf factor
    EXCEPT the scatter function and transmittance at the shading point.
    """
    gp = scene.light_group_p
    n = p_from.shape[0]
    grp = jnp.where(u3[..., 0] < gp[0], 0,
                    jnp.where(u3[..., 0] < gp[0] + gp[1], 1, 2))
    # re-stretch the pick uniform within its group
    u_area = jnp.clip(u3[..., 0] / jnp.maximum(gp[0], 1e-12), 0.0, 1.0)
    u_delta = jnp.clip((u3[..., 0] - gp[0]) / jnp.maximum(gp[1], 1e-12),
                       0.0, 1.0)

    # --- area branch (cosine-emitting prim sample) ---
    es = sample_position(
        scene, jnp.stack([u_area, u3[..., 1], u3[..., 2]], axis=-1))
    seg = es.p - p_from
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    dist_a = jnp.sqrt(d2)
    wl_a = seg / dist_a[..., None]
    cos_l = dot(es.n, -wl_a)
    pdf_a_sa = es.pdf_area * gp[0] * d2 / jnp.maximum(cos_l, 1e-6)
    ok_a = es.valid & (cos_l > 1e-6) & (es.pdf_area > 0) & (gp[0] > 0)
    li_over_pdf_a = es.radiance / jnp.maximum(pdf_a_sa, 1e-20)[..., None]

    # --- delta branch ---
    if scene.de_type.shape[0] > 0:
        ds_d = _sample_direct_delta(scene, p_from, u_delta)
    else:
        z = jnp.zeros((n,))
        ds_d = DirectSample(wl=jnp.zeros((n, 3)), dist=z,
                            p_light=jnp.zeros((n, 3)),
                            li_over_pdf=jnp.zeros((n, 3)), pdf_sa=z,
                            valid=jnp.zeros((n,), bool),
                            n_light=jnp.zeros((n, 3)),
                            grp=jnp.ones((n,), jnp.int32),
                            falloff2=jnp.zeros((n,), bool))

    # --- env branch (constant: uniform sphere; map: luminance CDF) ---
    _, wr = world_center_radius(scene)
    wl_e, pdf_e = sample_env_dir(scene, u3[..., 1:3])
    dist_e = jnp.full((n,), 2.0) * wr
    pdf_e_sa = gp[2] * pdf_e
    li_over_pdf_e = env_le(scene, wl_e) \
        / jnp.maximum(pdf_e_sa, 1e-20)[..., None]

    is_a = (grp == 0)[..., None]
    is_d = (grp == 1)[..., None]
    wl = jnp.where(is_a, wl_a, jnp.where(is_d, ds_d.wl, wl_e))
    dist = jnp.where(grp == 0, dist_a,
                     jnp.where(grp == 1, ds_d.dist, dist_e))
    p_light = jnp.where(is_a, es.p,
                        jnp.where(is_d, ds_d.p_light,
                                  p_from + wl_e * dist_e[..., None]))
    li = jnp.where(is_a, li_over_pdf_a,
                   jnp.where(is_d, ds_d.li_over_pdf, li_over_pdf_e))
    pdf_sa = jnp.where(grp == 0, pdf_a_sa,
                       jnp.where(grp == 1, 0.0, pdf_e_sa))
    valid = jnp.where(grp == 0, ok_a,
                      jnp.where(grp == 1, ds_d.valid, gp[2] > 0))
    return DirectSample(wl=wl, dist=dist, p_light=p_light, li_over_pdf=li,
                        pdf_sa=pdf_sa, valid=valid,
                        n_light=jnp.where(is_a, es.n, 0.0), grp=grp,
                        falloff2=jnp.where(grp == 1, ds_d.falloff2,
                                           grp == 0))


# --------------------------------------------------------------------------
# photon emission (all emitter kinds)


def sample_photon(scene: Scene, key, n, lanes=None):
    """Sample n photon-emission rays across ALL emitter groups by power.

    Returns a dict with: p, d, alpha (power/pdf), med, valid, plus the
    shift caches the particle tracer stores for first-bounce photons
    (ns/scatter/pdf_dir meaningful only for area lights; reconnectable is
    False for delta/env parents — conservative unilateral shifts, the
    reference's area-only restriction, gvpm.cpp:148-158).

    lanes [n] (optional): global path ids — randoms become functions of
    (key, lane id) so sharded shooters draw the identical photon set at
    any device count (rng.lane_uniform)."""
    from ..core import rng as _rng
    k_pick, k_pos, k_dir, k_disk = jax.random.split(key, 4)
    if lanes is None:
        u3 = jax.random.uniform(k_pos, (n, 3))
        u2 = jax.random.uniform(k_dir, (n, 2))
        u_disk = jax.random.uniform(k_disk, (n, 2))
        u_pick = jax.random.uniform(k_pick, (n,))
    else:
        u3 = _rng.lane_uniform(k_pos, lanes, (3,))
        u2 = _rng.lane_uniform(k_dir, lanes, (2,))
        u_disk = _rng.lane_uniform(k_disk, lanes, (2,))
        u_pick = _rng.lane_uniform(k_pick, lanes)
    gp = scene.light_group_p
    grp = jnp.where(u_pick < gp[0], 0,
                    jnp.where(u_pick < gp[0] + gp[1], 1, 2))
    wc, wr = world_center_radius(scene)

    # --- area: flux-weighted prim + cosine direction -----------------
    es = sample_position(scene, u3)
    d_a, pdf_dir_a = sample_direction(scene, es, u2)
    cos_e = jnp.maximum(dot(es.n, d_a), 0.0)
    alpha_a = es.radiance * (cos_e / jnp.maximum(
        es.pdf_area * pdf_dir_a * gp[0], 1e-20))[..., None]
    ok_a = es.valid & (cos_e > 0)

    # --- delta: point / spot / directional ---------------------------
    n_de = scene.de_type.shape[0]
    if n_de > 0:
        k = jnp.clip(jnp.searchsorted(scene.de_cdf, u3[..., 0],
                                      side="right"), 0, n_de - 1)
        pmf = scene.de_cdf[k] - jnp.where(k > 0, scene.de_cdf[k - 1], 0.0)
        det = scene.de_type[k]
        axis = scene.de_dir[k]
        # point: uniform sphere; spot: uniform cone of the cutoff angle
        d_sph = warp.square_to_uniform_sphere(u2)
        cc = scene.de_cos_cutoff[k]
        d_cone, pdf_cone = warp.square_to_uniform_cone(u2, cc)
        s_ax, t_ax = coordinate_system(axis)
        d_cone = to_world(axis, s_ax, t_ax, d_cone)
        fall = _spot_falloff_dir(scene, k, d_cone)
        # directional: offset over the bounding disk, shoot along axis
        disk = warp.square_to_uniform_disk(u_disk) * wr
        s2, t2 = coordinate_system(axis)
        p_dir = wc - axis * wr + s2 * disk[..., 0:1] + t2 * disk[..., 1:2]
        pdf_pos_dir = 1.0 / (jnp.pi * wr * wr)

        d_de = jnp.where((det == DE_POINT)[..., None], d_sph,
                         jnp.where((det == DE_SPOT)[..., None], d_cone,
                                   axis))
        p_de = jnp.where((det == DE_DIRECTIONAL)[..., None], p_dir,
                         scene.de_p[k])
        w_point = warp.FOURPI * jnp.ones_like(pmf)
        w_spot = fall / jnp.maximum(pdf_cone, 1e-20)
        w_dir = (1.0 / pdf_pos_dir) * jnp.ones_like(pmf)
        w_de = jnp.where(det == DE_POINT, w_point,
                         jnp.where(det == DE_SPOT, w_spot, w_dir))
        alpha_de = scene.de_intensity[k] \
            * (w_de / jnp.maximum(pmf * gp[1], 1e-20))[..., None]
        med_de = scene.de_medium[k]
        ok_de = pmf > 0
    else:
        p_de = d_de = alpha_de = jnp.zeros((n, 3))
        med_de = jnp.full((n,), -1, jnp.int32)
        ok_de = jnp.zeros((n,), bool)

    # --- env: inward direction from the bounding disk (constant:
    # uniform sphere; map: luminance-CDF importance sample) --
    d_env_out, pdf_env_dir = sample_env_dir(scene, u2)  # TO the env
    d_env = -d_env_out
    disk_e = warp.square_to_uniform_disk(u_disk) * wr
    se, te = coordinate_system(d_env)
    p_env = wc + d_env_out * wr + se * disk_e[..., 0:1] \
        + te * disk_e[..., 1:2]
    # alpha = L(d) / (pdf_dir * pdf_pos * group_p), pdf_pos = 1/(pi R^2)
    alpha_env = env_le(scene, d_env_out) \
        * (jnp.pi * wr * wr
           / jnp.maximum(pdf_env_dir * gp[2], 1e-20))[..., None]

    is_a = (grp == 0)[..., None]
    is_d = (grp == 1)[..., None]
    p = jnp.where(is_a, es.p + es.n * 1e-4,
                  jnp.where(is_d, p_de, p_env))
    d = jnp.where(is_a, d_a, jnp.where(is_d, d_de, d_env))
    alpha = jnp.where(is_a, alpha_a, jnp.where(is_d, alpha_de, alpha_env))
    valid = jnp.where(grp == 0, ok_a & (gp[0] > 0),
                      jnp.where(grp == 1, ok_de, gp[2] > 0))
    from ..render.visibility import medium_transition
    med_a = medium_transition(scene, es.prim, es.n, d_a)
    med0 = jnp.where(grp == 0, med_a,
                     jnp.where(grp == 1, med_de, -1))
    return dict(
        p=p, d=d, alpha=alpha, med=med0, valid=valid,
        ns=jnp.where(is_a, es.n, d),
        pdf_dir=jnp.where(grp == 0, pdf_dir_a, 1.0),
        scatter=jnp.where(is_a, cos_e[..., None],
                          jnp.ones((n, 3))),
        reconnectable=grp == 0,
        prim=es.prim,
    )


def _spot_falloff_dir(scene: Scene, k, d_emit):
    """Spot falloff for an EMISSION direction (not a to-light dir)."""
    cos_t = dot(scene.de_dir[k], d_emit)
    cc = scene.de_cos_cutoff[k]
    cf = scene.de_cos_falloff[k]
    lin = (cos_t - cc) / jnp.maximum(cf - cc, 1e-6)
    return jnp.where(cos_t <= cc, 0.0,
                     jnp.where(cos_t >= cf, 1.0, lin))
