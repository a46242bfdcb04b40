"""Batched BSDF evaluation / sampling / pdf.

Re-design of the reference's per-object BSDF plugins (src/bsdfs/*.cpp) as a
single dispatch-free table evaluator: every lane computes all lobe types on
the VPU and selects by `bsdf_type` — no divergence, no virtual calls.

Conventions (differ from Mitsuba deliberately — documented, consistent):
  * all directions are in the local shading frame, z = shading normal;
    wi = toward viewer/previous vertex, wo = sampled/next direction;
    both point AWAY from the surface.
  * eval() returns the BSDF value WITHOUT the |cos(theta_o)| factor;
    integrators multiply the cosine explicitly.
  * sample() returns weight = f * |cos| / pdf (the full throughput factor),
    so delta lobes need no special-casing by callers.
  * `transport`: 'radiance' (camera paths) or 'importance' (light/photon
    paths) — affects the 1/eta^2 radiance compression on refraction
    (reference: vertex.h EImportance/ERadiance handling).

reference files: bsdfs/diffuse.cpp, conductor.cpp, dielectric.cpp,
roughconductor.cpp (Beckmann), phong.cpp, plastic.cpp, null.cpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import flax.struct

from ..core import warp
from ..core.math import (fresnel_conductor, fresnel_dielectric, reflect_local,
                         safe_sqrt)
from ..core.tables import take
from ..scene.types import (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE,
                           BSDF_NULL, BSDF_PHONG, BSDF_PLASTIC,
                           BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_DIELECTRIC, Scene)

INV_PI = 1.0 / jnp.pi


@flax.struct.dataclass
class BSDFSample:
    wo: jnp.ndarray        # [N,3] sampled direction (local)
    weight: jnp.ndarray    # [N,3] f * |cos| / pdf
    pdf: jnp.ndarray       # [N] solid-angle pdf (0 for delta lobes)
    is_delta: jnp.ndarray  # [N] bool — discrete lobe
    eta: jnp.ndarray       # [N] relative IOR of the event (1 if none)
    valid: jnp.ndarray     # [N] bool


def _cos(v):
    return v[..., 2]


# ------------------------- microfacet (Beckmann) ---------------------------

def _beckmann_d(m, alpha):
    c2 = jnp.clip(_cos(m) ** 2, 1e-9, 1.0)
    t2 = (1.0 - c2) / c2
    a2 = alpha * alpha
    return jnp.exp(-t2 / a2) / (jnp.pi * a2 * c2 * c2)


def _smith_g1(v, m, alpha):
    cv = _cos(v)
    # sidedness: v must be on the same side as m
    back = (jnp.sum(v * m, axis=-1) * cv) <= 0.0
    tan_t = safe_sqrt(1.0 - cv * cv) / jnp.maximum(jnp.abs(cv), 1e-9)
    a = 1.0 / jnp.maximum(alpha * tan_t, 1e-9)
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    g = jnp.where(a < 1.6, rational, 1.0)
    return jnp.where(back, 0.0, g)


def _sample_beckmann(u, alpha):
    """Sample half-vector from D(m)|cos|; returns (m, pdf)."""
    a2 = alpha * alpha
    log_u = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
    t2 = -a2 * log_u
    c2 = 1.0 / (1.0 + t2)
    cos_t = jnp.sqrt(c2)
    sin_t = safe_sqrt(1.0 - c2)
    phi = 2.0 * jnp.pi * u[..., 1]
    m = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    pdf = _beckmann_d(m, alpha) * cos_t
    return m, pdf


def _rough_dielectric_eval(albedo, alpha, eta, wi, wo, transport):
    """Microfacet transmission model (Walter et al. 2007, Beckmann).

    reference: bsdfs/roughdielectric.cpp eval/pdf. Returns (f [N,3],
    pdf [N]) with the reflection and refraction lobes merged; the
    radiance-transport 1/eta^2 compression is applied on refraction."""
    ci, co = _cos(wi), _cos(wo)
    reflect = (ci * co) > 0.0
    # relative IOR of the transmitted side seen from wi
    rel = jnp.where(ci > 0.0, eta, 1.0 / eta)

    m_r = wi + wo
    m_t = wi + rel[..., None] * wo
    m = jnp.where(reflect[..., None], m_r, m_t)
    m_len = jnp.sqrt(jnp.maximum(jnp.sum(m * m, axis=-1), 1e-18))
    m = m / m_len[..., None]
    m = m * jnp.sign(_cos(m))[..., None]          # orient to +z

    wi_m = jnp.sum(wi * m, axis=-1)
    wo_m = jnp.sum(wo * m, axis=-1)
    F, _ = fresnel_dielectric(wi_m, eta)
    D = _beckmann_d(m, alpha)
    G = _smith_g1(wi, m, alpha) * _smith_g1(wo, m, alpha)
    pdf_m = D * jnp.abs(_cos(m))

    # reflection lobe
    f_r = F * D * G / jnp.maximum(4.0 * jnp.abs(ci * co), 1e-9)
    pdf_r = pdf_m * F / jnp.maximum(4.0 * jnp.abs(wo_m), 1e-9)

    # refraction lobe (Walter eq. 21); sqrtDenom = wi.m + rel * wo.m
    denom = wi_m + rel * wo_m
    denom2 = jnp.maximum(denom * denom, 1e-9)
    f_t = (jnp.abs(wi_m * wo_m) / jnp.maximum(jnp.abs(ci * co), 1e-9)
           * rel * rel * (1.0 - F) * G * D / denom2)
    if transport == "radiance":
        f_t = f_t / jnp.maximum(rel * rel, 1e-9)
    pdf_t = pdf_m * (1.0 - F) * rel * rel * jnp.abs(wo_m) / denom2

    # refraction is only valid when wi/wo straddle the microfacet
    t_ok = (wi_m * wo_m) < 0.0
    f = jnp.where(reflect, f_r, jnp.where(t_ok, f_t, 0.0))
    pdf = jnp.where(reflect, pdf_r, jnp.where(t_ok, pdf_t, 0.0))
    return albedo * f[..., None], pdf


def _rough_dielectric_sample(albedo, alpha, eta, wi, u0, u2, transport):
    """Sample the Walter microfacet transmission model
    (roughdielectric.cpp sample). Returns (wo, weight, pdf, eta_out, ok)."""
    ci = _cos(wi)
    m, pdf_m = _sample_beckmann(u2, alpha)          # up-oriented
    wi_m = jnp.sum(wi * m, axis=-1)
    F, _ = fresnel_dielectric(wi_m, eta)
    choose_refl = u0 < F

    wo_r = 2.0 * wi_m[..., None] * m - wi

    rel = jnp.where(wi_m > 0.0, eta, 1.0 / eta)     # n_t / n_i
    eta_r = 1.0 / rel
    cos2_t = 1.0 - eta_r * eta_r * (1.0 - wi_m * wi_m)
    cos_t = safe_sqrt(cos2_t)
    wo_t = eta_r[..., None] * (-wi) + (
        (eta_r * jnp.abs(wi_m) - cos_t) * jnp.sign(wi_m))[..., None] * m

    wo = jnp.where(choose_refl[..., None], wo_r, wo_t)
    wo_m = jnp.sum(wo * m, axis=-1)
    co = _cos(wo)
    side_ok = jnp.where(choose_refl, (ci * co) > 0.0, (ci * co) < 0.0)

    G = _smith_g1(wi, m, alpha) * _smith_g1(wo, m, alpha)
    # Walter eq. 41 weight for D|cos m| sampling (F cancels with the
    # lobe-selection probability)
    w = jnp.abs(wi_m) * G / jnp.maximum(jnp.abs(ci) * jnp.abs(_cos(m)),
                                        1e-9)
    if transport == "radiance":
        w = jnp.where(choose_refl, w, w / jnp.maximum(rel * rel, 1e-9))

    denom = wi_m + rel * wo_m
    denom2 = jnp.maximum(denom * denom, 1e-9)
    pdf = jnp.where(
        choose_refl,
        pdf_m * F / jnp.maximum(4.0 * jnp.abs(wo_m), 1e-9),
        pdf_m * (1.0 - F) * rel * rel * jnp.abs(wo_m) / denom2)

    ok = side_ok & (G > 0.0) & (jnp.where(choose_refl, True, cos2_t > 0.0))
    weight = albedo * jnp.where(ok, w, 0.0)[..., None]
    eta_out = jnp.where(choose_refl, 1.0, rel)
    return wo, weight, pdf, eta_out, ok


# ------------------------------- eval --------------------------------------

def eval_bsdf(scene: Scene, bi, wi, wo, transport="radiance"):
    """f(wi,wo) without cosine. Delta lobes return 0 (measure mismatch).

    Returns (f [N,3], pdf [N]): pdf of sampling wo given wi under sample().
    """
    btype = take(scene.bsdf_type, bi)
    flip = _twosided_flip(btype, wi)
    wi = _flip_z(wi, flip)
    wo = _flip_z(wo, flip)
    albedo = take(scene.bsdf_albedo, bi)
    alpha = take(scene.bsdf_alpha, bi)
    eta3 = take(scene.bsdf_eta3, bi)
    k3 = take(scene.bsdf_k, bi)
    spec = take(scene.bsdf_k, bi)  # phong: specular reflectance stored in k
    ci, co = _cos(wi), _cos(wo)
    same_side = (ci * co) > 0.0
    upper = (ci > 0.0) & (co > 0.0)

    # diffuse
    f_diff = albedo * INV_PI
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo * jnp.sign(ci)[..., None])

    # rough conductor (Beckmann microfacet)
    h = wi + wo
    h_len = jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1), 1e-18))
    m = h / h_len[..., None]
    m = m * jnp.sign(_cos(m))[..., None]  # upper hemisphere
    D = _beckmann_d(m, alpha)
    G = _smith_g1(wi, m, alpha) * _smith_g1(wo, m, alpha)
    F = fresnel_conductor(jnp.abs(jnp.sum(wi * m, axis=-1)), eta3, k3)
    denom = 4.0 * jnp.maximum(jnp.abs(ci) * jnp.abs(co), 1e-9)
    f_rc = albedo * F * (D * G / denom)[..., None]
    # pdf: D(m)|cos m| / (4 |wi.m|)
    pdf_rc = D * jnp.abs(_cos(m)) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wi * m, axis=-1)), 1e-9)

    # phong: kd/pi + ks (n+2)/(2pi) cos^n(alpha_r); alpha stores exponent
    wr = reflect_local(wi)
    cos_r = jnp.clip(jnp.sum(wr * wo, axis=-1), 0.0, 1.0)
    n_exp = alpha
    f_ph = (albedo * INV_PI
            + spec * ((n_exp + 2.0) * (0.5 * INV_PI)
                      * jnp.power(cos_r, n_exp))[..., None])
    lum_d = jnp.mean(albedo, axis=-1)
    lum_s = jnp.mean(spec, axis=-1)
    w_spec = lum_s / jnp.maximum(lum_d + lum_s, 1e-9)
    pdf_ph = ((1.0 - w_spec) * pdf_diff
              + w_spec * (n_exp + 1.0) * (0.5 * INV_PI)
              * jnp.power(cos_r, n_exp))

    # plastic: Fresnel-weighted diffuse (specular lobe is delta -> 0 here)
    eta = take(scene.bsdf_eta, bi)
    Fi, _ = fresnel_dielectric(jnp.abs(ci), eta)
    Fo, _ = fresnel_dielectric(jnp.abs(co), eta)
    f_pl = albedo * ((1.0 - Fi) * (1.0 - Fo))[..., None] * INV_PI
    pdf_pl = (1.0 - Fi) * pdf_diff

    zero = jnp.zeros_like(f_diff)
    f = jnp.where(upper[..., None], f_diff, zero)
    pdf = jnp.where(upper, pdf_diff, 0.0)

    def sel(mask, fv, pv, side):
        fm = jnp.where(side[..., None], fv, zero)
        pm = jnp.where(side, pv, 0.0)
        return (jnp.where(mask[..., None], fm, f),
                jnp.where(mask, pm, pdf))

    f, pdf = sel(btype == BSDF_ROUGH_CONDUCTOR, f_rc, pdf_rc, upper)
    f, pdf = sel(btype == BSDF_PHONG, f_ph, pdf_ph, upper)
    f, pdf = sel(btype == BSDF_PLASTIC, f_pl, pdf_pl, upper)
    f_rd, pdf_rd = _rough_dielectric_eval(albedo, alpha, eta, wi, wo,
                                          transport)
    f, pdf = sel(btype == BSDF_ROUGH_DIELECTRIC, f_rd, pdf_rd,
                 jnp.ones_like(ci, bool))
    # delta lobes evaluate to zero
    is_delta = ((btype == BSDF_CONDUCTOR) | (btype == BSDF_DIELECTRIC)
                | (btype == BSDF_NULL))
    f = jnp.where(is_delta[..., None], 0.0, f)
    pdf = jnp.where(is_delta, 0.0, pdf)
    del same_side
    return f, pdf


def pdf_bsdf(scene: Scene, bi, wi, wo):
    _, pdf = eval_bsdf(scene, bi, wi, wo)
    return pdf


# ------------------------------ sample -------------------------------------

def _twosided_flip(btype, wi):
    """Built-in `twosided` adapter (reference: bsdfs/twosided.cpp, which
    the scene files wrap around most reflective BSDFs): for NON-
    transmissive lobes a back-side hit evaluates in the z-mirrored frame.
    Transmissive lobes (dielectric / rough dielectric) keep the SIGNED
    frame — the inside/outside sign drives relative IOR and TIR.
    Returns the per-lane z flip (+-1)."""
    transmissive = (btype == BSDF_DIELECTRIC) \
        | (btype == BSDF_ROUGH_DIELECTRIC) | (btype == BSDF_NULL)
    back = _cos(wi) < 0.0
    return jnp.where(back & ~transmissive, -1.0, 1.0)


def _flip_z(v, flip):
    return jnp.stack([v[..., 0], v[..., 1], v[..., 2] * flip], axis=-1)


def sample_bsdf(scene: Scene, bi, wi, u3, transport="radiance") -> BSDFSample:
    """Sample wo given wi. u3: [N,3] uniforms (lobe select + 2D)."""
    btype = take(scene.bsdf_type, bi)
    albedo = take(scene.bsdf_albedo, bi)
    alpha = take(scene.bsdf_alpha, bi)
    eta = take(scene.bsdf_eta, bi)
    eta3 = take(scene.bsdf_eta3, bi)
    k3 = take(scene.bsdf_k, bi)
    spec = take(scene.bsdf_k, bi)
    flip = _twosided_flip(btype, wi)
    wi = _flip_z(wi, flip)
    ci = _cos(wi)
    u0 = u3[..., 0]
    u2 = u3[..., 1:3]

    # ---- diffuse: cosine hemisphere on wi's side ----
    wo_d = warp.square_to_cosine_hemisphere(u2)
    wo_diff = jnp.stack([wo_d[..., 0], wo_d[..., 1],
                         wo_d[..., 2] * jnp.sign(ci)], axis=-1)
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_d)
    w_diff = jnp.broadcast_to(albedo, wo_d.shape[:-1] + (3,))

    # ---- smooth conductor: delta mirror ----
    wo_mir = reflect_local(wi)
    F_c = fresnel_conductor(jnp.abs(ci), eta3, k3)
    w_mir = albedo * F_c

    # ---- smooth dielectric: reflect/refract by Fresnel ----
    Fd, cos_t = fresnel_dielectric(ci, eta)
    choose_refl = u0 < Fd
    rel_eta = jnp.where(ci > 0.0, eta, 1.0 / eta)
    scale = -1.0 / rel_eta
    wo_refr = jnp.stack([scale * wi[..., 0], scale * wi[..., 1], cos_t],
                        axis=-1)
    # radiance transport picks up 1/eta_rel^2 on refraction
    refr_factor = jnp.where(
        jnp.asarray(transport == "radiance"),
        1.0 / (rel_eta * rel_eta), jnp.ones_like(rel_eta))
    wo_diel = jnp.where(choose_refl[..., None], wo_mir, wo_refr)
    w_diel = jnp.where(choose_refl[..., None],
                       jnp.ones_like(albedo),
                       (refr_factor)[..., None] * jnp.ones_like(albedo))
    w_diel = w_diel * albedo
    eta_diel = jnp.where(choose_refl, 1.0, rel_eta)

    # ---- rough conductor ----
    m, pdf_m = _sample_beckmann(u2, alpha)
    m = jnp.stack([m[..., 0], m[..., 1], m[..., 2] * jnp.sign(ci)], axis=-1)
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_rc = 2.0 * wi_dot_m[..., None] * m - wi
    pdf_rc = pdf_m / jnp.maximum(4.0 * jnp.abs(wi_dot_m), 1e-9)
    D = _beckmann_d(m * jnp.sign(_cos(m))[..., None], alpha)
    G = _smith_g1(wi, m, alpha) * _smith_g1(wo_rc, m, alpha)
    F = fresnel_conductor(jnp.abs(wi_dot_m), eta3, k3)
    f_rc = albedo * F * (D * G / jnp.maximum(
        4.0 * jnp.abs(ci * _cos(wo_rc)), 1e-9))[..., None]
    w_rc = f_rc * jnp.abs(_cos(wo_rc))[..., None] / jnp.maximum(
        pdf_rc, 1e-12)[..., None]
    rc_ok = (_cos(wo_rc) * ci) > 0.0
    w_rc = jnp.where(rc_ok[..., None], w_rc, 0.0)

    # ---- phong ----
    lum_d = jnp.mean(albedo, axis=-1)
    lum_s = jnp.mean(spec, axis=-1)
    w_spec_p = lum_s / jnp.maximum(lum_d + lum_s, 1e-9)
    pick_spec = u0 < w_spec_p
    n_exp = alpha
    # sample cos^n lobe around reflection dir
    cos_a = jnp.power(jnp.maximum(u2[..., 0], 1e-12), 1.0 / (n_exp + 1.0))
    sin_a = safe_sqrt(1.0 - cos_a * cos_a)
    phi = 2.0 * jnp.pi * u2[..., 1]
    lobe = jnp.stack([sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a],
                     axis=-1)
    wr = reflect_local(wi)
    # frame around wr
    from ..core.math import coordinate_system, to_world
    s_ax, t_ax = coordinate_system(wr)
    wo_ps = to_world(wr, s_ax, t_ax, lobe)
    wo_ph = jnp.where(pick_spec[..., None], wo_ps, wo_diff)
    f_ph, pdf_ph = _phong_eval_pdf(albedo, spec, n_exp, w_spec_p, wi, wo_ph)
    w_ph = f_ph * jnp.abs(_cos(wo_ph))[..., None] / jnp.maximum(
        pdf_ph, 1e-12)[..., None]
    ph_ok = (_cos(wo_ph) * ci) > 0.0
    w_ph = jnp.where(ph_ok[..., None], w_ph, 0.0)

    # ---- plastic: specular delta with prob F, diffuse else ----
    Fp, _ = fresnel_dielectric(jnp.abs(ci), eta)
    pick_s = u0 < Fp
    wo_pl = jnp.where(pick_s[..., None], wo_mir, wo_diff)
    w_pl = jnp.where(pick_s[..., None], jnp.ones_like(albedo),
                     albedo * (1.0 - Fp)[..., None])
    pdf_pl = jnp.where(pick_s, 0.0, (1.0 - Fp) * pdf_diff)

    # ---- rough dielectric (Walter microfacet transmission) ----
    wo_rd, w_rd, pdf_rd, eta_rd, _ = _rough_dielectric_sample(
        albedo, alpha, eta, wi, u0, u2, transport)

    # ---- null: pass straight through ----
    wo_null = -wi
    w_null = jnp.ones_like(albedo)

    # ---- select by type ----
    def pick(t):
        return (btype == t)

    wo = wo_diff
    wgt = w_diff
    pdf = pdf_diff
    is_delta = jnp.zeros_like(ci, dtype=bool)
    eta_out = jnp.ones_like(ci)

    for t, (woi, wgi, pdi, deli, etai) in {
        BSDF_CONDUCTOR: (wo_mir, w_mir, jnp.zeros_like(ci),
                         jnp.ones_like(ci, bool), jnp.ones_like(ci)),
        BSDF_DIELECTRIC: (wo_diel, w_diel, jnp.zeros_like(ci),
                          jnp.ones_like(ci, bool), eta_diel),
        BSDF_ROUGH_CONDUCTOR: (wo_rc, w_rc, pdf_rc,
                               jnp.zeros_like(ci, bool), jnp.ones_like(ci)),
        BSDF_ROUGH_DIELECTRIC: (wo_rd, w_rd, pdf_rd,
                                jnp.zeros_like(ci, bool), eta_rd),
        BSDF_PHONG: (wo_ph, w_ph, pdf_ph, jnp.zeros_like(ci, bool),
                     jnp.ones_like(ci)),
        BSDF_PLASTIC: (wo_pl, w_pl, pdf_pl, pick_s, jnp.ones_like(ci)),
        BSDF_NULL: (wo_null, w_null, jnp.zeros_like(ci),
                    jnp.ones_like(ci, bool), jnp.ones_like(ci)),
    }.items():
        mask = pick(t)
        wo = jnp.where(mask[..., None], woi, wo)
        wgt = jnp.where(mask[..., None], wgi, wgt)
        pdf = jnp.where(mask, pdi, pdf)
        is_delta = jnp.where(mask, deli, is_delta)
        eta_out = jnp.where(mask, etai, eta_out)

    valid = jnp.max(wgt, axis=-1) > 0.0
    wo = _flip_z(wo, flip)    # back to the caller's (unflipped) frame
    return BSDFSample(wo=wo, weight=wgt, pdf=pdf, is_delta=is_delta,
                      eta=eta_out, valid=valid)


def _phong_eval_pdf(albedo, spec, n_exp, w_spec, wi, wo):
    wr = reflect_local(wi)
    cos_r = jnp.clip(jnp.sum(wr * wo, axis=-1), 0.0, 1.0)
    f = (albedo * INV_PI
         + spec * ((n_exp + 2.0) * (0.5 * INV_PI)
                   * jnp.power(cos_r, n_exp))[..., None])
    pdf_d = jnp.abs(_cos(wo)) * INV_PI
    pdf_s = (n_exp + 1.0) * (0.5 * INV_PI) * jnp.power(cos_r, n_exp)
    return f, (1.0 - w_spec) * pdf_d + w_spec * pdf_s


# --------------------- roughness classification ----------------------------

def effective_roughness(scene: Scene, bi):
    """Scalar roughness proxy for VertexClassifier (gvpm_struct.h:46-104)."""
    btype = take(scene.bsdf_type, bi)
    alpha = take(scene.bsdf_alpha, bi)
    r = jnp.full_like(alpha, jnp.inf)                 # diffuse = inf
    r = jnp.where((btype == BSDF_CONDUCTOR) | (btype == BSDF_DIELECTRIC)
                  | (btype == BSDF_NULL), 0.0, r)
    r = jnp.where((btype == BSDF_ROUGH_CONDUCTOR)
                  | (btype == BSDF_ROUGH_DIELECTRIC), alpha, r)
    # phong exponent -> beckmann-equivalent alpha
    r = jnp.where(btype == BSDF_PHONG,
                  jnp.sqrt(2.0 / (alpha + 2.0)), r)
    r = jnp.where(btype == BSDF_PLASTIC, jnp.inf, r)
    return r


def is_diffuse_like(scene: Scene, bi, bounce_roughness=0.05):
    """True where the vertex classifies 'diffuse' for shift-type selection."""
    return effective_roughness(scene, bi) >= bounce_roughness
