"""Planar (structure-of-planes) math for TPU gather kernels.

TPU memory tiles the last two axes to (8,128); any tensor shaped
[..., M, 3] pads the 3-lane axis to 128 — a 42x memory blowup on every
vector temporary in the gather inner loop. These helpers keep vectors and
spectra as separate scalar planes of shape [Qt, M] (M padded mildly), so
the inner loop runs at full VPU width.

Provides: component gathers, vector algebra on planes, HG phase, and a
gather-time BSDF evaluator covering the non-delta lobes (diffuse, rough
conductor, phong, plastic diffuse) — delta lobes contribute nothing to a
density estimate.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import (BSDF_DIFFUSE, BSDF_PHONG, BSDF_PLASTIC,
                           BSDF_ROUGH_CONDUCTOR, Scene)

VERT_EMITTER = 0
VERT_SURFACE = 1
VERT_MEDIUM = 2

INV_PI = 1.0 / jnp.pi
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def gather3(arr, idx):
    """[P,3] photon field -> three [Qt,M] planes.

    One row gather + unstack: the [Qt,M,3] form exists only transiently
    at the gather; all arithmetic stays planar."""
    g = arr[idx]
    return g[..., 0], g[..., 1], g[..., 2]


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def neg3(a):
    return (-a[0], -a[1], -a[2])


def expand(v):
    """Per-query vector [Qt,3] -> planes broadcastable against [Qt,M]."""
    return (v[:, 0:1], v[:, 1:2], v[:, 2:3])


def norm3(a, eps=1e-12):
    l2 = dot3(a, a)
    inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(l2, eps)))
    return scale3(a, inv), jnp.sqrt(jnp.maximum(l2, eps))


def hg_phase(cos_theta, g):
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) \
        / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def eval_phase_planar(scene: Scene, mi, cos_theta):
    """Phase value from the propagation-cosine plane, mirroring
    render.phase.eval_phase's type dispatch (iso/HG/Rayleigh). mi:
    [Qt,M] or broadcastable medium indices."""
    from ..scene.types import PHASE_HG, PHASE_RAYLEIGH
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = scene.med_g[idx]
    ptype = scene.med_phase[idx]
    hg = hg_phase(cos_theta, g)
    ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)
    return jnp.where(ptype == PHASE_HG, hg,
                     jnp.where(ptype == PHASE_RAYLEIGH, ray, INV_FOURPI))


def to_local_planar(frame_n, frame_s, frame_t, w):
    """World planes -> local coords (three planes). frame_*: per-query
    [Qt,3]; w: planes [Qt,M]."""
    ns, ss, ts = expand(frame_n), expand(frame_s), expand(frame_t)
    return dot3(ss, w), dot3(ts, w), dot3(ns, w)


def eval_bsdf_gather(scene: Scene, bi, wi_loc, wo_loc):
    """Gather-time BSDF value f(wi,wo) (no cosine), non-delta lobes only.

    bi: [Qt,M] (or broadcastable) bsdf ids; wi_loc/wo_loc: local-frame
    planes (tuples of [Qt,M]). Returns (fr, fg, fb) planes.
    """
    bic = jnp.clip(bi, 0, scene.bsdf_type.shape[0] - 1)
    btype = scene.bsdf_type[bic]
    alb_r = scene.bsdf_albedo[bic, 0]
    alb_g = scene.bsdf_albedo[bic, 1]
    alb_b = scene.bsdf_albedo[bic, 2]
    alpha = scene.bsdf_alpha[bic]

    ci = wi_loc[2]
    co = wo_loc[2]
    upper = (ci > 0.0) & (co > 0.0)

    # diffuse
    w_diff = INV_PI

    # rough conductor (Beckmann, scalar Fresnel approx via avg eta/k)
    hx, hy, hz = wi_loc[0] + wo_loc[0], wi_loc[1] + wo_loc[1], ci + co
    hl = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    mz = jnp.abs(hz / hl)
    c2 = jnp.clip(mz * mz, 1e-9, 1.0)
    t2 = (1.0 - c2) / c2
    a2 = alpha * alpha
    D = jnp.exp(-t2 / jnp.maximum(a2, 1e-9)) \
        / jnp.maximum(jnp.pi * a2 * c2 * c2, 1e-12)

    def g1(cv):
        tan_t = jnp.sqrt(jnp.maximum(1.0 - cv * cv, 0.0)) \
            / jnp.maximum(jnp.abs(cv), 1e-9)
        a = 1.0 / jnp.maximum(alpha * tan_t, 1e-9)
        rat = (3.535 * a + 2.181 * a * a) \
            / (1.0 + 2.276 * a + 2.577 * a * a)
        return jnp.where(a < 1.6, rat, 1.0)

    G = g1(ci) * g1(co)
    f_rc = D * G / jnp.maximum(4.0 * jnp.abs(ci) * jnp.abs(co), 1e-9)
    # per-channel conductor Fresnel at the half vector
    cos_im = jnp.abs((wi_loc[0] * hx + wi_loc[1] * hy + ci * hz) / hl)

    def fres_c(ch):
        eta = scene.bsdf_eta3[bic, ch]
        k = scene.bsdf_k[bic, ch]
        ci2 = jnp.clip(cos_im * cos_im, 0.0, 1.0)
        e2k2 = eta * eta + k * k
        t0 = e2k2 * ci2
        two = 2.0 * eta * cos_im
        r_par2 = (t0 - two + 1.0 - ci2 + ci2 * ci2) / jnp.maximum(
            t0 + two + 1.0 - ci2 + ci2 * ci2, 1e-12)
        r_perp2 = (e2k2 - two + ci2) / jnp.maximum(e2k2 + two + ci2,
                                                   1e-12)
        return jnp.clip(0.5 * (r_par2 + r_perp2), 0.0, 1.0)

    # phong
    wr = (-wi_loc[0], -wi_loc[1], ci)
    cos_r = jnp.clip(dot3(wr, wo_loc), 0.0, 1.0)
    spec_r = scene.bsdf_k[bic, 0]
    spec_g = scene.bsdf_k[bic, 1]
    spec_b = scene.bsdf_k[bic, 2]
    n_exp = alpha
    ph_spec = (n_exp + 2.0) * (0.5 * INV_PI) * jnp.power(cos_r, n_exp)

    # plastic: diffuse term with fresnel attenuation (approx const 0.9)
    w_pl = 0.81 * INV_PI

    is_d = btype == BSDF_DIFFUSE
    is_rc = btype == BSDF_ROUGH_CONDUCTOR
    is_ph = btype == BSDF_PHONG
    is_pl = btype == BSDF_PLASTIC

    def chan(ch, alb, spec):
        f = jnp.where(is_d, alb * w_diff, 0.0)
        f = jnp.where(is_rc, alb * f_rc * fres_c(ch), f)
        f = jnp.where(is_ph, alb * INV_PI + spec * ph_spec, f)
        f = jnp.where(is_pl, alb * w_pl, f)
        return jnp.where(upper, f, 0.0)

    return (chan(0, alb_r, spec_r), chan(1, alb_g, spec_g),
            chan(2, alb_b, spec_b))


def frame_planar(n):
    """Duff et al. branchless ONB on planes. n: tuple of [Qt,M] planes
    (unit). Returns (s, t) plane-tuples — identical formulas to
    core.math.coordinate_system so local coords match the cached
    vector-path values bit-for-bit."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    t = (b, sign + ny * ny * a, -ny)
    return s, t


def to_local_planes(n, s, t, w):
    """All-planes variant of to_local_planar (frame is per-candidate)."""
    return dot3(s, w), dot3(t, w), dot3(n, w)


def _fresnel_dielectric_planar(cos_i, eta):
    """Mirror of core.math.fresnel_dielectric (F only) on planes."""
    rel_eta = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    abs_ci = jnp.abs(cos_i)
    sin2_t = (1.0 - abs_ci * abs_ci) / (rel_eta * rel_eta)
    tir = sin2_t >= 1.0
    abs_ct = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_s = (abs_ci - rel_eta * abs_ct) / jnp.maximum(
        abs_ci + rel_eta * abs_ct, 1e-12)
    r_p = (rel_eta * abs_ci - abs_ct) / jnp.maximum(
        rel_eta * abs_ci + abs_ct, 1e-12)
    F = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, F)


def _smith_g1_planar(cv, v_dot_m, alpha):
    back = (v_dot_m * cv) <= 0.0
    tan_t = jnp.sqrt(jnp.maximum(1.0 - cv * cv, 0.0)) \
        / jnp.maximum(jnp.abs(cv), 1e-9)
    a = 1.0 / jnp.maximum(alpha * tan_t, 1e-9)
    rational = (3.535 * a + 2.181 * a * a) \
        / (1.0 + 2.276 * a + 2.577 * a * a)
    g = jnp.where(a < 1.6, rational, 1.0)
    return jnp.where(back, 0.0, g)


def eval_bsdf_pdf_gather(scene: Scene, bi, wi_loc, wo_loc):
    """Planar (f, pdf) mirroring render.bsdf.eval_bsdf EXACTLY for the
    reconnectable reflective lobes: diffuse, rough conductor (Beckmann),
    phong, plastic. Delta lobes and rough dielectric return 0 (such
    parents are non-reconnectable or fall to the unilateral weight).

    Exactness matters: the reconnection shift divides this value/pdf by
    the base values that the particle tracer cached from eval_bsdf
    (ptracer LightVertices.scatter_base / pdf_dir_base) — an approximate
    formula here would bias the ratio, not just lose accuracy.
    Returns (fr, fg, fb, pdf) planes [Qt,M].
    """
    bic = jnp.clip(bi, 0, scene.bsdf_type.shape[0] - 1)
    params = dict(
        btype=scene.bsdf_type[bic],
        alb=(scene.bsdf_albedo[bic, 0], scene.bsdf_albedo[bic, 1],
             scene.bsdf_albedo[bic, 2]),
        spec=(scene.bsdf_k[bic, 0], scene.bsdf_k[bic, 1],
              scene.bsdf_k[bic, 2]),
        eta3=(scene.bsdf_eta3[bic, 0], scene.bsdf_eta3[bic, 1],
              scene.bsdf_eta3[bic, 2]),
        alpha=scene.bsdf_alpha[bic],
        eta1=scene.bsdf_eta[bic])
    return eval_bsdf_pdf_params(params, wi_loc, wo_loc)


def eval_bsdf_pdf_params(params, wi_loc, wo_loc):
    """eval_bsdf_pdf_gather core on pre-fetched parameter planes —
    the TPU-fast path: indexed [Qt,M] table lookups pay per-index, so
    hot loops bake the parameters into the photon row table
    (gradient_gather.pack_photons) instead of looking them up here.
    params: btype, alb (3 planes), spec (3), eta3 (3), alpha, eta1.
    """
    btype = params["btype"]
    alb = params["alb"]
    spec = params["spec"]
    alpha = params["alpha"]
    eta1 = params["eta1"]

    ci, co = wi_loc[2], wo_loc[2]
    upper = (ci > 0.0) & (co > 0.0)

    # diffuse: f = albedo/pi, pdf = cos hemi on wi's side
    pdf_diff = jnp.abs(co) * INV_PI
    pdf_diff = jnp.where((ci * co) > 0.0, pdf_diff, 0.0)

    # rough conductor (Beckmann)
    hx, hy, hz = (wi_loc[0] + wo_loc[0], wi_loc[1] + wo_loc[1], ci + co)
    hl = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    sgn = jnp.sign(hz / hl)
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    mx, my, mz = sgn * hx / hl, sgn * hy / hl, sgn * hz / hl
    c2 = jnp.clip(mz * mz, 1e-9, 1.0)
    t2 = (1.0 - c2) / c2
    a2 = alpha * alpha
    D = jnp.exp(-t2 / a2) / (jnp.pi * a2 * c2 * c2)
    wi_m = wi_loc[0] * mx + wi_loc[1] * my + ci * mz
    wo_m = wo_loc[0] * mx + wo_loc[1] * my + co * mz
    G = _smith_g1_planar(ci, wi_m, alpha) * _smith_g1_planar(co, wo_m, alpha)
    denom = 4.0 * jnp.maximum(jnp.abs(ci) * jnp.abs(co), 1e-9)
    f_rc_s = D * G / denom
    pdf_rc = D * jnp.abs(mz) / jnp.maximum(4.0 * jnp.abs(wi_m), 1e-9)

    def fres_c(ch):
        eta = params["eta3"][ch]
        k = params["spec"][ch]
        ci2 = jnp.clip(wi_m * wi_m, 0.0, 1.0)
        aci = jnp.sqrt(ci2)
        e2k2 = eta * eta + k * k
        t0 = e2k2 * ci2
        two = 2.0 * eta * aci
        r_par2 = (t0 - two + 1.0 - ci2 + ci2 * ci2) / jnp.maximum(
            t0 + two + 1.0 - ci2 + ci2 * ci2, 1e-12)
        r_perp2 = (e2k2 - two + ci2) / jnp.maximum(e2k2 + two + ci2, 1e-12)
        return jnp.clip(0.5 * (r_par2 + r_perp2), 0.0, 1.0)

    # phong (albedo/pi + spec*(n+2)/(2pi) cos^n); pdf mixture
    cos_r = jnp.clip(-wi_loc[0] * wo_loc[0] - wi_loc[1] * wo_loc[1]
                     + ci * co, 0.0, 1.0)
    n_exp = alpha
    ph_spec = (n_exp + 2.0) * (0.5 * INV_PI) * jnp.power(cos_r, n_exp)
    lum_d = (alb[0] + alb[1] + alb[2]) / 3.0
    lum_s = (spec[0] + spec[1] + spec[2]) / 3.0
    w_spec = lum_s / jnp.maximum(lum_d + lum_s, 1e-9)
    pdf_ph = ((1.0 - w_spec) * pdf_diff
              + w_spec * (n_exp + 1.0) * (0.5 * INV_PI)
              * jnp.power(cos_r, n_exp))

    # plastic: Fresnel-weighted diffuse
    Fi = _fresnel_dielectric_planar(jnp.abs(ci), eta1)
    Fo = _fresnel_dielectric_planar(jnp.abs(co), eta1)
    f_pl_s = (1.0 - Fi) * (1.0 - Fo) * INV_PI
    pdf_pl = (1.0 - Fi) * pdf_diff

    is_d = btype == BSDF_DIFFUSE
    is_rc = btype == BSDF_ROUGH_CONDUCTOR
    is_ph = btype == BSDF_PHONG
    is_pl = btype == BSDF_PLASTIC

    def chan(ch):
        f = jnp.where(is_d, alb[ch] * INV_PI, 0.0)
        f = jnp.where(is_rc, alb[ch] * f_rc_s * fres_c(ch), f)
        f = jnp.where(is_ph, alb[ch] * INV_PI + spec[ch] * ph_spec, f)
        f = jnp.where(is_pl, alb[ch] * f_pl_s, f)
        return jnp.where(upper, f, 0.0)

    pdf = jnp.where(is_d, pdf_diff, 0.0)
    pdf = jnp.where(is_rc, pdf_rc, pdf)
    pdf = jnp.where(is_ph, pdf_ph, pdf)
    pdf = jnp.where(is_pl, pdf_pl, pdf)
    pdf = jnp.where(upper, pdf, 0.0)
    return chan(0), chan(1), chan(2), pdf


def parent_scatter_planar(scene: Scene, ptype, pwi, pns, pbsdf, pmed,
                          w_new):
    """Planar mirror of shift.parent_scatter — table-lookup front end;
    the hot loops use parent_scatter_params with pre-packed parameters
    (TPU [Qt,M]-indexed lookups pay per-index)."""
    bic = jnp.clip(pbsdf, 0, scene.bsdf_type.shape[0] - 1)
    bparams = dict(
        btype=scene.bsdf_type[bic],
        alb=(scene.bsdf_albedo[bic, 0], scene.bsdf_albedo[bic, 1],
             scene.bsdf_albedo[bic, 2]),
        spec=(scene.bsdf_k[bic, 0], scene.bsdf_k[bic, 1],
              scene.bsdf_k[bic, 2]),
        eta3=(scene.bsdf_eta3[bic, 0], scene.bsdf_eta3[bic, 1],
              scene.bsdf_eta3[bic, 2]),
        alpha=scene.bsdf_alpha[bic],
        eta1=scene.bsdf_eta[bic])
    mi = jnp.clip(pmed, 0, scene.med_sigma_s.shape[0] - 1)
    in_med = pmed >= 0
    mparams = dict(
        sigs=(jnp.where(in_med, scene.med_sigma_s[mi, 0], 0.0),
              jnp.where(in_med, scene.med_sigma_s[mi, 1], 0.0),
              jnp.where(in_med, scene.med_sigma_s[mi, 2], 0.0)),
        g=scene.med_g[mi], ptype=scene.med_phase[mi])
    return parent_scatter_params(ptype, pwi, pns, bparams, mparams, w_new)


def phase_params(cos_theta, g, ptype):
    """eval_phase on pre-fetched parameter planes."""
    from ..scene.types import PHASE_HG, PHASE_RAYLEIGH
    hg = hg_phase(cos_theta, g)
    ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)
    return jnp.where(ptype == PHASE_HG, hg,
                     jnp.where(ptype == PHASE_RAYLEIGH, ray, INV_FOURPI))


def parent_scatter_params(ptype, pwi, pns, bparams, mparams, w_new):
    """Scatter value + direction pdf at a photon's parent toward w_new,
    all material parameters supplied as planes.

    ptype: [Qt,M]; pwi/pns/w_new: plane-tuples; bparams: see
    eval_bsdf_pdf_params; mparams: sigs (3 planes), g, ptype.
    Returns (sr, sg, sb, pdf, ok).
    """
    # emitter parent: cosine emission lobe
    cos_e = dot3(pns, w_new)
    sc_em = jnp.maximum(cos_e, 0.0)
    pdf_em = sc_em * INV_PI

    # surface parent: BSDF (importance transport; the reconnectable
    # reflective lobes are transport-symmetric)
    nwi = neg3(pwi)
    flip = jnp.sign(dot3(pns, nwi))
    flip = jnp.where(flip == 0.0, 1.0, flip)
    nsf = scale3(pns, flip)
    s_ax, t_ax = frame_planar(nsf)
    wi_l = to_local_planes(nsf, s_ax, t_ax, nwi)
    wo_l = to_local_planes(nsf, s_ax, t_ax, w_new)
    fr, fg, fb, pdf_b = eval_bsdf_pdf_params(bparams, wi_l, wo_l)
    acos = jnp.abs(wo_l[2])

    # medium parent: sigma_s * phase
    cos_ph = dot3(nwi, w_new)  # cos between propagation dirs: (-wi).w_new
    pv = phase_params(-cos_ph, mparams["g"], mparams["ptype"])
    sig = mparams["sigs"]

    is_em = ptype == VERT_EMITTER
    is_md = ptype == VERT_MEDIUM

    def pick(em, md, sf):
        return jnp.where(is_em, em, jnp.where(is_md, md, sf))

    sr = pick(sc_em, sig[0] * pv, fr * acos)
    sg = pick(sc_em, sig[1] * pv, fg * acos)
    sb = pick(sc_em, sig[2] * pv, fb * acos)
    pdf = pick(pdf_em, pv, pdf_b)
    # pure logical form (a bool-valued where lowers to an i8->i1
    # truncation Mosaic rejects)
    ok = (~is_em) | (cos_e > 1e-6)
    return sr, sg, sb, pdf, ok
