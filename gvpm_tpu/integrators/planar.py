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
    """Phase value from the propagation-cosine plane. mi: [Qt,M] or
    broadcastable medium indices."""
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = scene.med_g[idx]
    hg = hg_phase(cos_theta, g)
    return jnp.where(jnp.abs(g) < 1e-6, INV_FOURPI, hg)


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
