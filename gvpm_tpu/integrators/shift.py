"""Gradient-domain shift operations on stored light paths.

Re-designs the reference's shift machinery (gvpm/shift/operation/
shift_diffuse.cpp diffuseReconnection, shift_volume_photon.cpp
shiftPhotonDiffuse, shift_surface.cpp) as batched closed-form updates on
the per-vertex shift caches recorded by the particle tracer
(ptracer.LightVertices.parent_* / *_base): because every photon carries
its parent vertex and base-segment quantities, a reconnection shift is a
pure ratio computation — no path replay, no pointers.

Math (diffuse reconnection, volume target; shift_diffuse.cpp:10-120):
  base:    alpha = A_prefix * scatter(w) * Tr(b->p) / (pdf_dir * pdf_dist)
  shifted: alpha' = alpha * [scatter'(w')/scatter(w)] * [Tr'/Tr]
                        * [d^2/d'^2]                       (volume measure)
           surface target additionally * [cos'_p/cos_p]    (area measure)
  jacobian of the position map p -> p' = p + delta is 1 (translation,
  getShiftPos, shift_volume_photon.cpp:858).
  MIS pdf ratio (area/volume measure):
           [pdf_dir' * pdf_dist' / d'^2] / [pdf_dir * pdf_dist / d^2]

Known deviations (round 1): the parent->p' visibility ray and the adjoint
shading-normal correction are skipped; transmittance/distance-pdf ratios
use the child vertex's medium for the whole segment (exact when parent
and photon share one homogeneous medium, the paper-scene case).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import coordinate_system, dot, normalize, to_local
from ..core.warp import INV_PI
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import eval_bsdf
from ..scene.types import Scene

VERT_EMITTER = 0   # parent_type of first-bounce photons
VERT_SURFACE = 1
VERT_MEDIUM = 2


def parent_scatter(scene: Scene, ph_parent_type, ph_parent_wi,
                   ph_parent_ns, ph_parent_bsdf, ph_parent_med, new_dir):
    """Scatter value + direction pdf at the photon's parent toward
    `new_dir` (the three parent kinds of diffuseReconnection).

    Returns (scatter [N,3], pdf_dir [N], ok [N]).
    scatter: emitter -> cos; surface -> f*|cos| (importance); medium ->
    sigma_s * p. Matches what ptracer caches in `scatter_base` for the
    base direction.
    """
    # emitter: cosine emission lobe (area.cpp evalDirection)
    cos_e = dot(ph_parent_ns, new_dir)
    sc_em = jnp.maximum(cos_e, 0.0)[..., None] * jnp.ones((1, 3))
    pdf_em = jnp.maximum(cos_e, 0.0) * INV_PI

    # surface: BSDF at parent, importance transport
    ns = ph_parent_ns * jnp.sign(
        dot(ph_parent_ns, -ph_parent_wi, keepdims=True))
    s_ax, t_ax = coordinate_system(ns)
    wi_loc = to_local(ns, s_ax, t_ax, -ph_parent_wi)
    wo_loc = to_local(ns, s_ax, t_ax, new_dir)
    bi = jnp.clip(ph_parent_bsdf, 0, scene.bsdf_type.shape[0] - 1)
    f, pdf_b = eval_bsdf(scene, bi, wi_loc, wo_loc, transport="importance")
    sc_sf = f * jnp.abs(wo_loc[..., 2:3])

    # medium: sigma_s * phase
    mi = jnp.clip(ph_parent_med, 0, scene.med_sigma_s.shape[0] - 1)
    in_med = ph_parent_med >= 0
    pv = ph.eval_phase(scene, mi, -ph_parent_wi, new_dir)
    sigma_s = jnp.where(in_med[..., None], scene.med_sigma_s[mi], 0.0)
    sc_md = sigma_s * pv[..., None]

    is_em = ph_parent_type == VERT_EMITTER
    is_md = ph_parent_type == VERT_MEDIUM
    scatter = jnp.where(is_em[..., None], sc_em,
                        jnp.where(is_md[..., None], sc_md, sc_sf))
    pdf = jnp.where(is_em, pdf_em, jnp.where(is_md, pv, pdf_b))
    ok = jnp.where(is_em, cos_e > 1e-6, True)
    return scatter, pdf, ok


def _sigma_t_of(scene: Scene, med_idx):
    mi = jnp.clip(med_idx, 0, scene.med_sigma_a.shape[0] - 1)
    st = scene.med_sigma_a[mi] + scene.med_sigma_s[mi]
    return jnp.where((med_idx >= 0)[..., None], st, 0.0)


def reconnect_photon(scene: Scene, pv, idx, new_p, target_is_volume):
    """Diffuse-reconnection shift of photon `idx` to position new_p.

    pv: dict of flattened LightVertices arrays; idx: [Q] photon indices;
    new_p: [Q,3] shifted photon positions (same kernel-local offset).

    Returns (alpha_shift [Q,3], pdf_ratio [Q], ok [Q]):
      alpha_shift — shifted photon power (replaces pv['alpha'][idx])
      pdf_ratio   — pdf(shifted segment)/pdf(base segment), area measure,
                    for the MIS weight 1/(1 + ratio-terms)
    """
    b = pv["parent_p"][idx]
    p = pv["p"][idx]
    d_new_v = new_p - b
    d_old_v = p - b
    d2_new = jnp.maximum(dot(d_new_v, d_new_v), 1e-12)
    d2_old = jnp.maximum(dot(d_old_v, d_old_v), 1e-12)
    w_new = d_new_v / jnp.sqrt(d2_new)[..., None]
    w_old = d_old_v / jnp.sqrt(d2_old)[..., None]

    scatter_new, pdf_dir_new, ok_sc = parent_scatter(
        scene, pv["parent_type"][idx], pv["parent_wi"][idx],
        pv["parent_ns"][idx], pv["parent_bsdf"][idx],
        pv["parent_med"][idx], w_new)
    scatter_old = pv["scatter_base"][idx]
    pdf_dir_old = pv["pdf_dir_base"][idx]

    # transmittance + distance-pdf change along the segment (child medium)
    st = _sigma_t_of(scene, pv["med"][idx])
    dd = jnp.sqrt(d2_new) - jnp.sqrt(d2_old)
    tr_ratio = jnp.exp(-st * dd[..., None])
    if target_is_volume:
        dens_new = jnp.mean(st * jnp.exp(-st * jnp.sqrt(d2_new)[..., None]),
                            axis=-1)
        dens_old = jnp.mean(st * jnp.exp(-st * jnp.sqrt(d2_old)[..., None]),
                            axis=-1)
        pdf_dist_ratio = jnp.where(dens_old > 1e-20,
                                   dens_new / jnp.maximum(dens_old, 1e-20),
                                   1.0)
        cos_ratio = jnp.ones_like(dd)
        pdf_cos_ratio = jnp.ones_like(dd)
    else:
        # surface target: pdf_failure ratio + opposing-cosine ratio
        f_new = jnp.mean(jnp.exp(-st * jnp.sqrt(d2_new)[..., None]), axis=-1)
        f_old = jnp.mean(jnp.exp(-st * jnp.sqrt(d2_old)[..., None]), axis=-1)
        pdf_dist_ratio = jnp.where(f_old > 1e-20,
                                   f_new / jnp.maximum(f_old, 1e-20), 1.0)
        ns_p = pv["ns"][idx]
        cos_new = jnp.abs(dot(ns_p, w_new))
        cos_old = jnp.maximum(jnp.abs(dot(ns_p, w_old)), 1e-6)
        cos_ratio = cos_new / cos_old
        pdf_cos_ratio = cos_ratio
        # reject shifts that flip to the other side of the parent surface
        # (shift_volume_photon.cpp:404-411 signDot check)
        par_sf = pv["parent_type"][idx] == VERT_SURFACE
        sign_ok = dot(pv["parent_ns"][idx], w_new) \
            * dot(pv["parent_ns"][idx], w_old) > 0.0
        ok_sc = ok_sc & jnp.where(par_sf, sign_ok, True)

    sc_ratio = scatter_new / jnp.maximum(scatter_old, 1e-20)
    alpha_shift = (pv["alpha"][idx] * sc_ratio * tr_ratio
                   * (d2_old / d2_new * cos_ratio)[..., None])

    pdf_ratio = (pdf_dir_new / jnp.maximum(pdf_dir_old, 1e-20)
                 * pdf_dist_ratio * (d2_old / d2_new) * pdf_cos_ratio)

    ok = (ok_sc & pv["reconnectable"][idx]
          & (jnp.max(scatter_old, axis=-1) > 0.0)
          & (pdf_dir_old > 1e-20) & (pdf_dir_new > 0.0))
    return (jnp.where(ok[..., None], alpha_shift, 0.0),
            jnp.where(ok, pdf_ratio, 0.0), ok)


def mis_weight(pdf_ratio_light, pdf_ratio_cam, jacobian=1.0, ok=None):
    """Balance-heuristic weight of the BASE strategy for one shift pair
    (shift_volume_photon.cpp:470-484): 1/(1 + J * offsetPdf/basePdf).
    Failed shifts get weight 1 (unilateral)."""
    w = 1.0 / (1.0 + jacobian * pdf_ratio_light * pdf_ratio_cam)
    if ok is not None:
        w = jnp.where(ok, w, 1.0)
    return jnp.clip(w, 0.0, 1.0)
