"""G-PT path-space shift machine: reconnection + half-vector shifts.

Implements the reference's shift state machine (gpt/gpt.cpp:502
`evaluate`, RayState/VertexType classification gpt.cpp:125-187,
reconnection shift gpt.cpp:298, half-vector shift gpt.cpp:216 incl. the
volume variant gpt.cpp:196) as a lockstep wavefront: N base lanes + 4N
offset lanes advanced together through one `lax.scan` over bounces.

Shift composition per bounce (each factor in its own domain, composed
multiplicatively — the reference does the same):

- parallel bounce (pre-reconnection): the offset replays the base's
  primary samples at ITS OWN vertex (`sample_bsdf`/`sample_phase` with
  the same uniforms). For microfacet BSDFs the sampled half vector is a
  deterministic function of the uniforms in the local frame, so the
  replay IS the half-vector shift; for delta BSDFs it is the mirror /
  refraction copy. In the replay (primary-sample-space) measure the
  Jacobian is 1 and the pdf ratio is 1; the value ratio is
  weight_offset/weight_base.
- medium copy: when the base scatters in a medium at distance t, the
  offset scatters at the same t along its own ray (distance-domain copy,
  gpt.cpp medium handling); value ratio sigma_s'Tr'/sigma_s Tr, pdf
  ratio from the distance-sampling densities.
- reconnection (gpt.cpp:298): as soon as the previous base AND offset
  vertices are both diffuse-classified (is_diffuse_like — the
  VertexClassifier roughness threshold, gvpm_struct.h:46) and the new
  base vertex is diffuse too, the offset connects its vertex straight to
  the new base vertex. Area-measure Jacobian is 1 (shared target);
  the ratio factors are scatter value x geometry x transmittance, and
  the MIS pdf ratio converts both direction pdfs to the shared measure —
  identical bookkeeping to shift.py::reconnect_photon, but on the camera
  (radiance) side.
- after reconnection the incoming directions still differ at the shared
  vertex: the next scatter applies f(wi'->wo)/f(wi->wo) (the reference's
  RECENTLY_CONNECTED state) and the paths merge (CONNECTED): every later
  contribution is base_contribution * fr.

MIS per contribution: balance heuristic over the pair of shift-mapped
strategies, w = 1/(1 + pr) with pr the accumulated (pdf_offset x J)/
pdf_base ratio; failed shifts contribute w=1, C_shift=0 (unilateral),
exactly the reference's main/shifted weighting.

Known deviations (documented, not silent): the offset's NEE segment
pdf-ratio and reconnection distance-pdf use the medium at the offset
vertex for the whole segment (exact for the single-homogeneous-medium
paper scenes); the spot-falloff change at the shifted NEE vertex is
taken as 1 (the point/spot 1/d^2 ratio IS applied; directional/env
samples have no distance falloff and get ratio 1); "very direct" light
(emitter seen by the camera) is excluded from gradients like the
reference (-direct buffer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..core.config import VolPathConfig
from ..core.math import coordinate_system, dot, normalize, to_local, to_world
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import eval_bsdf, is_diffuse_like, sample_bsdf
from ..render.emitter import (env_le, eval_radiance, pdf_env_sa,
                              sample_direct)
from ..render.visibility import medium_transition, segment_transmittance
from ..scene.camera import generate_rays
from ..scene.intersect import intersect
from ..scene.types import BSDF_NULL, Scene
from .volpath import RAY_EPS, _light_pdf_sa, _mis, _offset_ray

OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1))
RIGHT, LEFT, DOWN, UP = 0, 1, 2, 3

# offset lane states
ALIVE, CONNECTED, DEAD = 0, 1, 2


def _t4(x):
    """Tile a base array [N,...] to the 4 offset lanes [4N,...]."""
    return jnp.tile(x, (4,) + (1,) * (x.ndim - 1))


def _safe_div(a, b, eps=1e-20):
    return a / jnp.maximum(b, eps)


def _vertex_scatter(scene, is_med, med_idx, bi, ns, wi, wo):
    """Radiance-transport scatter value f (x |cos| for surfaces, x sigma_s
    for media) and solid-angle pdf at a camera-subpath vertex.

    wi points AWAY from the vertex toward the previous vertex; wo toward
    the next. Returns (value [..,3], pdf [..]).
    """
    # surface branch (true normal; BSDF evals are sign-aware)
    nsf = ns
    s_ax, t_ax = coordinate_system(nsf)
    wi_loc = to_local(nsf, s_ax, t_ax, wi)
    wo_loc = to_local(nsf, s_ax, t_ax, wo)
    bi_c = jnp.clip(bi, 0, scene.bsdf_type.shape[0] - 1)
    f_s, pdf_s = eval_bsdf(scene, bi_c, wi_loc, wo_loc)
    val_s = f_s * jnp.abs(wo_loc[..., 2:3])
    # medium branch
    mi = jnp.clip(med_idx, 0, scene.med_sigma_s.shape[0] - 1)
    pv = ph.eval_phase(scene, mi, wi, wo)
    sig_s = jnp.where((med_idx >= 0)[..., None], scene.med_sigma_s[mi], 0.0)
    val_m = sig_s * pv[..., None]
    im = is_med[..., None]
    return (jnp.where(im, val_m, val_s), jnp.where(is_med, pv, pdf_s))


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_pass(scene: Scene, cfg: VolPathConfig, seed, it):
    """One spp of the path-space-shift G-PT.

    Returns (primal [H,W,3] incl. very-direct, gx, gy, direct) — gradient
    buffers carry per-contribution MIS weights (0.5/0.5 interior split as
    in gpt.py, border weight 1)."""
    from .gvpm import _reject_heterogeneous
    _reject_heterogeneous(scene)
    H, W = scene.height, scene.width
    n = H * W
    n_steps = cfg.max_depth + cfg.null_bounces
    key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_pix, k_path = jax.random.split(key)

    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    u_pix = jax.random.uniform(k_pix, (n, 2))
    o_b, d_b, _ = generate_rays(scene, px, py, u_pix)
    off_px = jnp.concatenate([px + dx for dx, dy in OFFSETS])
    off_py = jnp.concatenate([py + dy for dx, dy in OFFSETS])
    o_o, d_o, _ = generate_rays(scene, off_px, off_py, jnp.tile(u_pix, (4, 1)))

    m = 4 * n
    base = dict(
        o=o_b, d=d_b, med=jnp.broadcast_to(scene.cam_medium, (n,)),
        thr=jnp.ones((n, 3)), L=jnp.zeros((n, 3)), Ld=jnp.zeros((n, 3)),
        active=jnp.ones((n,), bool), spec=jnp.ones((n,), bool),
        last_pdf=jnp.zeros((n,)), scatter_p=o_b,
        f_cos=jnp.ones((n, 3)),                 # scatter value at y_i -> d
        tr_seg=jnp.ones((n, 3)),                # Tr since last scatter
        pdfdist_seg=jnp.ones((n,)),             # dist-pdf since last scatter
        depth=jnp.zeros((n,), jnp.int32),
    )
    offs = dict(
        st=jnp.full((m,), ALIVE, jnp.int32),
        o=o_o, d=d_o, med=jnp.broadcast_to(scene.cam_medium, (m,)),
        fr=jnp.ones((m, 3)), pr=jnp.ones((m,)),
        can_connect=jnp.zeros((m,), bool),
        zp_p=o_o, zp_ns=jnp.zeros((m, 3)), zp_wi=-d_o,
        zp_bsdf=jnp.zeros((m,), jnp.int32), zp_med=jnp.zeros((m,), jnp.int32),
        zp_is_med=jnp.zeros((m,), bool),
        # fr/pr snapshots at the reconnection parent (taken at vertex
        # creation, BEFORE that bounce's scatter/replay ratio and any
        # later null-hop partial-segment ratios are folded in): the
        # reconnection replaces the parent's direction choice and the
        # whole following segment, so composing from the running fr/pr
        # would divide base pre-null factors out twice and keep stale
        # offset null-segment factors.
        zp_fr=jnp.ones((m, 3)), zp_pr=jnp.ones((m,)),
        last_pdf=jnp.zeros((m,)), scatter_p=o_o, spec=jnp.ones((m,), bool),
        G=jnp.zeros((m, 3)),
    )
    state = dict(**{f"b_{k}": v for k, v in base.items()},
                 **{f"s_{k}": v for k, v in offs.items()})

    def body(state, k_step):
        b = {k[2:]: v for k, v in state.items() if k.startswith("b_")}
        s = {k[2:]: v for k, v in state.items() if k.startswith("s_")}
        k_med, k_nee, k_scat, k_rr = jax.random.split(k_step, 4)
        u_med = jax.random.uniform(k_med, (n, 2))
        u_nee3 = jax.random.uniform(k_nee, (n, 3))
        u_ph2 = jax.random.uniform(k_scat, (n, 2))
        u_bs3 = jax.random.uniform(k_scat, (n, 3))
        u_rr = jax.random.uniform(k_rr, (n,))

        active = b["active"]
        thr, cur_med = b["thr"], b["med"]
        first = b["depth"] == 0

        # ----------------- base segment (volpath semantics) --------------
        hit = intersect(scene, b["o"], b["d"])
        t_far = jnp.where(hit.valid, hit.t, jnp.inf)
        ms = med.sample_distance(scene, cur_med, b["o"], b["d"], t_far,
                                 u_med[:, 0], u_channel=u_med[:, 1])
        mevt = active & ms.success
        sevt = active & ~ms.success & hit.valid
        esc = active & ~ms.success & ~hit.valid
        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL
        nullx = sevt & is_null
        scat_s = sevt & ~is_null

        thr_med = thr * ms.sigma_s * ms.transmittance \
            * _safe_div(1.0, ms.pdf_success)[..., None]
        thr_surf = thr * ms.transmittance \
            * _safe_div(1.0, ms.pdf_failure)[..., None]

        # base vertex y1 (event position) + its classification
        y1 = jnp.where(mevt[..., None], ms.p, hit.p)
        y1_diffuse = mevt | (scat_s & is_diffuse_like(scene, bi))
        ns_b = hit.ns  # true normal: dielectric needs the side sign
        s_axb, t_axb = coordinate_system(ns_b)
        wi_locb = to_local(ns_b, s_axb, t_axb, -b["d"])

        # base segment totals since last real scatter (null hops included)
        d2_b = jnp.maximum(dot(y1 - b["scatter_p"], y1 - b["scatter_p"]),
                           1e-12)
        tr_b_tot = b["tr_seg"] * ms.transmittance
        pdfdist_b = b["pdfdist_seg"] * jnp.where(mevt, ms.pdf_success,
                                                 ms.pdf_failure)
        cosT_b = jnp.where(mevt, 1.0, jnp.abs(dot(hit.ng, b["d"])))

        # ----------------- offsets: advance (a') --------------------------
        alive = s["st"] == ALIVE
        conn = s["st"] == CONNECTED
        hit_o = intersect(scene, s["o"], s["d"])
        t_far_o = jnp.where(hit_o.valid, hit_o.t, jnp.inf)
        bi_o = jnp.clip(scene.prim_bsdf(hit_o.prim), 0,
                        scene.bsdf_type.shape[0] - 1)
        null_o = scene.bsdf_type[bi_o] == BSDF_NULL

        evt_scatter = mevt | scat_s                   # base has a vertex
        do_recon = alive & s["can_connect"] & _t4(evt_scatter & y1_diffuse)

        # --- reconnection to the shared base vertex y1 ---
        y1_t = _t4(y1)
        seg_o = y1_t - s["zp_p"]
        d2_o = jnp.maximum(dot(seg_o, seg_o), 1e-12)
        wl_rc = seg_o / jnp.sqrt(d2_o)[..., None]
        f_rc, pdf_rc = _vertex_scatter(scene, s["zp_is_med"], s["zp_med"],
                                       s["zp_bsdf"], s["zp_ns"], s["zp_wi"],
                                       wl_rc)
        zp_off = jnp.where(s["zp_is_med"][..., None], s["zp_p"],
                           _offset_ray(s["zp_p"], s["zp_ns"], wl_rc))
        tr_rc = segment_transmittance(scene, zp_off, y1_t, s["zp_med"])
        dist_rc = jnp.sqrt(d2_o)
        ps_rc, pf_rc = med.pdf_distance(scene, s["zp_med"], dist_rc,
                                        dist_rc + RAY_EPS, True)
        pdfdist_rc = jnp.where(_t4(mevt), ps_rc, pf_rc)
        cosT_rc = jnp.where(_t4(mevt), 1.0,
                            jnp.abs(dot(_t4(hit.ng), wl_rc)))
        # reject reconnections that flip to the other side of the parent
        # surface vs the offset's original outgoing direction (the signDot
        # check, shift_volume_photon.cpp:404-411)
        side_ok = jnp.where(
            s["zp_is_med"], True,
            dot(s["zp_ns"], wl_rc) * dot(s["zp_ns"], s["d"]) > 0.0)
        f_cos_b4 = _t4(b["f_cos"])
        rc_ok = do_recon & side_ok \
            & (jnp.max(f_rc, axis=-1) > 0.0) & (pdf_rc > 0.0) \
            & (jnp.max(tr_rc, axis=-1) > 0.0) \
            & (jnp.max(f_cos_b4, axis=-1) > 1e-20) \
            & (_t4(b["last_pdf"]) > 1e-20) & (_t4(pdfdist_b) > 1e-20)
        fr_rc = s["zp_fr"] * _safe_div(f_rc, f_cos_b4) \
            * _safe_div(tr_rc, _t4(tr_b_tot)) \
            * (_safe_div(cosT_rc, _t4(cosT_b), 1e-6)
               * _t4(d2_b) / d2_o)[..., None]
        pr_rc = s["zp_pr"] * _safe_div(pdf_rc, _t4(b["last_pdf"])) \
            * _safe_div(pdfdist_rc, _t4(pdfdist_b)) \
            * _safe_div(cosT_rc, _t4(cosT_b), 1e-6) * _t4(d2_b) / d2_o

        # --- parallel advance (no reconnection this step) ---
        par = alive & ~do_recon
        in_med_o = s["med"] >= 0
        # medium copy: same distance t_b along the offset ray
        t_b4 = _t4(ms.t)
        z_med = s["o"] + s["d"] * t_b4[..., None]
        tr_om = med.transmittance(scene, s["med"], t_b4, o=s["o"], d=s["d"])
        ps_o, _ = med.pdf_distance(scene, s["med"], t_b4, t_far_o, False)
        sig_s_o = jnp.where(
            in_med_o[..., None],
            scene.med_sigma_s[jnp.clip(s["med"], 0,
                                       scene.med_sigma_s.shape[0] - 1)], 0.0)
        ok_med = par & _t4(mevt) & in_med_o & (t_b4 < t_far_o)
        fr_med = s["fr"] * _safe_div(sig_s_o * tr_om,
                                     _t4(ms.sigma_s * ms.transmittance))
        pr_med = s["pr"] * _safe_div(ps_o, _t4(ms.pdf_success))
        # surface advance: own hit, event class (null-ness) must match
        tr_os = med.transmittance(scene, s["med"], hit_o.t,
                                  o=s["o"], d=s["d"])
        _, pf_o = med.pdf_distance(scene, s["med"], hit_o.t, hit_o.t, True)
        ok_surf = par & _t4(sevt) & hit_o.valid & (null_o == _t4(is_null))
        fr_sf = s["fr"] * _safe_div(tr_os, _t4(ms.transmittance))
        pr_sf = s["pr"] * _safe_div(pf_o, _t4(ms.pdf_failure))
        ok_esc = par & _t4(esc) & ~hit_o.valid

        adv_ok = do_recon & rc_ok
        new_fr = jnp.where(adv_ok[..., None], fr_rc,
                           jnp.where(ok_med[..., None], fr_med,
                                     jnp.where(ok_surf[..., None], fr_sf,
                                               s["fr"])))
        new_pr = jnp.where(adv_ok, pr_rc,
                           jnp.where(ok_med, pr_med,
                                     jnp.where(ok_surf, pr_sf, s["pr"])))
        died = alive & _t4(active) \
            & ~(adv_ok | ok_med | ok_surf | ok_esc)
        st1 = jnp.where(died, DEAD, s["st"])
        live_o = (st1 == ALIVE) & _t4(active)

        # the offset's current vertex z1 + its local frame
        z1 = jnp.where(adv_ok[..., None], y1_t,
                       jnp.where(ok_med[..., None], z_med, hit_o.p))
        z_is_med = ok_med | (adv_ok & _t4(mevt))
        z_ns = jnp.where(adv_ok[..., None], _t4(hit.ns), hit_o.ns)
        z_wi = jnp.where(adv_ok[..., None], -wl_rc, -s["d"])
        z_bi = jnp.where(adv_ok, _t4(bi), bi_o)
        z_med_idx = s["med"]
        z_diffuse = z_is_med | (~z_is_med & is_diffuse_like(scene, z_bi)
                                & ~(null_o & ~adv_ok))
        ns_o_f = z_ns
        s_axo, t_axo = coordinate_system(ns_o_f)
        wi_loco = to_local(ns_o_f, s_axo, t_axo, z_wi)

        # ----------------- contributions at y1 / z1 (b) -------------------
        # emitter hit (skipped into the -direct buffer at depth 0)
        Le_b = eval_radiance(scene, hit.prim, hit.ng, -b["d"])
        pdf_l_b = _light_pdf_sa(scene, hit.prim, hit.p, hit.ng,
                                b["scatter_p"])
        w_hit_b = jnp.where(b["spec"] | (not cfg.nee), 1.0,
                            _mis(b["last_pdf"], pdf_l_b))
        C_hit_b = jnp.where(scat_s[..., None], thr_surf * Le_b
                            * w_hit_b[..., None], 0.0)
        w_env_b = jnp.where(b["spec"] | (not cfg.nee), 1.0,
                            _mis(b["last_pdf"], pdf_env_sa(scene, b["d"])))
        C_env_b = jnp.where(esc[..., None],
                            thr_surf * env_le(scene, b["d"])
                            * w_env_b[..., None], 0.0)

        # offset-side emitter-hit / env
        hito_p = jnp.where(adv_ok[..., None], _t4(hit.p), hit_o.p)
        hito_ng = jnp.where(adv_ok[..., None], _t4(hit.ng), hit_o.ng)
        hito_prim = jnp.where(adv_ok, _t4(hit.prim), hit_o.prim)
        wi_hit_o = jnp.where(adv_ok[..., None], wl_rc, s["d"])
        Le_o = eval_radiance(scene, hito_prim, hito_ng, -wi_hit_o)
        lp_o = jnp.where(adv_ok, pdf_rc, s["last_pdf"])
        sp_o = jnp.where(adv_ok[..., None], s["zp_p"], s["scatter_p"])
        pdf_l_o = _light_pdf_sa(scene, hito_prim, hito_p, hito_ng, sp_o)
        spec_o_now = jnp.where(adv_ok, False, s["spec"])
        w_hit_o = jnp.where(spec_o_now | (not cfg.nee), 1.0,
                            _mis(lp_o, pdf_l_o))
        C_hit_o = jnp.where((live_o & _t4(scat_s))[..., None],
                            _t4(thr_surf) * new_fr * Le_o
                            * w_hit_o[..., None], 0.0)
        w_env_o = jnp.where(spec_o_now | (not cfg.nee), 1.0,
                            _mis(s["last_pdf"], pdf_env_sa(scene, s["d"])))
        C_env_o = jnp.where((live_o & _t4(esc))[..., None],
                            _t4(thr_surf) * new_fr * env_le(scene, s["d"])
                            * w_env_o[..., None], 0.0)
        C_hit_o = C_hit_o + C_env_o \
            + jnp.where((conn & _t4(active))[..., None],
                        _t4(C_hit_b + C_env_b) * s["fr"], 0.0)
        C_hit_base4 = _t4(C_hit_b + C_env_b)

        # ----------------- NEE at the base vertex -------------------------
        if cfg.nee:
            p_nee_b = jnp.where(mevt[..., None], ms.p,
                                _offset_ray(hit.p, hit.ng, -b["d"]))
            ds = sample_direct(scene, p_nee_b, u_nee3)
            f_b_nee, pdf_dir_b = _vertex_scatter(
                scene, mevt, cur_med, bi, hit.ns, -b["d"], ds.wl)
            # _vertex_scatter folds the TABLE sigma_s for media; base
            # thr_med already has the (local) sigma_s -> divide the table
            # value back out so heterogeneous media keep the pure phase
            sig_b = jnp.where(
                mevt[..., None],
                jnp.maximum(jnp.where(
                    (cur_med >= 0)[..., None],
                    scene.med_sigma_s[jnp.clip(
                        cur_med, 0, scene.med_sigma_s.shape[0] - 1)],
                    0.0), 1e-20), 1.0)
            f_b_nee = f_b_nee / sig_b
            tr_b_nee = segment_transmittance(scene, p_nee_b, ds.p_light,
                                             cur_med)
            w_b_nee = jnp.where(ds.pdf_sa > 0, _mis(ds.pdf_sa, pdf_dir_b),
                                1.0)
            thr_evt = jnp.where(mevt[..., None], thr_med, thr_surf)
            C_nee_b = jnp.where(
                (ds.valid & (mevt | scat_s))[..., None],
                thr_evt * f_b_nee * tr_b_nee * ds.li_over_pdf
                * w_b_nee[..., None], 0.0)

            # offset NEE to the SAME light point
            pl4 = _t4(ds.p_light)
            seg_lo = pl4 - z1
            d2_lo = jnp.maximum(dot(seg_lo, seg_lo), 1e-12)
            wl_o = seg_lo / jnp.sqrt(d2_lo)[..., None]
            seg_lb = ds.p_light - jnp.where(mevt[..., None], ms.p, hit.p)
            d2_lb = jnp.maximum(dot(seg_lb, seg_lb), 1e-12)
            f_o_nee, pdf_dir_o = _vertex_scatter(
                scene, z_is_med, z_med_idx, z_bi, z_ns, z_wi, wl_o)
            sig_o = jnp.where(
                z_is_med[..., None],
                jnp.maximum(jnp.where(
                    in_med_o[..., None],
                    scene.med_sigma_s[jnp.clip(z_med_idx, 0,
                                               scene.med_sigma_s.shape[0]
                                               - 1)], 0.0), 1e-20), 1.0)
            f_o_nee = f_o_nee / sig_o
            p_nee_o = jnp.where(z_is_med[..., None], z1,
                                _offset_ray(z1, z_ns, wl_o))
            tr_o_nee = segment_transmittance(scene, p_nee_o, pl4, z_med_idx)
            cosl_b = jnp.maximum(jnp.abs(dot(ds.n_light, -normalize(seg_lb))),
                                 1e-6)
            cosl_o = jnp.abs(dot(_t4(ds.n_light), -wl_o))
            grp4 = _t4(ds.grp)
            # d^2 falloff ratio only for lights whose Li actually falls
            # off with distance (area, point/spot); directional and env
            # samples have no 1/d^2 term -> ratio 1
            f2_4 = _t4(ds.falloff2)
            geom_ratio = jnp.where(
                grp4 == 0, _safe_div(cosl_o, _t4(cosl_b), 1e-6)
                * _t4(d2_lb) / d2_lo,
                jnp.where((grp4 == 1) & f2_4, _t4(d2_lb) / d2_lo, 1.0))
            pdf_sa_o = _t4(ds.pdf_sa) \
                * jnp.where(grp4 == 0,
                            _safe_div(_t4(cosl_b), cosl_o, 1e-6)
                            * d2_lo / _t4(d2_lb), 1.0)
            w_o_nee = jnp.where(pdf_sa_o > 0, _mis(pdf_sa_o, pdf_dir_o), 1.0)
            C_nee_o_own = _t4(thr_evt) * new_fr * f_o_nee * tr_o_nee \
                * _t4(ds.li_over_pdf) * (geom_ratio * w_o_nee)[..., None]
            live_nee = live_o & _t4(ds.valid & (mevt | scat_s))
            C_nee_o = jnp.where(live_nee[..., None], C_nee_o_own, 0.0) \
                + jnp.where((conn & _t4(active))[..., None],
                            _t4(C_nee_b) * s["fr"], 0.0)
        else:
            C_nee_b = jnp.zeros((n, 3))
            C_nee_o = jnp.zeros((m, 3))

        # ----------------- scatter at the vertex (c) ----------------------
        u3 = u_bs3
        bs = sample_bsdf(scene, bi, wi_locb, u3)
        wo_surf = to_world(ns_b, s_axb, t_axb, bs.wo)
        wo_med, pdf_med = ph.sample_phase(scene, cur_med, -b["d"], u_ph2)

        # base value of this bounce (stored for later reconnections)
        f_b2, pdf_b2 = eval_bsdf(scene, bi, wi_locb, bs.wo)
        fcos_b2 = f_b2 * jnp.abs(bs.wo[..., 2:3])
        p_b2 = ph.eval_phase(scene, cur_med, -b["d"], wo_med)
        sig_b2 = jnp.where(mevt[..., None], ms.sigma_s, 1.0)
        # (delta vertices are never reconnection parents — classification
        # excludes them — so store 1 there to keep the ratio guards quiet)
        new_f_cos = jnp.where(
            mevt[..., None], sig_b2 * p_b2[..., None],
            jnp.where(bs.is_delta[..., None], 1.0, fcos_b2))

        # offsets at (c):
        # just reconnected -> evaluate the shared vertex with the offset wi
        wo_loco_b = to_local(ns_o_f, s_axo, t_axo,
                             _t4(wo_surf))           # base wo in offset frame
        f_rc2, pdf_rc2 = eval_bsdf(scene, _t4(bi), wi_loco, wo_loco_b)
        p_rc2 = ph.eval_phase(scene, _t4(cur_med), z_wi, _t4(wo_med))
        pb2_4 = _t4(jnp.where(mevt[..., None],
                              p_b2[..., None] * jnp.ones((1, 3)), fcos_b2))
        frc2 = jnp.where(_t4(mevt)[..., None],
                         p_rc2[..., None] * jnp.ones((1, 3)),
                         f_rc2 * jnp.abs(wo_loco_b[..., 2:3]))
        prc2 = jnp.where(_t4(mevt), p_rc2, pdf_rc2)
        prc2_b = _t4(jnp.where(mevt, p_b2, pdf_b2))
        rc2_ok = adv_ok & ~_t4(bs.is_delta & scat_s) \
            & (jnp.max(pb2_4, axis=-1) > 1e-20) & (prc2_b > 1e-20)
        fr_rc2 = new_fr * _safe_div(frc2, pb2_4)
        pr_rc2 = new_pr * _safe_div(prc2, prc2_b)

        # parallel replay at the offset's own vertex with the same uniforms
        bs_o = sample_bsdf(scene, z_bi, wi_loco, _t4(u3))
        wo_o_surf = to_world(ns_o_f, s_axo, t_axo, bs_o.wo)
        wo_o_med, pdf_o_med = ph.sample_phase(scene, z_med_idx, z_wi,
                                              _t4(u_ph2))
        rep_surf = live_o & ~adv_ok & _t4(scat_s) & bs_o.valid \
            & _t4(bs.valid) & (bs_o.is_delta == _t4(bs.is_delta)) \
            & (jnp.max(_t4(bs.weight), axis=-1) > 1e-20)
        rep_med = live_o & ~adv_ok & _t4(mevt)
        fr_rep = new_fr * _safe_div(bs_o.weight, _t4(bs.weight))

        fr2 = jnp.where(rc2_ok[..., None], fr_rc2,
                        jnp.where(rep_surf[..., None], fr_rep, new_fr))
        pr2 = jnp.where(rc2_ok, pr_rc2, new_pr)
        # state transitions: reconnected lanes merge; replay lanes stay
        scatter_step = _t4(mevt | scat_s)
        died2 = live_o & scatter_step \
            & ~(rc2_ok | rep_surf | rep_med | _t4(nullx))
        st2 = jnp.where(died2, DEAD, jnp.where(rc2_ok, CONNECTED, st1))

        # new offset rays (replay lanes only; null hops pass through)
        d_o_new = jnp.where(rep_med[..., None], wo_o_med,
                            jnp.where(rep_surf[..., None], wo_o_surf,
                                      s["d"]))
        o_o_new = jnp.where(
            rep_med[..., None], z1,
            jnp.where((rep_surf | (live_o & ~adv_ok & _t4(nullx)))[..., None],
                      _offset_ray(hito_p, hito_ng, d_o_new), s["o"]))
        crossed_o = live_o & ~adv_ok & _t4(sevt) \
            & (dot(d_o_new, hito_ng) * dot(-s["d"], hito_ng) < 0.0)
        med_o_new = jnp.where(
            crossed_o, medium_transition(scene, hito_prim, hito_ng, d_o_new),
            s["med"])
        last_pdf_o = jnp.where(rep_med, pdf_o_med,
                               jnp.where(rep_surf, bs_o.pdf, s["last_pdf"]))
        spec_o2 = jnp.where(rep_med, False,
                            jnp.where(rep_surf, bs_o.is_delta,
                                      jnp.where(rc2_ok, _t4(bs.is_delta),
                                                s["spec"])))
        scatter_p_o = jnp.where((rep_med | rep_surf)[..., None], z1,
                                s["scatter_p"])

        # can_connect for the NEXT bounce: both current vertices diffuse;
        # null hops keep the previous flag
        can2 = (st2 == ALIVE) & scatter_step & _t4(y1_diffuse) & z_diffuse
        can2 = jnp.where(live_o & ~adv_ok & _t4(nullx), s["can_connect"],
                         can2)

        # remember z1 as the reconnection parent for the next bounce
        zp_p2 = jnp.where(scatter_step[..., None] & live_o[..., None], z1,
                          s["zp_p"])
        zp_ns2 = jnp.where(scatter_step[..., None] & live_o[..., None],
                           z_ns, s["zp_ns"])
        zp_wi2 = jnp.where(scatter_step[..., None] & live_o[..., None],
                           z_wi, s["zp_wi"])
        zp_bi2 = jnp.where(scatter_step & live_o, z_bi, s["zp_bsdf"])
        zp_med2 = jnp.where(scatter_step & live_o, z_med_idx, s["zp_med"])
        zp_ismed2 = jnp.where(scatter_step & live_o, z_is_med,
                              s["zp_is_med"])
        zp_fr2 = jnp.where(scatter_step[..., None] & live_o[..., None],
                           new_fr, s["zp_fr"])
        zp_pr2 = jnp.where(scatter_step & live_o, new_pr, s["zp_pr"])

        # ----------------- accumulate gradients ---------------------------
        # shift MIS weight per contribution: 1/(1+pr); failed lanes w=1
        pr_hit = jnp.where(conn, s["pr"], new_pr)
        w_sh_hit = jnp.where(live_o | conn, 1.0 / (1.0 + pr_hit), 1.0)
        C_s_hit = jnp.where((live_o | conn)[..., None], C_hit_o, 0.0)
        pr_nee = jnp.where(conn, s["pr"], new_pr)
        w_sh_nee = jnp.where(live_o | conn, 1.0 / (1.0 + pr_nee), 1.0)
        C_s_nee = jnp.where((live_o | conn)[..., None], C_nee_o, 0.0)
        not_first = ~_t4(first)
        dG = jnp.where(not_first[..., None],
                       w_sh_hit[..., None] * (C_s_hit - C_hit_base4), 0.0) \
            + w_sh_nee[..., None] * (C_s_nee - _t4(C_nee_b))
        G2 = s["G"] + dG

        # base radiance: very-direct split
        L2 = b["L"] + C_nee_b \
            + jnp.where(first[..., None], 0.0, C_hit_b + C_env_b)
        Ld2 = b["Ld"] + jnp.where(first[..., None], C_hit_b + C_env_b, 0.0)

        # ----------------- base state update -------------------------------
        new_d = jnp.where(mevt[..., None], wo_med,
                          jnp.where(sevt[..., None], wo_surf, b["d"]))
        new_o = jnp.where(mevt[..., None], ms.p,
                          jnp.where(sevt[..., None],
                                    _offset_ray(hit.p, hit.ng, wo_surf),
                                    b["o"]))
        new_thr = jnp.where(mevt[..., None], thr_med,
                            jnp.where(sevt[..., None],
                                      thr_surf * bs.weight, thr))
        crossed = sevt & (dot(wo_surf, hit.ng) * dot(-b["d"], hit.ng) < 0.0)
        new_med = jnp.where(crossed,
                            medium_transition(scene, hit.prim, hit.ng,
                                              wo_surf), cur_med)
        scat = mevt | scat_s
        new_spec = jnp.where(mevt, False,
                             jnp.where(scat_s, bs.is_delta, b["spec"]))
        new_pdf = jnp.where(mevt, pdf_med,
                            jnp.where(scat_s, bs.pdf, b["last_pdf"]))
        new_scatter_p = jnp.where(scat[..., None], y1, b["scatter_p"])
        new_tr_seg = jnp.where(scat[..., None], 1.0,
                               b["tr_seg"] * ms.transmittance)
        new_pdfdist = jnp.where(scat, 1.0,
                                b["pdfdist_seg"] * ms.pdf_failure)
        new_fcos = jnp.where(scat[..., None], new_f_cos, b["f_cos"])
        new_depth = b["depth"] + scat.astype(jnp.int32)

        dead = (~hit.valid & ~ms.success) | (new_depth >= cfg.max_depth) \
            | (jnp.max(new_thr, axis=-1) <= 0.0) | (~bs.valid & sevt)
        q = jnp.minimum(jnp.max(new_thr, axis=-1), cfg.rr_clamp)
        do_rr = (new_depth >= cfg.rr_depth) & active
        rr_kill = do_rr & (u_rr >= q)
        new_thr = jnp.where((do_rr & ~rr_kill)[..., None],
                            new_thr * _safe_div(1.0, q, 1e-6)[..., None],
                            new_thr)
        new_active = active & ~dead & ~rr_kill

        nb = dict(o=new_o, d=new_d, med=new_med, thr=new_thr, L=L2, Ld=Ld2,
                  active=new_active, spec=new_spec, last_pdf=new_pdf,
                  scatter_p=new_scatter_p, f_cos=new_fcos,
                  tr_seg=new_tr_seg, pdfdist_seg=new_pdfdist,
                  depth=new_depth)
        ns_ = dict(st=st2, o=o_o_new, d=d_o_new, med=med_o_new, fr=fr2,
                   pr=pr2, can_connect=can2, zp_p=zp_p2, zp_ns=zp_ns2,
                   zp_wi=zp_wi2, zp_bsdf=zp_bi2, zp_med=zp_med2,
                   zp_is_med=zp_ismed2, zp_fr=zp_fr2, zp_pr=zp_pr2,
                   last_pdf=last_pdf_o,
                   scatter_p=scatter_p_o, spec=spec_o2, G=G2)
        out = dict(**{f"b_{k}": v for k, v in nb.items()},
                   **{f"s_{k}": v for k, v in ns_.items()})
        return out, None

    keys = jax.random.split(k_path, n_steps)
    state, _ = lax.scan(body, state, keys)

    L_ind = state["b_L"].reshape(H, W, 3)
    L_dir = state["b_Ld"].reshape(H, W, 3)
    G = state["s_G"].reshape(4, H, W, 3)

    # Each edge (x, x+1) is sampled by two strategies — the forward shift
    # from x (G[RIGHT]) and the backward shift from x+1 (G[LEFT]) — whose
    # per-contribution balance weights w = 1/(1+pr) already implement the
    # pairwise MIS (gpt.cpp main/shifted weighting), so the assembly is a
    # plain sum: no extra 0.5 (gpt.py's 0.5 IS its MIS weight for the
    # identity shift, where pr = 1).
    gx = G[RIGHT]
    gx = gx.at[:, :-1].add(-G[LEFT][:, 1:])
    gy = G[DOWN]
    gy = gy.at[:-1, :].add(-G[UP][1:, :])
    return L_ind + L_dir, gx, gy, L_dir


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           callback=None, recon_alpha=0.2, recon_l1=True, recon_iters=50):
    """Progressive path-space-shift G-PT: average primal/gradients over
    spp, screened-Poisson reconstruction of the indirect component, then
    add the very-direct buffer back (gpt.cpp:2775-2900 -direct handling).
    """
    from ..ops import poisson
    H, W = scene.height, scene.width
    acc = [jnp.zeros((H, W, 3)) for _ in range(4)]
    for it in range(cfg.spp):
        p, gx, gy, direct = render_pass(scene, cfg, seed, it)
        acc = [acc[0] + p, acc[1] + gx, acc[2] + gy, acc[3] + direct]
        if callback is not None:
            callback(it, acc[0] / (it + 1))
    primal, gx, gy, direct = [a / cfg.spp for a in acc]
    recon = poisson.solve(primal - direct, gx, gy, alpha=recon_alpha,
                          iters=recon_iters, l1=recon_l1) + direct
    return dict(image=recon, primal=primal, gx=gx, gy=gy, direct=direct)
