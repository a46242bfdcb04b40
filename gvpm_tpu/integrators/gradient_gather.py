"""Dense (planar) gradient photon gathers — the G-VPM hot loop.

Replaces the fold-based gathers in gvpm.py (hashgrid.gather: 27*K
*serial* dependent gathers per query — "serial death on TPU") with the
planar gather_dense path: candidates are materialized ONCE per query
tile as [Qt, M] index planes and the 5-way evaluation (base + 4 shifts)
runs as fused full-width VPU arithmetic on scalar planes
(integrators/planar.py rationale).

Memory layout (the perf-critical decision, measured on v5e): TPU
gathers pay per-INDEX, not per-byte — 32 separate scalar-plane gathers
run ~30x slower than ONE gather of 128-float rows for the same indices.
So every per-photon field the shift evaluation touches is packed into a
single [P, 128] f32 row table (pack_photons; a [P, F<=128] array is
physically padded to 128 lanes by the (8,128) tiling anyway, so the
padding is free), the table is pre-permuted into grid order
(hashgrid.build_sorted — candidate slots then index rows directly), and
each tile does ONE row gather + a transpose back to planes.

The shift math is the SAME diffuse-reconnection ratio computation as
shift.reconnect_photon — mirrored in planar form and cross-checked
against it by tests/test_gradient_gather.py. Reference hot loop:
shift_volume_photon.cpp:489-655 (VolumeGradientPositionQuery) and
gvpm_accel.h:269-312 (BRE traversal). Photons whose parent chain is
pure-delta take the manifold (ME) shift via budgeted pair compaction
(manifold.py; getTypeShift's third branch, shift_utilities.h:112-136).

Each gather counts REAL photon visits (candidates passing the kernel
test) so bench.py reports honest visits/s, and successful shifts for
the per-pass success-rate StatsCounter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.math import coordinate_system, to_local
from ..ops import hashgrid
from ..render import medium as med
from ..scene.types import (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_NULL,
                           Scene)
from . import planar as pl

INV_PI = 1.0 / jnp.pi

# ---------------------------------------------------------------------------
# packed photon rows
# ---------------------------------------------------------------------------

_SLOT3 = ("p", "wi", "alpha", "parent_p", "parent_wi", "parent_ns",
          "scatter_base", "ns", "st",
          # parent material parameters (baked so the inner loop never
          # does [Qt,M]-indexed table lookups — they pay per-index)
          "pm_alb", "pm_spec", "pm_eta3", "pm_sigs")
_SLOT1 = ("pdf_dir_base", "parent_type", "parent_bsdf", "parent_med",
          "reconnectable", "vtype", "bsdf", "prim",
          "pm_btype", "pm_alpha", "pm_eta1", "pm_g", "pm_ptype")
SLOT = {}
_k = 0
for _n in _SLOT3:
    SLOT[_n] = _k
    _k += 3
for _n in _SLOT1:
    SLOT[_n] = _k
    _k += 1
N_SLOTS = _k
ROW_F = 128  # declared row width (see module docstring)


def pack_photons(scene: Scene, pv):
    """Photon SoA dict -> one [P, 128] f32 row table.

    Integer fields are stored as f32 (exact below 2^24 — photon-map rows
    and scene tables are far smaller); sigma_t of the photon's medium is
    folded in at pack time so the inner loop never touches the medium
    tables.
    """
    mi = jnp.clip(pv["med"], 0, scene.med_sigma_a.shape[0] - 1)
    st = jnp.where((pv["med"] >= 0)[..., None],
                   scene.med_sigma_a[mi] + scene.med_sigma_s[mi], 0.0)
    bic = jnp.clip(pv["parent_bsdf"], 0, scene.bsdf_type.shape[0] - 1)
    pmi = jnp.clip(pv["parent_med"], 0, scene.med_sigma_s.shape[0] - 1)
    p_in_med = pv["parent_med"] >= 0
    derived3 = dict(
        st=st,
        pm_alb=scene.bsdf_albedo[bic],
        pm_spec=scene.bsdf_k[bic],
        pm_eta3=scene.bsdf_eta3[bic],
        pm_sigs=jnp.where(p_in_med[..., None],
                          scene.med_sigma_s[pmi], 0.0))
    derived1 = dict(
        pm_btype=scene.bsdf_type[bic],
        pm_alpha=scene.bsdf_alpha[bic],
        pm_eta1=scene.bsdf_eta[bic],
        pm_g=scene.med_g[pmi],
        pm_ptype=scene.med_phase[pmi])
    cols = []
    for n in _SLOT3:
        a = derived3[n] if n in derived3 else pv[n]
        cols.append(a.astype(jnp.float32))
    for n in _SLOT1:
        a = derived1[n] if n in derived1 else pv[n]
        cols.append(a.astype(jnp.float32)[..., None])
    packed = jnp.concatenate(cols, axis=-1)
    return jnp.pad(packed, ((0, 0), (0, ROW_F - N_SLOTS)))


class RowView:
    """Plane access into one tile's gathered rows ([F, Qt, M])."""

    def __init__(self, rows):
        # rows: [Qt, M, ROW_F] -> planes-major for full-width VPU math
        self.pls = jnp.moveaxis(rows, -1, 0)

    def f3(self, name):
        k = SLOT[name]
        return (self.pls[k], self.pls[k + 1], self.pls[k + 2])

    def f1(self, name):
        return self.pls[SLOT[name]]

    def i1(self, name):
        return self.pls[SLOT[name]].astype(jnp.int32)

    def b1(self, name):
        return self.pls[SLOT[name]] > 0.5


def _row3(packed, i, name):
    k = SLOT[name]
    return packed[i, k:k + 3]


def _row1(packed, i, name):
    return packed[i, SLOT[name]]


def _gp_compatible(base, sgp):
    """Camera-subpath structure compatibility of a shifted gather point
    (ShiftGatherPoint::generate validity, shift_cameraPath.h:29-170)."""
    return (sgp.valid & base.valid & (sgp.depth == base.depth)
            & (sgp.bsdf == base.bsdf))


# ---------------------------------------------------------------------------
# planar reconnection shift on a row view
# ---------------------------------------------------------------------------

def _shift_caches(v: RowView, surface_target):
    """Shift-cache planes shared by all 4 shifts (pure slicing — the one
    row gather already happened)."""
    ph_p = v.f3("p")
    pre = dict(
        bp=v.f3("parent_p"), ptype=v.i1("parent_type"),
        pwi=v.f3("parent_wi"), pns=v.f3("parent_ns"),
        pbsdf=v.i1("parent_bsdf"), pmed=v.i1("parent_med"),
        sc_old=v.f3("scatter_base"), pdf_old=v.f1("pdf_dir_base"),
        alpha=v.f3("alpha"), reconn=v.b1("reconnectable"),
        st=v.f3("st"),
        bparams=dict(btype=v.i1("pm_btype"), alb=v.f3("pm_alb"),
                     spec=v.f3("pm_spec"), eta3=v.f3("pm_eta3"),
                     alpha=v.f1("pm_alpha"), eta1=v.f1("pm_eta1")),
        mparams=dict(sigs=v.f3("pm_sigs"), g=v.f1("pm_g"),
                     ptype=v.i1("pm_ptype")),
    )
    d_old = pl.sub3(ph_p, pre["bp"])
    d2_old = jnp.maximum(pl.dot3(d_old, d_old), 1e-12)
    l_old = jnp.sqrt(d2_old)
    pre["d2_old"] = d2_old
    pre["l_old"] = l_old
    pre["w_old"] = pl.scale3(d_old, 1.0 / l_old)
    if surface_target:
        pre["ns_p"] = v.f3("ns")
    return pre


def _reconnect_planar(scene: Scene, pre, new_p, target_is_volume):
    """Planar mirror of shift.reconnect_photon on [Qt,M] planes.

    Returns (alpha_shift planes (r,g,b), pdf_ratio, ok, w_new).
    """
    d_new = pl.sub3(new_p, pre["bp"])
    d2_new = jnp.maximum(pl.dot3(d_new, d_new), 1e-12)
    l_new = jnp.sqrt(d2_new)
    w_new = pl.scale3(d_new, 1.0 / l_new)

    sr, sg, sb, pdf_new, ok_sc = pl.parent_scatter_params(
        pre["ptype"], pre["pwi"], pre["pns"], pre["bparams"],
        pre["mparams"], w_new)

    st = pre["st"]
    dd = l_new - pre["l_old"]
    tr_ratio = tuple(jnp.exp(-st[c] * dd) for c in range(3))

    if target_is_volume:
        dens_new = (st[0] * jnp.exp(-st[0] * l_new)
                    + st[1] * jnp.exp(-st[1] * l_new)
                    + st[2] * jnp.exp(-st[2] * l_new)) / 3.0
        dens_old = (st[0] * jnp.exp(-st[0] * pre["l_old"])
                    + st[1] * jnp.exp(-st[1] * pre["l_old"])
                    + st[2] * jnp.exp(-st[2] * pre["l_old"])) / 3.0
        pdf_dist_ratio = jnp.where(
            dens_old > 1e-20, dens_new / jnp.maximum(dens_old, 1e-20), 1.0)
        cos_ratio = 1.0
        pdf_cos_ratio = 1.0
    else:
        f_new = (jnp.exp(-st[0] * l_new) + jnp.exp(-st[1] * l_new)
                 + jnp.exp(-st[2] * l_new)) / 3.0
        f_old = (jnp.exp(-st[0] * pre["l_old"])
                 + jnp.exp(-st[1] * pre["l_old"])
                 + jnp.exp(-st[2] * pre["l_old"])) / 3.0
        pdf_dist_ratio = jnp.where(
            f_old > 1e-20, f_new / jnp.maximum(f_old, 1e-20), 1.0)
        ns_p = pre["ns_p"]
        cos_new = jnp.abs(pl.dot3(ns_p, w_new))
        cos_old = jnp.maximum(jnp.abs(pl.dot3(ns_p, pre["w_old"])), 1e-6)
        cos_ratio = cos_new / cos_old
        pdf_cos_ratio = cos_ratio
        par_sf = pre["ptype"] == pl.VERT_SURFACE
        sign_ok = pl.dot3(pre["pns"], w_new) \
            * pl.dot3(pre["pns"], pre["w_old"]) > 0.0
        ok_sc = ok_sc & jnp.where(par_sf, sign_ok, True)

    geo = pre["d2_old"] / d2_new * cos_ratio
    sc_old = pre["sc_old"]
    a_sh = tuple(
        pre["alpha"][c] * (s / jnp.maximum(sc_old[c], 1e-20))
        * tr_ratio[c] * geo
        for c, s in enumerate((sr, sg, sb)))
    pdf_ratio = (pdf_new / jnp.maximum(pre["pdf_old"], 1e-20)
                 * pdf_dist_ratio * (pre["d2_old"] / d2_new)
                 * pdf_cos_ratio)
    sc_old_max = jnp.maximum(jnp.maximum(sc_old[0], sc_old[1]), sc_old[2])
    ok = (ok_sc & pre["reconn"] & (sc_old_max > 0.0)
          & (pre["pdf_old"] > 1e-20) & (pdf_new > 0.0))
    zero = jnp.zeros_like(pdf_ratio)
    a_sh = tuple(jnp.where(ok, a, zero) for a in a_sh)
    return a_sh, jnp.where(ok, pdf_ratio, 0.0), ok, w_new


def _mis_planar(pdf_ratio_light, pdf_ratio_cam, ok):
    w = 1.0 / (1.0 + pdf_ratio_light * pdf_ratio_cam)
    return jnp.clip(jnp.where(ok, w, 1.0), 0.0, 1.0)


# ---------------------------------------------------------------------------
# ME (manifold) pair compaction — getTypeShift's third branch
# ---------------------------------------------------------------------------

def _pack_me_pairs(scene: Scene, v: RowView, pre, inside, qi, idx, scale,
                   photon_ok=True):
    """Top-Qt ME-eligible (query, photon) pairs of one tile.
    photon_ok: extra plane excluding photons that cannot contribute to
    this gather (e.g. delta-BSDF surface photons)."""
    Qt, M = idx.shape
    pbt = scene.bsdf_type[jnp.clip(pre["pbsdf"], 0,
                                   scene.bsdf_type.shape[0] - 1)]
    par_delta = (pbt == BSDF_CONDUCTOR) | (pbt == BSDF_DIELECTRIC)
    me_m = inside & ~pre["reconn"] \
        & (pre["ptype"] == pl.VERT_SURFACE) & par_delta & photon_ok
    flat = me_m.reshape(-1)
    vals, order = lax.top_k(flat.astype(jnp.int32), Qt)
    return dict(me_q=qi[order // M],
                me_i=idx.reshape(-1)[order],
                me_scale=scale.reshape(-1)[order],
                me_ok=vals > 0)


def _compact_me(out, budget):
    """Second compaction of the per-tile pair lists to a fixed budget."""
    Q = out["me_ok"].shape[0]
    B = min(budget, Q)
    vals, order = lax.top_k(out["me_ok"].astype(jnp.int32), B)
    return (out["me_q"][order], out["me_i"][order],
            out["me_scale"][order], vals > 0)


# ---------------------------------------------------------------------------
# surface photons
# ---------------------------------------------------------------------------

def surface_gather(scene: Scene, base, sgps, grid, packed, n_emitted,
                   border, max_per_cell=32, q_tile=128, stencil=8,
                   use_manifold=False, me_budget=4096, pv_chain=None):
    """Surface photon gather with 4-direction shifts, dense planar path.

    packed: pack_photons table permuted into `grid` order
    (hashgrid.build_sorted). pv_chain: ORIGINAL-order photon dict for ME
    chain walks (grid.sorted_idx maps back). Semantics match
    gvpm.surface_gradient_gather (2D kernel, diffuse reconnection,
    pairwise MIS); grid cell >= 2*max r for stencil=8. Returns
    (primal [N,3], S [4,N,3], W [4,N,3], visits [N], shift_ok [N]).
    """
    r_all = base.radius
    s_ax_all, t_ax_all = coordinate_system(base.ns)
    wo_loc_all = to_local(base.ns, s_ax_all, t_ax_all, base.wo)
    comp = jnp.stack([_gp_compatible(base, sgps[i]) for i in range(4)])
    sgp_frames = []
    for i in range(4):
        ss, tt = coordinate_system(sgps[i].ns)
        sgp_frames.append(
            (ss, tt, to_local(sgps[i].ns, ss, tt, sgps[i].wo)))

    def eval_fn(qi, idx, ok, scale):
        gp_p = base.p[qi]
        r = r_all[qi][:, None]
        ns = base.ns[qi]
        s_ax = s_ax_all[qi]
        t_ax = t_ax_all[qi]
        wo_l = wo_loc_all[qi]
        bi = base.bsdf[qi][:, None]
        gvalid = base.valid[qi][:, None]

        v = RowView(packed[idx])
        ph_p = v.f3("p")
        rel = pl.sub3(ph_p, pl.expand(gp_p))
        d2 = pl.dot3(rel, rel)
        is_surf = v.i1("vtype") == 1
        wi_p = v.f3("wi")
        nwi = pl.neg3(wi_p)
        front = pl.dot3(pl.expand(ns), nwi) > 1e-4
        inside = ok & is_surf & (d2 < r * r) & front & gvalid
        wi_l = pl.to_local_planar(ns, s_ax, t_ax, nwi)
        wo_lp = (wo_l[:, 0:1], wo_l[:, 1:2], wo_l[:, 2:3])
        fr, fg, fb, _ = pl.eval_bsdf_pdf_gather(scene, bi, wo_lp, wi_l)
        k2 = INV_PI / jnp.maximum(r * r, 1e-12)
        kw = jnp.where(inside, k2 * scale, 0.0)
        a = v.f3("alpha")
        cb = (a[0] * fr * kw, a[1] * fg * kw, a[2] * fb * kw)
        primal = jnp.stack([jnp.sum(c, axis=1) for c in cb], axis=-1)

        pre = _shift_caches(v, surface_target=True)
        S = []
        Wb = []
        ok_count = jnp.zeros(idx.shape[0], jnp.int32)
        for i in range(4):
            sp = pl.expand(sgps[i].p[qi])
            new_p = (sp[0] + rel[0], sp[1] + rel[1], sp[2] + rel[2])
            a_sh, pr_l, ok_s, w_new = _reconnect_planar(
                scene, pre, new_p, target_is_volume=False)
            ssx, ttx, wo_s = (sgp_frames[i][0][qi], sgp_frames[i][1][qi],
                              sgp_frames[i][2][qi])
            ns_i = sgps[i].ns[qi]
            wi_ls = pl.to_local_planar(ns_i, ssx, ttx, pl.neg3(w_new))
            wo_sp = (wo_s[:, 0:1], wo_s[:, 1:2], wo_s[:, 2:3])
            bi_s = sgps[i].bsdf[qi][:, None]
            fsr, fsg, fsb, _ = pl.eval_bsdf_pdf_gather(
                scene, bi_s, wo_sp, wi_ls)
            ok_i = ok_s & comp[i][qi][:, None] & inside
            w = _mis_planar(pr_l, 1.0, ok_i)
            w = jnp.where(border[i][qi][:, None], 1.0, w)
            kwi = jnp.where(ok_i, k2 * scale, 0.0) * w
            S.append(jnp.stack(
                [jnp.sum(a_sh[0] * fsr * kwi, axis=1),
                 jnp.sum(a_sh[1] * fsg * kwi, axis=1),
                 jnp.sum(a_sh[2] * fsb * kwi, axis=1)], axis=-1))
            Wb.append(jnp.stack(
                [jnp.sum(w * c, axis=1) for c in cb], axis=-1))
            ok_count = ok_count + jnp.sum(ok_i, axis=1)
        res = dict(primal=primal, S=jnp.stack(S, axis=1),
                   W=jnp.stack(Wb, axis=1),
                   visits=jnp.sum(inside, axis=1), shift_ok=ok_count)
        if use_manifold:
            obt = scene.bsdf_type[jnp.clip(v.i1("bsdf"), 0,
                                           scene.bsdf_type.shape[0] - 1)]
            own_ok = ~((obt == BSDF_CONDUCTOR) | (obt == BSDF_DIELECTRIC)
                       | (obt == BSDF_NULL))
            res.update(_pack_me_pairs(scene, v, pre, inside, qi, idx,
                                      scale, photon_ok=own_ok))
        return res

    out = hashgrid.gather_dense(grid, base.p, eval_fn,
                                max_per_cell=max_per_cell, q_tile=q_tile,
                                stencil=stencil)
    inv = 1.0 / n_emitted
    primal = base.thr * out["primal"] * inv
    S = jnp.moveaxis(out["S"], 1, 0)
    W = jnp.moveaxis(out["W"], 1, 0)
    S = jnp.stack([sgps[i].thr * S[i] * inv for i in range(4)])
    W = W * (base.thr * inv)[None]
    shift_ok = out["shift_ok"]

    if use_manifold:
        from . import manifold
        from ..core.math import dot as _dot
        from ..core.math import normalize
        from ..render.bsdf import eval_bsdf
        me_q, me_i, me_scale, me_ok = _compact_me(out, me_budget)
        wscale = jnp.linalg.norm(scene.world_hi - scene.world_lo)
        # chain walks follow parent links in the ORIGINAL photon order
        me_io = grid.sorted_idx[me_i]
        ch = manifold.pull_chains(scene, pv_chain, me_io)
        a_i = pv_chain["alpha"][me_io]
        ph_p = pv_chain["p"][me_io]
        ph_wi = pv_chain["wi"][me_io]
        ph_prim = pv_chain["prim"][me_io]
        ph_ns = pv_chain["ns"][me_io]
        k2 = (INV_PI / jnp.maximum(r_all[me_q] ** 2, 1e-12))
        # base pair contribution (for the W weight correction)
        nsq = base.ns[me_q]
        saq, taq = s_ax_all[me_q], t_ax_all[me_q]
        wi_lb = to_local(nsq, saq, taq, -ph_wi)
        f_b, _ = eval_bsdf(scene, base.bsdf[me_q], wo_loc_all[me_q],
                           wi_lb)
        c_base_pair = base.thr[me_q] * a_i * f_b \
            * (k2 * me_scale * inv)[..., None]
        # sphere-root selector at the photon: base segment arrived from
        # outside iff wi points against the outward normal
        ph_enter = _dot(ph_wi, ph_ns) < 0.0
        for i in range(4):
            c_t = sgps[i].p[me_q] + (ph_p - base.p[me_q])
            ar, pr, okm, wi_new = manifold.me_shift_surface(
                scene, ch, ph_prim, ph_ns, ph_enter, c_t,
                scene_scale=wscale)
            ssx, ttx, wo_s = sgp_frames[i]
            wi_ls = to_local(sgps[i].ns[me_q], ssx[me_q], ttx[me_q],
                             -normalize(wi_new))
            f_s, _ = eval_bsdf(scene, sgps[i].bsdf[me_q], wo_s[me_q],
                               wi_ls)
            ok_i = okm & me_ok & comp[i][me_q] & ~border[i][me_q]
            w = jnp.where(ok_i, 1.0 / (1.0 + pr), 1.0)
            c_sh = sgps[i].thr[me_q] * (a_i * ar) * f_s \
                * (k2 * me_scale * inv)[..., None]
            S = S.at[i, me_q].add(
                jnp.where(ok_i[..., None], w[..., None] * c_sh, 0.0))
            W = W.at[i, me_q].add(
                jnp.where(ok_i[..., None], (w - 1.0)[..., None]
                          * c_base_pair, 0.0))
            shift_ok = shift_ok.at[me_q].add(ok_i.astype(jnp.int32))

    return primal, S, W, out["visits"], shift_ok


# ---------------------------------------------------------------------------
# volume photon points (VPM distance sampling, 3D kernel)
# ---------------------------------------------------------------------------

def volume_gather(scene: Scene, cb, scb_list, grid, packed, n_emitted,
                  r_vol, key, border_lane, n_samples=2, max_per_cell=32,
                  q_tile=128, stencil=8, use_manifold=False,
                  me_budget=4096, pv_chain=None):
    """VPM/distance gather with 4-direction shifts, dense planar path.

    Matches gvpm.volume_gradient_gather semantics; packed/pv_chain as in
    surface_gather. grid cell must cover the stencil (>= 2*r_vol for
    stencil=8). Returns (primal [M,3], S [4,M,3], W [4,M,3],
    visits [M], shift_ok [M]).
    """
    m = cb["o"].shape[0]
    o, d, length, mi = cb["o"], cb["d"], cb["length"], cb["med"]
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_vol ** 3, 1e-18))

    svalid = [scb_list[i]["valid"] & (scb_list[i]["med"] == mi)
              for i in range(4)]

    def one_sample(k):
        u = jax.random.uniform(k, (m,))
        ms = med.sample_distance(scene, mi, o, d, length, u,
                                 strategy=med.ALWAYS_VALID)
        x = ms.p
        t = ms.t
        sok = cb["valid"] & ms.success
        pdf_base_ray = jnp.maximum(ms.pdf_success, 1e-20)
        w_cam = cb["thr"] * ms.transmittance * ms.sigma_s \
            / pdf_base_ray[..., None]

        xs, cam_ok, pdf_ratio_cam, thr_s = [], [], [], []
        for i in range(4):
            s = scb_list[i]
            ok_i = sok & svalid[i] & (s["length"] >= t)
            xs.append(s["o"] + s["d"] * t[..., None])
            ps_i, _ = med.pdf_distance(scene, mi, t, s["length"],
                                       jnp.zeros_like(sok),
                                       strategy=med.ALWAYS_VALID)
            pdf_ratio_cam.append(ps_i / pdf_base_ray)
            cam_ok.append(ok_i)
            thr_s.append(s["thr"] * ms.transmittance * ms.sigma_s
                         / pdf_base_ray[..., None])

        def eval_fn(qi, idx, ok, scale):
            xq = x[qi]
            dq = d[qi]
            miq = mi[qi][:, None]
            sokq = sok[qi][:, None]
            v = RowView(packed[idx])
            ph_p = v.f3("p")
            rel = pl.sub3(ph_p, pl.expand(xq))
            d2 = pl.dot3(rel, rel)
            is_med = v.i1("vtype") == 2
            inside = ok & is_med & (d2 < r_vol * r_vol) & sokq
            wi_p = v.f3("wi")
            cos_t = -pl.dot3(wi_p, pl.expand(dq))
            pf = pl.eval_phase_planar(scene, miq, cos_t)
            kw = jnp.where(inside, pf * k3 * scale, 0.0)
            a = v.f3("alpha")
            cb_pl = (a[0] * kw, a[1] * kw, a[2] * kw)
            primal = jnp.stack([jnp.sum(c, axis=1) for c in cb_pl],
                               axis=-1)

            pre = _shift_caches(v, surface_target=False)
            S = []
            Wb = []
            ok_count = jnp.zeros(idx.shape[0], jnp.int32)
            for i in range(4):
                sp = pl.expand(xs[i][qi])
                new_p = (sp[0] + rel[0], sp[1] + rel[1], sp[2] + rel[2])
                a_sh, pr_l, ok_s, w_new = _reconnect_planar(
                    scene, pre, new_p, target_is_volume=True)
                sdq = pl.expand(scb_list[i]["d"][qi])
                cos_s = -pl.dot3(w_new, sdq)
                pf_s = pl.eval_phase_planar(scene, miq, cos_s)
                ok_i = ok_s & cam_ok[i][qi][:, None] & inside
                w = _mis_planar(pr_l, pdf_ratio_cam[i][qi][:, None], ok_i)
                w = jnp.where(border_lane[i][qi][:, None], 1.0, w)
                kwi = jnp.where(ok_i, pf_s * k3 * scale, 0.0) * w
                S.append(jnp.stack(
                    [jnp.sum(a_sh[c] * kwi, axis=1) for c in range(3)],
                    axis=-1))
                Wb.append(jnp.stack(
                    [jnp.sum(w * c, axis=1) for c in cb_pl], axis=-1))
                ok_count = ok_count + jnp.sum(ok_i, axis=1)
            res = dict(primal=primal, S=jnp.stack(S, axis=1),
                       W=jnp.stack(Wb, axis=1),
                       visits=jnp.sum(inside, axis=1), shift_ok=ok_count)
            if use_manifold:
                res.update(_pack_me_pairs(scene, v, pre, inside, qi, idx,
                                          scale))
            return res

        out = hashgrid.gather_dense(grid, x, eval_fn,
                                    max_per_cell=max_per_cell,
                                    q_tile=q_tile, stencil=stencil)
        primal = w_cam * out["primal"]
        S = jnp.moveaxis(out["S"], 1, 0)
        W = jnp.moveaxis(out["W"], 1, 0)
        S = jnp.stack([thr_s[i] * S[i] for i in range(4)])
        W = W * w_cam[None]
        shift_ok = out["shift_ok"]

        if use_manifold:
            from . import manifold
            from ..render import phase as ph
            me_q, me_i, me_scale, me_ok = _compact_me(out, me_budget)
            wscale = jnp.linalg.norm(scene.world_hi - scene.world_lo)
            me_io = grid.sorted_idx[me_i]
            ch = manifold.pull_chains(scene, pv_chain, me_io)
            a_i = pv_chain["alpha"][me_io]
            ph_p = pv_chain["p"][me_io]
            ph_wi = pv_chain["wi"][me_io]
            mi_q = mi[me_q]
            pf_b = ph.eval_phase(scene, mi_q, -ph_wi, -d[me_q])
            c_base_pair = w_cam[me_q] * a_i \
                * (pf_b * k3 * me_scale)[..., None]
            for i in range(4):
                c_t = xs[i][me_q] + (ph_p - x[me_q])
                ar, pr, okm, wi_new = manifold.me_shift_volume(
                    scene, ch, c_t, scene_scale=wscale)
                pf_s = ph.eval_phase(scene, mi_q, -wi_new,
                                     -scb_list[i]["d"][me_q])
                ok_i = okm & me_ok & cam_ok[i][me_q] \
                    & ~border_lane[i][me_q]
                w = jnp.where(ok_i,
                              1.0 / (1.0 + pr * pdf_ratio_cam[i][me_q]),
                              1.0)
                c_sh = thr_s[i][me_q] * (a_i * ar) \
                    * (pf_s * k3 * me_scale)[..., None]
                S = S.at[i, me_q].add(
                    jnp.where(ok_i[..., None], w[..., None] * c_sh, 0.0))
                W = W.at[i, me_q].add(
                    jnp.where(ok_i[..., None], (w - 1.0)[..., None]
                              * c_base_pair, 0.0))
                shift_ok = shift_ok.at[me_q].add(ok_i.astype(jnp.int32))

        return primal, S, W, out["visits"], shift_ok

    keys = jax.random.split(key, n_samples)
    primal = jnp.zeros((m, 3))
    S = jnp.zeros((4, m, 3))
    W = jnp.zeros((4, m, 3))
    visits = jnp.zeros((m,), jnp.int32)
    shift_ok = jnp.zeros((m,), jnp.int32)
    for k in keys:
        p_, S_, W_, v_, so_ = one_sample(k)
        primal, S, W = primal + p_, S + S_, W + W_
        visits, shift_ok = visits + v_, shift_ok + so_
    inv = 1.0 / (n_samples * n_emitted)
    return primal * inv, S * inv, W * inv, visits, shift_ok


# ---------------------------------------------------------------------------
# gradient BRE (2D kernel, deterministic foot-point)
# ---------------------------------------------------------------------------

def bre_gather(scene: Scene, cb, scb_list, grid, packed, n_emitted,
               r_vol, border_lane, max_steps=24, max_per_cell=16,
               q_tile=128):
    """Gradient BRE with 4-direction shifts, dense planar path.

    Marches the camera segments in steps of 2*r_vol (grid cell = 2*r_vol,
    27-stencil covers every photon whose foot lies in the step chunk:
    max photon distance from the chunk midpoint is sqrt(2)*r < 2r).
    Camera-side MIS pdf ratio is 1 (deterministic foot-point). Returns
    (primal [M,3], S [4,M,3], W [4,M,3], visits [M], shift_ok [M]).
    """
    m = cb["o"].shape[0]
    o, d, length, mi = cb["o"], cb["d"], cb["length"], cb["med"]
    valid = cb["valid"]
    _, sigma_s, st_cam = med._tables(scene, mi)
    step = 2.0 * r_vol
    k2 = INV_PI / jnp.maximum(r_vol * r_vol, 1e-12)

    svalid = [scb_list[i]["valid"] & (scb_list[i]["med"] == mi)
              for i in range(4)]

    def body(kstep, carry):
        primal0, S0, W0, v0, so0 = carry
        t_mid = (kstep.astype(jnp.float32) + 0.5) * step
        x = o + d * t_mid[..., None]
        live = valid & (t_mid - 0.5 * step < length)

        def eval_fn(qi, idx, ok, scale):
            oq = o[qi]
            dq = d[qi]
            lenq = length[qi][:, None]
            miq = mi[qi][:, None]
            liveq = live[qi][:, None]
            v = RowView(packed[idx])
            ph_p = v.f3("p")
            rel = pl.sub3(ph_p, pl.expand(oq))
            t_proj = pl.dot3(rel, pl.expand(dq))
            in_step = (t_proj >= kstep * step) \
                & (t_proj < (kstep + 1) * step) & (t_proj >= 0.0) \
                & (t_proj <= lenq)
            perp = (rel[0] - dq[:, 0:1] * t_proj,
                    rel[1] - dq[:, 1:2] * t_proj,
                    rel[2] - dq[:, 2:3] * t_proj)
            d2p = pl.dot3(perp, perp)
            is_med = v.i1("vtype") == 2
            inside = ok & is_med & in_step & (d2p < r_vol * r_vol) & liveq
            wi_p = v.f3("wi")
            cos_t = -pl.dot3(wi_p, pl.expand(dq))
            pf = pl.eval_phase_planar(scene, miq, cos_t)
            stq = st_cam[qi]
            a = v.f3("alpha")
            ssq = sigma_s[qi]
            kw = jnp.where(inside, pf * k2 * scale, 0.0)
            cb_pl = tuple(
                a[c] * ssq[:, c:c + 1] * jnp.exp(-stq[:, c:c + 1] * t_proj)
                * kw for c in range(3))
            primal = jnp.stack([jnp.sum(c, axis=1) for c in cb_pl],
                               axis=-1)

            foot = (oq[:, 0:1] + dq[:, 0:1] * t_proj,
                    oq[:, 1:2] + dq[:, 1:2] * t_proj,
                    oq[:, 2:3] + dq[:, 2:3] * t_proj)
            pre = _shift_caches(v, surface_target=False)
            S = []
            Wb = []
            ok_count = jnp.zeros(idx.shape[0], jnp.int32)
            for i in range(4):
                s = scb_list[i]
                soq = s["o"][qi]
                sdq = s["d"][qi]
                ok_cam = svalid[i][qi][:, None] \
                    & (s["length"][qi][:, None] >= t_proj)
                x_s = (soq[:, 0:1] + sdq[:, 0:1] * t_proj,
                       soq[:, 1:2] + sdq[:, 1:2] * t_proj,
                       soq[:, 2:3] + sdq[:, 2:3] * t_proj)
                new_p = (x_s[0] + ph_p[0] - foot[0],
                         x_s[1] + ph_p[1] - foot[1],
                         x_s[2] + ph_p[2] - foot[2])
                a_sh, pr_l, ok_s, w_new = _reconnect_planar(
                    scene, pre, new_p, target_is_volume=True)
                cos_s = -pl.dot3(w_new, pl.expand(sdq))
                pf_s = pl.eval_phase_planar(scene, miq, cos_s)
                ok_i = inside & ok_cam & ok_s
                w = _mis_planar(pr_l, 1.0, ok_i)
                w = jnp.where(border_lane[i][qi][:, None], 1.0, w)
                kwi = jnp.where(ok_i, pf_s * k2 * scale, 0.0) * w
                sthr = scb_list[i]["thr"][qi]
                S.append(jnp.stack(
                    [jnp.sum(a_sh[c] * ssq[:, c:c + 1]
                             * jnp.exp(-stq[:, c:c + 1] * t_proj) * kwi,
                             axis=1) * sthr[:, c]
                     for c in range(3)], axis=-1))
                Wb.append(jnp.stack(
                    [jnp.sum(w * c, axis=1) for c in cb_pl], axis=-1))
                ok_count = ok_count + jnp.sum(ok_i, axis=1)
            return dict(primal=primal, S=jnp.stack(S, axis=1),
                        W=jnp.stack(Wb, axis=1),
                        visits=jnp.sum(inside, axis=1), shift_ok=ok_count)

        out = hashgrid.gather_dense(grid, x, eval_fn,
                                    max_per_cell=max_per_cell,
                                    q_tile=q_tile, stencil=27)
        primal = primal0 + cb["thr"] * out["primal"]
        S = S0 + jnp.moveaxis(out["S"], 1, 0)
        W = W0 + jnp.moveaxis(out["W"], 1, 0) * cb["thr"][None]
        return (primal, S, W, v0 + out["visits"], so0 + out["shift_ok"])

    init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)), jnp.zeros((4, m, 3)),
            jnp.zeros((m,), jnp.int32), jnp.zeros((m,), jnp.int32))
    primal, S, W, visits, shift_ok = lax.fori_loop(0, max_steps, body,
                                                   init)
    inv = 1.0 / n_emitted
    return primal * inv, S * inv, W * inv, visits, shift_ok
