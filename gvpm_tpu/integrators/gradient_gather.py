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
          "reconnectable", "vtype", "bsdf", "prim", "depth",
          "pm_btype", "pm_alpha", "pm_eta1", "pm_g", "pm_ptype",
          # baked ME-eligibility flags (the fused Pallas kernel cannot
          # do scene-table lookups): parent lobe is delta, own surface
          # lobe is delta/null
          "pm_delta", "own_delta")
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


def pack_photons(scene: Scene, pv, valid=None):
    """Photon SoA dict -> one [P, 128] f32 row table.

    Integer fields are stored as f32 (exact below 2^24 — photon-map rows
    and scene tables are far smaller); sigma_t of the photon's medium is
    folded in at pack time so the inner loop never touches the medium
    tables. `valid` [P] restricts the NaN scrub to dead lanes (see
    below) so a genuine non-finite in a live photon stays visible in
    images/tests instead of being silently zeroed.
    """
    from ..core.tables import take
    mi = jnp.clip(pv["med"], 0, scene.med_sigma_a.shape[0] - 1)
    st = jnp.where((pv["med"] >= 0)[..., None],
                   take(scene.med_sigma_a, mi)
                   + take(scene.med_sigma_s, mi), 0.0)
    bic = jnp.clip(pv["parent_bsdf"], 0, scene.bsdf_type.shape[0] - 1)
    pmi = jnp.clip(pv["parent_med"], 0, scene.med_sigma_s.shape[0] - 1)
    p_in_med = pv["parent_med"] >= 0
    derived3 = dict(
        st=st,
        pm_alb=take(scene.bsdf_albedo, bic),
        pm_spec=take(scene.bsdf_k, bic),
        pm_eta3=take(scene.bsdf_eta3, bic),
        pm_sigs=jnp.where(p_in_med[..., None],
                          take(scene.med_sigma_s, pmi), 0.0))
    pbt = take(scene.bsdf_type, bic)
    obt = take(scene.bsdf_type,
               jnp.clip(pv["bsdf"], 0, scene.bsdf_type.shape[0] - 1))
    derived1 = dict(
        pm_btype=pbt,
        pm_alpha=take(scene.bsdf_alpha, bic),
        pm_eta1=take(scene.bsdf_eta, bic),
        pm_g=take(scene.med_g, pmi),
        pm_ptype=take(scene.med_phase, pmi),
        pm_delta=((pbt == BSDF_CONDUCTOR)
                  | (pbt == BSDF_DIELECTRIC)).astype(jnp.float32),
        own_delta=((obt == BSDF_CONDUCTOR) | (obt == BSDF_DIELECTRIC)
                   | (obt == BSDF_NULL)).astype(jnp.float32))
    cols = []
    for n in _SLOT3:
        a = derived3[n] if n in derived3 else pv[n]
        cols.append(a.astype(jnp.float32))
    for n in _SLOT1:
        a = derived1[n] if n in derived1 else pv[n]
        cols.append(a.astype(jnp.float32)[..., None])
    packed = jnp.concatenate(cols, axis=-1)
    # invalid photon slots can hold inf/NaN (dead lanes of the particle
    # tracer). The legacy driver never gathers them, but the windowed
    # driver STREAMS contiguous row ranges that may include them, and a
    # masked lane still poisons sums via 0*inf -> NaN. Zeroed rows flow
    # through the eval finitely (every division is eps-guarded). With a
    # `valid` mask only DEAD rows are scrubbed (live-photon finiteness
    # bugs must surface, not vanish).
    scrub = jnp.where(jnp.isfinite(packed), packed, 0.0)
    if valid is not None:
        packed = jnp.where(valid[:, None], packed, scrub)
    else:
        packed = scrub
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
        # logical form, not where(cond, bool, True): a bool-valued
        # where lowers to an i8->i1 truncation Mosaic rejects
        ok_sc = ok_sc & ((~par_sf) | sign_ok)

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
# fused Pallas kernel path (ops/pallas_gather.py driver="pallas")
# ---------------------------------------------------------------------------

def _mk_qslots(f3names, f1names):
    slots = {}
    k = 0
    for n in f3names:
        slots[n] = k
        k += 3
    for n in f1names:
        slots[n] = k
        k += 1
    return slots, k


_VOL_Q3 = ("x", "d", "xs0", "xs1", "xs2", "xs3",
           "sd0", "sd1", "sd2", "sd3")
_VOL_Q1 = ("g", "pt", "sok", "depth",
           "cam_ok0", "cam_ok1", "cam_ok2", "cam_ok3",
           "prc0", "prc1", "prc2", "prc3",
           "border0", "border1", "border2", "border3")
VOL_QSLOTS, _VOL_NQ = _mk_qslots(_VOL_Q3, _VOL_Q1)
VOL_QROW_F = 64
VOL_N_ADD = 30   # primal 3 + S 12 + W 12 + visits + shift_ok + dropped


def _volume_eval_pallas(min_depth, use_manifold):
    """In-kernel mirror of volume_gather.eval_core: 3D-kernel primal +
    4 reconnection shifts on [Qt, W] pair planes (the same planar math,
    executed inside one Mosaic kernel — see ops/pallas_gather.py)."""

    def eval_fn(qv, wv, ok, scale, par, absrow):
        r2 = par[0, 0]
        k3 = par[0, 1]
        xq = qv.f3("x")
        dq = qv.f3("d")
        ph_p = wv.f3("p")
        rel = pl.sub3(ph_p, xq)
        d2 = pl.dot3(rel, rel)
        inside = ok & (wv.f1("vtype") == 2.0) & (d2 < r2) & qv.b1("sok")
        if min_depth > 0:
            inside = inside & (wv.f1("depth") + qv.f1("depth") + 1.0
                               >= float(min_depth))
        cos_t = -pl.dot3(wv.f3("wi"), dq)
        pf = pl.phase_params(cos_t, qv.f1("g"), qv.i1("pt"))
        kw = jnp.where(inside, pf * k3 * scale, 0.0)
        a = wv.f3("alpha")
        cb = (a[0] * kw, a[1] * kw, a[2] * kw)

        def rsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        pre = _shift_caches(wv, surface_target=False)
        cols = [rsum(c) for c in cb]
        s_cols, w_cols = [], []
        okc = jnp.zeros((ok.shape[0], 1), jnp.float32)
        for i in range(4):
            sp = qv.f3(f"xs{i}")
            new_p = (sp[0] + rel[0], sp[1] + rel[1], sp[2] + rel[2])
            a_sh, pr_l, ok_s, w_new = _reconnect_planar(
                None, pre, new_p, target_is_volume=True)
            sdq = qv.f3(f"sd{i}")
            cos_s = -pl.dot3(w_new, sdq)
            pf_s = pl.phase_params(cos_s, qv.f1("g"), qv.i1("pt"))
            ok_i = ok_s & qv.b1(f"cam_ok{i}") & inside
            w = _mis_planar(pr_l, qv.f1(f"prc{i}"), ok_i)
            w = jnp.where(qv.b1(f"border{i}"), 1.0, w)
            kwi = jnp.where(ok_i, pf_s * k3 * scale, 0.0) * w
            s_cols += [rsum(a_sh[c] * kwi) for c in range(3)]
            w_cols += [rsum(w * c) for c in cb]
            okc = okc + rsum(ok_i.astype(jnp.float32))
        visits = rsum(inside.astype(jnp.float32))
        add = jnp.concatenate(
            cols + s_cols + w_cols
            + [visits, okc, jnp.zeros_like(visits)], axis=1)
        mk = None
        if use_manifold:
            from ..ops.pallas_gather import BIG_F
            me_m = (inside & ~pre["reconn"]
                    & (pre["ptype"] == pl.VERT_SURFACE)
                    & wv.b1("pm_delta"))
            key = jnp.where(me_m, absrow.astype(jnp.float32), BIG_F)
            kmin = jnp.min(key, axis=1, keepdims=True)
            sel = (key == kmin) & me_m
            smin = jnp.max(jnp.where(sel, scale, 0.0), axis=1,
                           keepdims=True)
            mk = (kmin, smin)
        return add, mk

    return eval_fn


_SUR_Q3 = ("p", "ns", "s", "t", "wo", "alb", "spec", "eta3",
           "p0", "ns0", "s0", "t0", "wo0",
           "p1", "ns1", "s1", "t1", "wo1",
           "p2", "ns2", "s2", "t2", "wo2",
           "p3", "ns3", "s3", "t3", "wo3")
_SUR_Q1 = ("btype", "alpha_b", "eta1", "r2", "valid", "depth",
           "comp0", "comp1", "comp2", "comp3",
           "sens0", "sens1", "sens2", "sens3",
           "border0", "border1", "border2", "border3")
SUR_QSLOTS, _SUR_NQ = _mk_qslots(_SUR_Q3, _SUR_Q1)
SUR_QROW_F = 128


def _surface_eval_pallas(min_depth, use_manifold):
    """In-kernel mirror of surface_gather.eval_core (2D kernel primal +
    4 reconnection shifts). The shifted gather point's BSDF equals the
    base's whenever comp[i] holds (structure compatibility requires
    sgp.bsdf == base.bsdf), so the base's baked BSDF params serve both
    evaluations — incompatible pairs are masked out anyway."""

    def eval_fn(qv, wv, ok, scale, par, absrow):
        gp_p = qv.f3("p")
        r2 = qv.f1("r2")
        ns = qv.f3("ns")
        s_ax = qv.f3("s")
        t_ax = qv.f3("t")
        wo_l = qv.f3("wo")
        ph_p = wv.f3("p")
        rel = pl.sub3(ph_p, gp_p)
        d2 = pl.dot3(rel, rel)
        wi_p = wv.f3("wi")
        nwi = pl.neg3(wi_p)
        front = pl.dot3(ns, nwi) > 1e-4
        inside = (ok & (wv.f1("vtype") == 1.0) & (d2 < r2) & front
                  & qv.b1("valid"))
        if min_depth > 0:
            inside = inside & (wv.f1("depth") + qv.f1("depth")
                               >= float(min_depth))
        wi_l = pl.to_local_planes(ns, s_ax, t_ax, nwi)
        bparams = dict(btype=qv.i1("btype"), alb=qv.f3("alb"),
                       spec=qv.f3("spec"), eta3=qv.f3("eta3"),
                       alpha=qv.f1("alpha_b"), eta1=qv.f1("eta1"))
        fr, fg, fb, _ = pl.eval_bsdf_pdf_params(bparams, wo_l, wi_l)
        k2 = INV_PI / jnp.maximum(r2, 1e-12)
        kw = jnp.where(inside, k2 * scale, 0.0)
        a = wv.f3("alpha")
        cb = (a[0] * fr * kw, a[1] * fg * kw, a[2] * fb * kw)

        def rsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        pre = _shift_caches(wv, surface_target=True)
        cols = [rsum(c) for c in cb]
        s_cols, w_cols = [], []
        okc = jnp.zeros((ok.shape[0], 1), jnp.float32)
        for i in range(4):
            sp = qv.f3(f"p{i}")
            new_p = (sp[0] + rel[0], sp[1] + rel[1], sp[2] + rel[2])
            a_sh, pr_l, ok_s, w_new = _reconnect_planar(
                None, pre, new_p, target_is_volume=False)
            wi_ls = pl.to_local_planes(qv.f3(f"ns{i}"), qv.f3(f"s{i}"),
                                       qv.f3(f"t{i}"), pl.neg3(w_new))
            fs = pl.eval_bsdf_pdf_params(bparams, qv.f3(f"wo{i}"),
                                         wi_ls)
            ok_i = ok_s & qv.b1(f"comp{i}") & inside
            w = _mis_planar(pr_l, qv.f1(f"sens{i}"), ok_i)
            w = jnp.where(qv.b1(f"border{i}"), 1.0, w)
            kwi = jnp.where(ok_i, k2 * scale, 0.0) * w
            s_cols += [rsum(a_sh[c] * fs[c] * kwi) for c in range(3)]
            w_cols += [rsum(w * c) for c in cb]
            okc = okc + rsum(ok_i.astype(jnp.float32))
        visits = rsum(inside.astype(jnp.float32))
        add = jnp.concatenate(
            cols + s_cols + w_cols
            + [visits, okc, jnp.zeros_like(visits)], axis=1)
        mk = None
        if use_manifold:
            from ..ops.pallas_gather import BIG_F
            me_m = (inside & ~pre["reconn"]
                    & (pre["ptype"] == pl.VERT_SURFACE)
                    & wv.b1("pm_delta") & ~wv.b1("own_delta"))
            key = jnp.where(me_m, absrow.astype(jnp.float32), BIG_F)
            kmin = jnp.min(key, axis=1, keepdims=True)
            sel = (key == kmin) & me_m
            smin = jnp.max(jnp.where(sel, scale, 0.0), axis=1,
                           keepdims=True)
            mk = (kmin, smin)
        return add, mk

    return eval_fn


def _unpack_pallas_out(planv, out_flat, n_add, me):
    """Kernel tile output -> the gather-driver out dict contract."""
    from ..ops import pallas_gather as pg
    res = pg.unsort(planv, out_flat)
    Q = res.shape[0]
    out = dict(primal=res[:, 0:3],
               S=res[:, 3:15].reshape(Q, 4, 3),
               W=res[:, 15:27].reshape(Q, 4, 3),
               visits=res[:, 27].astype(jnp.int32),
               shift_ok=res[:, 28].astype(jnp.int32))
    dropped = jnp.sum(res[:, 29]).astype(jnp.int32)
    if me:
        key = res[:, n_add]
        out["me_q"] = jnp.arange(Q, dtype=jnp.int32)
        out["me_i"] = jnp.clip(key, 0, 2**30).astype(jnp.int32)
        out["me_scale"] = res[:, n_add + 1]
        out["me_ok"] = key < 1e29
    return out, dropped


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
                   use_manifold=False, me_budget=4096, pv_chain=None,
                   budget=None, min_depth=0, window=768,
                   window_q_tile=128, driver="window", k_budget=32,
                   pallas_q_tile=128, pallas_window=256):
    """Surface photon gather with 4-direction shifts, dense planar path.

    packed: pack_photons table permuted into `grid` order. Three
    drivers:
      - hashgrid.HashGrid (build_sorted): legacy prefix-compacted
        per-candidate row gathers (one random gather per candidate —
        ~110M rows/s ceiling measured on-chip);
      - cellgrid.CellGrid + driver="window": windowed dense streaming
        (contiguous runs, each photon row streamed once per query tile
        — the round-3 fast path);
      - cellgrid.CellGrid + driver="cull": narrow-table ball cull +
        K-compacted eval (gather_window_culled — the round-4 fast
        path; shift math runs only on real kernel visits).
    pv_chain: ORIGINAL-order photon dict for ME chain walks
    (grid.sorted_idx maps back). Semantics match
    gvpm.surface_gradient_gather (2D kernel, diffuse reconnection,
    pairwise MIS); grid cell >= 2*max r for stencil=8. Returns
    (primal [N,3], S [4,N,3], W [4,N,3], visits [N], shift_ok [N]).
    """
    from ..ops import cellgrid
    r_all = base.radius
    s_ax_all, t_ax_all = coordinate_system(base.ns)
    wo_loc_all = to_local(base.ns, s_ax_all, t_ax_all, base.wo)
    comp = jnp.stack([_gp_compatible(base, sgps[i]) for i in range(4)])
    # sensorMIS: offset/base camera-subpath pdf ratio
    # (gvpm_struct.h:608-631); 1 for pure-specular-identical retraces
    sens = jnp.stack([
        jnp.clip(sgps[i].pdf_prod
                 / jnp.maximum(base.pdf_prod, 1e-20), 1e-4, 1e4)
        for i in range(4)])
    sgp_frames = []
    for i in range(4):
        ss, tt = coordinate_system(sgps[i].ns)
        sgp_frames.append(
            (ss, tt, to_local(sgps[i].ns, ss, tt, sgps[i].wo)))

    def eval_core(qi, v, ok, scale, idx):
        gp_p = base.p[qi]
        r = r_all[qi][:, None]
        ns = base.ns[qi]
        s_ax = s_ax_all[qi]
        t_ax = t_ax_all[qi]
        wo_l = wo_loc_all[qi]
        bi = base.bsdf[qi][:, None]
        gvalid = base.valid[qi][:, None]

        ph_p = v.f3("p")
        rel = pl.sub3(ph_p, pl.expand(gp_p))
        d2 = pl.dot3(rel, rel)
        is_surf = v.i1("vtype") == 1
        wi_p = v.f3("wi")
        nwi = pl.neg3(wi_p)
        front = pl.dot3(pl.expand(ns), nwi) > 1e-4
        inside = ok & is_surf & (d2 < r * r) & front & gvalid
        if min_depth > 0:
            # per-pair total-depth gate: photon depth + camera scatter
            # count at the GP (shift_volume_photon.cpp:672 semantics,
            # not a photon-map prefilter)
            inside = inside & (v.i1("depth") + base.depth[qi][:, None]
                               >= min_depth)
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
        ok_count = jnp.zeros(ok.shape[0], jnp.int32)
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
            w = _mis_planar(pr_l, sens[i][qi][:, None], ok_i)
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

    overflow = jnp.zeros((), jnp.int32)
    if isinstance(grid, cellgrid.CellGrid) and driver == "pallas":
        from ..ops import pallas_gather as pg
        interp = jax.default_backend() == "cpu"
        planv = pg.plan_windows(grid, base.p, base.valid,
                                q_tile=pallas_q_tile,
                                window=pallas_window)
        bic = jnp.clip(base.bsdf, 0, scene.bsdf_type.shape[0] - 1)
        cols3 = [base.p, base.ns, s_ax_all, t_ax_all, wo_loc_all,
                 scene.bsdf_albedo[bic], scene.bsdf_k[bic],
                 scene.bsdf_eta3[bic]]
        for i in range(4):
            cols3 += [sgps[i].p, sgps[i].ns, sgp_frames[i][0],
                      sgp_frames[i][1], sgp_frames[i][2]]
        cols1 = [scene.bsdf_type[bic].astype(jnp.float32),
                 scene.bsdf_alpha[bic], scene.bsdf_eta[bic],
                 r_all * r_all, base.valid.astype(jnp.float32),
                 base.depth.astype(jnp.float32)] \
            + [comp[i].astype(jnp.float32) for i in range(4)] \
            + [sens[i] for i in range(4)] \
            + [border[i].astype(jnp.float32) for i in range(4)]
        qrows = jnp.concatenate(
            [c.astype(jnp.float32) for c in cols3]
            + [c[:, None] for c in cols1], axis=1)
        qrows = jnp.pad(qrows,
                        ((0, 0), (0, SUR_QROW_F - qrows.shape[1])))
        qrows = qrows[planv["qi"]]
        params = jnp.zeros((1, 8), jnp.float32)
        out_flat = pg.fused_gather(
            planv, packed.T, qrows, params,
            _surface_eval_pallas(min_depth, use_manifold),
            VOL_N_ADD, SUR_QSLOTS, SLOT, me=use_manifold,
            interpret=interp)
        out, dropped = _unpack_pallas_out(planv, out_flat, VOL_N_ADD,
                                          use_manifold)
    elif isinstance(grid, cellgrid.CellGrid) and driver == "cull":
        def eval_cf(qi, idx, ok, scale):
            return eval_core(qi, RowView(packed[idx]), ok, scale, idx)
        out, dropped, overflow = cellgrid.gather_ranked_cull(
            grid, base.p, r_all * r_all, cellgrid.narrow_table(packed),
            eval_cf, packed, q_tile=window_q_tile,
            budget=budget or max(64, 2 * k_budget),
            k_budget=k_budget, q_valid=base.valid, stencil=27)
    elif isinstance(grid, cellgrid.CellGrid):
        def eval_win(qi, rows, row0, ok, scale):
            idx = row0 + jnp.broadcast_to(
                jnp.arange(rows.shape[0], dtype=jnp.int32)[None, :],
                ok.shape)
            return eval_core(qi, RowView(rows[None]), ok, scale, idx)
        out, dropped = cellgrid.gather_window(
            grid, base.p, eval_win, packed, q_tile=window_q_tile,
            window=window, q_valid=base.valid)
    else:
        def eval_fn(qi, idx, ok, scale):
            return eval_core(qi, RowView(packed[idx]), ok, scale, idx)
        out = hashgrid.gather_dense(grid, base.p, eval_fn,
                                    max_per_cell=max_per_cell,
                                    q_tile=q_tile,
                                    stencil=stencil, budget=budget)
        dropped = jnp.zeros((), jnp.int32)
    inv = 1.0 / n_emitted
    primal = base.thr * out["primal"] * inv
    S = jnp.moveaxis(out["S"], 1, 0)
    W = jnp.moveaxis(out["W"], 1, 0)
    S = jnp.stack([sgps[i].thr * S[i] * inv for i in range(4)])
    W = W * (base.thr * inv)[None]
    shift_ok = out["shift_ok"]

    me_drop = jnp.zeros((), jnp.int32)
    if use_manifold:
        from . import manifold
        from ..core.math import dot as _dot
        from ..core.math import normalize
        from ..render.bsdf import eval_bsdf
        me_q, me_i, me_scale, me_ok = _compact_me(out, me_budget)
        # ME-eligible pairs beyond the per-tile/global budgets fall to
        # unilateral gradients — COUNT them (VERDICT r3 weak #7;
        # reference counts every shift outcome,
        # shift_volume_photon.cpp:40-47)
        me_drop = (jnp.sum(out["me_ok"].astype(jnp.int32))
                   - jnp.sum(me_ok.astype(jnp.int32)))
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

    return (primal, S, W, out["visits"], shift_ok,
            jnp.stack([dropped, overflow, me_drop]))


# ---------------------------------------------------------------------------
# volume photon points (VPM distance sampling, 3D kernel)
# ---------------------------------------------------------------------------

def volume_gather(scene: Scene, cb, scb_list, grid, packed, n_emitted,
                  r_vol, key, border_lane, n_samples=2, max_per_cell=32,
                  q_tile=128, stencil=8, use_manifold=False,
                  me_budget=4096, pv_chain=None, budget=None,
                  min_depth=0, window=768, window_q_tile=128,
                  driver="window", k_budget=32, pallas_q_tile=128,
                  pallas_window=256):
    """VPM/distance gather with 4-direction shifts, dense planar path.

    Matches gvpm.volume_gradient_gather semantics; packed/pv_chain as in
    surface_gather, including its three drivers (HashGrid: legacy
    per-candidate gathers; CellGrid: windowed contiguous streaming, or
    narrow-table cull + K-compacted eval with driver="cull").
    grid cell must cover the stencil (>= 2*r_vol for stencil=8).
    Returns (primal [M,3], S [4,M,3], W [4,M,3], visits [M],
    shift_ok [M]).
    """
    from ..ops import cellgrid
    m = cb["o"].shape[0]
    o, d, length, mi = cb["o"], cb["d"], cb["length"], cb["med"]
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_vol ** 3, 1e-18))

    svalid = [scb_list[i]["valid"] & (scb_list[i]["med"] == mi)
              for i in range(4)]
    # sensorMIS: offset/base camera-subpath pdf ratio
    # (gvpm_struct.h:608-631)
    sens = [jnp.clip(scb_list[i]['pdf_prod']
                     / jnp.maximum(cb['pdf_prod'], 1e-20),
                     1e-4, 1e4) for i in range(4)]
    narrow = (cellgrid.narrow_table(packed)
              if isinstance(grid, cellgrid.CellGrid) and driver == "cull"
              else None)
    # feature-major table for the fused kernel: one XLA transpose per
    # pass; windows then DMA as 128 contiguous stripes
    tbl_T = (packed.T
             if isinstance(grid, cellgrid.CellGrid) and driver == "pallas"
             else None)

    def one_sample(k):
        if "gid" in cb:   # device-count-invariant draws (core/rng.py)
            from ..core import rng as _rng
            u = _rng.lane_uniform(k, cb["gid"])
        else:
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
            pdf_ratio_cam.append(ps_i / pdf_base_ray * sens[i])
            cam_ok.append(ok_i)
            thr_s.append(s["thr"] * ms.transmittance * ms.sigma_s
                         / pdf_base_ray[..., None])

        def eval_core(qi, v, ok, scale, idx):
            xq = x[qi]
            dq = d[qi]
            miq = mi[qi][:, None]
            sokq = sok[qi][:, None]
            ph_p = v.f3("p")
            rel = pl.sub3(ph_p, pl.expand(xq))
            d2 = pl.dot3(rel, rel)
            is_med = v.i1("vtype") == 2
            inside = ok & is_med & (d2 < r_vol * r_vol) & sokq
            if min_depth > 0:
                # medium vertex on this segment has camera depth
                # cb["depth"]+1 (shift_volume_photon.cpp:672)
                inside = inside & (
                    v.i1("depth") + cb["depth"][qi][:, None] + 1
                    >= min_depth)
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
            ok_count = jnp.zeros(ok.shape[0], jnp.int32)
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

        overflow = jnp.zeros((), jnp.int32)
        if isinstance(grid, cellgrid.CellGrid) and driver == "pallas":
            from ..ops import pallas_gather as pg
            interp = jax.default_backend() == "cpu"
            planv = pg.plan_windows(grid, x, sok, q_tile=pallas_q_tile,
                                    window=pallas_window)
            mic = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
            cols3 = [x, d] + xs + [scb_list[i]["d"] for i in range(4)]
            cols1 = [scene.med_g[mic],
                     scene.med_phase[mic].astype(jnp.float32),
                     sok, cb["depth"].astype(jnp.float32)] \
                + [c.astype(jnp.float32) for c in cam_ok] \
                + pdf_ratio_cam \
                + [border_lane[i].astype(jnp.float32) for i in range(4)]
            qrows = jnp.concatenate(
                [c.astype(jnp.float32) for c in cols3]
                + [c[:, None] for c in cols1], axis=1)
            qrows = jnp.pad(qrows,
                            ((0, 0), (0, VOL_QROW_F - qrows.shape[1])))
            qrows = qrows[planv["qi"]]
            k3s = jnp.float32(k3)
            params = jnp.stack(
                [r_vol * r_vol, k3s] + [jnp.float32(0.0)] * 6
            ).reshape(1, 8).astype(jnp.float32)
            out_flat = pg.fused_gather(
                planv, tbl_T, qrows, params,
                _volume_eval_pallas(min_depth, use_manifold),
                VOL_N_ADD, VOL_QSLOTS, SLOT, me=use_manifold,
                interpret=interp)
            out, dropped = _unpack_pallas_out(planv, out_flat,
                                              VOL_N_ADD, use_manifold)
        elif isinstance(grid, cellgrid.CellGrid) and driver == "cull":
            def eval_cf(qi, idx, ok, scale):
                return eval_core(qi, RowView(packed[idx]), ok, scale,
                                 idx)
            out, dropped, overflow = cellgrid.gather_ranked_cull(
                grid, x, r_vol * r_vol, narrow, eval_cf, packed,
                q_tile=window_q_tile,
                budget=budget or max(64, 2 * k_budget),
                k_budget=k_budget, q_valid=sok, stencil=27)
        elif isinstance(grid, cellgrid.CellGrid):
            def eval_win(qi, rows, row0, ok, scale):
                idx = row0 + jnp.broadcast_to(
                    jnp.arange(rows.shape[0], dtype=jnp.int32)[None, :],
                    ok.shape)
                return eval_core(qi, RowView(rows[None]), ok, scale, idx)
            out, dropped = cellgrid.gather_window(
                grid, x, eval_win, packed, q_tile=window_q_tile,
                window=window, q_valid=sok)
        else:
            def eval_fn(qi, idx, ok, scale):
                return eval_core(qi, RowView(packed[idx]), ok, scale,
                                 idx)
            out = hashgrid.gather_dense(grid, x, eval_fn,
                                        max_per_cell=max_per_cell,
                                        q_tile=q_tile, stencil=stencil,
                                        budget=budget)
            dropped = jnp.zeros((), jnp.int32)
        primal = w_cam * out["primal"]
        S = jnp.moveaxis(out["S"], 1, 0)
        W = jnp.moveaxis(out["W"], 1, 0)
        S = jnp.stack([thr_s[i] * S[i] for i in range(4)])
        W = W * w_cam[None]
        shift_ok = out["shift_ok"]

        me_drop = jnp.zeros((), jnp.int32)
        if use_manifold:
            from . import manifold
            from ..render import phase as ph
            me_q, me_i, me_scale, me_ok = _compact_me(out, me_budget)
            me_drop = (jnp.sum(out["me_ok"].astype(jnp.int32))
                       - jnp.sum(me_ok.astype(jnp.int32)))
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

        return (primal, S, W, out["visits"], shift_ok,
                jnp.stack([dropped, overflow, me_drop]))

    keys = jax.random.split(key, n_samples)
    primal = jnp.zeros((m, 3))
    S = jnp.zeros((4, m, 3))
    W = jnp.zeros((4, m, 3))
    visits = jnp.zeros((m,), jnp.int32)
    shift_ok = jnp.zeros((m,), jnp.int32)
    dropped = jnp.zeros((3,), jnp.int32)
    for k in keys:
        p_, S_, W_, v_, so_, dr_ = one_sample(k)
        primal, S, W = primal + p_, S + S_, W + W_
        visits, shift_ok = visits + v_, shift_ok + so_
        dropped = dropped + dr_
    inv = 1.0 / (n_samples * n_emitted)
    return primal * inv, S * inv, W * inv, visits, shift_ok, dropped


# ---------------------------------------------------------------------------
# gradient BRE (2D kernel, deterministic foot-point)
# ---------------------------------------------------------------------------

def bre_gather(scene: Scene, cb, scb_list, grid, packed, n_emitted,
               r_vol, border_lane, max_steps=24, max_per_cell=16,
               q_tile=128, budget=None, min_depth=0):
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
    # sensorMIS: offset/base camera-subpath pdf ratio
    # (gvpm_struct.h:608-631)
    sens = [jnp.clip(scb_list[i]['pdf_prod']
                     / jnp.maximum(cb['pdf_prod'], 1e-20),
                     1e-4, 1e4) for i in range(4)]

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
            if min_depth > 0:
                inside = inside & (
                    v.i1("depth") + cb["depth"][qi][:, None] + 1
                    >= min_depth)
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
                w = _mis_planar(pr_l, sens[i][qi][:, None], ok_i)
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
                                    q_tile=q_tile, stencil=27,
                                    budget=budget, exact_cells=True)
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


# ---------------------------------------------------------------------------
# photon-beam gradient gather (1D) with light-side reconnection shifts
# ---------------------------------------------------------------------------

def segment_chunked(gather_fn, scene, cb, scb_list, border_lane,
                    seg_tile, key=None, **kw):
    """Run a beam/plane gradient gather in CAMERA-SEGMENT chunks.

    The beam/plane gathers materialize [M, beam_tile] pair planes with
    M = all compacted camera segments; at paper scale (512^2 x 2 =
    524,288 segments) one f32 plane is 512 MB of HLO temp and dozens
    are live across the 4-shift loop — the BENCH_r03 OOM. Chunking M
    bounds every live temp to [seg_tile, beam_tile] while the inner
    beam-tile scan is unchanged; total pair work is identical.
    (Reference analog: SubBeamBVH query batching, beams_accel.h:82-260,
    bounds the same camera x beam product on the CPU side.)

    cb / scb_list entries are [M, ...] dicts, border_lane is [4, M].
    Padded lanes carry valid=False and are inert. `key`, when given, is
    folded with the chunk index so stochastic gathers (beam3d chord
    samples) stay decorrelated across chunks.
    """
    m = cb["o"].shape[0]
    if seg_tile <= 0 or seg_tile >= m:
        if key is not None:
            kw["key"] = key
        return gather_fn(scene, cb, scb_list, border_lane=border_lane,
                         **kw)
    n_chunks = -(-m // seg_tile)
    pad = n_chunks * seg_tile - m

    def ck(a):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, seg_tile) + a.shape[1:])

    cbc = {k: ck(v) for k, v in cb.items()}
    scbc = [{k: ck(v) for k, v in s.items()} for s in scb_list]
    blc = ck(jnp.moveaxis(border_lane, 0, 1))  # [n_chunks, St, 4]

    def body(args):
        ci, cbi, scbi, bli = args
        kw2 = dict(kw)
        if key is not None:
            kw2["key"] = jax.random.fold_in(key, ci)
        return gather_fn(scene, cbi, scbi,
                         border_lane=jnp.moveaxis(bli, -1, 0), **kw2)

    pr, S, W, v, sk, md = lax.map(
        body, (jnp.arange(n_chunks), cbc, scbc, blc))
    pr = pr.reshape(-1, 3)[:m]
    S = jnp.moveaxis(S, 1, 0).reshape(4, -1, 3)[:, :m]
    W = jnp.moveaxis(W, 1, 0).reshape(4, -1, 3)[:, :m]
    return pr, S, W, jnp.sum(v), jnp.sum(sk), jnp.sum(md)


def _bake_beam_params(scene: Scene, lb):
    """Per-beam [B] parent material parameters (one cheap table gather
    per pass instead of [M,T]-indexed lookups in the tile loop)."""
    bic = jnp.clip(lb["parent_bsdf"], 0, scene.bsdf_type.shape[0] - 1)
    pmi = jnp.clip(lb["parent_med"], 0, scene.med_sigma_s.shape[0] - 1)
    in_med = lb["parent_med"] >= 0
    return dict(
        bp_btype=scene.bsdf_type[bic].astype(jnp.float32),
        bp_alb=scene.bsdf_albedo[bic],
        bp_spec=scene.bsdf_k[bic],
        bp_eta3=scene.bsdf_eta3[bic],
        bp_alpha=scene.bsdf_alpha[bic],
        bp_eta1=scene.bsdf_eta[bic],
        bp_sigs=jnp.where(in_med[..., None], scene.med_sigma_s[pmi], 0.0),
        bp_g=scene.med_g[pmi],
        bp_ptype=scene.med_phase[pmi].astype(jnp.float32))


_BEAM_F3 = ("o", "d", "alpha", "parent_p", "parent_wi", "parent_ns",
            "scatter_base", "bp_alb", "bp_spec", "bp_eta3", "bp_sigs")
_BEAM_F1 = ("length", "med", "pdf_dir_base", "parent_type",
            "reconnectable", "valid", "bp_btype", "bp_alpha", "bp_eta1",
            "bp_g", "bp_ptype")


def _beam_me_elig(scene: Scene, lb):
    """Per-beam ME eligibility: the origin lobe is a DELTA surface
    scatter, the segment leaves the vertex itself, and no diffuse
    reconnection exists (getTypeShift's third branch applied to beam
    origins; shiftBeamME dispatch, shift_volume_beams.h:440)."""
    bt = scene.bsdf_type[jnp.clip(lb["parent_bsdf"], 0,
                                  scene.bsdf_type.shape[0] - 1)]
    par_delta = (bt == BSDF_CONDUCTOR) | (bt == BSDF_DIELECTRIC)
    ao = lb["at_origin"]
    rc = lb["reconnectable"]
    if ao.dtype != jnp.bool_:
        ao = ao > 0.5
    if rc.dtype != jnp.bool_:
        rc = rc > 0.5
    return lb["valid"] & ao & ~rc & (lb["parent_type"] == 1) & par_delta


def beam_gradient_gather(scene: Scene, cb, scb_list, lb, n_emitted,
                         r_beam, border_lane, tile=256,
                         use_manifold=False, me_budget=2048,
                         pv_chain=None):
    """1D beam-beam gradient gather: base intersections paired with a
    light-side DIFFUSE-RECONNECTION beam shift, and (use_manifold) a
    MANIFOLD shift for delta-origin beams (shiftBeamME analog): each
    camera segment keeps its FIRST ME-eligible beam pair per pass; the
    pairs are budget-compacted and chain-solved post-scan
    (manifold.me_shift_beam), remaining eligible pairs stay unilateral
    and are COUNTED (me_dropped).

    The shift (reference shiftBeamDiffuse, shift_volume_beams.h:408-457;
    BeamGradRadianceQuery:151-260) keeps the beam's origin vertex A,
    maps the base intersection point pb to the offset camera frame
    preserving the camera distance t_c and the kernel offset vector
    (pc - pb), and re-emits the beam from A through the mapped point:
    new direction, scatter-lobe ratio at A, transmittance/survival at
    the new beam parameter, 1/sin(theta') of the new crossing. MIS uses
    the density ratio of the offset intersection under its own sampling
    (pdf_dir * surv / (t^2 sin)) vs the base's
    (shift_volume_beams.h:273-311 Jacobian terms). Beams whose origin
    lobe is non-reconnectable (delta scatter / post-null segment) fall
    back to the null/identity shift (shiftNull3D,
    shift_volume_beams.cpp:748): the SAME beam re-intersected against
    the offset camera segment, weight 1/2.

    cb / scb_list: base + 4 offset camera-segment dicts (same flat
    order); lb: flattened LightBeams dict; border_lane: [4,M] bool.
    Returns (primal [M,3], S [4,M,3], W [4,M,3], visits, shift_ok).
    """
    from ..core.math import dot
    from . import estimators as est

    oc, dc, lc = cb["o"], cb["d"], cb["length"]
    mi, cvalid, cthr = cb["med"], cb["valid"], cb["thr"]
    m = oc.shape[0]
    _, sigma_s, st_c = med._tables(scene, mi)          # [M,3]
    mic = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g_cam = scene.med_g[mic][:, None]                  # [M,1] planes
    pt_cam = scene.med_phase[mic][:, None]
    k1 = 1.0 / (2.0 * r_beam)
    r2 = r_beam * r_beam

    so = [s["o"] for s in scb_list]
    sd = [s["d"] for s in scb_list]
    sthr = [s["thr"] for s in scb_list]
    slen = [s["length"] for s in scb_list]
    svalid = [s["valid"] & (s["med"] == mi) & cvalid for s in scb_list]
    # sensorMIS camera-subpath pdf ratio (gvpm_struct.h:608-631)
    sens = [jnp.clip(scb_list[i]["pdf_prod"]
                     / jnp.maximum(cb["pdf_prod"], 1e-20), 1e-4, 1e4)
            for i in range(4)]

    fields = dict(lb)
    fields.update(_bake_beam_params(scene, lb))
    do_me = use_manifold and pv_chain is not None
    fields["me_elig"] = (_beam_me_elig(scene, lb) if do_me
                         else jnp.zeros_like(lb["valid"]))
    nb = lb["o"].shape[0]
    n_tiles = -(-nb // tile)
    pad = n_tiles * tile - nb

    def tl(a):
        a = jnp.pad(a.astype(jnp.float32) if a.dtype == jnp.bool_ else a,
                    [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_tiles, tile) + a.shape[1:])

    tiles = {k: tl(fields[k])
             for k in _BEAM_F3 + _BEAM_F1 + ("me_elig",)}

    def p3(a):           # [T,3] -> plane tuple of [1,T]
        return (a[None, :, 0], a[None, :, 1], a[None, :, 2])

    def tile_step(acc, tt):
        ti, t = tt
        primal, S, W, visits, shok, me_found, me_beam, me_total = acc
        tob, tdb, tLb, tab = t["o"], t["d"], t["length"], t["alpha"]
        tvb = t["valid"] > 0.5
        tmb = t["med"].astype(jnp.int32)
        me_t = t["me_elig"] > 0.5                         # [T]

        # ---- base closest approach (rayIntersectInternal1D) ----
        w0 = oc[:, None, :] - tob[None]
        b = dot(dc[:, None, :], tdb[None])
        f1 = -dot(w0, dc[:, None, :])
        f2 = -dot(w0, tdb[None])
        denom = 1.0 - b * b
        parallel = jnp.abs(denom) < 1e-8
        den = jnp.where(parallel, 1.0, denom)
        tc_ = (f1 - b * f2) / den
        tb_ = (b * f1 - f2) / den
        okb = (~parallel & (tc_ > 1e-5) & (tc_ < lc[:, None])
               & (tb_ > 1e-5) & (tb_ < tLb[None])
               & cvalid[:, None] & tvb[None]
               & (mi[:, None] == tmb[None]))
        pc = oc[:, None, :] + dc[:, None, :] * tc_[..., None]
        pb = tob[None] + tdb[None] * tb_[..., None]
        delta = pc - pb
        d2 = jnp.sum(delta * delta, axis=-1)
        okb = okb & (d2 < r2)
        sin_t = jnp.sqrt(jnp.maximum(denom, 1e-12))
        pf_b = pl.phase_params(-b, g_cam, pt_cam)
        tr_c = jnp.exp(-st_c[:, None, :] * tc_[..., None])
        tr_b = jnp.exp(-st_c[:, None, :] * tb_[..., None])
        surv_b = est.survival_prob(
            scene, jnp.broadcast_to(mi[:, None], b.shape), tb_)
        wgt_b = (pf_b * k1 / (sin_t * jnp.maximum(surv_b, 1e-9)))[..., None] \
            * tr_c * tr_b * sigma_s[:, None, :]
        c_base = jnp.where(okb[..., None], tab[None] * wgt_b, 0.0) \
            * cthr[:, None, :]
        primal = primal + jnp.sum(c_base, axis=1)
        visits = visits + jnp.sum(okb)

        # ---- ME pair collection: first eligible beam per segment ----
        # (pairs taken here are EXCLUDED from the identity fallback and
        # resolved by the post-scan manifold stage)
        elig = okb & me_t[None]                            # [M, T]
        any_e = jnp.any(elig, axis=1)
        first = jnp.argmax(elig, axis=1).astype(jnp.int32)
        take = any_e & ~me_found
        me_beam = jnp.where(take, ti * tile + first, me_beam)
        me_found = me_found | any_e
        me_total = me_total + jnp.sum(elig)

        # ---- reconnection caches shared by the 4 shifts ----
        A = t["parent_p"]                                   # [T,3]
        pwi = p3(t["parent_wi"])
        pns = p3(t["parent_ns"])
        ptype = t["parent_type"].astype(jnp.int32)[None]
        reconn = (t["reconnectable"] > 0.5)[None]           # [1,T]
        sc_old = p3(t["scatter_base"])
        pdf_old = t["pdf_dir_base"][None]
        bparams = dict(btype=t["bp_btype"].astype(jnp.int32)[None],
                       alb=p3(t["bp_alb"]), spec=p3(t["bp_spec"]),
                       eta3=p3(t["bp_eta3"]),
                       alpha=t["bp_alpha"][None], eta1=t["bp_eta1"][None])
        mparams = dict(sigs=p3(t["bp_sigs"]), g=t["bp_g"][None],
                       ptype=t["bp_ptype"].astype(jnp.int32)[None])
        sc_old_max = jnp.maximum(jnp.maximum(sc_old[0], sc_old[1]),
                                 sc_old[2])

        for i in range(4):
            # ---- reconnection branch ----
            pc_i = so[i][:, None, :] + sd[i][:, None, :] * tc_[..., None]
            y_i = pc_i - delta
            dv = y_i - A[None]
            t_new2 = jnp.maximum(jnp.sum(dv * dv, axis=-1), 1e-12)
            t_new = jnp.sqrt(t_new2)
            w_new = tuple(dv[..., c] / t_new for c in range(3))
            sr, sg, sb_, pdf_new, ok_sc = pl.parent_scatter_params(
                ptype, pwi, pns, bparams, mparams, w_new)
            cos_x = (w_new[0] * sd[i][:, None, 0]
                     + w_new[1] * sd[i][:, None, 1]
                     + w_new[2] * sd[i][:, None, 2])
            sin2_n = jnp.maximum(1.0 - cos_x * cos_x, 1e-8)
            sin_n = jnp.sqrt(sin2_n)
            pf_n = pl.phase_params(-cos_x, g_cam, pt_cam)
            surv_n = est.survival_prob(
                scene, jnp.broadcast_to(mi[:, None], b.shape), t_new)
            tr_bn = jnp.exp(-st_c[:, None, :] * t_new[..., None])
            # offset beam length: same free-flight randoms in the same
            # homogeneous medium -> same sampled length as the base
            # (the 1(t<L)/surv(t) pairing must match the base estimator)
            ok_rc = (okb & reconn & ok_sc & svalid[i][:, None]
                     & (tc_ < slen[i][:, None]) & (t_new < tLb[None])
                     & (sc_old_max > 0.0)
                     & (pdf_old > 1e-20) & (pdf_new > 0.0))
            sc_r = jnp.stack(
                [jnp.where(ok_rc, s / jnp.maximum(sc_old[c], 1e-20), 0.0)
                 for c, s in enumerate((sr, sg, sb_))], axis=-1)
            wgt_n = (pf_n * k1
                     / (sin_n * jnp.maximum(surv_n, 1e-9)))[..., None] \
                * tr_c * tr_bn * sigma_s[:, None, :]
            c_rc = tab[None] * sc_r * wgt_n * sthr[i][:, None, :]
            # offset/base intersection-density ratio for the pair MIS
            pr_rc = (pdf_new / jnp.maximum(pdf_old, 1e-20)
                     * (surv_n / jnp.maximum(surv_b, 1e-9))
                     * (tb_ * tb_ / t_new2) * (sin_t / sin_n))

            # ---- identity fallback (null shift: same beam, offset ray)
            w0i = so[i][:, None, :] - tob[None]
            bi_ = dot(sd[i][:, None, :], tdb[None])
            f1i = -dot(w0i, sd[i][:, None, :])
            f2i = -dot(w0i, tdb[None])
            deni = 1.0 - bi_ * bi_
            pari = jnp.abs(deni) < 1e-8
            dni = jnp.where(pari, 1.0, deni)
            tci = (f1i - bi_ * f2i) / dni
            tbi = (bi_ * f1i - f2i) / dni
            pci = so[i][:, None, :] + sd[i][:, None, :] * tci[..., None]
            pbi = tob[None] + tdb[None] * tbi[..., None]
            d2i = jnp.sum((pci - pbi) ** 2, axis=-1)
            ok_id = (okb & ~reconn & ~me_t[None] & ~pari
                     & svalid[i][:, None]
                     & (tci > 1e-5) & (tci < slen[i][:, None])
                     & (tbi > 1e-5) & (tbi < tLb[None]) & (d2i < r2))
            sin_i = jnp.sqrt(jnp.maximum(deni, 1e-12))
            pf_i = pl.phase_params(-bi_, g_cam, pt_cam)
            surv_i = est.survival_prob(
                scene, jnp.broadcast_to(mi[:, None], b.shape), tbi)
            tr_ci = jnp.exp(-st_c[:, None, :] * tci[..., None])
            tr_bi = jnp.exp(-st_c[:, None, :] * tbi[..., None])
            wgt_i = (pf_i * k1
                     / (sin_i * jnp.maximum(surv_i, 1e-9)))[..., None] \
                * tr_ci * tr_bi * sigma_s[:, None, :]
            c_id = tab[None] * wgt_i * sthr[i][:, None, :]

            ok_sh = jnp.where(reconn, ok_rc, ok_id)
            c_sh = jnp.where(reconn[..., None],
                             jnp.where(ok_rc[..., None], c_rc, 0.0),
                             jnp.where(ok_id[..., None], c_id, 0.0))
            pr_l = jnp.where(reconn, pr_rc, 1.0)
            w = 1.0 / (1.0 + jnp.clip(pr_l * sens[i][:, None], 0.0, 1e12))
            w = jnp.clip(jnp.where(ok_sh, w, 1.0), 0.0, 1.0)
            w = jnp.where(border_lane[i][:, None], 1.0, w)
            S = S.at[i].add(jnp.sum(w[..., None] * c_sh, axis=1))
            W = W.at[i].add(jnp.sum(
                jnp.where(okb[..., None], w[..., None] * c_base, 0.0),
                axis=1))
            shok = shok + jnp.sum(ok_rc)
        return (primal, S, W, visits, shok,
                me_found, me_beam, me_total), None

    init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)),
            jnp.zeros((4, m, 3)), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((m,), bool), jnp.zeros((m,), jnp.int32),
            jnp.zeros((), jnp.int32))
    (primal, S, W, visits, shok, me_found, me_beam, me_total), _ = \
        lax.scan(tile_step, init, (jnp.arange(n_tiles), tiles))

    me_drop = jnp.zeros((), jnp.int32)
    if do_me:
        from ..core.math import dot
        B_me = min(me_budget, m)
        vals, sq = lax.top_k(me_found.astype(jnp.int32), B_me)
        sel = vals > 0
        bq = me_beam[sq]
        S, W, shok, att = _beam_me_stage(
            scene, fields, pv_chain, cb, scb_list, sens, svalid,
            border_lane, sq, bq, sel, r_beam, S, W, shok,
            sigma_s, st_c, mi, cthr)
        me_drop = me_total - att
    inv = 1.0 / n_emitted
    return primal * inv, S * inv, W * inv, visits, shok, me_drop


def _beam_me_stage(scene: Scene, fields, pv_chain, cb, scb_list, sens,
                   svalid, border_lane, sq, bq, sel, r_beam, S, W,
                   shok, sigma_s, st_c, mi, cthr):
    """Post-scan manifold stage for beam1d ME pairs (shiftBeamME,
    shift_volume_beams.cpp:748): recompute the base 1D intersection for
    the compacted (segment sq, beam bq) pairs, chain-solve the offset
    beams through manifold.me_shift_beam, and accumulate the ME-shifted
    contributions with pairwise MIS. Returns (S, W, shok, attempted)."""
    from ..core.math import dot
    from . import estimators as est
    from . import manifold

    oc, dc, lc = cb["o"], cb["d"], cb["length"]
    oq, dq, lq = oc[sq], dc[sq], lc[sq]
    miq = mi[sq]
    sg_q, st_q = sigma_s[sq], st_c[sq]
    g_q = scene.med_g[jnp.clip(miq, 0, scene.med_g.shape[0] - 1)]
    pt_q = scene.med_phase[jnp.clip(miq, 0, scene.med_g.shape[0] - 1)]
    k1 = 1.0 / (2.0 * r_beam)
    r2 = r_beam * r_beam

    bo = fields["o"][bq]
    bd = fields["d"][bq]
    bL = fields["length"][bq]
    ba = fields["alpha"][bq]
    bmed = fields["med"][bq]

    # base closest approach (same math as the tile loop, pair lanes)
    w0 = oq - bo
    b = dot(dq, bd)
    f1 = -dot(w0, dq)
    f2 = -dot(w0, bd)
    denom = 1.0 - b * b
    parallel = jnp.abs(denom) < 1e-8
    den = jnp.where(parallel, 1.0, denom)
    tc_ = (f1 - b * f2) / den
    tb_ = (b * f1 - f2) / den
    pc = oq + dq * tc_[..., None]
    pb = bo + bd * tb_[..., None]
    delta = pc - pb
    d2 = jnp.sum(delta * delta, axis=-1)
    okp = (sel & ~parallel & (tc_ > 1e-5) & (tc_ < lq)
           & (tb_ > 1e-5) & (tb_ < bL) & (d2 < r2)
           & (miq == bmed))
    sin_t = jnp.sqrt(jnp.maximum(denom, 1e-12))
    surv_b = est.survival_prob(scene, miq, tb_)
    pf_b = pl.phase_params(-b, g_q, pt_q)
    tr_c = jnp.exp(-st_q * tc_[..., None])
    tr_b = jnp.exp(-st_q * tb_[..., None])
    wgt_b = (pf_b * k1 / (sin_t * jnp.maximum(surv_b, 1e-9)))[..., None] \
        * tr_c * tr_b * sg_q
    c_base_pair = jnp.where(okp[..., None], ba * wgt_b, 0.0) \
        * cthr[sq]

    # chain pull: the virtual photon is the base beam point pb, its
    # parent the (delta) beam origin
    virt = dict(p=pb, seg_med=bmed,
                parent_idx=fields["parent_idx"][bq].astype(jnp.int32),
                reconnectable=jnp.zeros(sq.shape, bool),
                parent_type=fields["parent_type"][bq].astype(jnp.int32),
                parent_bsdf=fields["parent_bsdf"][bq].astype(jnp.int32))
    ch = manifold.pull_chains(scene, pv_chain, virt=virt)
    wscale = jnp.linalg.norm(scene.world_hi - scene.world_lo)

    att = jnp.sum(okp)
    for i in range(4):
        so_i = scb_list[i]["o"][sq]
        sd_i = scb_list[i]["d"][sq]
        sthr_i = scb_list[i]["thr"][sq]
        slen_i = scb_list[i]["length"][sq]
        pc_i = so_i + sd_i * tc_[..., None]
        y_i = pc_i - delta
        org_n, dir_n, t_n, ar, pr_ch, okm = manifold.me_shift_beam(
            scene, ch, y_i, scene_scale=wscale)
        cos_x = dot(dir_n, sd_i)
        sin_n = jnp.sqrt(jnp.maximum(1.0 - cos_x * cos_x, 1e-8))
        pf_n = pl.phase_params(-cos_x, g_q, pt_q)
        surv_n = est.survival_prob(scene, miq, t_n)
        tr_bn = jnp.exp(-st_q * t_n[..., None])
        ok_i = (okm & okp & svalid[i][sq] & (tc_ < slen_i)
                & (t_n < bL) & ~border_lane[i][sq])
        wgt_n = (pf_n * k1
                 / (sin_n * jnp.maximum(surv_n, 1e-9)))[..., None] \
            * tr_c * tr_bn * sg_q
        c_me = ba * ar * wgt_n * sthr_i
        pr_me = (pr_ch * (surv_n / jnp.maximum(surv_b, 1e-9))
                 * (tb_ * tb_ / jnp.maximum(t_n * t_n, 1e-12))
                 * (sin_t / sin_n))
        wmi = jnp.where(ok_i,
                        1.0 / (1.0 + jnp.clip(pr_me * sens[i][sq],
                                              0.0, 1e12)), 1.0)
        S = S.at[i, sq].add(
            jnp.where(ok_i[..., None], wmi[..., None] * c_me, 0.0))
        W = W.at[i, sq].add(
            jnp.where(ok_i[..., None], (wmi - 1.0)[..., None]
                      * c_base_pair, 0.0))
        shok = shok + jnp.sum(ok_i)
    return S, W, shok, att


def beam3d_gradient_gather(scene: Scene, cb, scb_list, lb, n_emitted,
                           r_beam, key, border_lane, n_samples=2,
                           tile=256, use_manifold=False, me_budget=2048,
                           pv_chain=None):
    """3D-kernel beam gradient gather with light-side reconnection and
    (use_manifold) the MANIFOLD beam shift for delta-origin beams.

    Base estimator = estimators.beam_point_gather (sampled camera point
    x, one stratified chord sample per (point, beam)). The shift maps
    the base chord sample y to the offset frame preserving the camera
    distance t and the kernel offset (y - x), then re-emits the beam
    from its origin vertex A through y' (reference shiftBeamME/Diffuse
    dispatch, shift_volume_beams.h:408-457 — diffuse branch; null/
    identity fallback for non-reconnectable origins). MIS density
    ratio: direction pdf x solid-angle-to-point (t^2) x survival x
    chord (the stochastic chord-sample pdf is 1/chord).
    Returns (primal [M,3], S [4,M,3], W [4,M,3], visits, shift_ok).
    """
    from ..core.math import dot
    from . import estimators as est
    from ..render import phase as phm

    oc, dc, lc = cb["o"], cb["d"], cb["length"]
    mi, cvalid, cthr = cb["med"], cb["valid"], cb["thr"]
    m = oc.shape[0]
    _, sigma_s, st_c = med._tables(scene, mi)
    mic = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g_cam = scene.med_g[mic][:, None]
    pt_cam = scene.med_phase[mic][:, None]
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_beam ** 3, 1e-18))
    r2 = r_beam * r_beam

    so = [s["o"] for s in scb_list]
    sd = [s["d"] for s in scb_list]
    sthr = [s["thr"] for s in scb_list]
    slen = [s["length"] for s in scb_list]
    svalid = [s["valid"] & (s["med"] == mi) & cvalid for s in scb_list]
    # sensorMIS camera-subpath pdf ratio (gvpm_struct.h:608-631)
    sens = [jnp.clip(scb_list[i]["pdf_prod"]
                     / jnp.maximum(cb["pdf_prod"], 1e-20), 1e-4, 1e4)
            for i in range(4)]

    fields = dict(lb)
    fields.update(_bake_beam_params(scene, lb))
    do_me = use_manifold and pv_chain is not None
    fields["me_elig"] = (_beam_me_elig(scene, lb) if do_me
                         else jnp.zeros_like(lb["valid"]))
    nb = lb["o"].shape[0]
    n_tiles = -(-nb // tile)
    pad = n_tiles * tile - nb

    def tl(a):
        a = jnp.pad(a.astype(jnp.float32) if a.dtype == jnp.bool_ else a,
                    [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_tiles, tile) + a.shape[1:])

    tiles = {k: tl(fields[k])
             for k in _BEAM_F3 + _BEAM_F1 + ("me_elig",)}

    def p3(a):
        return (a[None, :, 0], a[None, :, 1], a[None, :, 2])

    def one_sample(k):
        k_t, k_s = jax.random.split(k)
        if "gid" in cb:   # device-count-invariant draws (core/rng.py)
            from ..core import rng as _rng
            u = _rng.lane_uniform(k_t, cb["gid"])
        else:
            u = jax.random.uniform(k_t, (m,))
        ms = med.sample_distance(scene, mi, oc, dc, lc, u,
                                 strategy=med.ALWAYS_VALID)
        x = ms.p
        t_cam = ms.t
        sok = cvalid & ms.success
        pdf_base_ray = jnp.maximum(ms.pdf_success, 1e-20)
        w_cam = cthr * ms.transmittance * ms.sigma_s \
            / pdf_base_ray[..., None]

        xs, cam_ok, pr_cam, thr_c = [], [], [], []
        for i in range(4):
            ok_i = sok & svalid[i] & (slen[i] >= t_cam)
            xs.append(so[i] + sd[i] * t_cam[..., None])
            ps_i, _ = med.pdf_distance(scene, mi, t_cam, slen[i],
                                       jnp.zeros_like(sok),
                                       strategy=med.ALWAYS_VALID)
            pr_cam.append(ps_i / pdf_base_ray * sens[i])
            cam_ok.append(ok_i)
            thr_c.append(sthr[i] * ms.transmittance * ms.sigma_s
                         / pdf_base_ray[..., None])

        def tile_step(acc, tt):
            ti, t = tt
            (primal, S, W, visits, shok,
             me_found, me_beam, me_y, me_total) = acc
            tob, tdb, tLb, tab = t["o"], t["d"], t["length"], t["alpha"]
            tvb = t["valid"] > 0.5
            tmb = t["med"].astype(jnp.int32)
            me_t = t["me_elig"] > 0.5

            rel = x[:, None, :] - tob[None]
            s_mid = dot(rel, tdb[None])
            perp = rel - tdb[None] * s_mid[..., None]
            d2p = jnp.sum(perp * perp, axis=-1)
            half = jnp.sqrt(jnp.maximum(r2 - d2p, 0.0))
            s0 = jnp.maximum(s_mid - half, 0.0)
            s1 = jnp.minimum(s_mid + half, tLb[None])
            chord = jnp.maximum(s1 - s0, 0.0)
            okb = sok[:, None] & tvb[None] & (chord > 0.0) \
                & (mi[:, None] == tmb[None])
            # positional chord samples: the lane-keyed variant (vmapped
            # per-lane threefry inside scan-inside-map) faulted the TPU
            # worker at bench scale; beam3d invariance is statistical
            us = jax.random.uniform(jax.random.fold_in(k_s, ti),
                                    s_mid.shape)
            s = s0 + us * chord
            y = tob[None] + tdb[None] * s[..., None]
            dist2 = jnp.sum((x[:, None, :] - y) ** 2, axis=-1)
            okb = okb & (dist2 < r2)
            cos_b = dot(tdb[None], dc[:, None, :])
            pf_b = pl.phase_params(-cos_b, g_cam, pt_cam)
            tr_b = jnp.exp(-st_c[:, None, :] * s[..., None])
            surv_b = est.survival_prob(
                scene, jnp.broadcast_to(mi[:, None], s.shape), s)
            c_loc = tab[None] * tr_b \
                * (chord * k3 * pf_b / jnp.maximum(surv_b, 1e-9))[..., None]
            c_base = jnp.where(okb[..., None], c_loc, 0.0) \
                * w_cam[:, None, :]
            primal = primal + jnp.sum(c_base, axis=1)
            visits = visits + jnp.sum(okb)

            # ---- ME pair collection (first eligible beam/segment) ----
            elig = okb & me_t[None]
            any_e = jnp.any(elig, axis=1)
            first = jnp.argmax(elig, axis=1).astype(jnp.int32)
            take = any_e & ~me_found
            me_beam = jnp.where(take, ti * tile + first, me_beam)
            y_take = jnp.take_along_axis(
                y, first[:, None, None], axis=1)[:, 0]
            me_y = jnp.where(take[..., None], y_take, me_y)
            me_found = me_found | any_e
            me_total = me_total + jnp.sum(elig)

            A = t["parent_p"]
            pwi = p3(t["parent_wi"])
            pns = p3(t["parent_ns"])
            ptype = t["parent_type"].astype(jnp.int32)[None]
            reconn = (t["reconnectable"] > 0.5)[None]
            sc_old = p3(t["scatter_base"])
            pdf_old = t["pdf_dir_base"][None]
            bparams = dict(btype=t["bp_btype"].astype(jnp.int32)[None],
                           alb=p3(t["bp_alb"]), spec=p3(t["bp_spec"]),
                           eta3=p3(t["bp_eta3"]),
                           alpha=t["bp_alpha"][None],
                           eta1=t["bp_eta1"][None])
            mparams = dict(sigs=p3(t["bp_sigs"]), g=t["bp_g"][None],
                           ptype=t["bp_ptype"].astype(jnp.int32)[None])
            sc_old_max = jnp.maximum(jnp.maximum(sc_old[0], sc_old[1]),
                                     sc_old[2])

            for i in range(4):
                # ---- reconnection branch ----
                y_i = xs[i][:, None, :] + (y - x[:, None, :])
                dv = y_i - A[None]
                t_new2 = jnp.maximum(jnp.sum(dv * dv, axis=-1), 1e-12)
                t_new = jnp.sqrt(t_new2)
                w_new = tuple(dv[..., c] / t_new for c in range(3))
                sr, sg, sb_, pdf_new, ok_sc = pl.parent_scatter_params(
                    ptype, pwi, pns, bparams, mparams, w_new)
                # chord of the NEW beam inside the offset kernel sphere
                rel_n = xs[i][:, None, :] - A[None]
                sm_n = (rel_n[..., 0] * w_new[0] + rel_n[..., 1] * w_new[1]
                        + rel_n[..., 2] * w_new[2])
                d2p_n = jnp.sum(rel_n * rel_n, axis=-1) - sm_n * sm_n
                half_n = jnp.sqrt(jnp.maximum(r2 - d2p_n, 0.0))
                s0n = jnp.maximum(sm_n - half_n, 0.0)
                # offset beam length = base stored length (same
                # free-flight randoms, same homogeneous medium); keeps
                # the chord/1(t<L)/surv form symmetric with the base
                s1n = jnp.minimum(sm_n + half_n, tLb[None])
                chord_n = jnp.maximum(s1n - s0n, 0.0)
                cos_x = (w_new[0] * sd[i][:, None, 0]
                         + w_new[1] * sd[i][:, None, 1]
                         + w_new[2] * sd[i][:, None, 2])
                pf_n = pl.phase_params(-cos_x, g_cam, pt_cam)
                surv_n = est.survival_prob(
                    scene, jnp.broadcast_to(mi[:, None], s.shape), t_new)
                tr_bn = jnp.exp(-st_c[:, None, :] * t_new[..., None])
                ok_rc = (okb & reconn & ok_sc & cam_ok[i][:, None]
                         & (chord_n > 0.0) & (t_new >= s0n)
                         & (t_new <= s1n) & (sc_old_max > 0.0)
                         & (pdf_old > 1e-20) & (pdf_new > 0.0))
                sc_r = jnp.stack(
                    [jnp.where(ok_rc,
                               sv / jnp.maximum(sc_old[c], 1e-20), 0.0)
                     for c, sv in enumerate((sr, sg, sb_))], axis=-1)
                c_rc = tab[None] * sc_r * tr_bn \
                    * (chord_n * k3 * pf_n
                       / jnp.maximum(surv_n, 1e-9))[..., None] \
                    * thr_c[i][:, None, :]
                pr_rc = (pdf_new / jnp.maximum(pdf_old, 1e-20)
                         * (surv_n / jnp.maximum(surv_b, 1e-9))
                         * (s * s / t_new2)
                         * (chord / jnp.maximum(chord_n, 1e-12)))

                # ---- identity fallback ----
                rel_i = xs[i][:, None, :] - tob[None]
                sm_i = dot(rel_i, tdb[None])
                perp_i = rel_i - tdb[None] * sm_i[..., None]
                d2p_i = jnp.sum(perp_i * perp_i, axis=-1)
                half_i = jnp.sqrt(jnp.maximum(r2 - d2p_i, 0.0))
                s0i = jnp.maximum(sm_i - half_i, 0.0)
                s1i = jnp.minimum(sm_i + half_i, tLb[None])
                chord_i = jnp.maximum(s1i - s0i, 0.0)
                s_id = s0i + us * chord_i
                y_id = tob[None] + tdb[None] * s_id[..., None]
                dist2_i = jnp.sum((xs[i][:, None, :] - y_id) ** 2, axis=-1)
                ok_id = (okb & ~reconn & ~me_t[None]
                         & cam_ok[i][:, None]
                         & (chord_i > 0.0) & (dist2_i < r2))
                cos_i = dot(tdb[None], sd[i][:, None, :])
                pf_i = pl.phase_params(-cos_i, g_cam, pt_cam)
                tr_bid = jnp.exp(-st_c[:, None, :] * s_id[..., None])
                surv_i = est.survival_prob(
                    scene, jnp.broadcast_to(mi[:, None], s.shape), s_id)
                c_id = tab[None] * tr_bid \
                    * (chord_i * k3 * pf_i
                       / jnp.maximum(surv_i, 1e-9))[..., None] \
                    * thr_c[i][:, None, :]

                ok_sh = jnp.where(reconn, ok_rc, ok_id)
                c_sh = jnp.where(reconn[..., None],
                                 jnp.where(ok_rc[..., None], c_rc, 0.0),
                                 jnp.where(ok_id[..., None], c_id, 0.0))
                pr_l = jnp.where(reconn, pr_rc, 1.0)
                w = 1.0 / (1.0 + jnp.clip(pr_l * pr_cam[i][:, None],
                                          0.0, 1e12))
                w = jnp.clip(jnp.where(ok_sh, w, 1.0), 0.0, 1.0)
                w = jnp.where(border_lane[i][:, None], 1.0, w)
                S = S.at[i].add(jnp.sum(w[..., None] * c_sh, axis=1))
                W = W.at[i].add(jnp.sum(
                    jnp.where(okb[..., None], w[..., None] * c_base, 0.0),
                    axis=1))
                shok = shok + jnp.sum(ok_rc)
            return (primal, S, W, visits, shok,
                    me_found, me_beam, me_y, me_total), None

        init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)),
                jnp.zeros((4, m, 3)), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.zeros((m,), bool), jnp.zeros((m,), jnp.int32),
                jnp.zeros((m, 3)), jnp.zeros((), jnp.int32))
        (pr, S, W, v, sk, me_found, me_beam, me_y, me_total), _ = \
            lax.scan(tile_step, init, (jnp.arange(n_tiles), tiles))

        me_drop = jnp.zeros((), jnp.int32)
        if do_me:
            S, W, sk, att = _beam3d_me_stage(
                scene, fields, pv_chain, xs, x, cam_ok, thr_c, w_cam,
                border_lane, me_found, me_beam, me_y, me_budget,
                r_beam, k3, r2, mi, st_c, S, W, sk,
                sd_list=sd, g_cam1=g_cam[:, 0], pt_cam1=pt_cam[:, 0],
                dc_base=dc, pr_cam=pr_cam)
            me_drop = me_total - att
        return pr, S, W, v, sk, me_drop

    keys = jax.random.split(key, n_samples)
    primal = jnp.zeros((m, 3))
    S = jnp.zeros((4, m, 3))
    W = jnp.zeros((4, m, 3))
    visits = jnp.zeros((), jnp.int32)
    shok = jnp.zeros((), jnp.int32)
    me_drop = jnp.zeros((), jnp.int32)
    for k in keys:
        p_, S_, W_, v_, sk_, md_ = one_sample(k)
        primal, S, W = primal + p_, S + S_, W + W_
        visits, shok = visits + v_, shok + sk_
        me_drop = me_drop + md_
    inv = 1.0 / (n_samples * n_emitted)
    return primal * inv, S * inv, W * inv, visits, shok, me_drop


def _beam3d_me_stage(scene: Scene, fields, pv_chain, xs, x, cam_ok,
                     thr_c, w_cam, border_lane, me_found, me_beam,
                     me_y, me_budget, r_beam, k3, r2, mi, st_c, S, W,
                     shok, sd_list, g_cam1, pt_cam1, dc_base, pr_cam):
    """Post-scan manifold stage for beam3d ME pairs: the stored base
    chord point me_y maps to the offset frame (xs[i] + (me_y - x)) and
    the delta-origin beam is chain-solved through it
    (manifold.me_shift_beam). Returns (S, W, shok, attempted)."""
    from ..core.math import dot
    from . import estimators as est
    from . import manifold

    m = me_found.shape[0]
    B_me = min(me_budget, m)
    vals, sq = lax.top_k(me_found.astype(jnp.int32), B_me)
    sel = vals > 0
    bq = me_beam[sq]
    bo = fields["o"][bq]
    bd = fields["d"][bq]
    bL = fields["length"][bq]
    ba = fields["alpha"][bq]
    bmed = fields["med"][bq]
    yq = me_y[sq]
    xq = x[sq]
    miq = mi[sq]
    st_q = st_c[sq]
    g_q, pt_q = g_cam1[sq], pt_cam1[sq]

    # base pair terms at the stored chord point
    s_b = jnp.linalg.norm(yq - bo, axis=-1)
    rel = xq - bo
    sm = dot(rel, bd)
    d2p = jnp.sum(rel * rel, axis=-1) - sm * sm
    half = jnp.sqrt(jnp.maximum(r2 - d2p, 0.0))
    s0 = jnp.maximum(sm - half, 0.0)
    s1 = jnp.minimum(sm + half, bL)
    chord = jnp.maximum(s1 - s0, 0.0)
    okp = sel & (chord > 0.0) & (miq == bmed) \
        & (jnp.sum((xq - yq) ** 2, axis=-1) < r2)
    surv_b = est.survival_prob(scene, miq, s_b)
    dcq = dc_base[sq]

    virt = dict(p=yq, seg_med=bmed,
                parent_idx=fields["parent_idx"][bq].astype(jnp.int32),
                reconnectable=jnp.zeros(sq.shape, bool),
                parent_type=fields["parent_type"][bq].astype(jnp.int32),
                parent_bsdf=fields["parent_bsdf"][bq].astype(jnp.int32))
    ch = manifold.pull_chains(scene, pv_chain, virt=virt)
    wscale = jnp.linalg.norm(scene.world_hi - scene.world_lo)

    # base contribution of the pair (for the W weight correction)
    tr_b = jnp.exp(-st_q * s_b[..., None])
    # base phase vs the BASE camera dir is needed per shift only through
    # c_base_pair; use the base camera direction stored implicitly via
    # w_cam (thr includes transmittance/pdf) — recompute with base dir:
    att = jnp.sum(okp)
    for i in range(4):
        sd_i = sd_list[i][sq]
        y_i = xs[i][sq] + (yq - xq)
        org_n, dir_n, t_n, ar, pr_ch, okm = manifold.me_shift_beam(
            scene, ch, y_i, scene_scale=wscale)
        # chord of the NEW beam in the offset kernel sphere
        rel_n = xs[i][sq] - org_n
        sm_n = dot(rel_n, dir_n)
        d2p_n = jnp.sum(rel_n * rel_n, axis=-1) - sm_n * sm_n
        half_n = jnp.sqrt(jnp.maximum(r2 - d2p_n, 0.0))
        s0n = jnp.maximum(sm_n - half_n, 0.0)
        s1n = jnp.minimum(sm_n + half_n, bL)
        chord_n = jnp.maximum(s1n - s0n, 0.0)
        cos_x = dot(dir_n, sd_i)
        pf_n = pl.phase_params(-cos_x, g_q, pt_q)
        surv_n = est.survival_prob(scene, miq, t_n)
        tr_bn = jnp.exp(-st_q * t_n[..., None])
        ok_i = (okm & okp & cam_ok[i][sq] & (chord_n > 0.0)
                & (t_n >= s0n) & (t_n <= s1n) & (t_n < bL)
                & ~border_lane[i][sq])
        c_me = ba * ar * tr_bn \
            * (chord_n * k3 * pf_n
               / jnp.maximum(surv_n, 1e-9))[..., None] * thr_c[i][sq]
        pr_me = (pr_ch * (surv_n / jnp.maximum(surv_b, 1e-9))
                 * (s_b * s_b / jnp.maximum(t_n * t_n, 1e-12))
                 * (chord / jnp.maximum(chord_n, 1e-12)))
        # base-pair contribution (base beam dir vs BASE camera dir)
        pf_b = pl.phase_params(-dot(bd, dcq), g_q, pt_q)
        c_base_pair = ba * tr_b \
            * (chord * k3 * pf_b
               / jnp.maximum(surv_b, 1e-9))[..., None] * w_cam[sq]
        wmi = jnp.where(ok_i,
                        1.0 / (1.0 + jnp.clip(pr_me * pr_cam[i][sq],
                                              0.0, 1e12)), 1.0)
        S = S.at[i, sq].add(
            jnp.where(ok_i[..., None], wmi[..., None] * c_me, 0.0))
        W = W.at[i, sq].add(
            jnp.where(ok_i[..., None], (wmi - 1.0)[..., None]
                      * c_base_pair, 0.0))
        shok = shok + jnp.sum(ok_i)
    return S, W, shok, att


def plane_gradient_gather(scene: Scene, cb, scb_list, planes, n_emitted,
                          border_lane, tile=256, use_manifold=False,
                          me_budget=2048, pv_chain=None):
    """0D photon-plane gradient gather with the medium-ROTATION shift.

    Reference mediumRotationShift (shift/operation/shift_medium.h:39,
    PlaneGradRadianceQuery shift_volume_planes.h:57): the offset plane
    is the base plane rotated about its origin vertex po by the minimal
    rotation R taking a=(y-po)/|.| to b=(y'-po)/|.|, where y is the
    base intersection and y' = o_i + d_i * tcam the offset camera point
    at the SAME camera distance. Because y-po = t0*w0 + t1*w1 lies in
    the plane, the line po + s*b lies in the ROTATED plane, so y' is on
    it with parameters (t0,t1) * |y'-po|/|y-po| — the offset
    intersection is analytic, no re-intersection. Rotation preserves
    the w0/w1 angle, so the plane-extension phase value/pdf cancel
    exactly; the remaining ratios are the origin scatter lobe toward
    R w0 (diffuse reconnection at po, parent caches on the generating
    beam), survivals at the scaled parameters, and the camera-side
    phase/transmittance/|det| at the rotated frame. Non-reconnectable
    origins fall back to the identity shift (same plane, offset ray:
    shiftNull3D). Returns (primal, S, W, visits, shift_ok).
    """
    from ..core.math import dot
    from . import estimators as est

    oc, dc, lc = cb["o"], cb["d"], cb["length"]
    mi, cvalid, cthr = cb["med"], cb["valid"], cb["thr"]
    m = oc.shape[0]
    _, sigma_s, st_c = med._tables(scene, mi)
    mic = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g_cam = scene.med_g[mic][:, None]
    pt_cam = scene.med_phase[mic][:, None]

    so = [s["o"] for s in scb_list]
    sd = [s["d"] for s in scb_list]
    sthr = [s["thr"] for s in scb_list]
    slen = [s["length"] for s in scb_list]
    svalid = [s["valid"] & (s["med"] == mi) & cvalid for s in scb_list]
    # sensorMIS camera-subpath pdf ratio (gvpm_struct.h:608-631)
    sens = [jnp.clip(scb_list[i]["pdf_prod"]
                     / jnp.maximum(cb["pdf_prod"], 1e-20), 1e-4, 1e4)
            for i in range(4)]

    fields = dict(planes)
    fields.update(_bake_beam_params(scene, planes))
    do_me = use_manifold and pv_chain is not None \
        and "parent_idx" in planes and "at_origin" in planes
    fields["me_elig"] = (_beam_me_elig(scene, planes) if do_me
                         else jnp.zeros_like(planes["valid"]))
    npl = planes["o"].shape[0]
    n_tiles = -(-npl // tile)
    pad = n_tiles * tile - npl

    def tl(a):
        a = jnp.pad(a.astype(jnp.float32) if a.dtype == jnp.bool_ else a,
                    [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_tiles, tile) + a.shape[1:])

    keys = ("o", "w0", "l0", "w1", "l1", "alpha", "med", "valid",
            "surv1_sigma", "parent_p", "parent_wi", "parent_ns",
            "scatter_base", "pdf_dir_base", "parent_type",
            "reconnectable", "bp_btype", "bp_alb", "bp_spec", "bp_eta3",
            "bp_alpha", "bp_eta1", "bp_sigs", "bp_g", "bp_ptype",
            "me_elig")
    tiles = {k: tl(fields[k]) for k in keys}

    def p3(a):
        return (a[None, :, 0], a[None, :, 1], a[None, :, 2])

    def rodrigues(v, kx, ky, kz, cos_r, sin_r):
        """Rotate [M,T,3] v about unit axis planes (kx,ky,kz)."""
        kdv = kx * v[..., 0] + ky * v[..., 1] + kz * v[..., 2]
        cx = ky * v[..., 2] - kz * v[..., 1]
        cy = kz * v[..., 0] - kx * v[..., 2]
        cz = kx * v[..., 1] - ky * v[..., 0]
        f = kdv * (1.0 - cos_r)
        return jnp.stack([v[..., 0] * cos_r + cx * sin_r + kx * f,
                          v[..., 1] * cos_r + cy * sin_r + ky * f,
                          v[..., 2] * cos_r + cz * sin_r + kz * f],
                         axis=-1)

    def tile_step(acc, tt):
        ti, t = tt
        primal, S, W, visits, shok, me_found, me_plane, me_total = acc
        po, pw0, pl0 = t["o"], t["w0"], t["l0"]
        pw1, pl1, pal = t["w1"], t["l1"], t["alpha"]
        pval = t["valid"] > 0.5
        pmed = t["med"].astype(jnp.int32)
        psig = t["surv1_sigma"]
        me_t = t["me_elig"] > 0.5

        # ---- base Moller-Trumbore (intersectPlane0D) ----
        e0 = pw0 * pl0[..., None]
        e1 = pw1 * pl1[..., None]
        Pv = jnp.cross(dc[:, None, :], e1[None])
        det = dot(e0[None], Pv)
        okb = jnp.abs(det) > 1e-7
        inv_det = jnp.where(okb, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        T_ = oc[:, None, :] - po[None]
        u0 = dot(T_, Pv) * inv_det
        Q = jnp.cross(T_, e0[None])
        u1 = dot(dc[:, None, :], Q) * inv_det
        tcam = dot(e1[None], Q) * inv_det
        okb = (okb & (u0 >= 0.0) & (u0 <= 1.0) & (u1 >= 0.0) & (u1 <= 1.0)
               & (tcam > 1e-5) & (tcam < lc[:, None])
               & cvalid[:, None] & pval[None]
               & (mi[:, None] == pmed[None]))
        t0 = u0 * pl0[None]
        t1 = u1 * pl1[None]
        tr_cam = jnp.exp(-st_c[:, None, :] * tcam[..., None])
        cos_cb = dot(pw1[None], dc[:, None, :])
        pf_b = pl.phase_params(-cos_cb, g_cam, pt_cam)
        st_p = st_c[:, None, :]
        tr0 = jnp.exp(-st_p * t0[..., None])
        tr1 = jnp.exp(-st_p * t1[..., None])
        surv0 = est.survival_prob(
            scene, jnp.broadcast_to(mi[:, None], det.shape), t0)
        surv1 = jnp.exp(-psig[None] * t1)
        jac = jnp.abs(dot(pw0[None],
                          jnp.cross(pw1[None],
                                    jnp.broadcast_to(dc[:, None],
                                                     Pv.shape))))
        wgt_b = (tr_cam * tr0 * tr1
                 * sigma_s[:, None, :] * sigma_s[:, None, :]
                 * (pf_b / (jnp.maximum(surv0, 1e-9)
                            * jnp.maximum(surv1, 1e-9)
                            * jnp.maximum(jac, 1e-6)))[..., None])
        c_base = jnp.where(okb[..., None], pal[None] * wgt_b, 0.0) \
            * cthr[:, None, :]
        primal = primal + jnp.sum(c_base, axis=1)
        visits = visits + jnp.sum(okb)

        # ---- ME pair collection: first eligible plane per segment
        # (excluded from the identity fallback; resolved post-scan) ----
        elig = okb & me_t[None]
        any_e = jnp.any(elig, axis=1)
        first = jnp.argmax(elig, axis=1).astype(jnp.int32)
        take = any_e & ~me_found
        me_plane = jnp.where(take, ti * tile + first, me_plane)
        me_found = me_found | any_e
        me_total = me_total + jnp.sum(elig)

        # ---- shift caches ----
        y = oc[:, None, :] + dc[:, None, :] * tcam[..., None]
        rel_b = y - po[None]
        lb_r = jnp.sqrt(jnp.maximum(jnp.sum(rel_b * rel_b, axis=-1),
                                    1e-16))
        a_dir = rel_b / lb_r[..., None]
        pwi = p3(t["parent_wi"])
        pns = p3(t["parent_ns"])
        ptype = t["parent_type"].astype(jnp.int32)[None]
        reconn = (t["reconnectable"] > 0.5)[None]
        sc_old = p3(t["scatter_base"])
        pdf_old = t["pdf_dir_base"][None]
        bparams = dict(btype=t["bp_btype"].astype(jnp.int32)[None],
                       alb=p3(t["bp_alb"]), spec=p3(t["bp_spec"]),
                       eta3=p3(t["bp_eta3"]), alpha=t["bp_alpha"][None],
                       eta1=t["bp_eta1"][None])
        mparams = dict(sigs=p3(t["bp_sigs"]), g=t["bp_g"][None],
                       ptype=t["bp_ptype"].astype(jnp.int32)[None])
        sc_old_max = jnp.maximum(jnp.maximum(sc_old[0], sc_old[1]),
                                 sc_old[2])

        for i in range(4):
            # ---- rotation branch ----
            y_i = so[i][:, None, :] + sd[i][:, None, :] * tcam[..., None]
            rel_o = y_i - po[None]
            lo_r2 = jnp.maximum(jnp.sum(rel_o * rel_o, axis=-1), 1e-16)
            lo_r = jnp.sqrt(lo_r2)
            b_dir = rel_o / lo_r[..., None]
            cos_r = jnp.sum(a_dir * b_dir, axis=-1)
            axis = jnp.cross(a_dir, b_dir)
            sin_r = jnp.sqrt(jnp.maximum(
                jnp.sum(axis * axis, axis=-1), 0.0))
            safe = sin_r > 1e-7
            k_hat = axis / jnp.maximum(sin_r, 1e-7)[..., None]
            # sin ~ 0: either identity (cos>0, rotate by nothing) or
            # antipodal (fail)
            w0_r = jnp.where(
                safe[..., None],
                rodrigues(jnp.broadcast_to(pw0[None], y.shape),
                          k_hat[..., 0], k_hat[..., 1], k_hat[..., 2],
                          cos_r, sin_r),
                jnp.broadcast_to(pw0[None], y.shape))
            w1_r = jnp.where(
                safe[..., None],
                rodrigues(jnp.broadcast_to(pw1[None], y.shape),
                          k_hat[..., 0], k_hat[..., 1], k_hat[..., 2],
                          cos_r, sin_r),
                jnp.broadcast_to(pw1[None], y.shape))
            scale = lo_r / lb_r
            t0_n = t0 * scale
            t1_n = t1 * scale
            ok_geo = (safe | (cos_r > 0.0)) & (t0_n <= pl0[None]) \
                & (t1_n <= pl1[None])

            wn = (w0_r[..., 0], w0_r[..., 1], w0_r[..., 2])
            sr, sg, sb_, pdf_new, ok_sc = pl.parent_scatter_params(
                ptype, pwi, pns, bparams, mparams, wn)
            cos_ci = (w1_r[..., 0] * sd[i][:, None, 0]
                      + w1_r[..., 1] * sd[i][:, None, 1]
                      + w1_r[..., 2] * sd[i][:, None, 2])
            pf_n = pl.phase_params(-cos_ci, g_cam, pt_cam)
            tr0n = jnp.exp(-st_p * t0_n[..., None])
            tr1n = jnp.exp(-st_p * t1_n[..., None])
            surv0n = est.survival_prob(
                scene, jnp.broadcast_to(mi[:, None], det.shape), t0_n)
            surv1n = jnp.exp(-psig[None] * t1_n)
            jac_n = jnp.abs(
                jnp.sum(w0_r * jnp.cross(w1_r, sd[i][:, None, :]),
                        axis=-1))
            ok_rc = (okb & reconn & ok_sc & svalid[i][:, None] & ok_geo
                     & (tcam < slen[i][:, None]) & (jac_n > 1e-6)
                     & (sc_old_max > 0.0) & (pdf_old > 1e-20)
                     & (pdf_new > 0.0))
            sc_r = jnp.stack(
                [jnp.where(ok_rc, sv / jnp.maximum(sc_old[c], 1e-20), 0.0)
                 for c, sv in enumerate((sr, sg, sb_))], axis=-1)
            wgt_n = (tr_cam * tr0n * tr1n
                     * sigma_s[:, None, :] * sigma_s[:, None, :]
                     * (pf_n / (jnp.maximum(surv0n, 1e-9)
                                * jnp.maximum(surv1n, 1e-9)
                                * jnp.maximum(jac_n, 1e-6)))[..., None])
            c_rc = pal[None] * sc_r * wgt_n * sthr[i][:, None, :]
            pr_rc = (pdf_new / jnp.maximum(pdf_old, 1e-20)
                     * (surv0n / jnp.maximum(surv0, 1e-9))
                     * (surv1n / jnp.maximum(surv1, 1e-9))
                     * (jac / jnp.maximum(jac_n, 1e-6))
                     / jnp.maximum(scale * scale, 1e-12))

            # ---- identity fallback: same plane, offset ray ----
            Pvi = jnp.cross(sd[i][:, None, :], e1[None])
            deti = dot(e0[None], Pvi)
            oki = jnp.abs(deti) > 1e-7
            inv_di = jnp.where(oki, 1.0 / jnp.where(deti == 0, 1.0, deti),
                               0.0)
            Ti = so[i][:, None, :] - po[None]
            u0i = dot(Ti, Pvi) * inv_di
            Qi = jnp.cross(Ti, e0[None])
            u1i = dot(sd[i][:, None, :], Qi) * inv_di
            tci = dot(e1[None], Qi) * inv_di
            ok_id = (okb & ~reconn & ~me_t[None] & oki
                     & svalid[i][:, None]
                     & (u0i >= 0.0) & (u0i <= 1.0)
                     & (u1i >= 0.0) & (u1i <= 1.0)
                     & (tci > 1e-5) & (tci < slen[i][:, None]))
            t0i = u0i * pl0[None]
            t1i = u1i * pl1[None]
            tr_ci = jnp.exp(-st_c[:, None, :] * tci[..., None])
            cos_ii = dot(pw1[None], sd[i][:, None, :])
            pf_i = pl.phase_params(-cos_ii, g_cam, pt_cam)
            tr0i = jnp.exp(-st_p * t0i[..., None])
            tr1i = jnp.exp(-st_p * t1i[..., None])
            surv0i = est.survival_prob(
                scene, jnp.broadcast_to(mi[:, None], det.shape), t0i)
            surv1i = jnp.exp(-psig[None] * t1i)
            jaci = jnp.abs(dot(pw0[None],
                               jnp.cross(pw1[None], jnp.broadcast_to(
                                   sd[i][:, None, :], Pv.shape))))
            wgt_i = (tr_ci * tr0i * tr1i
                     * sigma_s[:, None, :] * sigma_s[:, None, :]
                     * (pf_i / (jnp.maximum(surv0i, 1e-9)
                                * jnp.maximum(surv1i, 1e-9)
                                * jnp.maximum(jaci, 1e-6)))[..., None])
            c_id = pal[None] * wgt_i * sthr[i][:, None, :]

            ok_sh = jnp.where(reconn, ok_rc, ok_id)
            c_sh = jnp.where(reconn[..., None],
                             jnp.where(ok_rc[..., None], c_rc, 0.0),
                             jnp.where(ok_id[..., None], c_id, 0.0))
            pr_l = jnp.where(reconn, pr_rc, 1.0)
            w = 1.0 / (1.0 + jnp.clip(pr_l * sens[i][:, None], 0.0, 1e12))
            w = jnp.clip(jnp.where(ok_sh, w, 1.0), 0.0, 1.0)
            w = jnp.where(border_lane[i][:, None], 1.0, w)
            S = S.at[i].add(jnp.sum(w[..., None] * c_sh, axis=1))
            W = W.at[i].add(jnp.sum(
                jnp.where(okb[..., None], w[..., None] * c_base, 0.0),
                axis=1))
            shok = shok + jnp.sum(ok_rc)
        return (primal, S, W, visits, shok,
                me_found, me_plane, me_total), None

    init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)),
            jnp.zeros((4, m, 3)), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((m,), bool), jnp.zeros((m,), jnp.int32),
            jnp.zeros((), jnp.int32))
    (primal, S, W, visits, shok, me_found, me_plane, me_total), _ = \
        lax.scan(tile_step, init, (jnp.arange(n_tiles), tiles))

    me_drop = jnp.zeros((), jnp.int32)
    if do_me:
        B_me = min(me_budget, m)
        vals, sq = lax.top_k(me_found.astype(jnp.int32), B_me)
        sel = vals > 0
        pq = me_plane[sq]
        S, W, shok, att = _plane_me_stage(
            scene, fields, pv_chain, cb, scb_list, sens, svalid, slen,
            so, sd, sthr, border_lane, sq, pq, sel, S, W, shok,
            sigma_s, st_c, mi, cthr)
        me_drop = me_total - att
    inv = 1.0 / n_emitted
    return (primal * inv, S * inv, W * inv, visits, shok, me_drop)


def _plane_me_stage(scene: Scene, fields, pv_chain, cb, scb_list, sens,
                    svalid, slen, so, sd, sthr, border_lane, sq, pq,
                    sel, S, W, shok, sigma_s, st_c, mi, cthr):
    """Post-scan manifold stage for photon-plane ME pairs (the missing
    branch of PlaneGradRadianceQuery's dispatch: shift_volume_planes.h:57
    routes delta-origin planes through the ME machinery of
    shift/operation/shift_medium.h:39 instead of the rotation shift).

    Formulation: the plane's generating beam origin A ends a pure-delta
    chain, so its position/direction are the chain exit. The chain is
    Newton-solved (manifold.me_shift_beam) so the shifted AXIS passes
    through q' = y'_i - t1*w1 — the offset camera intersection minus the
    base extension offset (the kernel-offset-preserving target,
    getShiftPos analog). The shifted plane is then A', w0' = chain exit
    dir, w1' = R w0->w0' applied to w1 (minimal rotation — preserves the
    w0/w1 angle so the extension phase value/pdf cancel exactly, as in
    mediumRotationShift), re-intersected EXACTLY against the offset
    camera ray. Chain ratios (anchor scatter, Fresnel, transmittance,
    manifold measure) come from the solver; plane-estimator factors are
    recomputed on the shifted geometry.
    """
    from ..core.math import dot
    from . import estimators as est
    from . import manifold

    oq, dq, lq = cb["o"][sq], cb["d"][sq], cb["length"][sq]
    miq = mi[sq]
    sg_q, st_q = sigma_s[sq], st_c[sq]
    g_q = scene.med_g[jnp.clip(miq, 0, scene.med_g.shape[0] - 1)]
    pt_q = scene.med_phase[jnp.clip(miq, 0, scene.med_g.shape[0] - 1)]

    po = fields["o"][pq]
    pw0 = fields["w0"][pq]
    pl0 = fields["l0"][pq]
    pw1 = fields["w1"][pq]
    pl1 = fields["l1"][pq]
    pal = fields["alpha"][pq]
    pmed = fields["med"][pq].astype(jnp.int32)
    psig = fields["surv1_sigma"][pq]

    # base Moller-Trumbore (pair lanes)
    e0 = pw0 * pl0[..., None]
    e1 = pw1 * pl1[..., None]
    Pv = jnp.cross(dq, e1)
    det = dot(e0, Pv)
    okb = jnp.abs(det) > 1e-7
    inv_det = jnp.where(okb, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    T_ = oq - po
    u0 = dot(T_, Pv) * inv_det
    Q = jnp.cross(T_, e0)
    u1 = dot(dq, Q) * inv_det
    tcam = dot(e1, Q) * inv_det
    okb = (sel & okb & (u0 >= 0.0) & (u0 <= 1.0) & (u1 >= 0.0)
           & (u1 <= 1.0) & (tcam > 1e-5) & (tcam < lq)
           & (miq == pmed))
    t0 = u0 * pl0
    t1 = u1 * pl1
    tr_cam = jnp.exp(-st_q * tcam[..., None])
    pf_b = pl.phase_params(-dot(pw1, dq), g_q, pt_q)
    tr0 = jnp.exp(-st_q * t0[..., None])
    tr1 = jnp.exp(-st_q * t1[..., None])
    surv0 = est.survival_prob(scene, miq, t0)
    surv1 = jnp.exp(-psig * t1)
    jac = jnp.abs(dot(pw0, jnp.cross(pw1, dq)))
    wgt_b = (tr_cam * tr0 * tr1 * sg_q * sg_q
             * (pf_b / (jnp.maximum(surv0, 1e-9)
                        * jnp.maximum(surv1, 1e-9)
                        * jnp.maximum(jac, 1e-6)))[..., None])
    c_base_pair = jnp.where(okb[..., None], pal * wgt_b, 0.0) \
        * cthr[sq]

    # chain pull: virtual photon = base axis point A + t0*w0
    q_axis = po + pw0 * t0[..., None]
    virt = dict(p=q_axis, seg_med=pmed,
                parent_idx=fields["parent_idx"][pq].astype(jnp.int32),
                reconnectable=jnp.zeros(sq.shape, bool),
                parent_type=fields["parent_type"][pq].astype(jnp.int32),
                parent_bsdf=fields["parent_bsdf"][pq].astype(jnp.int32))
    ch = manifold.pull_chains(scene, pv_chain, virt=virt)
    wscale = jnp.linalg.norm(scene.world_hi - scene.world_lo)
    y_base = oq + dq * tcam[..., None]

    att = jnp.sum(okb)
    for i in range(4):
        so_i, sd_i = so[i][sq], sd[i][sq]
        sthr_i, slen_i = sthr[i][sq], slen[i][sq]
        y_i = so_i + sd_i * tcam[..., None]
        q_t = y_i - (y_base - q_axis)     # preserve extension offset
        org_n, w0n, t0n, ar, pr_ch, okm = manifold.me_shift_beam(
            scene, ch, q_t, scene_scale=wscale)
        # minimal rotation w0 -> w0' applied to w1
        cos_r = dot(pw0, w0n)
        axis = jnp.cross(pw0, w0n)
        sin_r = jnp.sqrt(jnp.maximum(dot(axis, axis), 0.0))
        safe = sin_r > 1e-7
        k_hat = axis / jnp.maximum(sin_r, 1e-7)[..., None]
        kdv = dot(k_hat, pw1)
        cx = jnp.cross(k_hat, pw1)
        w1n = jnp.where(
            safe[..., None],
            pw1 * cos_r[..., None] + cx * sin_r[..., None]
            + k_hat * (kdv * (1.0 - cos_r))[..., None],
            pw1)
        # shifted-plane intersection with the offset ray
        e0n = w0n * pl0[..., None]
        e1n = w1n * pl1[..., None]
        Pvn = jnp.cross(sd_i, e1n)
        detn = dot(e0n, Pvn)
        okn = jnp.abs(detn) > 1e-7
        invn = jnp.where(okn, 1.0 / jnp.where(detn == 0, 1.0, detn), 0.0)
        Tn = so_i - org_n
        u0n = dot(Tn, Pvn) * invn
        Qn = jnp.cross(Tn, e0n)
        u1n = dot(sd_i, Qn) * invn
        tcn = dot(e1n, Qn) * invn
        ok_i = (okm & okb & okn & svalid[i][sq]
                & (u0n >= 0.0) & (u0n <= 1.0)
                & (u1n >= 0.0) & (u1n <= 1.0)
                & (tcn > 1e-5) & (tcn < slen_i)
                & ~border_lane[i][sq])
        t0i = u0n * pl0
        t1i = u1n * pl1
        tr_cn = jnp.exp(-st_q * tcn[..., None])
        pf_n = pl.phase_params(-dot(w1n, sd_i), g_q, pt_q)
        tr0n = jnp.exp(-st_q * t0i[..., None])
        tr1n = jnp.exp(-st_q * t1i[..., None])
        surv0n = est.survival_prob(scene, miq, t0i)
        surv1n = jnp.exp(-psig * t1i)
        jac_n = jnp.abs(dot(w0n, jnp.cross(w1n, sd_i)))
        wgt_n = (tr_cn * tr0n * tr1n * sg_q * sg_q
                 * (pf_n / (jnp.maximum(surv0n, 1e-9)
                            * jnp.maximum(surv1n, 1e-9)
                            * jnp.maximum(jac_n, 1e-6)))[..., None])
        c_me = pal * ar * wgt_n * sthr_i
        pr_me = (pr_ch * (surv0n / jnp.maximum(surv0, 1e-9))
                 * (surv1n / jnp.maximum(surv1, 1e-9))
                 * (jac / jnp.maximum(jac_n, 1e-6))
                 * (t0 * t1) / jnp.maximum(t0i * t1i, 1e-12))
        wmi = jnp.where(ok_i,
                        1.0 / (1.0 + jnp.clip(pr_me * sens[i][sq],
                                              0.0, 1e12)), 1.0)
        S = S.at[i, sq].add(
            jnp.where(ok_i[..., None], wmi[..., None] * c_me, 0.0))
        W = W.at[i, sq].add(
            jnp.where(ok_i[..., None], (wmi - 1.0)[..., None]
                      * c_base_pair, 0.0))
        shok = shok + jnp.sum(ok_i)
    return S, W, shok, att
