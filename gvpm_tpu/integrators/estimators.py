"""Photon-density estimators: surface SPPM, volume points (VPM/distance),
beam-radiance estimate (BRE), and photon beams (1D).

reference call sites:
  surface          — PhotonMap::estimateRadianceGP (sppm.cpp:547)
  VPM / distance   — volumePhotonPassDistance (sppm.cpp:1003)
  BRE              — volumePhotonPassBRE (sppm.cpp:882, bre.h:32)
  photon beams 1D  — volumePhotonBeamPass (sppm.cpp:765, beams_struct.h:250)

TPU design notes:
  * point gathers ride the hash grid (ops/hashgrid.py) — O(27K) fixed
    fanout per query; kd-tree/BVH traversals of the reference disappear.
  * BRE marches camera segments in fixed steps of r (cell = 2r) with exact
    foot-point dedupe, replacing the per-photon-disc BVH.
  * beam-beam streams all photon beams against all camera segments in
    tiles via lax.scan — beams are few (2e4 in the paper configs), so a
    dense sweep beats an irregular BVH on this hardware.

Normalization: every estimator divides by n_emitted light paths; the
constant kernels are K2 = 1/(pi r^2), K3 = 3/(4 pi r^3), K1 = 1/(2r)
(reference kernel choices for SPPM/GVPM constant kernels,
shift_volume_photon.cpp:489 "4/3 pi r^3").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.math import cross, dot
from ..ops import hashgrid
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import eval_bsdf
from ..core.math import coordinate_system, to_local
from ..scene.types import Scene

INV_PI = 1.0 / jnp.pi


# --------------------------------------------------------------------------
# surface photon gather
# --------------------------------------------------------------------------

def surface_gather(scene: Scene, gps, grid, pp, pv, n_emitted,
                   radius_scale, max_per_cell=32, q_tile=256, stencil=8):
    """Radiance at gather points from surface photons.

    Planar (structure-of-planes) inner loop: every candidate quantity is
    a [Qt,M] scalar plane, so nothing pads the 3-lane axis to 128
    (integrators/planar.py). gps: GatherPoints; pp: [P,3]; pv: dict of
    flattened LightVertices fields; returns [N,3] premultiplied by
    gp.thr.
    """
    from . import planar as pl
    r_all = gps.radius * radius_scale
    s_ax_all, t_ax_all = coordinate_system(gps.ns)
    wo_loc_all = to_local(gps.ns, s_ax_all, t_ax_all, gps.wo)

    def eval_fn(qi, idx, ok, scale):
        gp_p = gps.p[qi]
        r = r_all[qi][:, None]
        ns = gps.ns[qi]
        s_ax = s_ax_all[qi]
        t_ax = t_ax_all[qi]
        wo_l = wo_loc_all[qi]
        bi = gps.bsdf[qi][:, None]
        gvalid = gps.valid[qi][:, None]

        ph_p = pl.gather3(pp, idx)
        rel = pl.sub3(ph_p, pl.expand(gp_p))
        d2 = pl.dot3(rel, rel)
        is_surf = pv["vtype"][idx] == 1
        wi_p = pl.gather3(pv["wi"], idx)
        nwi = pl.neg3(wi_p)
        front = pl.dot3(pl.expand(ns), nwi) > 1e-4
        inside = ok & is_surf & (d2 < r * r) & front & gvalid
        wi_l = pl.to_local_planar(ns, s_ax, t_ax, nwi)
        wo_lp = (wo_l[:, 0:1], wo_l[:, 1:2], wo_l[:, 2:3])
        fr, fg, fb = pl.eval_bsdf_gather(scene, bi, wo_lp, wi_l)
        k2 = INV_PI / jnp.maximum(r * r, 1e-12)
        w = jnp.where(inside, k2 * scale, 0.0)
        ag3 = pv["alpha"][idx]
        ar, ag, ab = ag3[..., 0], ag3[..., 1], ag3[..., 2]
        return jnp.stack([jnp.sum(ar * fr * w, axis=1),
                          jnp.sum(ag * fg * w, axis=1),
                          jnp.sum(ab * fb * w, axis=1)], axis=-1)

    acc = hashgrid.gather_dense(grid, gps.p, eval_fn,
                                max_per_cell=max_per_cell, q_tile=q_tile,
                                stencil=stencil)
    return gps.thr * acc / n_emitted


# --------------------------------------------------------------------------
# volume photon points: distance sampling + 3D kernel
# --------------------------------------------------------------------------

def volume_distance_gather(scene: Scene, beams_cam, grid, pp, pv,
                           n_emitted, r_vol, key, n_samples=2,
                           max_per_cell=32, q_tile=256, stencil=8):
    """VPM: for each camera-beam segment, sample forced-interaction
    distances, 3D-kernel gather of medium photons at each point. Planar
    inner loop (integrators/planar.py)."""
    from . import planar as pl
    o, d = beams_cam["o"], beams_cam["d"]
    length = beams_cam["length"]
    mi = beams_cam["med"]
    valid = beams_cam["valid"]
    m = o.shape[0]
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_vol ** 3, 1e-18))

    def one_sample(k):
        u = jax.random.uniform(k, (m,))
        ms = med.sample_distance(scene, mi, o, d, length, u,
                                 strategy=med.ALWAYS_VALID)
        x = ms.p
        sok = valid & ms.success

        def eval_fn(qi, idx, ok, scale):
            xq = x[qi]
            dq = d[qi]
            miq = mi[qi][:, None]
            sokq = sok[qi][:, None]
            ph_p = pl.gather3(pp, idx)
            rel = pl.sub3(ph_p, pl.expand(xq))
            d2 = pl.dot3(rel, rel)
            is_med = pv["vtype"][idx] == 2
            inside = ok & is_med & (d2 < r_vol * r_vol) & sokq
            wi_p = pl.gather3(pv["wi"], idx)
            # cos between photon propagation and propagation toward
            # camera (-d): dot(wi_p, -d)
            cos_t = -pl.dot3(wi_p, pl.expand(dq))
            pf = pl.eval_phase_planar(scene, miq, cos_t)
            w = jnp.where(inside, pf * k3 * scale, 0.0)
            ag3 = pv["alpha"][idx]
            ar, ag, ab = ag3[..., 0], ag3[..., 1], ag3[..., 2]
            return jnp.stack([jnp.sum(ar * w, axis=1),
                              jnp.sum(ag * w, axis=1),
                              jnp.sum(ab * w, axis=1)], axis=-1)

        Li = hashgrid.gather_dense(grid, x, eval_fn,
                                   max_per_cell=max_per_cell,
                                   q_tile=q_tile, stencil=stencil)
        w = ms.transmittance * ms.sigma_s / jnp.maximum(
            ms.pdf_success, 1e-20)[..., None]
        return jnp.where(sok[..., None], beams_cam["thr"] * w * Li, 0.0)

    keys = jax.random.split(key, n_samples)
    contrib = jnp.zeros((m, 3))
    for k in keys:
        contrib = contrib + one_sample(k)
    return contrib / (n_samples * n_emitted), beams_cam["pixel"]


# --------------------------------------------------------------------------
# beam radiance estimate (camera beam x photon points, 2D kernel)
# --------------------------------------------------------------------------

def knn_radii(grid, pp, valid, r0, k, max_per_cell=32):
    """Per-photon BRE radii from local photon density.

    reference: bre.cpp:29-93 sizes each photon disc by the distance to
    its k-th nearest neighbor. TPU version: one fixed-radius count per
    photon over the hash grid (a single 27-cell gather instead of a kNN
    heap walk), inverted through the 3D density relation
    r_k ~ r0 * (k / count(r0))^(1/3), clamped to [0.25, 2] * r0 — the
    same clamp role as the reference's radius cap. Grid must be built
    with cell_size >= r0 so the stencil covers the count sphere.
    """
    r02 = r0 * r0

    def fold(carry, idx, ok, scale):
        rel = pp[idx] - pp
        d2 = jnp.sum(rel * rel, axis=-1)
        inside = ok & (d2 < r02) & valid
        return carry + jnp.where(inside, scale, 0.0)

    cnt = hashgrid.gather(grid, pp, fold,
                          jnp.zeros(pp.shape[0], jnp.float32),
                          max_per_cell=max_per_cell)
    ratio = jnp.cbrt(k / jnp.maximum(cnt, 1.0))
    return r0 * jnp.clip(ratio, 0.25, 2.0)


def bre_gather(scene: Scene, beams_cam, grid, pp, pv, n_emitted, r_vol,
               max_steps=48, max_per_cell=16, q_tile=256, stencil=27,
               pr=None):
    """BRE: deterministic integral of photon discs along camera segments.

    Grid must be built with cell_size = 2*r_vol. The segment is marched in
    steps of r_vol; a photon contributes at the step whose t-interval
    contains its ray foot-point — visited exactly once.

    pr: optional per-photon radii [P] (knn_radii), each <= 2*r_vol so the
    stencil still covers every overlapping disc; None = global r_vol.
    """
    o, d = beams_cam["o"], beams_cam["d"]
    length = beams_cam["length"]
    mi = beams_cam["med"]
    valid = beams_cam["valid"]
    m = o.shape[0]
    _, sigma_s, st = med._tables(scene, mi)
    step = r_vol
    k2 = INV_PI / jnp.maximum(r_vol * r_vol, 1e-12)

    def body(kstep, acc):
        t_mid = (kstep + 0.5) * step
        x = o + d * t_mid
        live = valid & (t_mid - 0.5 * step < length)

        def eval_fn(qi, idx, ok, scale):
            oq = o[qi]
            dq = d[qi]
            lq = length[qi]
            liveq = live[qi]
            stq = st[qi]
            ssq = sigma_s[qi]
            miq = mi[qi]
            rel = pp[idx] - oq[:, None, :]
            t_proj = jnp.sum(rel * dq[:, None, :], axis=-1)
            in_step = (t_proj >= kstep * step) \
                & (t_proj < (kstep + 1) * step) & (t_proj >= 0.0) \
                & (t_proj <= lq[:, None])
            perp = rel - dq[:, None, :] * t_proj[..., None]
            d2 = jnp.sum(perp * perp, axis=-1)
            is_med = pv["vtype"][idx] == 2
            if pr is None:
                r2_ph = r_vol * r_vol
                k2_ph = k2
            else:
                r_ph = pr[idx]
                r2_ph = r_ph * r_ph
                k2_ph = INV_PI / jnp.maximum(r2_ph, 1e-12)
            inside = ok & is_med & in_step & (d2 < r2_ph) \
                & liveq[:, None]
            pf = ph.eval_phase(scene,
                               jnp.broadcast_to(miq[:, None], idx.shape),
                               -pv["wi"][idx],
                               jnp.broadcast_to(-dq[:, None, :],
                                                rel.shape))
            tr = jnp.exp(-stq[:, None, :] * t_proj[..., None])
            contrib = pv["alpha"][idx] * ssq[:, None, :] * tr \
                * (pf * k2_ph * scale)[..., None]
            return jnp.sum(jnp.where(inside[..., None], contrib, 0.0),
                           axis=1)

        return acc + hashgrid.gather_dense(grid, x, eval_fn,
                                           exact_cells=True,
                                           max_per_cell=max_per_cell,
                                           q_tile=q_tile, stencil=stencil)

    acc = lax.fori_loop(0, max_steps, body, jnp.zeros((m, 3)))
    return beams_cam["thr"] * acc / n_emitted, beams_cam["pixel"]


# --------------------------------------------------------------------------
# photon beams x camera points (3D kernel, "beam3d")
# --------------------------------------------------------------------------

def beam_point_gather(scene: Scene, beams_cam, lb, n_emitted, r_beam,
                      key, n_samples=2, tile=256):
    """3D-kernel beam estimator (reference BeamRadianceQuery 3D variants,
    beams.h:18-230): sample camera distances, then for each photon beam
    integrate the 3D kernel along the beam chord through the kernel
    sphere with one stochastic sample per (point, beam):

      L_i(x,w) = sum_b flux_b * chord * K3(|x-y(s)|) Tr_b(s)
                 p(w_b->w) / surv(s)

    (the EGSR-style single-sample chord integration; the reference's
    'Optimized' variant additionally importance-samples Tr along the
    chord.)
    """
    oc, dc = beams_cam["o"], beams_cam["d"]
    lc = beams_cam["length"]
    mi = beams_cam["med"]
    cvalid = beams_cam["valid"]
    m = oc.shape[0]
    _, sigma_s, st_c = med._tables(scene, mi)
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_beam ** 3, 1e-18))

    nb = lb["o"].shape[0]
    n_tiles = -(-nb // tile)
    pad = n_tiles * tile - nb

    def padf(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    ob = padf(lb["o"]).reshape(n_tiles, tile, 3)
    db = padf(lb["d"]).reshape(n_tiles, tile, 3)
    Lb = padf(lb["length"]).reshape(n_tiles, tile)
    ab = padf(lb["alpha"]).reshape(n_tiles, tile, 3)
    vb = padf(lb["valid"].astype(jnp.int32)).reshape(n_tiles, tile) > 0
    mb = padf(lb["med"]).reshape(n_tiles, tile)

    def one_sample(k):
        k_t, k_s = jax.random.split(k)
        u = jax.random.uniform(k_t, (m,))
        ms = med.sample_distance(scene, mi, oc, dc, lc, u,
                                 strategy=med.ALWAYS_VALID)
        x = ms.p
        sok = cvalid & ms.success
        w_cam = beams_cam["thr"] * ms.transmittance * ms.sigma_s \
            / jnp.maximum(ms.pdf_success, 1e-20)[..., None]

        def tile_step(carry, t):
            acc, ti = carry
            tob, tdb, tLb, tab, tvb, tmb = t
            # chord of the beam line inside the kernel sphere around x
            rel = x[:, None, :] - tob[None]               # [M,T,3]
            s_mid = dot(rel, tdb[None])
            perp = rel - tdb[None] * s_mid[..., None]
            d2 = jnp.sum(perp * perp, axis=-1)
            half = jnp.sqrt(jnp.maximum(r_beam * r_beam - d2, 0.0))
            s0 = jnp.maximum(s_mid - half, 0.0)
            s1 = jnp.minimum(s_mid + half, tLb[None])
            chord = jnp.maximum(s1 - s0, 0.0)
            ok = sok[:, None] & tvb[None] & (chord > 0.0) \
                & (mi[:, None] == tmb[None])
            # one stratified sample on the chord per (point, beam)
            us = jax.random.uniform(jax.random.fold_in(k_s, ti),
                                    s_mid.shape)
            s = s0 + us * chord
            y = tob[None] + tdb[None] * s[..., None]
            dist2 = jnp.sum((x[:, None, :] - y) ** 2, axis=-1)
            ok = ok & (dist2 < r_beam * r_beam)
            pf = ph.eval_phase(
                scene, jnp.broadcast_to(mi[:, None], s.shape),
                -jnp.broadcast_to(tdb[None], y.shape),
                -jnp.broadcast_to(dc[:, None], y.shape))
            tr_b = jnp.exp(-st_c[:, None, :] * s[..., None])
            surv = survival_prob(
                scene, jnp.broadcast_to(mi[:, None], s.shape), s)
            wgt = tab[None] * tr_b \
                * (chord * k3 * pf / jnp.maximum(surv, 1e-9))[..., None]
            acc = acc + jnp.sum(jnp.where(ok[..., None], wgt, 0.0),
                                axis=1)
            return (acc, ti + 1), None

        (Li, _), _ = lax.scan(tile_step, (jnp.zeros((m, 3)), 0),
                              (ob, db, Lb, ab, vb, mb))
        return jnp.where(sok[..., None], w_cam * Li, 0.0)

    keys = jax.random.split(key, n_samples)
    acc = jnp.zeros((m, 3))
    for k in keys:
        acc = acc + one_sample(k)
    return acc / (n_samples * n_emitted), beams_cam["pixel"]


# --------------------------------------------------------------------------
# photon planes (0D kernel)
# --------------------------------------------------------------------------

def survival_prob(scene: Scene, mi, t):
    """P(free-flight sample exceeds t) under the walk's distance sampler:
    (1-w) + w * mean_c exp(-sigma_c t)  (spectral balance, medium.py)."""
    _, _, st = med._tables(scene, mi)
    w = med.sampling_weight(scene, mi)
    return (1.0 - w) + w * jnp.mean(jnp.exp(-st * t[..., None]), axis=-1)


def make_planes(scene: Scene, lb, key):
    """Photon beams -> photon planes (PhotonPlane::transformBeam,
    plane_struct.h:73-93): extend each beam by a phase-sampled direction
    w1 with an exp-sampled length (no visibility).

    Returns a dict of plane arrays (o, w0, l0, w1, l1, alpha, med, valid).
    """
    nb = lb["o"].shape[0]
    k_dir, k_len = jax.random.split(key)
    mi = lb["med"]
    w1, _ = ph.sample_phase(scene, mi, -lb["d"],
                            jax.random.uniform(k_dir, (nb, 2)))
    _, _, st = med._tables(scene, mi)
    sigma_g = jnp.maximum(st[..., 1], 1e-20)
    u = jax.random.uniform(k_len, (nb,))
    l1 = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sigma_g
    # degenerate when w1 ~ parallel to the beam (transformBeam's while loop)
    ok = lb["valid"] & (jnp.abs(dot(w1, lb["d"])) < 1.0 - 1e-6) \
        & (l1 > 1e-6) & jnp.isfinite(l1)
    out = dict(o=lb["o"], w0=lb["d"], l0=lb["length"], w1=w1, l1=l1,
               alpha=lb["alpha"], med=mi, valid=ok,
               # survival of the plane-extension sampler: w=1, green chan
               surv1_sigma=sigma_g)
    # pass the generating beam's shift caches through (1:1 order) for
    # the plane rotation shift (gradient_gather.plane_gradient_gather)
    for k in ("parent_p", "parent_type", "parent_wi", "parent_ns",
              "parent_bsdf", "parent_med", "scatter_base",
              "pdf_dir_base", "reconnectable",
              # chain provenance for the plane ME shift
              # (gradient_gather._plane_me_stage)
              "parent_idx", "at_origin"):
        if k in lb:
            out[k] = lb[k]
    return out


def plane_gather(scene: Scene, beams_cam, planes, n_emitted, tile=256):
    """0D photon-plane estimator (PhotonPlaneQuery, plane_struct.h:227;
    getContrib0D plane_struct.h:140-192):

      contrib = Tr_cam(tCam) * sigma_s^2 * flux * p(w1 -> -d)
                * Tr_w0(t0)/P(len0>t0) * Tr_w1(t1)/P(len1>t1)
                / |w0 . (w1 x d)|

    Camera ray x parallelogram via the Moller-Trumbore variant
    (intersectPlane0D, plane_struct.h:104).
    """
    oc, dc = beams_cam["o"], beams_cam["d"]
    lc = beams_cam["length"]
    mi = beams_cam["med"]
    cvalid = beams_cam["valid"]
    m = oc.shape[0]
    _, sigma_s, st_c = med._tables(scene, mi)

    npl = planes["o"].shape[0]
    n_tiles = -(-npl // tile)
    pad = n_tiles * tile - npl

    def padf(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    P = {k: padf(v).reshape((n_tiles, tile) + v.shape[1:])
         for k, v in planes.items()}

    def tile_step(acc, t):
        po, pw0, pl0, pw1, pl1, pal, pmed, pval, psig = t
        e0 = pw0 * pl0[..., None]                      # [T,3]
        e1 = pw1 * pl1[..., None]
        Pv = jnp.cross(dc[:, None, :], e1[None])       # [M,T,3]
        det = dot(e0[None], Pv)
        ok = jnp.abs(det) > 1e-7
        inv_det = jnp.where(ok, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        T_ = oc[:, None, :] - po[None]
        t0 = dot(T_, Pv) * inv_det
        Q = jnp.cross(T_, e0[None])
        t1 = dot(dc[:, None, :], Q) * inv_det
        tcam = dot(e1[None], Q) * inv_det
        ok = (ok & (t0 >= 0.0) & (t0 <= 1.0) & (t1 >= 0.0) & (t1 <= 1.0)
              & (tcam > 1e-5) & (tcam < lc[:, None])
              & cvalid[:, None] & pval[None]
              & (mi[:, None] == pmed[None]))
        t0 = t0 * pl0[None]
        t1 = t1 * pl1[None]

        tr_cam = jnp.exp(-st_c[:, None, :] * tcam[..., None])
        # phase at the camera scatter point: in = w1, out = toward camera
        pf = ph.eval_phase(scene, jnp.broadcast_to(mi[:, None], det.shape),
                           -jnp.broadcast_to(pw1[None], Pv.shape),
                           -jnp.broadcast_to(dc[:, None], Pv.shape))
        st_p = st_c[:, None, :]  # same medium as camera segment
        tr0 = jnp.exp(-st_p * t0[..., None])
        tr1 = jnp.exp(-st_p * t1[..., None])
        surv0 = survival_prob(scene,
                              jnp.broadcast_to(mi[:, None], det.shape), t0)
        surv1 = jnp.exp(-psig[None] * t1)  # extension sampler, w=1 green
        jac = jnp.abs(dot(pw0[None],
                          jnp.cross(pw1[None],
                                    jnp.broadcast_to(dc[:, None], Pv.shape))))
        w = (tr_cam * tr0 * tr1
             * sigma_s[:, None, :] * sigma_s[:, None, :]
             * (pf / (jnp.maximum(surv0, 1e-9) * jnp.maximum(surv1, 1e-9)
                      * jnp.maximum(jac, 1e-6)))[..., None])
        contrib = jnp.where(ok[..., None], pal[None] * w, 0.0)
        return acc + jnp.sum(contrib, axis=1), None

    acc, _ = lax.scan(tile_step, jnp.zeros((m, 3)),
                      tuple(P[k] for k in ("o", "w0", "l0", "w1", "l1",
                                           "alpha", "med", "valid",
                                           "surv1_sigma")))
    return beams_cam["thr"] * acc / n_emitted, beams_cam["pixel"]


# --------------------------------------------------------------------------
# photon beams x camera beams (1D kernel)
# --------------------------------------------------------------------------

def beam_beam_gather(scene: Scene, beams_cam, lb, n_emitted, r_beam,
                     tile=256):
    """1D beam-beam estimator (reference rayIntersectInternal1D,
    beams_struct.h:250; BeamRadianceQuery beams.h:18-230).

    lb: dict of flattened LightBeams fields. For each (camera segment,
    photon beam) closest approach: if |offset| < r and both parameters in
    range: contrib = alpha_b Tr_b(tb) Tr_c(tc) sigma_s p K1 / sin(theta).
    """
    oc, dc = beams_cam["o"], beams_cam["d"]
    lc = beams_cam["length"]
    mi = beams_cam["med"]
    cvalid = beams_cam["valid"]
    m = oc.shape[0]
    st_c = med._tables(scene, mi)[2]
    sigma_s = med._tables(scene, mi)[1]

    nb = lb["o"].shape[0]
    n_tiles = -(-nb // tile)
    pad = n_tiles * tile - nb

    def padf(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    ob = padf(lb["o"]).reshape(n_tiles, tile, 3)
    db = padf(lb["d"]).reshape(n_tiles, tile, 3)
    Lb = padf(lb["length"]).reshape(n_tiles, tile)
    ab = padf(lb["alpha"]).reshape(n_tiles, tile, 3)
    vb = padf(lb["valid"].astype(jnp.int32)).reshape(n_tiles, tile) > 0
    mb = padf(lb["med"]).reshape(n_tiles, tile)

    def tile_step(acc, t):
        tob, tdb, tLb, tab, tvb, tmb = t
        # closest approach between camera ray (oc,dc) and beams (tob,tdb)
        # solve [1 -b; b -1][tc; tb] = [f1; f2] with b = dc.db
        w0 = oc[:, None, :] - tob[None, :, :]             # [M,T,3]
        b = dot(dc[:, None, :], tdb[None, :, :])          # [M,T]
        f1 = -dot(w0, dc[:, None, :])
        f2 = -dot(w0, tdb[None, :, :])
        denom = 1.0 - b * b
        parallel = jnp.abs(denom) < 1e-8
        den = jnp.where(parallel, 1.0, denom)
        tc = (f1 - b * f2) / den
        tb = (b * f1 - f2) / den
        ok = (~parallel & (tc > 1e-5) & (tc < lc[:, None])
              & (tb > 1e-5) & (tb < tLb[None, :])
              & cvalid[:, None] & tvb[None, :]
              & (mi[:, None] == tmb[None, :]))
        pc = oc[:, None, :] + dc[:, None, :] * tc[..., None]
        pb = tob[None, :, :] + tdb[None, :, :] * tb[..., None]
        delta = pc - pb
        d2 = jnp.sum(delta * delta, axis=-1)
        ok = ok & (d2 < r_beam * r_beam)
        sin_theta = jnp.sqrt(jnp.maximum(denom, 1e-12))
        pf = ph.eval_phase(scene, jnp.broadcast_to(mi[:, None], b.shape),
                           -jnp.broadcast_to(tdb[None], pc.shape),
                           -jnp.broadcast_to(dc[:, None], pc.shape))
        tr_c = jnp.exp(-st_c[:, None, :] * tc[..., None])
        # beam-side transmittance uses the beam's own medium = camera's
        tr_b = jnp.exp(-st_c[:, None, :] * tb[..., None])
        # short-beam compensation: stored beams have sampled lengths, so
        # a gather at tb exists with prob P(len > tb) — divide it out
        # (beams_struct.h:160-176, "Unifying Points, Beams and Paths" 7.3)
        surv = survival_prob(scene,
                             jnp.broadcast_to(mi[:, None], b.shape), tb)
        k1 = 1.0 / (2.0 * r_beam)
        w = (pf * k1 / (sin_theta * jnp.maximum(surv, 1e-9)))[..., None] \
            * tr_c * tr_b * sigma_s[:, None, :]
        contrib = jnp.where(ok[..., None], tab[None] * w, 0.0)
        return acc + jnp.sum(contrib, axis=1), None

    acc, _ = lax.scan(tile_step, jnp.zeros((m, 3)),
                      (ob, db, Lb, ab, vb, mb))
    return beams_cam["thr"] * acc / n_emitted, beams_cam["pixel"]
