"""G-VPM: gradient-domain volumetric photon density estimation.

The paper's contribution (reference: gvpm/gvpm.cpp GPMIntegrator): each
progressive pass computes, besides the primal photon-density estimate,
finite-difference gradients to the 4 neighbor pixels by SHIFTING every
(camera path, photon) pair: the camera subpath is retraced through the
offset pixel (shift_cameraPath.h — here: re-traced with the SAME random
numbers, so specular/null chains reproduce structurally), and the photon
is reconnected to a target that preserves the kernel-local offset
(getShiftPos, shift_volume_photon.cpp:858) via the cached-parent
reconnection shift (shift.py). MIS between base and offset sampling makes
the pair estimator symmetric (shift_volume_photon.cpp:470-484).

Per-pass buffers per pixel (gvpm_struct.h:421-641): primal flux, and per
direction d in {right,left,down,up}: shifted flux S_d and weighted base
flux W_d. Gradient assembly (computeGradient, gvpm.cpp:1205-1306):

  Gx[x]   = (S_right[x] - W_right[x]) + (W_left[x+1] - S_left[x+1])
  Gy[y]   = (S_down[y] - W_down[y]) + (W_up[y+1] - S_up[y+1])

Final image: screened-Poisson reconstruction (ops/poisson.py) of the
averaged primal + gradients (gvpm.cpp:609-702).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import GradientConfig
from ..core.math import coordinate_system, dot, to_local
from ..ops import cellgrid, hashgrid, poisson
from ..render import medium as med
from ..render import phase as phmod
from ..render.bsdf import eval_bsdf
from . import estimators, gatherpoint, gradient_gather, ptracer, shift, sppm
from ..scene.types import Scene

INV_PI = 1.0 / jnp.pi

# shift directions: (dx, dy) in image coords; reference ERight/ELeft/
# ETop/EBottom (gbdpt_proc.cpp:103 hard-codes the same 4-neighbor set)
OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1))
RIGHT, LEFT, DOWN, UP = 0, 1, 2, 3


def _gp_compatible(base, sgp):
    """Camera-subpath structure compatibility of a shifted gather point
    (ShiftGatherPoint::generate validity, shift_cameraPath.h:29-170)."""
    return (sgp.valid & base.valid & (sgp.depth == base.depth)
            & (sgp.bsdf == base.bsdf))


def surface_gradient_gather(scene: Scene, base, sgps, grid, pp, pv,
                            n_emitted, border, max_per_cell=32):
    """Surface photon gather with 4-direction shifts.

    base: GatherPoints (radius already scaled); sgps: list of 4 shifted
    GatherPoints. Returns (primal [N,3], S [4,N,3], W [4,N,3]).
    """
    n = base.p.shape[0]
    r = base.radius
    s_ax, t_ax = coordinate_system(base.ns)
    wo_loc = to_local(base.ns, s_ax, t_ax, base.wo)
    k2 = (INV_PI / jnp.maximum(r * r, 1e-12))[..., None]

    comp = [_gp_compatible(base, sgps[i]) for i in range(4)]
    sgp_frames = []
    for i in range(4):
        ss, tt = coordinate_system(sgps[i].ns)
        sgp_frames.append((ss, tt, to_local(sgps[i].ns, ss, tt,
                                            sgps[i].wo)))

    def fold(carry, idx, ok, scale):
        primal, S, W = carry
        d2 = jnp.sum((pp[idx] - base.p) ** 2, axis=-1)
        is_surf = pv["vtype"][idx] == 1
        wi_p = pv["wi"][idx]
        front = dot(base.ns, -wi_p) > 1e-4
        inside = ok & is_surf & (d2 < r * r) & front & base.valid
        wi_loc = to_local(base.ns, s_ax, t_ax, -wi_p)
        f, _ = eval_bsdf(scene, base.bsdf, wo_loc, wi_loc)
        c_base = base.thr * pv["alpha"][idx] * f * k2 * scale[..., None]
        c_base = jnp.where(inside[..., None], c_base, 0.0)
        primal = primal + c_base

        for i in range(4):
            ssx, ttx, wo_loc_s = sgp_frames[i]
            # sensorMIS (gvpm_struct.h:608-631)
            sens_i = jnp.clip(sgps[i].pdf_prod
                              / jnp.maximum(base.pdf_prod, 1e-20),
                              1e-4, 1e4)
            new_p = sgps[i].p + (pp[idx] - base.p)
            a_s, pdf_ratio, ok_s = shift.reconnect_photon(
                scene, pv, idx, new_p, target_is_volume=False)
            w_new = new_p - pv["parent_p"][idx]
            w_new = w_new / jnp.maximum(
                jnp.linalg.norm(w_new, axis=-1, keepdims=True), 1e-12)
            wi_loc_s = to_local(sgps[i].ns, ssx, ttx, -w_new)
            f_s, _ = eval_bsdf(scene, sgps[i].bsdf, wo_loc_s, wi_loc_s)
            ok_i = ok_s & comp[i] & inside
            c_shift = sgps[i].thr * a_s * f_s * k2 * scale[..., None]
            w = shift.mis_weight(pdf_ratio, sens_i, ok=ok_i)
            w = jnp.where(border[i], 1.0, w)
            S = S.at[i].add(jnp.where(ok_i[..., None],
                                      w[..., None] * c_shift, 0.0))
            W = W.at[i].add(jnp.where(inside[..., None],
                                      w[..., None] * c_base, 0.0))
        return (primal, S, W)

    init = (jnp.zeros((n, 3)), jnp.zeros((4, n, 3)), jnp.zeros((4, n, 3)))
    primal, S, W = hashgrid.gather(grid, base.p, fold, init,
                                   max_per_cell=max_per_cell)
    inv = 1.0 / n_emitted
    return primal * inv, S * inv, W * inv


def volume_gradient_gather(scene: Scene, cb, scb_list, grid, pp, pv,
                           n_emitted, r_vol, key, lane, border_lane,
                           n_samples=2, max_per_cell=32):
    """Volume (VPM/distance) gather with 4-direction shifts.

    cb: base camera segments dict (flattened [M]); scb_list: 4 shifted
    camera-segment dicts with matching layout (same [S,N] flattening).
    lane: [M] pixel lane per segment; border_lane: [4,M] bool.
    Returns (primal [M,3], S [4,M,3], W [4,M,3]).
    """
    m = cb["o"].shape[0]
    o, d, length, mi = cb["o"], cb["d"], cb["length"], cb["med"]
    k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_vol ** 3, 1e-18))

    # shifted segment data: same edge index, distance copied from base
    svalid, so, sd, sthr, slen = [], [], [], [], []
    for i in range(4):
        s = scb_list[i]
        svalid.append(s["valid"] & (s["med"] == mi))
        so.append(s["o"])
        sd.append(s["d"])
        sthr.append(s["thr"])
        slen.append(s["length"])

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

        # shifted sample points: same distance on the shifted edge
        xs, cam_ok, pdf_ratio_cam, thr_s = [], [], [], []
        for i in range(4):
            ok_i = sok & svalid[i] & (slen[i] >= t)
            xs.append(so[i] + sd[i] * t[..., None])
            ps_i, _ = med.pdf_distance(scene, mi, t, slen[i],
                                       jnp.zeros_like(sok),
                                       strategy=med.ALWAYS_VALID)
            pdf_ratio_cam.append(
                ps_i / pdf_base_ray
                * jnp.clip(scb_list[i]["pdf_prod"]
                           / jnp.maximum(cb["pdf_prod"], 1e-20),
                           1e-4, 1e4))
            cam_ok.append(ok_i)
            # shifted camera factor: thr' * Tr(t) * sigma_s / pdf_base
            thr_s.append(sthr[i] * ms.transmittance * ms.sigma_s
                         / pdf_base_ray[..., None])

        def fold(carry, idx, ok, scale):
            primal, S, W = carry
            d2 = jnp.sum((pp[idx] - x) ** 2, axis=-1)
            is_med = pv["vtype"][idx] == 2
            inside = ok & is_med & (d2 < r_vol * r_vol) & sok
            pf = phmod.eval_phase(scene, mi, -pv["wi"][idx], -d)
            c_base = w_cam * pv["alpha"][idx] * (pf * k3 * scale)[..., None]
            c_base = jnp.where(inside[..., None], c_base, 0.0)
            primal = primal + c_base

            for i in range(4):
                new_p = xs[i] + (pp[idx] - x)
                a_s, pdf_ratio_l, ok_s = shift.reconnect_photon(
                    scene, pv, idx, new_p, target_is_volume=True)
                w_new = new_p - pv["parent_p"][idx]
                w_new = w_new / jnp.maximum(
                    jnp.linalg.norm(w_new, axis=-1, keepdims=True), 1e-12)
                pf_s = phmod.eval_phase(scene, mi, -w_new, -sd[i])
                ok_i = ok_s & cam_ok[i] & inside
                c_shift = thr_s[i] * a_s * (pf_s * k3 * scale)[..., None]
                w = shift.mis_weight(pdf_ratio_l, pdf_ratio_cam[i],
                                     ok=ok_i)
                w = jnp.where(border_lane[i], 1.0, w)
                S = S.at[i].add(jnp.where(ok_i[..., None],
                                          w[..., None] * c_shift, 0.0))
                W = W.at[i].add(jnp.where(inside[..., None],
                                          w[..., None] * c_base, 0.0))
            return (primal, S, W)

        init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)),
                jnp.zeros((4, m, 3)))
        return hashgrid.gather(grid, x, fold, init,
                               max_per_cell=max_per_cell)

    keys = jax.random.split(key, n_samples)
    primal = jnp.zeros((m, 3))
    S = jnp.zeros((4, m, 3))
    W = jnp.zeros((4, m, 3))
    for k in keys:
        p_, S_, W_ = one_sample(k)
        primal, S, W = primal + p_, S + S_, W + W_
    inv = 1.0 / (n_samples * n_emitted)
    return primal * inv, S * inv, W * inv


def volume_gradient_bre(scene: Scene, cb, scb_list, grid, pp, pv,
                        n_emitted, r_vol, border_lane, max_steps=48,
                        max_per_cell=16):
    """Gradient BRE: deterministic photon-disc marching with 4-direction
    shifts (reference: VolumeGradientBREQuery, shift_volume_photon.cpp:658;
    accel gvpm_accel.h:269-312).

    The camera distance is the photon's foot-point (deterministic), so the
    camera-side MIS pdf ratio is 1; the photon reconnection supplies the
    light-side ratio. Grid cell = 2*r_vol, march step = r_vol.
    """
    m = cb["o"].shape[0]
    o, d, length, mi = cb["o"], cb["d"], cb["length"], cb["med"]
    valid = cb["valid"]
    _, sigma_s, st = med._tables(scene, mi)
    step = r_vol
    k2 = INV_PI / jnp.maximum(r_vol * r_vol, 1e-12)

    svalid, so, sd, sthr, slen = [], [], [], [], []
    for i in range(4):
        s = scb_list[i]
        svalid.append(s["valid"] & (s["med"] == mi))
        so.append(s["o"])
        sd.append(s["d"])
        sthr.append(s["thr"])
        slen.append(s["length"])

    def body(kstep, carry):
        primal, S, W = carry
        t_mid = (kstep + 0.5) * step
        x = o + d * t_mid
        live = valid & (t_mid - 0.5 * step < length)

        def fold(c, idx, ok, scale):
            primal, S, W = c
            is_med = pv["vtype"][idx] == 2
            rel = pp[idx] - o
            t_proj = dot(rel, d)
            in_step = (t_proj >= kstep * step) \
                & (t_proj < (kstep + 1) * step) & (t_proj >= 0.0) \
                & (t_proj <= length)
            perp = rel - d * t_proj[..., None]
            d2p = jnp.sum(perp * perp, axis=-1)
            inside = ok & is_med & in_step & (d2p < r_vol * r_vol) & live
            pf = phmod.eval_phase(scene, mi, -pv["wi"][idx], -d)
            tr = jnp.exp(-st * t_proj[..., None])
            c_base = cb["thr"] * pv["alpha"][idx] * sigma_s * tr \
                * (pf * k2 * scale)[..., None]
            c_base = jnp.where(inside[..., None], c_base, 0.0)
            primal = primal + c_base

            foot = o + d * t_proj[..., None]
            for i in range(4):
                ok_i = inside & svalid[i] & (slen[i] >= t_proj)
                x_s = so[i] + sd[i] * t_proj[..., None]
                new_p = x_s + (pp[idx] - foot)
                a_s, pdf_ratio_l, ok_s = shift.reconnect_photon(
                    scene, pv, idx, new_p, target_is_volume=True)
                w_new = new_p - pv["parent_p"][idx]
                w_new = w_new / jnp.maximum(
                    jnp.linalg.norm(w_new, axis=-1, keepdims=True), 1e-12)
                pf_s = phmod.eval_phase(scene, mi, -w_new, -sd[i])
                ok_i = ok_i & ok_s
                c_shift = sthr[i] * a_s * sigma_s * tr \
                    * (pf_s * k2 * scale)[..., None]
                sens_i = jnp.clip(scb_list[i]["pdf_prod"]
                                  / jnp.maximum(cb["pdf_prod"], 1e-20),
                                  1e-4, 1e4)
                w = shift.mis_weight(pdf_ratio_l, sens_i, ok=ok_i)
                w = jnp.where(border_lane[i], 1.0, w)
                S = S.at[i].add(jnp.where(ok_i[..., None],
                                          w[..., None] * c_shift, 0.0))
                W = W.at[i].add(jnp.where(inside[..., None],
                                          w[..., None] * c_base, 0.0))
            return (primal, S, W)

        return hashgrid.gather(grid, x, fold, carry,
                               max_per_cell=max_per_cell)

    from jax import lax
    init = (jnp.zeros((m, 3)), jnp.zeros((4, m, 3)), jnp.zeros((4, m, 3)))
    primal, S, W = lax.fori_loop(0, max_steps, body, init)
    inv = 1.0 / n_emitted
    return primal * inv, S * inv, W * inv


def assemble_gradients(primal_px, S_px, W_px, H, W_img):
    """computeGradient (gvpm.cpp:1205-1306) on [H,W,...] buffers."""
    def img(a):
        return a.reshape(H, W_img, 3)

    S = [img(S_px[i]) for i in range(4)]
    Wb = [img(W_px[i]) for i in range(4)]
    gx = S[RIGHT] - Wb[RIGHT]
    gx = gx.at[:, :-1].add(Wb[LEFT][:, 1:] - S[LEFT][:, 1:])
    gy = S[DOWN] - Wb[DOWN]
    gy = gy.at[:-1, :].add(Wb[UP][1:, :] - S[UP][1:, :])
    return img(primal_px), gx, gy


def pass_buffers(scene: Scene, cfg: GradientConfig, volume, n_photons,
                 photons, beams, k_cam, k_gather, px, py, border,
                 surf_scale, vol_scale, r_vol_base, emission_scale=1.0,
                 defer_beams=False):
    """The per-pixel-block gradient pass core: camera traces (base + 4
    offsets), surface + volume gathers with shifts. Returns flat
    (primal [n,3], S [4,n,3], W [4,n,3], stats) for the given pixel
    lanes — callers assemble gradients on the full film (render_pass) or
    on row shards (parallel.dist.gvpm_render_pass_sharded; S/W stay
    unassembled so shard boundaries need no neighbor exchange)."""
    n = px.shape[0]
    W = scene.width

    # base + 4 offset camera paths, SAME random numbers -> same
    # structure; traced as ONE [5n]-ray wavefront (rand_tile repeats the
    # per-lane randoms across the 5 pixel groups)
    px5 = jnp.concatenate([px] + [px + dx for dx, _ in OFFSETS])
    py5 = jnp.concatenate([py] + [py + dy for _, dy in OFFSETS])
    gp5, cb5 = gatherpoint.trace(scene, cfg, k_cam, px5, py5,
                                 rand_tile=5)
    split_gp = jax.tree_util.tree_map(
        lambda a: a.reshape((5, n) + a.shape[1:]), gp5)
    split_cb = jax.tree_util.tree_map(
        lambda a: a.reshape((a.shape[0], 5, n) + a.shape[2:]), cb5)
    base = jax.tree_util.tree_map(lambda a: a[0], split_gp)
    cam_beams = jax.tree_util.tree_map(lambda a: a[:, 0], split_cb)
    sgps = [jax.tree_util.tree_map(lambda a, i=i: a[i], split_gp)
            for i in range(1, 5)]
    scbs = [jax.tree_util.tree_map(lambda a, i=i: a[:, i], split_cb)
            for i in range(1, 5)]

    pp = photons["p"]

    # ---- photon admissibility flags ----
    # cameraSphere: drop photons stored within a sensor-centred sphere
    # (gvpm_accel.h:221 isValidPhoton — kills the huge-kernel fireflies
    # of photons landing next to the lens) and beams whose SEGMENT
    # crosses it (gvpm_beams.h:90 segment-sphere test). minDepth is NOT
    # a photon prefilter: the reference gates each gather pair on total
    # path depth (photon depth + camera depth,
    # shift_volume_photon.cpp:672) — applied inside the gathers below.
    keep = jnp.ones(pp.shape[0], bool)
    if cfg.camera_sphere > 0.0:
        cam_o = scene.cam_to_world[:3, 3]
        d2cam = jnp.sum((pp - cam_o[None]) ** 2, axis=-1)
        keep = keep & (d2cam > cfg.camera_sphere ** 2)
        t_cl = jnp.clip(jnp.sum((cam_o[None] - beams["o"]) * beams["d"],
                                axis=-1), 0.0, beams["length"])
        cl = beams["o"] + beams["d"] * t_cl[..., None]
        d2seg = jnp.sum((cl - cam_o[None]) ** 2, axis=-1)
        beams = dict(beams, valid=beams["valid"]
                     & (d2seg > cfg.camera_sphere ** 2))
    # nullShift debug mode (GPMConfig nullShift): force every light
    # shift to the identity/unilateral branch by clearing the
    # reconnectable flags end to end
    if cfg.shift_null:
        photons = dict(photons, reconnectable=jnp.zeros_like(
            photons["reconnectable"]))
        beams = dict(beams, reconnectable=jnp.zeros_like(
            beams["reconnectable"]))

    # global (pixel, step) lane id: gather randoms keyed by it are
    # device-count invariant (rng.lane_uniform; VERDICT r3 weak #6)
    pix_id = (py.astype(jnp.int32) * scene.width
              + px.astype(jnp.int32))

    def flat_cb(c):
        cd = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), c)
        n_steps_c = c.valid.shape[0]
        gid = (jnp.arange(n_steps_c, dtype=jnp.int32)[:, None]
               * jnp.int32(scene.width * scene.height)
               + pix_id[None, :]).reshape(-1)
        return dict(valid=cd.valid, o=cd.o, d=cd.d, length=cd.length,
                    med=cd.med, thr=cd.thr, pdf_prod=cd.pdf_prod,
                    depth=cd.depth, gid=gid)

    # ---- surface (dense planar path, gradient_gather.py) ----
    # grid build sorts ROW INDICES only; the packed row table is built
    # AFTER the grid_*_rows cap on the selected rows (round-5: packing
    # the full S*P slot array first materialized a [4.7M, 128] = 2.4 GB
    # temp at paper scale — ~80% RR-killed padding)
    gbudget = cfg.gather_budget or None
    windowed = cfg.gather_driver in ("window", "cull", "pallas")
    r_surf = base.radius * surf_scale
    base_s = base.replace(radius=r_surf)
    surf_valid = (photons["vtype"] == ptracer.VERT_SURFACE) & keep
    # cull driver queries a 3x3x3 stencil (cell >= r: 2.4x fewer
    # candidates per ball); the windowed drivers keep 2x2x2 at 2r
    cmul = 1.0 if cfg.gather_driver in ("cull", "pallas") else 2.0
    cell = cmul * jnp.maximum(
        jnp.max(jnp.where(base.valid, r_surf, 0.0)), 1e-5)

    def pack_rows(sel):
        ph = {f: v[sel] for f, v in photons.items()}
        return gradient_gather.pack_photons(
            scene, ph, valid=(ph["vtype"] != ptracer.VERT_NONE))

    rowid = jnp.arange(pp.shape[0], dtype=jnp.int32)
    if windowed:
        grid_s, sel_s = cellgrid.build_cells(
            pp, surf_valid, scene.world_lo, scene.world_hi, cell,
            cfg.grid_dims, rowid, max_rows=cfg.grid_surface_rows)
        packed_s = pack_rows(sel_s)
    else:
        packed = gradient_gather.pack_photons(
            scene, photons, valid=(photons["vtype"] != ptracer.VERT_NONE))
        grid_s, packed_s = hashgrid.build_sorted(
            pp, surf_valid, scene.world_lo, cell, packed,
            hash_size=cfg.grid_hash_size, max_rows=cfg.grid_surface_rows)
    p_s, S_s, W_s, v_s, so_s, dr_s = gradient_gather.surface_gather(
        scene, base_s, sgps, grid_s, packed_s, n_photons, border,
        max_per_cell=cfg.grid_max_photons_per_cell,
        q_tile=cfg.gather_q_tile, budget=gbudget,
        min_depth=cfg.min_depth,
        window=cfg.gather_window, window_q_tile=cfg.window_q_tile,
        driver=cfg.gather_driver, k_budget=cfg.cull_k,
        use_manifold=cfg.use_manifold, me_budget=cfg.me_pair_budget,
        pv_chain=photons, pallas_q_tile=cfg.pallas_q_tile,
        pallas_window=cfg.pallas_window)
    visits = jnp.sum(v_s)
    shift_ok = jnp.sum(so_s)
    win_dropped = dr_s[0]
    k_overflow = dr_s[1]
    me_dropped = dr_s[2]

    # ---- volume (VPM distance | BRE) ----
    if volume in ("distance", "bre"):
        r_vol = r_vol_base * vol_scale
        med_valid = (photons["vtype"] == ptracer.VERT_MEDIUM) & keep
        if windowed and volume == "distance":
            # BRE stays on the hash grid: its cylinder-step membership
            # needs the 27-stencil exact-cell mode
            grid_v, sel_v = cellgrid.build_cells(
                pp, med_valid, scene.medium_lo, scene.medium_hi,
                cmul * r_vol, cfg.grid_dims, rowid,
                max_rows=cfg.grid_volume_rows)
            packed_v = pack_rows(sel_v)
        else:
            packed_full = gradient_gather.pack_photons(
                scene, photons,
                valid=(photons["vtype"] != ptracer.VERT_NONE))
            grid_v, packed_v = hashgrid.build_sorted(
                pp, med_valid, scene.medium_lo, 2.0 * r_vol, packed_full,
                hash_size=cfg.grid_hash_size,
                max_rows=cfg.grid_volume_rows)

        cb = flat_cb(cam_beams)
        scb_list = [flat_cb(c) for c in scbs]
        n_steps = cam_beams.valid.shape[0]
        lane_full = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_steps)
        # compact valid medium segments to a fixed per-pixel budget —
        # most camera paths have 1-2 medium segments out of the
        # max_cam_depth slots, and every dead lane still costs a full
        # stencil*K candidate tile in the gather
        budget = min(cb["valid"].shape[0], n * cfg.vol_segments_per_pixel)
        order = jnp.argsort(~cb["valid"])[:budget]
        cb = {kk: vv[order] for kk, vv in cb.items()}
        scb_list = [{kk: vv[order] for kk, vv in s.items()}
                    for s in scb_list]
        lane = lane_full[order]
        border_lane = jnp.stack([border[i][lane] for i in range(4)])
        if volume == "distance":
            p_v, S_v, W_v, v_v, so_v, dr_v = gradient_gather.volume_gather(
                scene, cb, scb_list, grid_v, packed_v, n_photons,
                r_vol, k_gather, border_lane,
                n_samples=cfg.volume_samples,
                max_per_cell=cfg.grid_max_photons_per_cell,
                q_tile=cfg.gather_q_tile, budget=gbudget,
                min_depth=cfg.min_depth,
                window=cfg.gather_window,
                window_q_tile=cfg.window_q_tile,
                driver=cfg.gather_driver, k_budget=cfg.cull_k,
                use_manifold=cfg.use_manifold,
                me_budget=cfg.me_pair_budget,
                pv_chain=photons,
                pallas_q_tile=cfg.pallas_q_tile,
                pallas_window=cfg.pallas_window)
        else:
            dr_v = jnp.zeros((3,), jnp.int32)
            p_v, S_v, W_v, v_v, so_v = gradient_gather.bre_gather(
                scene, cb, scb_list, grid_v, packed_v, n_photons,
                r_vol, border_lane,
                max_per_cell=cfg.grid_max_photons_per_cell,
                q_tile=cfg.gather_q_tile, budget=gbudget,
                min_depth=cfg.min_depth)
        visits = visits + jnp.sum(v_v)
        shift_ok = shift_ok + jnp.sum(so_v)
        win_dropped = win_dropped + dr_v[0]
        k_overflow = k_overflow + dr_v[1]
        me_dropped = me_dropped + dr_v[2]
        # splat per-segment results back to pixel lanes
        def to_px(a):
            out = jnp.zeros((n, 3))
            return out.at[lane].add(a, mode="drop")
        p_s = p_s + to_px(p_v)
        S_s = S_s + jnp.stack([to_px(S_v[i]) for i in range(4)])
        W_s = W_s + jnp.stack([to_px(W_v[i]) for i in range(4)])

    # ---- volume photon beams 1D/3D + photon planes 0D ----
    # beam1d: pairwise reconnection shift (shiftBeamDiffuse,
    # shift_volume_beams.h:408-457; shiftNull3D identity fallback);
    # plane0d: medium-rotation shift (shift_medium.h:39).
    # defer_beams=True stashes the compacted segment/beam state instead
    # of gathering: the host driver then dispatches one bounded jit per
    # segment chunk (render_pass_hosted) — the round-5 fix for the
    # beam/plane full-scale TPU faults (one monolithic dispatch of the
    # whole pair sweep).
    elif volume in ("beam1d", "beam3d", "plane0d"):
        r_b = r_vol_base * vol_scale
        cb = flat_cb(cam_beams)
        scb_list = [flat_cb(c) for c in scbs]
        n_steps = cam_beams.valid.shape[0]
        lane_full = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_steps)
        budget = min(cb["valid"].shape[0], n * cfg.vol_segments_per_pixel)
        order = jnp.argsort(~cb["valid"])[:budget]
        cb = {kk: vv[order] for kk, vv in cb.items()}
        scb_list = [{kk: vv[order] for kk, vv in s.items()}
                    for s in scb_list]
        lane = lane_full[order]
        if volume == "plane0d":
            cb["pixel"] = lane
        border_lane = jnp.stack([border[i][lane] for i in range(4)])
        lb = (estimators.make_planes(scene, beams, k_gather)
              if volume == "plane0d" else beams)

        if defer_beams:
            pending = dict(cb=cb, scb=scb_list, lane=lane,
                           border_lane=border_lane, lb=lb,
                           r_b=jnp.asarray(r_b, jnp.float32),
                           key=k_gather)
            if cfg.use_manifold:
                pending["pv_chain"] = photons
        else:
            if volume == "beam1d":
                res = gradient_gather.segment_chunked(
                    gradient_gather.beam_gradient_gather, scene, cb,
                    scb_list, border_lane, cfg.beam_seg_tile, lb=lb,
                    n_emitted=n_photons, r_beam=r_b, tile=cfg.beam_tile,
                    use_manifold=cfg.use_manifold,
                    me_budget=cfg.me_pair_budget, pv_chain=photons)
            elif volume == "beam3d":
                res = gradient_gather.segment_chunked(
                    gradient_gather.beam3d_gradient_gather, scene, cb,
                    scb_list, border_lane, cfg.beam_seg_tile,
                    key=k_gather, lb=lb, n_emitted=n_photons,
                    r_beam=r_b, n_samples=cfg.volume_samples,
                    tile=cfg.beam_tile, use_manifold=cfg.use_manifold,
                    me_budget=cfg.me_pair_budget, pv_chain=photons)
            else:
                res = gradient_gather.segment_chunked(
                    gradient_gather.plane_gradient_gather, scene, cb,
                    scb_list, border_lane, cfg.beam_seg_tile, planes=lb,
                    n_emitted=n_photons, tile=cfg.beam_tile,
                    use_manifold=cfg.use_manifold,
                    me_budget=cfg.me_pair_budget, pv_chain=photons)
            p_v, S_v, W_v, v_v, so_v, md_v = res
            visits = visits + jnp.sum(v_v)
            shift_ok = shift_ok + jnp.sum(so_v)
            me_dropped = me_dropped + md_v

            def to_px(a):
                out = jnp.zeros((n, 3))
                return out.at[lane].add(a, mode="drop")
            p_s = p_s + to_px(p_v)
            S_s = S_s + jnp.stack([to_px(S_v[i]) for i in range(4)])
            W_s = W_s + jnp.stack([to_px(W_v[i]) for i in range(4)])

    # ---- directly-seen emission (directTracing, gvpm.cpp:1231-1240) ----
    # emission_scale: photon-INDEPENDENT term — ring-pass callers add
    # the photon terms n_dev times and scale this one down to match
    # (parallel/dist.py gvpm_render_pass_sharded_ring)
    p_s = p_s + emission_scale * base.emission
    for i in range(4):
        em_ok = sgps[i].emission  # shifted path emission
        w = jnp.where(border[i], 1.0, 0.5)[..., None] * emission_scale
        S_s = S_s.at[i].add(w * em_ok)
        W_s = W_s.at[i].add(w * base.emission)

    stats = dict(visits=visits, shift_ok=shift_ok,
                 win_dropped=win_dropped, k_overflow=k_overflow,
                 me_dropped=me_dropped)
    if defer_beams:
        stats["pending"] = pending
    return p_s, S_s, W_s, stats


def _reject_heterogeneous(scene: Scene):
    """The gradient shifts use homogeneous closed forms (exp(-sigma_t*d)
    transmittance ratios along reconnected segments, shift.py:117-136);
    on a heterogeneous medium they would be silently biased. The
    reference has the same limitation (README.md:66 lists G-VPM
    heterogeneous as missing). Reject loudly instead of approximating.
    `het_medium` is a static field, so this check costs nothing under
    jit."""
    if scene.het_medium >= 0:
        raise ValueError(
            "gradient-domain integrators do not support heterogeneous "
            "media: the reconnection/ME shifts use homogeneous "
            "closed-form transmittance ratios and would be biased "
            "(reference parity: README.md:66). Render this scene with "
            "the primal integrators (volpath/sppm) instead.")


BEAM_VOLUMES = ("beam1d", "beam3d", "plane0d")


@functools.partial(jax.jit, static_argnames=("cfg", "volume", "n_photons",
                                             "defer_beams"))
def _render_pass_jit(scene: Scene, cfg: GradientConfig, volume, n_photons,
                     seed, it, surf_scale, vol_scale, r_vol_base,
                     defer_beams=False):
    _reject_heterogeneous(scene)
    H, W = scene.height, scene.width
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_gather = rng.pass_key(seed, it, rng.STREAM_GATHER)

    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    border = jnp.stack([xi == W - 1, xi == 0, yi == H - 1, yi == 0])

    photons, beams = sppm.shoot_photons(scene, cfg, n_photons, k_light)
    p_s, S_s, W_s, stats = pass_buffers(
        scene, cfg, volume, n_photons, photons, beams, k_cam, k_gather,
        px, py, border, surf_scale, vol_scale, r_vol_base,
        defer_beams=defer_beams)
    if defer_beams:
        return p_s, S_s, W_s, stats
    primal, gx, gy = assemble_gradients(p_s, S_s, W_s, H, W)
    return primal, gx, gy, stats


@functools.partial(jax.jit, static_argnames=("cfg", "volume", "n_photons"))
def _beam_chunk(scene: Scene, cfg: GradientConfig, volume, n_photons,
                lb, cbc, scbc, blc, r_b, key, pv_chain):
    """One bounded segment-chunk dispatch of a beam/plane gather."""
    if volume == "beam1d":
        return gradient_gather.beam_gradient_gather(
            scene, cbc, scbc, lb, n_photons, r_b, blc,
            tile=cfg.beam_tile, use_manifold=cfg.use_manifold,
            me_budget=cfg.me_pair_budget, pv_chain=pv_chain)
    if volume == "beam3d":
        return gradient_gather.beam3d_gradient_gather(
            scene, cbc, scbc, lb, n_photons, r_b, key, blc,
            n_samples=cfg.volume_samples, tile=cfg.beam_tile,
            use_manifold=cfg.use_manifold,
            me_budget=cfg.me_pair_budget, pv_chain=pv_chain)
    return gradient_gather.plane_gradient_gather(
        scene, cbc, scbc, lb, n_photons, blc, tile=cfg.beam_tile,
        use_manifold=cfg.use_manifold, me_budget=cfg.me_pair_budget,
        pv_chain=pv_chain)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _beam_combine(p_s, S_s, W_s, pr, S_v, W_v, lane, H, W):
    n = p_s.shape[0]

    def to_px(a):
        out = jnp.zeros((n, 3))
        return out.at[lane].add(a, mode="drop")

    p_s = p_s + to_px(pr)
    S_s = S_s + jnp.stack([to_px(S_v[i]) for i in range(4)])
    W_s = W_s + jnp.stack([to_px(W_v[i]) for i in range(4)])
    return assemble_gradients(p_s, S_s, W_s, H, W)


def render_pass_hosted(scene: Scene, cfg: GradientConfig, volume,
                       n_photons, seed, it, surf_scale, vol_scale,
                       r_vol_base):
    """Beam/plane gradient pass with HOST-dispatched segment chunks.

    The fused pass ran the whole [segments x beams] pair sweep (all
    chunks, all 4 shifts) as ONE device dispatch; at paper scale that
    single program faulted the TPU worker (BENCH_r04). Here the head
    (shoot + camera traces + surface gather + segment compaction) is
    one jit, then each segment chunk is its own bounded dispatch of a
    single compiled program — same math, same totals, dozens of
    seconds-long dispatches instead of one multi-minute one.
    """
    H, W = scene.height, scene.width
    p_s, S_s, W_s, stats = _render_pass_jit(
        scene, cfg, volume, n_photons, seed, it, surf_scale, vol_scale,
        r_vol_base, defer_beams=True)
    pend = stats.pop("pending")
    cb, scb, lane = pend["cb"], pend["scb"], pend["lane"]
    bl, lb, r_b = pend["border_lane"], pend["lb"], pend["r_b"]
    pvc = pend.get("pv_chain")
    m = cb["o"].shape[0]
    st_sz = min(cfg.beam_seg_tile or m, m)
    n_chunks = -(-m // st_sz)
    pad = n_chunks * st_sz - m

    def ck(a):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, st_sz) + a.shape[1:])

    cbc = {k: ck(v) for k, v in cb.items()}
    scbc = [{k: ck(v) for k, v in s.items()} for s in scb]
    blc = ck(jnp.moveaxis(bl, 0, 1))
    prs, Ss, Ws = [], [], []
    v_t = sk_t = md_t = None
    for ci in range(n_chunks):
        cb_i = {k: v[ci] for k, v in cbc.items()}
        scb_i = [{k: v[ci] for k, v in s.items()} for s in scbc]
        bl_i = jnp.moveaxis(blc[ci], -1, 0)
        key_i = jax.random.fold_in(pend["key"], ci)
        pr, S_v, W_v, vv, sk, md = _beam_chunk(
            scene, cfg, volume, n_photons, lb, cb_i, scb_i, bl_i, r_b,
            key_i, pvc)
        prs.append(pr)
        Ss.append(S_v)
        Ws.append(W_v)
        v_t = vv if v_t is None else v_t + vv
        sk_t = sk if sk_t is None else sk_t + sk
        md_t = md if md_t is None else md_t + md
    pr = jnp.concatenate(prs)[:m]
    S_v = jnp.concatenate(Ss, axis=1)[:, :m]
    W_v = jnp.concatenate(Ws, axis=1)[:, :m]
    primal, gx, gy = _beam_combine(p_s, S_s, W_s, pr, S_v, W_v, lane,
                                   H, W)
    stats["visits"] = stats["visits"] + v_t
    stats["shift_ok"] = stats["shift_ok"] + sk_t
    stats["me_dropped"] = stats["me_dropped"] + md_t
    return primal, gx, gy, stats


def render_pass(scene: Scene, cfg: GradientConfig, volume, n_photons,
                seed, it, surf_scale, vol_scale, r_vol_base):
    """One gradient pass. Returns (primal, gx, gy, stats): images
    [H,W,3] plus stats = {visits, shift_ok}: the number of real photon
    visits (candidates passing the kernel test — the honest bench
    denominator) and of successful reconnection shifts (the reference's
    per-pass shift success StatsCounter, shift_volume_photon.cpp:40-47).

    Beam/plane volumes dispatch per segment chunk from the host (see
    render_pass_hosted); point/BRE volumes run as one fused jit."""
    if (volume in BEAM_VOLUMES and cfg.beam_dispatch == "host"
            and cfg.beam_seg_tile):
        return render_pass_hosted(scene, cfg, volume, n_photons, seed,
                                  it, surf_scale, vol_scale, r_vol_base)
    return _render_pass_jit(scene, cfg, volume, n_photons, seed, it,
                            surf_scale, vol_scale, r_vol_base)


def render(scene: Scene, cfg: GradientConfig = GradientConfig(),
           volume="distance", seed=0, passes=None, callback=None,
           checkpoint_path=None, checkpoint_every=10):
    """Progressive G-VPM loop + screened-Poisson reconstruction.

    checkpoint_path: if set, the accumulation state is written atomically
    every `checkpoint_every` passes and the loop RESUMES from an existing
    checkpoint (the reference restarts from pass 1 on a kill, SURVEY §5.4
    — here the whole state is four arrays and two scalars).
    Per-pass shift success rates feed StatsCounter (the reference's
    behavioral regression signal, shift_volume_photon.cpp:40-47).
    """
    from ..core.logging import StatsCounter, log
    from ..utils import checkpoint as ckpt
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = max(cfg.volume_photons, cfg.surface_photons)
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    dim = sppm.KERNEL_DIM.get(volume, 3)

    H, W = scene.height, scene.width
    acc_p = jnp.zeros((H, W, 3))
    acc_gx = jnp.zeros((H, W, 3))
    acc_gy = jnp.zeros((H, W, 3))
    surf_scale, vol_scale = 1.0, 1.0
    it0 = 0
    if checkpoint_path:
        state = ckpt.load(checkpoint_path)
        if state is not None:
            it0, bufs, scal = state
            it0 += 1
            acc_p = jnp.asarray(bufs["acc_p"])
            acc_gx = jnp.asarray(bufs["acc_gx"])
            acc_gy = jnp.asarray(bufs["acc_gy"])
            surf_scale = scal["surf_scale"]
            vol_scale = scal["vol_scale"]
            log.info("resumed from %s at pass %d", checkpoint_path, it0)

    c_visits = StatsCounter.REGISTRY.get("gvpm/photon_visits") \
        or StatsCounter("gvpm/photon_visits", "value")
    c_shift = StatsCounter.REGISTRY.get("gvpm/shift_success") \
        or StatsCounter("gvpm/shift_success", "percentage")
    c_drop = StatsCounter.REGISTRY.get("gvpm/window_dropped_rows") \
        or StatsCounter("gvpm/window_dropped_rows", "value")
    c_kover = StatsCounter.REGISTRY.get("gvpm/cull_k_overflow") \
        or StatsCounter("gvpm/cull_k_overflow", "value")
    c_medrop = StatsCounter.REGISTRY.get("gvpm/me_dropped_pairs") \
        or StatsCounter("gvpm/me_dropped_pairs", "value")

    for it in range(it0, n_passes):
        p, gx, gy, stats = render_pass(scene, cfg, volume, n_photons,
                                       seed, it, surf_scale, vol_scale,
                                       r_vol_base)
        acc_p, acc_gx, acc_gy = acc_p + p, acc_gx + gx, acc_gy + gy
        v = int(stats["visits"])
        c_visits.add(v)
        c_shift.add(int(stats["shift_ok"]), max(4 * v, 1))
        c_drop.add(int(stats.get("win_dropped", 0)))
        c_kover.add(int(stats.get("k_overflow", 0)))
        c_medrop.add(int(stats.get("me_dropped", 0)))
        ratio = sppm.radius_ratio(it, cfg.alpha)
        surf_scale *= ratio ** 0.5
        if dim > 0:
            vol_scale *= ratio ** (1.0 / dim)
        if checkpoint_path and ((it + 1) % checkpoint_every == 0
                                or it == n_passes - 1):
            ckpt.save(checkpoint_path, it,
                      dict(acc_p=acc_p, acc_gx=acc_gx, acc_gy=acc_gy),
                      dict(surf_scale=surf_scale, vol_scale=vol_scale))
        if callback is not None:
            callback(it, acc_p / (it + 1))

    inv = 1.0 / n_passes
    primal = acc_p * inv
    gx = acc_gx * inv
    gy = acc_gy * inv
    recon = poisson.solve(primal, gx, gy, alpha=cfg.recon_alpha,
                          iters=cfg.recon_iters,
                          irls_iters=cfg.recon_irls_iters, l1=cfg.recon_l1)
    return dict(image=recon, primal=primal, gx=gx, gy=gy,
                passes=n_passes)
