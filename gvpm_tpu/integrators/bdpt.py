"""Bidirectional path tracer with recursive MIS (reference:
src/integrators/bdpt/bdpt.cpp:133 + libbidir PathSampler).

TPU design: per pixel lane, one camera subpath [S,N] and one light
subpath [T,N] are traced by lockstep scans that carry the SmallVCM-style
recursive MIS quantities (dVCM/dVC, vertex-connection-only); then a
static s x t double loop evaluates every connection strategy with masked
lanes. Strategies per lane: s=0 unidirectional hits (accumulated during
the camera walk), s=1 direct connection to the light subpath's emitter
vertex, s>=2, t>=2 inner connections. The t=1 light-tracing strategy
(splats to other pixels) is excluded and the camera-side dVCM is
initialized to zero so the MIS partition stays consistent.

Medium vertices participate as first-class connection endpoints (the
participating-media support of the reference's bdpt): their "cosine"
factors are 1 and scatter values are sigma_s * phase.

Balance heuristic throughout (mis(x) = x).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..core.config import PathConfig, VolPathConfig
from ..core.math import coordinate_system, dot, to_local, to_world
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import eval_bsdf, sample_bsdf
from ..render.emitter import (eval_radiance, pdf_direct_area,
                              sample_direction, sample_position)
from ..render.visibility import medium_transition, segment_transmittance
from ..scene.camera import generate_rays
from ..scene.intersect import intersect
from ..scene.types import BSDF_NULL, Scene

RAY_EPS = 1e-4

VT_NONE, VT_SURF, VT_MED = 0, 1, 2


def _scatter_eval(scene, vtype, bsdf, medidx, ns, wi_prop, wo,
                  transport):
    """(value, pdf_fwd, pdf_rev) of scattering at a subpath vertex.

    wi_prop: arriving propagation direction (prev -> vertex);
    wo: outgoing direction (vertex -> next). Value excludes cosines for
    media (none) and includes |cos_out| for surfaces.
    """
    # surface (true normal; BSDF evals are sign-aware)
    nsf = ns
    s_ax, t_ax = coordinate_system(nsf)
    wi_loc = to_local(nsf, s_ax, t_ax, -wi_prop)
    wo_loc = to_local(nsf, s_ax, t_ax, wo)
    f_s, pdf_s = eval_bsdf(scene, bsdf, wi_loc, wo_loc,
                           transport=transport)
    _, pdf_s_rev = eval_bsdf(scene, bsdf, wo_loc, wi_loc,
                             transport=transport)
    val_s = f_s * jnp.abs(wo_loc[..., 2:3])
    # medium
    mi = jnp.clip(medidx, 0, scene.med_sigma_s.shape[0] - 1)
    pv = ph.eval_phase(scene, mi, -wi_prop, wo)
    pv_rev = ph.eval_phase(scene, mi, wo, -wi_prop)  # symmetric anyway
    sigma_s = jnp.where((medidx >= 0)[..., None], scene.med_sigma_s[mi],
                        0.0)
    val_m = sigma_s * pv[..., None]
    is_med = vtype == VT_MED
    val = jnp.where(is_med[..., None], val_m, val_s)
    pdf = jnp.where(is_med, pv, pdf_s)
    pdf_rev = jnp.where(is_med, pv_rev, pdf_s_rev)
    return val, pdf, pdf_rev


def _cos_at(vtype, ns, w):
    """|cos| at a vertex toward w (1 at medium vertices)."""
    return jnp.where(vtype == VT_MED, 1.0, jnp.abs(dot(ns, w)))


def _trace_subpath(scene: Scene, cfg, o, d, med0, alpha0, dvcm0, dvc0,
                   key, transport, n_steps, rand_tile=1):
    """Shared subpath walk; returns per-step vertex records [steps, N].

    rand_tile > 1: the N lanes hold `rand_tile` equal groups and every
    random draw is tiled so lane i of each group sees the SAME randoms
    — base + offset wavefronts replay identical sequences in ONE
    traced strategy loop (a 5x compile-size reduction for G-BDPT)."""
    n = o.shape[0]
    g = n // rand_tile

    def draw(k, shape):
        u = jax.random.uniform(k, (g,) + shape[1:])
        return jnp.tile(u, (rand_tile,) + (1,) * (len(shape) - 1))

    state = dict(o=o, d=d, med=med0, alpha=alpha0,
                 active=jnp.ones((n,), bool),
                 dvcm=dvcm0, dvc=dvc0,
                 pdf_dir_prev=jnp.ones((n,)),
                 null_dist=jnp.zeros((n,)),
                 depth=jnp.zeros((n,), jnp.int32))
    keys = jax.random.split(key, n_steps)

    def body(state, k):
        k_med, k_scat = jax.random.split(k)
        o, d, cur_med = state["o"], state["d"], state["med"]
        active, alpha = state["active"], state["alpha"]

        hit = intersect(scene, o, d)
        t_far = jnp.where(hit.valid, hit.t, jnp.inf)
        u_med = draw(k_med, (n, 2))
        ms = med.sample_distance(scene, cur_med, o, d, t_far,
                                 u_med[:, 0], u_channel=u_med[:, 1])
        mevt = active & ms.success
        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL
        sevt = active & ~ms.success & hit.valid
        store = mevt | (sevt & ~is_null)

        alpha_med = alpha * ms.transmittance / jnp.maximum(
            ms.pdf_success, 1e-20)[..., None]
        alpha_srf = alpha * ms.transmittance / jnp.maximum(
            ms.pdf_failure, 1e-20)[..., None]

        # --- MIS propagation over the segment (SmallVCM):
        # dVCM *= d^2 ; dVCM, dVC /= cos_at_new_vertex. The distance is
        # accumulated across NULL boundary crossings — using only the
        # last sub-segment breaks the weight partition (systematic bias
        # caught by the golden harness)
        seg_len = state["null_dist"] + jnp.where(mevt, ms.t, t_far)
        cos_new = jnp.where(mevt, 1.0, jnp.abs(dot(hit.ns, d)))
        cos_new = jnp.maximum(cos_new, 1e-6)
        dvcm_at = state["dvcm"] * seg_len * seg_len / cos_new
        dvc_at = state["dvc"] / cos_new

        vtype = jnp.where(mevt, VT_MED,
                          jnp.where(sevt & ~is_null, VT_SURF, VT_NONE))
        p_v = jnp.where(mevt[..., None], ms.p, hit.p)
        alpha_v = jnp.where(mevt[..., None], alpha_med, alpha_srf)

        # emitter data at surface hits (for the s=0 strategy)
        Le = eval_radiance(scene, hit.prim, hit.ng, -d)
        pdf_light_a = pdf_direct_area(scene, hit.prim)

        vert = dict(vtype=vtype.astype(jnp.int32), p=p_v,
                    wi=d, alpha=alpha_v,
                    med=jnp.where(mevt, cur_med, -1),
                    bsdf=jnp.where(sevt, bi, -1).astype(jnp.int32),
                    ns=jnp.where(mevt[..., None], d, hit.ns),
                    dvcm=dvcm_at, dvc=dvc_at,
                    seg_med=cur_med,
                    Le=Le, pdf_light_a=pdf_light_a,
                    depth=state["depth"] + 1,   # scatter count (null
                                                # crossings excluded)
                    is_delta=jnp.zeros((n,), bool))

        # --- scatter ---
        u2 = draw(k_scat, (n, 2))
        wo_med, pdf_phase = ph.sample_phase(scene, cur_med, -d, u2)
        nsf = hit.ns  # true normal: dielectric needs the side sign
        s_ax, t_ax = coordinate_system(nsf)
        wi_loc = to_local(nsf, s_ax, t_ax, -d)
        u3 = draw(k_scat, (n, 3))
        bs = sample_bsdf(scene, bi, wi_loc, u3, transport=transport)
        wo_srf = to_world(nsf, s_ax, t_ax, bs.wo)
        vert["is_delta"] = jnp.where(mevt, False, bs.is_delta)

        wo = jnp.where(mevt[..., None], wo_med, wo_srf)
        pdf_fwd = jnp.where(mevt, pdf_phase, bs.pdf)
        # reverse pdf of sampling back toward the previous vertex
        _, _, pdf_rev = _scatter_eval(
            scene, vtype, bi, jnp.where(mevt, cur_med, -1), hit.ns, d,
            wo, transport)
        cos_out = jnp.where(mevt, 1.0, jnp.abs(dot(nsf, wo)))

        # SmallVCM recursion after scattering (balance heuristic)
        pdf_fwd_s = jnp.maximum(pdf_fwd, 1e-20)
        new_dvc = (cos_out / pdf_fwd_s) * (dvc_at * pdf_rev + dvcm_at)
        new_dvcm = 1.0 / pdf_fwd_s
        # delta scatters: connection strategies vanish
        new_dvc = jnp.where(vert["is_delta"],
                            (cos_out / pdf_fwd_s) * dvc_at * pdf_rev,
                            new_dvc)
        new_dvcm = jnp.where(vert["is_delta"], 0.0, new_dvcm)
        # null passthrough: keep MIS state
        passthrough = sevt & is_null
        new_dvcm = jnp.where(passthrough, state["dvcm"], new_dvcm)
        new_dvc = jnp.where(passthrough, state["dvc"], new_dvc)

        alpha_out = jnp.where(mevt[..., None],
                              alpha_med * ms.sigma_s,
                              alpha_srf * bs.weight)
        crossed = sevt & (dot(wo_srf, hit.ng) * dot(-d, hit.ng) < 0.0)
        new_med = jnp.where(mevt, cur_med,
                            jnp.where(crossed,
                                      medium_transition(scene, hit.prim,
                                                        hit.ng, wo_srf),
                                      cur_med))
        new_o = jnp.where(mevt[..., None], ms.p,
                          hit.p + hit.ng * jnp.sign(
                              dot(hit.ng, wo, keepdims=True)) * RAY_EPS)
        new_depth = state["depth"] + store.astype(jnp.int32)
        dead = (~mevt & ~sevt) | (new_depth >= cfg.max_depth) \
            | (jnp.max(alpha_out, axis=-1) <= 0.0)
        new_state = dict(
            o=new_o, d=wo, med=new_med,
            alpha=jnp.where(active[..., None], alpha_out, alpha),
            active=active & ~dead,
            dvcm=new_dvcm, dvc=new_dvc,
            pdf_dir_prev=pdf_fwd,
            null_dist=jnp.where(passthrough, seg_len, 0.0),
            depth=new_depth)
        # mark records from inactive lanes invalid
        vert["vtype"] = jnp.where(active, vert["vtype"], VT_NONE)
        return new_state, vert

    _, verts = lax.scan(body, state, keys)
    return verts


def _connect(scene: Scene, cv, le):
    """Camera vertex cv x light endpoint le (module-level so G-BDPT can
    re-run connection sweeps on SHIFTED camera vertices,
    gbdpt_proc.cpp:606 analog).

    le: dict with p, is_emitter, vtype, ns, bsdf, med, wi, alpha,
    dvcm, dvc, valid. Returns the MIS-weighted contribution [N,3].
    """
    seg = le["p"] - cv["p"]
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    dist = jnp.sqrt(d2)
    wl = seg / dist[..., None]

    cv_val, cv_pdf, cv_pdf_rev = _scatter_eval(
        scene, cv["vtype"], cv["bsdf"], cv["med"], cv["ns"],
        cv["wi"], wl, "radiance")

    # light endpoint value/pdfs toward the camera vertex
    cos_le = jnp.maximum(dot(le["ns"], -wl), 0.0)
    em_val = jnp.where((cos_le > 0)[..., None],
                       le.get("radiance", jnp.zeros_like(le["alpha"])),
                       0.0)
    em_pdf = cos_le / jnp.pi
    sc_val, sc_pdf, _ = _scatter_eval(
        scene, le["vtype"], le["bsdf"], le["med"], le["ns"],
        le["wi"], -wl, "importance")
    # reverse pdf at the light vertex: resample its own incoming
    # edge given arrival from the camera side
    _, sc_pdf_rev, _ = _scatter_eval(
        scene, le["vtype"], le["bsdf"], le["med"], le["ns"],
        wl, -le["wi"], "importance")
    is_em = le["is_emitter"]
    le_val = jnp.where(is_em[..., None], em_val, sc_val)
    le_pdf = jnp.where(is_em, em_pdf, sc_pdf)

    cos_l = jnp.where(is_em | (le["vtype"] == VT_SURF),
                      jnp.abs(dot(le["ns"], wl)), 1.0)
    cos_c = _cos_at(cv["vtype"], cv["ns"], wl)
    G = cos_l / d2  # camera-side cosine already in cv_val

    p_start = cv["p"] + jnp.where(
        (cv["vtype"] == VT_SURF)[..., None],
        cv["ns"] * jnp.sign(dot(cv["ns"], wl, keepdims=True))
        * RAY_EPS, 0.0)
    tr = segment_transmittance(
        scene, p_start, le["p"],
        jnp.where(cv["vtype"] == VT_MED, cv["med"], cv["seg_med"]))

    contrib = cv["alpha"] * cv_val * le["alpha"] * le_val * tr \
        * G[..., None]

    pdf_cam_to_l_area = cv_pdf * cos_l / d2
    pdf_l_to_cam_area = le_pdf * cos_c / d2
    w_light = jnp.where(
        is_em,
        pdf_cam_to_l_area * le["dvcm"],      # = pdfA/pdf_area (s=1)
        pdf_cam_to_l_area * (le["dvcm"] + sc_pdf_rev * le["dvc"]))
    w_cam = pdf_l_to_cam_area * (cv["dvcm"] + cv_pdf_rev * cv["dvc"])
    w = 1.0 / (1.0 + w_light + w_cam)

    ok = le["valid"] & (cv["vtype"] != VT_NONE) & ~cv["is_delta"] \
        & (jnp.max(contrib, axis=-1) > 0) & (cos_l > 1e-6)
    return jnp.where(ok[..., None], contrib * w[..., None], 0.0)


def _select_depth(verts, kdep):
    """Per-lane record of the kdep-th STORED vertex of a [S, N] subpath
    (depth is unique per stored record; null crossings store nothing).
    Adds 'exists' [N]."""
    take = (verts["vtype"] != VT_NONE) & (verts["depth"] == kdep)

    def pick(a):
        w = take
        while w.ndim < a.ndim:
            w = w[..., None]
        if a.dtype == jnp.bool_:
            return jnp.any(w & a, axis=0)
        return jnp.sum(jnp.where(w, a, 0), axis=0)

    out = {f: pick(verts[f]) for f in verts}
    out["exists"] = jnp.any(take, axis=0)
    return out


def radiance(scene: Scene, cfg: VolPathConfig, px, py, k):
    """Full BDPT estimate for pixel coords (px, py) with key k; [n,3].

    All randomness derives from k and the lane index only — evaluating
    this at offset pixel grids with the SAME k replays identical camera
    and light subpath random sequences (the PSS fallback shift of
    gbdpt.py)."""
    return radiance_parts(scene, cfg, px, py, k)["L"]


def radiance_parts(scene: Scene, cfg: VolPathConfig, px, py, k,
                   rand_tile=1):
    """BDPT estimate split into the buckets the G-BDPT path-space shift
    needs (gbdpt_proc.cpp:606 createShiftedLightPath analog — here the
    CAMERA subpath is shifted and the light subpath shared):

      very_direct — s=0 at camera depth 1 (excluded from gradients,
                    like gpt's -direct buffer)
      t1   — connections whose camera vertex is v1 (re-evaluated at the
             offset's own first vertex)
      t2c  — connections whose camera vertex is v2 (re-evaluated with
             the offset incoming direction after reconnection)
      s0d2 — s=0 at depth 2 (offset ratio = reconnection ratio only)
      rest — everything deeper (ratio = reconnection x at-v2 scatter)

    plus v1/v2/v3 per-lane records (_select_depth), the light-subpath
    records and the s=1 emitter endpoint, so gbdpt can run offset
    connection sweeps without retracing."""
    n = px.shape[0]
    g = n // rand_tile
    k_pix, k_cam, k_le, k_lw = jax.random.split(k, 4)

    def draw(kk, shape):
        u = jax.random.uniform(kk, (g,) + shape[1:])
        return jnp.tile(u, (rand_tile,) + (1,) * (len(shape) - 1))

    n_steps = cfg.max_depth + cfg.null_bounces

    # ---- camera subpath ----
    o, d, _ = generate_rays(scene, px, py, draw(k_pix, (n, 2)))
    cam = _trace_subpath(scene, cfg, o, d,
                         jnp.broadcast_to(scene.cam_medium, (n,)),
                         jnp.ones((n, 3)),
                         jnp.zeros((n,)),   # dVCM=0: t=1 excluded
                         jnp.zeros((n,)),
                         k_cam, "radiance", n_steps,
                         rand_tile=rand_tile)

    # ---- light subpath (rand_tile: IDENTICAL across lane groups —
    # G-BDPT's shared light subpath) ----
    es = sample_position(scene, draw(k_le, (n, 3)))
    d0, pdf_dir0 = sample_direction(scene, es, draw(k_le, (n, 2)))
    cos_e = jnp.maximum(dot(es.n, d0), 1e-6)
    emission_pdf = jnp.maximum(es.pdf_area * pdf_dir0, 1e-20)
    alpha_l0 = es.radiance * (cos_e / emission_pdf)[..., None]
    alpha_l0 = jnp.where(es.valid[..., None], alpha_l0, 0.0)
    dvcm_l0 = es.pdf_area / emission_pdf
    dvc_l0 = cos_e / emission_pdf
    med_l0 = medium_transition(scene, es.prim, es.n, d0)
    lt = _trace_subpath(scene, cfg, es.p + es.n * RAY_EPS, d0, med_l0,
                        alpha_l0, dvcm_l0, dvc_l0, k_lw, "importance",
                        n_steps, rand_tile=rand_tile)

    L = jnp.zeros((n, 3))
    buckets = {kk: jnp.zeros((n, 3))
               for kk in ("very_direct", "t1", "t2c", "s0d2", "rest")}

    def bucket_of(depth_arr, c, s0=False):
        """Route a contribution to its shift bucket by camera depth."""
        d1 = (depth_arr == 1)[..., None]
        d2 = (depth_arr == 2)[..., None]
        if s0:
            buckets["very_direct"] += jnp.where(d1, c, 0.0)
            buckets["s0d2"] += jnp.where(d2, c, 0.0)
            buckets["rest"] += jnp.where(~d1 & ~d2, c, 0.0)
        else:
            buckets["t1"] += jnp.where(d1, c, 0.0)
            buckets["t2c"] += jnp.where(d2, c, 0.0)
            buckets["rest"] += jnp.where(~d1 & ~d2, c, 0.0)

    # ---- s = 0: camera path hits an emitter ----
    # weight: 1 / (1 + directPdfA*dVCM + emissionPdfW*dVC)
    for tci in range(n_steps):
        vt = jax.tree_util.tree_map(lambda a: a[tci], cam)
        hit_light = (vt["vtype"] == VT_SURF) \
            & (jnp.max(vt["Le"], axis=-1) > 0)
        # emissionPdfW for the reverse direction at the light
        cos_l = jnp.maximum(jnp.abs(dot(vt["ns"], vt["wi"])), 1e-6)
        em_pdf_w = vt["pdf_light_a"] * (cos_l / jnp.pi)
        w = 1.0 / (1.0 + vt["pdf_light_a"] * vt["dvcm"]
                   + em_pdf_w * vt["dvc"])
        w = jnp.where(tci == 0, 1.0, w)
        c0 = jnp.where(hit_light[..., None],
                       vt["alpha"] * vt["Le"] * w[..., None], 0.0)
        L = L + c0
        bucket_of(vt["depth"], c0, s0=True)

    # ---- connections: camera vertex (t) x light vertex (s) ----
    def connect(cv, le):
        return _connect(scene, cv, le)

    # the s=1 endpoint: the emitter sample itself
    le_emitter = dict(
        p=es.p, is_emitter=jnp.ones((n,), bool),
        vtype=jnp.full((n,), VT_SURF, jnp.int32),
        ns=es.n, bsdf=jnp.zeros((n,), jnp.int32),
        med=jnp.full((n,), -1, jnp.int32), wi=es.n,
        alpha=1.0 / jnp.maximum(es.pdf_area, 1e-20)[..., None]
        * jnp.ones((n, 3)),
        radiance=es.radiance,
        dvcm=1.0 / jnp.maximum(es.pdf_area, 1e-20),  # w_light -> pdfA/pA
        dvc=jnp.zeros((n,)), valid=es.valid)

    # Strategy gating is per-LANE on scatter depth, not on scan-step
    # index: null boundary crossings occupy scan steps without adding a
    # path vertex, so with media inside null shells step index > depth
    # and static index gates would drop valid connections. The static
    # skip below only prunes (tci, sli) pairs whose MINIMUM possible
    # depths already exceed max_depth.
    nb = cfg.null_bounces
    for tci in range(n_steps):
        cv = jax.tree_util.tree_map(lambda a: a[tci], cam)
        if max(1, tci + 1 - nb) + 1 > cfg.max_depth + 1:
            continue
        dep_ok = cv["depth"] + 1 <= cfg.max_depth + 1
        cve = dict(cv)
        cve["vtype"] = jnp.where(dep_ok, cv["vtype"], VT_NONE)
        c1 = connect(cve, le_emitter)
        L = L + c1
        bucket_of(cv["depth"], c1)

        for sli in range(n_steps):
            if max(1, tci + 1 - nb) + max(1, sli + 1 - nb) \
                    > cfg.max_depth:
                continue
            lv = jax.tree_util.tree_map(lambda a: a[sli], lt)
            conn_ok = cv["depth"] + lv["depth"] <= cfg.max_depth
            le = dict(p=lv["p"], is_emitter=jnp.zeros((n,), bool),
                      vtype=lv["vtype"], ns=lv["ns"], bsdf=lv["bsdf"],
                      med=lv["med"], wi=lv["wi"], alpha=lv["alpha"],
                      dvcm=lv["dvcm"], dvc=lv["dvc"],
                      valid=(lv["vtype"] != VT_NONE) & ~lv["is_delta"]
                      & conn_ok)
            cc = connect(cv, le)
            L = L + cc
            bucket_of(cv["depth"], cc)

    return dict(L=L, cam=cam, lt=lt, es=es, le_emitter=le_emitter,
                v1=_select_depth(cam, 1), v2=_select_depth(cam, 2),
                v3=_select_depth(cam, 3), **buckets)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_pass(scene: Scene, cfg: VolPathConfig, seed, it):
    H, W = scene.height, scene.width
    k = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    return radiance(scene, cfg, px, py, k).reshape(H, W, 3)


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0):
    img = jnp.zeros((scene.height, scene.width, 3))
    for it in range(cfg.spp):
        img = img + render_pass(scene, cfg, seed, it)
    return img / cfg.spp
