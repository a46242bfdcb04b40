"""G-BDPT: gradient-domain bidirectional path tracing with media.

reference: src/integrators/gbdpt/ (GBDPTRenderer gbdpt_proc.cpp:48 —
base BDPT path per pixel + 4 offset paths by shifting the camera
subpath, hard-coded 4-neighbor set gbdpt_proc.cpp:103,276, per-strategy
Jacobians, Poisson reconstruction in gbdpt.cpp).

TPU design (round 4 — PATH-SPACE camera shift, createShiftedLightPath
analog gbdpt_proc.cpp:606): the light subpath is SHARED between base
and offsets (same key). The offset camera subpath is the base's shifted
by RECONNECTION AT THE FIRST VERTEX: the offset pixel ray finds its own
first vertex v1', then reconnects straight to the base's second vertex
v2 — vertices from v2 on are shared, so per-strategy work splits into

  t=1  — connections re-run at v1' (bdpt._connect sweeps over the
         shared light subpath; s=0 'very direct' excluded from
         gradients like the reference / gpt's -direct buffer)
  t=2  — connections re-run at v2 with the offset incoming direction
         and the camera throughput scaled by the reconnection ratio
         R = [f1' G' Tr'] / [f1 G Tr] (area-measure Jacobian 1: the
         reconnection target v2 is shared)
  t>=3 — base contributions x R x f2(wi'->wo2)/f2(wi->wo2) (the
         RECENTLY_CONNECTED factor at v2; wo2 from the stored v3)

MIS over the base/offset pair: balance weight w = 1/(1 + pr) with
pr = pdfA(v1'->v2)/pdfA(v1->v2) (+ sub-strategy weights inherited from
the base partition — any convex partition keeps the pair estimator
unbiased). Lanes whose first-vertex pair is not diffuse-classified
(specular/delta v1 or v1', or no v2) fall back to the PSS identity
replay with weight 1/2 — the round-1 shift, now only a fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import VolPathConfig
from ..core.math import dot
from ..ops import poisson
from ..render.bsdf import is_diffuse_like
from ..render.visibility import segment_transmittance
from ..scene.camera import generate_rays
from . import bdpt
from .bdpt import VT_MED, VT_NONE, VT_SURF, _connect, _scatter_eval
from ..scene.types import Scene

OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1))
RIGHT, LEFT, DOWN, UP = 0, 1, 2, 3


def _edge_terms(scene, v_from, v2):
    """Area-measure edge factors v_from -> v2: (value [n,3] = f*|cos| at
    v_from x G x Tr, pdfA [n], ok [n])."""
    seg = v2["p"] - v_from["p"]
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    dist = jnp.sqrt(d2)
    w = seg / dist[..., None]
    fval, fpdf, _ = _scatter_eval(
        scene, v_from["vtype"], v_from["bsdf"], v_from["med"],
        v_from["ns"], v_from["wi"], w, "radiance")
    cos2 = jnp.where(v2["vtype"] == VT_MED, 1.0,
                     jnp.abs(dot(v2["ns"], w)))
    G = cos2 / d2
    tr = segment_transmittance(
        scene, v_from["p"] + jnp.where(
            (v_from["vtype"] == VT_SURF)[..., None],
            v_from["ns"] * jnp.sign(dot(v_from["ns"], w,
                                        keepdims=True)) * 1e-4, 0.0),
        v2["p"],
        jnp.where(v_from["vtype"] == VT_MED, v_from["med"],
                  v2["seg_med"]))
    val = fval * (G[..., None]) * tr
    pdfA = fpdf * G
    ok = (jnp.max(val, axis=-1) >= 0) & (cos2 > 1e-6)
    return val, pdfA, ok, w


def _connect_sweep(scene, cfg, cv, parts, n_steps, depth_at):
    """All connection strategies with the camera vertex pinned to cv
    (camera depth depth_at): s=1 emitter endpoint + s>=2 light-subpath
    vertices, with the same per-lane depth gating as radiance_parts."""
    L = jnp.zeros_like(cv["alpha"])
    dep_ok = depth_at + 1 <= cfg.max_depth + 1
    cve = dict(cv)
    cve["vtype"] = jnp.where(dep_ok, cv["vtype"], VT_NONE)
    L = L + _connect(scene, cve, parts["le_emitter"])
    lt = parts["lt"]
    for sli in range(n_steps):
        lv = jax.tree_util.tree_map(lambda a: a[sli], lt)
        conn_ok = depth_at + lv["depth"] <= cfg.max_depth
        le = dict(p=lv["p"], is_emitter=jnp.zeros(lv["dvcm"].shape,
                                                  bool),
                  vtype=lv["vtype"], ns=lv["ns"], bsdf=lv["bsdf"],
                  med=lv["med"], wi=lv["wi"], alpha=lv["alpha"],
                  dvcm=lv["dvcm"], dvc=lv["dvc"],
                  valid=(lv["vtype"] != VT_NONE) & ~lv["is_delta"]
                  & conn_ok)
        L = L + _connect(scene, cv, le)
    return L


def _diffuse_vertex(scene, v):
    """VertexClassifier: vertex admits reconnection (medium, or surface
    with a non-delta, roughness-above-threshold BSDF)."""
    bi = jnp.clip(v["bsdf"], 0, scene.bsdf_type.shape[0] - 1)
    return v["exists"] & ((v["vtype"] == VT_MED)
                          | ((v["vtype"] == VT_SURF)
                             & is_diffuse_like(scene, bi)))


@functools.partial(jax.jit, static_argnames=("cfg", "shift"))
def render_pass(scene: Scene, cfg: VolPathConfig, seed, it,
                shift="reconnect"):
    """One spp of base + 4 offsets. Returns (primal, gx, gy) [H,W,3].
    shift="pss" forces the identity-replay fallback on every lane
    (round-1 behavior; kept for the variance A/B test)."""
    from .gvpm import _reject_heterogeneous
    _reject_heterogeneous(scene)
    H, W = scene.height, scene.width
    n = H * W
    k = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    n_steps = cfg.max_depth + cfg.null_bounces

    parts = bdpt.radiance_parts(scene, cfg, px, py, k)
    base = parts["L"]
    base_grad = base - parts["very_direct"]
    v1, v2, v3 = parts["v1"], parts["v2"], parts["v3"]

    # base reconnection edge v1 -> v2
    ev_b, pdfA_b, oke_b, w_b = _edge_terms(scene, v1, v2)
    d1_ok = _diffuse_vertex(scene, v1) & v2["exists"]
    # at-v2 outgoing direction (toward v3) for the t>=3 scatter ratio
    wo2 = v3["p"] - v2["p"]
    wo2 = wo2 / jnp.maximum(
        jnp.linalg.norm(wo2, axis=-1, keepdims=True), 1e-12)
    f2_b, _, _ = _scatter_eval(scene, v2["vtype"], v2["bsdf"],
                               v2["med"], v2["ns"], v2["wi"], wo2,
                               "radiance")

    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    border = [xi == W - 1, xi == 0, yi == H - 1, yi == 0]

    S, Wb = [], []
    for i, (dx, dy) in enumerate(OFFSETS):
        # the offset camera subpath with the SAME randoms: its parts
        # carry v1' for the reconnection AND its full PSS-identity
        # estimate for the fallback lanes
        op = bdpt.radiance_parts(scene, cfg, px + dx, py + dy, k)
        L_pss = op["L"]
        v1p = op["v1"]
        rc_ok = d1_ok & _diffuse_vertex(scene, v1p) & oke_b
        if shift == "pss":
            rc_ok = jnp.zeros_like(rc_ok)

        # offset reconnection edge v1' -> v2 (shared target: area
        # Jacobian 1)
        ev_o, pdfA_o, oke_o, w_o = _edge_terms(scene, v1p, v2)
        rc_ok = rc_ok & oke_o & (jnp.max(ev_b, axis=-1) > 0)
        R = jnp.where(rc_ok[..., None],
                      ev_o / jnp.maximum(ev_b, 1e-20), 0.0)
        R = jnp.clip(R, 0.0, 1e6)
        pr = jnp.where(rc_ok,
                       jnp.clip(pdfA_o / jnp.maximum(pdfA_b, 1e-20),
                                1e-4, 1e4), 1.0)

        # t=1: connections at the offset's own first vertex
        L_t1p = _connect_sweep(scene, cfg, v1p, parts, n_steps,
                               v1p["depth"])
        # t=2: connections at v2 with the offset incoming direction
        cv2p = dict(v2)
        cv2p["wi"] = w_o
        cv2p["alpha"] = v2["alpha"] * R
        L_t2p = _connect_sweep(scene, cfg, cv2p, parts, n_steps,
                               v2["depth"])
        # t>=3: base bucket x R x at-v2 scatter ratio
        f2_o, _, _ = _scatter_eval(scene, v2["vtype"], v2["bsdf"],
                                   v2["med"], v2["ns"], w_o, wo2,
                                   "radiance")
        r2s = jnp.where(rc_ok[..., None],
                        f2_o / jnp.maximum(f2_b, 1e-20), 0.0)
        r2s = jnp.clip(r2s, 0.0, 1e6)
        L_rc = (L_t1p + L_t2p + parts["s0d2"] * R
                + parts["rest"] * R * r2s)

        L_off_grad = jnp.where(rc_ok[..., None], L_rc,
                               L_pss - op["very_direct"])
        w = jnp.where(rc_ok, 1.0 / (1.0 + pr), 0.5)[..., None]
        w = jnp.where(border[i][..., None], 1.0, w)
        S.append(w * L_off_grad)
        Wb.append(w * base_grad)

    def img(a):
        return a.reshape(H, W, 3)

    gx = img(S[RIGHT] - Wb[RIGHT])
    gx = gx.at[:, :-1].add(img(Wb[LEFT] - S[LEFT])[:, 1:])
    gy = img(S[DOWN] - Wb[DOWN])
    gy = gy.at[:-1, :].add(img(Wb[UP] - S[UP])[1:, :])
    return img(base), gx, gy


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           callback=None, recon_alpha=0.2, recon_l1=True,
           recon_iters=50):
    """Progressive G-BDPT: average primal/gradients, reconstruct."""
    H, W = scene.height, scene.width
    acc = [jnp.zeros((H, W, 3)) for _ in range(3)]
    for it in range(cfg.spp):
        p, gx, gy = render_pass(scene, cfg, seed, it)
        acc = [acc[0] + p, acc[1] + gx, acc[2] + gy]
        if callback is not None:
            callback(it, acc[0] / (it + 1))
    primal, gx, gy = [a / cfg.spp for a in acc]
    recon = poisson.solve(primal, gx, gy, alpha=recon_alpha,
                          iters=recon_iters, l1=recon_l1)
    return dict(image=recon, primal=primal, gx=gx, gy=gy)
