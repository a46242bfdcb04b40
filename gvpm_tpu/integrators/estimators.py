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
                   radius_scale, max_per_cell=32):
    """Radiance at gather points from surface photons.

    gps: GatherPoints; pp: flattened photon positions [P,3]; pv: dict of
    flattened LightVertices fields; returns [N,3] (premultiplied by gp.thr).
    """
    r = gps.radius * radius_scale
    s_ax, t_ax = coordinate_system(gps.ns)
    wo_loc = to_local(gps.ns, s_ax, t_ax, gps.wo)

    def fold(acc, idx, ok, scale):
        d2 = jnp.sum((pp[idx] - gps.p) ** 2, axis=-1)
        is_surf = pv["vtype"][idx] == 1
        wi_p = pv["wi"][idx]                      # arriving propagation dir
        # photon must come from the GP's front side
        front = dot(gps.ns, -wi_p) > 1e-4
        inside = ok & is_surf & (d2 < r * r) & front & gps.valid
        wi_loc = to_local(gps.ns, s_ax, t_ax, -wi_p)
        f, _ = eval_bsdf(scene, gps.bsdf, wo_loc, wi_loc)
        k2 = INV_PI / jnp.maximum(r * r, 1e-12)
        contrib = pv["alpha"][idx] * f * (k2 * scale)[..., None]
        return acc + jnp.where(inside[..., None], contrib, 0.0)

    acc = hashgrid.gather(grid, gps.p, fold, jnp.zeros_like(gps.thr),
                          max_per_cell=max_per_cell)
    return gps.thr * acc / n_emitted


# --------------------------------------------------------------------------
# volume photon points: distance sampling + 3D kernel
# --------------------------------------------------------------------------

def volume_distance_gather(scene: Scene, beams_cam, grid, pp, pv,
                           n_emitted, r_vol, key, n_samples=2,
                           max_per_cell=32):
    """VPM: for each camera-beam segment, sample forced-interaction
    distances, 3D-kernel gather of medium photons at each point.

    beams_cam: flattened camera segments dict with fields valid,o,d,length,
    med,thr,pixel. Returns (contribution [M,3], pixel [M]).
    """
    o, d = beams_cam["o"], beams_cam["d"]
    length = beams_cam["length"]
    mi = beams_cam["med"]
    valid = beams_cam["valid"]
    m = o.shape[0]

    def one_sample(k):
        u = jax.random.uniform(k, (m,))
        ms = med.sample_distance(scene, mi, o, d, length, u,
                                 strategy=med.ALWAYS_VALID)
        x = ms.p
        sok = valid & ms.success

        def fold(acc, idx, ok, scale):
            d2 = jnp.sum((pp[idx] - x) ** 2, axis=-1)
            is_med = pv["vtype"][idx] == 2
            inside = ok & is_med & (d2 < r_vol * r_vol) & sok
            pf = ph.eval_phase(scene, mi, -pv["wi"][idx], -d)
            k3 = 3.0 / (4.0 * jnp.pi * jnp.maximum(r_vol ** 3, 1e-18))
            contrib = pv["alpha"][idx] * (pf * k3 * scale)[..., None]
            return acc + jnp.where(inside[..., None], contrib, 0.0)

        Li = hashgrid.gather(grid, x, fold, jnp.zeros((m, 3)),
                             max_per_cell=max_per_cell)
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

def bre_gather(scene: Scene, beams_cam, grid, pp, pv, n_emitted, r_vol,
               max_steps=48, max_per_cell=16):
    """BRE: deterministic integral of photon discs along camera segments.

    Grid must be built with cell_size = 2*r_vol. The segment is marched in
    steps of r_vol; a photon contributes at the step whose t-interval
    contains its ray foot-point — visited exactly once.
    """
    o, d = beams_cam["o"], beams_cam["d"]
    length = beams_cam["length"]
    mi = beams_cam["med"]
    valid = beams_cam["valid"]
    m = o.shape[0]
    _, sigma_s, st = med._tables(scene, mi)

    step = r_vol

    def body(k, acc):
        t_mid = (k + 0.5) * step
        x = o + d * t_mid
        live = valid & (t_mid - 0.5 * step < length)

        def fold(a, idx, ok, scale):
            is_med = pv["vtype"][idx] == 2
            rel = pp[idx] - o
            t_proj = dot(rel, d)
            in_step = (t_proj >= k * step) & (t_proj < (k + 1) * step) \
                & (t_proj >= 0.0) & (t_proj <= length)
            perp = rel - d * t_proj[..., None]
            d2 = jnp.sum(perp * perp, axis=-1)
            inside = ok & is_med & in_step & (d2 < r_vol * r_vol) & live
            pf = ph.eval_phase(scene, mi, -pv["wi"][idx], -d)
            tr = jnp.exp(-st * t_proj[..., None])
            k2 = INV_PI / jnp.maximum(r_vol * r_vol, 1e-12)
            contrib = pv["alpha"][idx] * sigma_s * tr \
                * (pf * k2 * scale)[..., None]
            return a + jnp.where(inside[..., None], contrib, 0.0)

        return hashgrid.gather(grid, x, fold, acc,
                               max_per_cell=max_per_cell)

    acc = lax.fori_loop(0, max_steps, body, jnp.zeros((m, 3)))
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
        tc = (-f1 + b * f2) / den
        tb = (b * (-f1) + f2) / den
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
        k1 = 1.0 / (2.0 * r_beam)
        w = (pf * k1 / sin_theta)[..., None] * tr_c * tr_b \
            * sigma_s[:, None, :]
        contrib = jnp.where(ok[..., None], tab[None] * w, 0.0)
        return acc + jnp.sum(contrib, axis=1), None

    acc, _ = lax.scan(tile_step, jnp.zeros((m, 3)),
                      (ob, db, Lb, ab, vb, mb))
    return beams_cam["thr"] * acc / n_emitted, beams_cam["pixel"]
