"""Gather-point generation: camera paths traced to the first diffuse vertex.

reference: GVPMRadiusInitializer::regeneratePositionAndRadius +
randomWalkFromPixelToFirstDiffuse (gvpm_gatherpoint.h:22,259) and the SPPM
camera-beam storage (photonmapper/utilities/initializeRadius.h:159-190).

TPU design: one lane per pixel sample; a lax.scan walks every lane through
specular/null bounces in lockstep until a diffuse-like vertex (roughness >=
bounce_roughness, VertexClassifier gvpm_struct.h:46) is found. Camera rays
do NOT scatter in media (long-beam transmittance); instead each step emits
a camera-beam segment record for the volume estimators.

Gather radius comes from the pixel footprint (ray differentials,
gvpm_gatherpoint.h:238): r = spread x path distance x initial_scale.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import PhotonConfig
from ..core.math import coordinate_system, dot, to_local, to_world
from ..render import medium as med
from ..render.bsdf import is_diffuse_like, sample_bsdf
from ..render.emitter import eval_radiance
from ..render.visibility import medium_transition
from ..scene.camera import generate_rays
from ..scene.intersect import intersect
from ..scene.types import BSDF_NULL, Scene

RAY_EPS = 1e-4


@flax.struct.dataclass
class GatherPoints:
    valid: jnp.ndarray     # [N] found a diffuse vertex
    p: jnp.ndarray         # [N,3]
    ns: jnp.ndarray        # [N,3] shading normal (faces the camera path)
    wo: jnp.ndarray        # [N,3] direction GP -> previous camera vertex
    bsdf: jnp.ndarray      # [N] int32
    thr: jnp.ndarray       # [N,3] camera throughput at the GP
    radius: jnp.ndarray    # [N] gather radius (unscaled by pass schedule)
    emission: jnp.ndarray  # [N,3] directly-seen emission along the path
    pixel: jnp.ndarray     # [N] int32 flat pixel id
    depth: jnp.ndarray     # [N] camera path scatter count at GP
    med: jnp.ndarray       # [N] int32 medium at the GP
    pdf_prod: jnp.ndarray  # [N] product of BSDF sample pdfs along the
    #   camera subpath up to the GP (sensorMIS ratio, gvpm_struct.h:608)


@flax.struct.dataclass
class CameraBeams:
    """Medium segments of the camera paths (camera beams).

    reference: Beam struct sppm.cpp:38 + initializeRadius.h:159-190.
    """
    valid: jnp.ndarray   # [S,N]
    o: jnp.ndarray       # [S,N,3]
    d: jnp.ndarray       # [S,N,3]
    length: jnp.ndarray  # [S,N]
    med: jnp.ndarray     # [S,N] int32
    thr: jnp.ndarray     # [S,N,3] camera throughput at segment start
    pixel: jnp.ndarray   # [S,N] int32
    spread: jnp.ndarray  # [S,N] pixel footprint angular rate at seg start
    pdf_prod: jnp.ndarray  # [S,N] camera-subpath pdf product at seg start
    depth: jnp.ndarray   # [S,N] int32 camera scatter count at seg start
    #   (a medium vertex sampled ON the segment has camera depth
    #    depth+1 — the per-pair minDepth gate needs it,
    #    shift_volume_photon.cpp:672)


def trace(scene: Scene, cfg: PhotonConfig, key, px, py, rand_tile=1):
    """Trace gather points for pixel coords px, py (flattened [N]).

    rand_tile > 1: px/py hold `rand_tile` pixel groups of equal size and
    every random draw is tiled so lane i of each group sees the SAME
    randoms — the one-wavefront form of tracing the base + 4 offset
    camera paths with identical random sequences (shift_cameraPath.h
    same-structure retrace), which keeps the machine busy with one
    [5n]-ray wavefront instead of five [n]-ray launches."""
    n = px.shape[0]
    assert n % rand_tile == 0
    g = n // rand_tile

    # randoms keyed by the BASE group's pixel id, not lane position:
    # device-count invariant (rng.lane_uniform) and shared across the
    # offset groups (same-structure retrace needs identical sequences)
    from ..core import rng as _rng
    pix_base = (py[:g].astype(jnp.int32) * scene.width
                + px[:g].astype(jnp.int32))

    def draw(k, shape):
        u = _rng.lane_uniform(k, pix_base, shape[1:])
        return jnp.tile(u, (rand_tile,) + (1,) * (len(shape) - 1))

    k_pix, k_walk = jax.random.split(key)
    u = draw(k_pix, (n, 2))
    o, d, spread = generate_rays(scene, px, py, u)
    pixel = (py.astype(jnp.int32) * scene.width + px.astype(jnp.int32))

    state = dict(
        o=o, d=d, med=jnp.broadcast_to(scene.cam_medium, (n,)),
        thr=jnp.ones((n, 3)), dist=jnp.zeros((n,)),
        pdfp=jnp.ones((n,)),
        active=jnp.ones((n,), bool),
        emission=jnp.zeros((n, 3)),
        depth=jnp.zeros((n,), jnp.int32),
        gp=dict(valid=jnp.zeros((n,), bool), p=jnp.zeros((n, 3)),
                ns=jnp.zeros((n, 3)), wo=jnp.zeros((n, 3)),
                bsdf=jnp.zeros((n,), jnp.int32), thr=jnp.zeros((n, 3)),
                radius=jnp.zeros((n,)), depth=jnp.zeros((n,), jnp.int32),
                med=jnp.broadcast_to(scene.cam_medium, (n,)),
                pdf_prod=jnp.ones((n,))),
    )
    step_keys = jax.random.split(k_walk, cfg.max_cam_depth)

    def body(state, k):
        o, d, cur_med = state["o"], state["d"], state["med"]
        active, thr = state["active"], state["thr"]

        hit = intersect(scene, o, d)
        alive_hit = active & hit.valid

        # camera-beam segment for this step (long-beam: no scattering)
        seg_len = jnp.where(hit.valid, hit.t, 0.0)
        beam = dict(valid=active & (cur_med >= 0) & (seg_len > 1e-6),
                    o=o, d=d, length=seg_len, med=cur_med, thr=thr,
                    pixel=pixel, spread=spread,
                    pdf_prod=state["pdfp"], depth=state["depth"])

        tr = med.transmittance(scene, cur_med, seg_len)
        thr_h = thr * tr
        dist_h = state["dist"] + seg_len

        # emission pickup (direct display component)
        Le = eval_radiance(scene, hit.prim, hit.ng, -d)
        emission = state["emission"] + jnp.where(
            alive_hit[..., None], thr_h * Le, 0.0)

        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL
        diffuse_like = is_diffuse_like(scene, bi, cfg.bounce_roughness)

        found = alive_hit & diffuse_like & ~is_null

        ns = hit.ns  # true normal (sign-aware BSDF evals)
        gp = state["gp"]
        new_gp = dict(
            valid=jnp.where(found, True, gp["valid"]),
            p=jnp.where(found[..., None], hit.p, gp["p"]),
            ns=jnp.where(found[..., None], ns, gp["ns"]),
            wo=jnp.where(found[..., None], -d, gp["wo"]),
            bsdf=jnp.where(found, bi, gp["bsdf"]),
            thr=jnp.where(found[..., None], thr_h, gp["thr"]),
            radius=jnp.where(found, spread * dist_h * cfg.initial_scale,
                             gp["radius"]),
            depth=jnp.where(found, state["depth"] + 1, gp["depth"]),
            med=jnp.where(found, cur_med, gp["med"]),
            pdf_prod=jnp.where(found, state["pdfp"], gp["pdf_prod"]),
        )

        # continue through specular / null surfaces
        s_ax, t_ax = coordinate_system(ns)
        wi_loc = to_local(ns, s_ax, t_ax, -d)
        u3 = draw(k, (n, 3))
        bs = sample_bsdf(scene, bi, wi_loc, u3)
        wo_w = to_world(ns, s_ax, t_ax, bs.wo)
        cont = alive_hit & ~found & bs.valid

        crossed = dot(wo_w, hit.ng) * dot(-d, hit.ng) < 0.0
        new_med = jnp.where(cont & crossed,
                            medium_transition(scene, hit.prim, hit.ng, wo_w),
                            cur_med)
        new_state = dict(
            o=jnp.where(cont[..., None],
                        hit.p + hit.ng * jnp.sign(
                            dot(hit.ng, wo_w, keepdims=True)) * RAY_EPS, o),
            d=jnp.where(cont[..., None], wo_w, d),
            med=new_med,
            thr=jnp.where(cont[..., None], thr_h * bs.weight, thr),
            pdfp=jnp.where(cont, state["pdfp"]
                           * jnp.maximum(bs.pdf, 1e-20), state["pdfp"]),
            dist=jnp.where(cont, dist_h, state["dist"]),
            active=cont,
            emission=emission,
            depth=state["depth"] + (cont & ~is_null).astype(jnp.int32),
            gp=new_gp,
        )
        return new_state, beam

    state, beams = lax.scan(body, state, step_keys)
    gp = state["gp"]
    gps = GatherPoints(valid=gp["valid"], p=gp["p"], ns=gp["ns"],
                       wo=gp["wo"], bsdf=gp["bsdf"], thr=gp["thr"],
                       radius=jnp.maximum(gp["radius"], 1e-5),
                       emission=state["emission"], pixel=pixel,
                       depth=gp["depth"], med=gp["med"],
                       pdf_prod=gp["pdf_prod"])
    return gps, CameraBeams(**beams)
