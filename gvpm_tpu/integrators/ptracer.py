"""Batched light-path tracing (photon / beam shooting).

Re-designs the reference's particle tracing stack — ParticleProcess /
ParticleTracer (particleproc.h:45,133), GradientPhotonProcess
(gvpm_proc.cpp:66-146) and Path::randomWalk in EImportance mode
(libbidir/path.h:101) — as ONE fixed-shape wavefront: P paths advance in
lockstep through a lax.scan over steps; every step emits one vertex record
per lane (possibly invalid), so the result is a dense [S, P] vertex tensor
that doubles as path storage for gradient shifts (the reference's decision
to keep whole light paths alive for shift replay, gvpm_accel.h:17-28).

Photon power convention: `alpha` stored at a vertex is the power *arriving*
(emission x all previous scatter weights x transmittance/pdf of the last
segment) — the local sigma_s / BSDF is applied at gather time by the
estimators, and folded into alpha only when the walk continues.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import PhotonConfig
from ..core.math import coordinate_system, dot, normalize, to_local, to_world
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import is_diffuse_like, sample_bsdf
from ..render.emitter import sample_photon
from ..render.visibility import medium_transition
from ..scene.types import BSDF_NULL, Scene

RAY_EPS = 1e-4

VERT_NONE = 0
VERT_SURFACE = 1
VERT_MEDIUM = 2


@flax.struct.dataclass
class LightVertices:
    """Per-step vertex records, shape [S, P, ...] (flattenable to [S*P]).

    The parent_* / *_base fields are the gradient-shift caches: everything
    needed to re-evaluate a reconnection of the last path segment without
    replaying the walk (the TPU analog of the reference's decision to keep
    (lightPath, vertexId) provenance in the photon map, gvpm_accel.h:17-28,
    and of PathVertex's cached weights/pdfs, vertex.h).
    """
    vtype: jnp.ndarray    # int32: VERT_*
    p: jnp.ndarray        # [.,3] position
    wi: jnp.ndarray       # [.,3] direction arriving at the vertex (unit,
                          #        pointing FROM prev vertex TO this one)
    alpha: jnp.ndarray    # [.,3] power arriving at the vertex
    med: jnp.ndarray      # int32 medium at the vertex (-1 at surfaces)
    seg_med: jnp.ndarray  # int32 medium TRAVERSED on the segment arriving
                          #       here (what transmittance was paid in)
    bsdf: jnp.ndarray     # int32 bsdf at surface vertices (-1 else)
    ns: jnp.ndarray       # [.,3] shading normal (surface only)
    prim: jnp.ndarray     # int32 primitive id (surface only; -1 else) —
                          #       the ME shift retraces specular chains
                          #       against these prims (manifold.py)
    path: jnp.ndarray     # int32 path id (lane)
    depth: jnp.ndarray    # int32 scatter count at this vertex (1 = first)
    # ---- shift caches: parent vertex + base-segment quantities ----
    parent_p: jnp.ndarray      # [.,3] previous stored vertex (or emitter)
    parent_type: jnp.ndarray   # int32 VERT_NONE=emitter,SURFACE,MEDIUM
    parent_wi: jnp.ndarray     # [.,3] direction arriving at the parent
    parent_ns: jnp.ndarray     # [.,3] normal at parent (emitter/surface)
    parent_bsdf: jnp.ndarray   # int32
    parent_med: jnp.ndarray    # int32 medium at parent (phase eval)
    scatter_base: jnp.ndarray  # [.,3] scatter value at parent toward this
                               #       vertex (sigma_s*p | f*cos | cos_e)
    seg_tr: jnp.ndarray        # [.,3] transmittance of the base segment
    pdf_dir_base: jnp.ndarray  # [.] solid-angle pdf of the base direction
    pdf_dist_base: jnp.ndarray # [.] distance pdf of the base segment
                               #     (incl. null-crossing failure factors)
    reconnectable: jnp.ndarray # [.] bool: parent admits a reconnection
                               #     shift (diffuse-like / medium / emitter)
    parent_idx: jnp.ndarray    # [.] int32 FLAT index (step*P + lane) of the
                               #     parent's own vertex record; -1 when the
                               #     parent is the emitter. Chain walks for
                               #     the manifold shift follow these.


@flax.struct.dataclass
class LightBeams:
    """Medium-traversing segments of light paths (photon beams).

    reference: LTBeamMap::tryAppendLT stores every medium edge
    (gvpm_beams.h:54-84). alpha is the power at the segment START; the
    1D/3D beam estimators apply transmittance along the segment.
    """
    valid: jnp.ndarray    # [S,P] bool
    o: jnp.ndarray        # [S,P,3] segment origin
    d: jnp.ndarray        # [S,P,3] unit direction
    length: jnp.ndarray   # [S,P]
    alpha: jnp.ndarray    # [S,P,3]
    med: jnp.ndarray      # [S,P] int32 medium of the segment
    path: jnp.ndarray     # [S,P] int32
    depth: jnp.ndarray    # [S,P] int32 scatter count before this edge
    # ---- shift caches: the vertex that EMITS this beam segment ----
    # (reference shiftBeamDiffuse, shift_volume_beams.h:408-457: the
    # offset beam keeps this origin vertex and re-samples its direction;
    # the ratios need the origin's scatter lobe and pdf.)
    parent_p: jnp.ndarray      # [S,P,3] scatter vertex the beam leaves
    parent_type: jnp.ndarray   # [S,P] int32 VERT_NONE(emitter)/SURF/MED
    parent_wi: jnp.ndarray     # [S,P,3] direction arriving at that vertex
    parent_ns: jnp.ndarray     # [S,P,3]
    parent_bsdf: jnp.ndarray   # [S,P] int32
    parent_med: jnp.ndarray    # [S,P] int32
    scatter_base: jnp.ndarray  # [S,P,3] scatter value toward d
    pdf_dir_base: jnp.ndarray  # [S,P]
    reconnectable: jnp.ndarray  # [S,P] bool: origin lobe admits a
    #   direction re-sample AND the segment starts at the vertex itself
    #   (false after a null-boundary crossing, where o != parent_p)
    parent_idx: jnp.ndarray    # [S,P] int32 flat index of the origin
    #   vertex's own record (-1 = emitter) — ME chain walks start here
    at_origin: jnp.ndarray     # [S,P] bool: segment leaves the vertex


def shoot(scene: Scene, cfg: PhotonConfig, n_paths: int, key,
          path_offset=None):
    """Trace n_paths light paths; returns (LightVertices, LightBeams).

    Normalization: estimators divide by n_paths (photon count), matching
    the reference's per-emitted-path scaling (GatherPhotonProcess).

    path_offset (optional int): randoms become functions of
    (key, path_offset + lane) instead of lane position — sharded
    shooters passing the SAME key and their global path offset produce
    the identical global photon set at any device count (the
    'deterministic mode' contract, core/rng.py)."""
    from ..core import rng as _rng
    n = n_paths
    n_steps = cfg.max_depth + cfg.null_bounces
    k_emit, k_walk = jax.random.split(key, 2)
    lanes = (None if path_offset is None
             else path_offset + jnp.arange(n, dtype=jnp.int32))

    def draw(k, shape):
        if lanes is None:
            return jax.random.uniform(k, shape)
        return _rng.lane_uniform(k, lanes, shape[1:])

    # --- emission across all emitter groups (area | delta | env) ---------
    em = sample_photon(scene, k_emit, n, lanes=lanes)
    alpha0 = jnp.where(em["valid"][..., None], em["alpha"], 0.0)

    state = dict(
        o=em["p"], d=em["d"], med=em["med"], alpha=alpha0,
        active=em["valid"],
        depth=jnp.zeros((n,), jnp.int32),
        # parent caches (start at the emitter; cosine emission lobe for
        # area lights; delta/env parents are non-reconnectable)
        pp_p=em["p"], pp_type=jnp.zeros((n,), jnp.int32),
        pp_wi=em["ns"], pp_ns=em["ns"],
        pp_bsdf=jnp.full((n,), -1, jnp.int32), pp_med=em["med"],
        pp_scatter=em["scatter"],
        pp_pdf_dir=em["pdf_dir"], pp_reconn=em["reconnectable"],
        pp_idx=jnp.full((n,), -1, jnp.int32),
        pp_at_origin=jnp.ones((n,), bool),
        seg_tr=jnp.ones((n, 3)), seg_pdffail=jnp.ones((n,)),
    )
    step_keys = jax.random.split(k_walk, n_steps)

    from ..scene.intersect import intersect

    def body(carry, k):
        state, step_i = carry
        k_med, k_scat, k_rr = jax.random.split(k, 3)
        o, d, cur_med = state["o"], state["d"], state["med"]
        alpha, active = state["alpha"], state["active"]

        hit = intersect(scene, o, d)
        t_far = jnp.where(hit.valid, hit.t, jnp.inf)
        u_med = draw(k_med, (n, 2))
        ms = med.sample_distance(scene, cur_med, o, d, t_far,
                                 u_med[:, 0], u_channel=u_med[:, 1])

        mevt = active & ms.success
        sevt = active & ~ms.success & hit.valid

        # beam record: the medium edge traversed this step
        seg_len = jnp.where(ms.success, ms.t, t_far)
        in_scat_med = (cur_med >= 0)
        beam_valid = active & in_scat_med & jnp.isfinite(seg_len) \
            & (seg_len > 1e-6)
        beam = dict(valid=beam_valid, o=o, d=d,
                    length=jnp.where(jnp.isfinite(seg_len), seg_len, 0.0),
                    alpha=alpha, med=cur_med, path=jnp.arange(n, dtype=jnp.int32),
                    depth=state["depth"],
                    parent_p=state["pp_p"], parent_type=state["pp_type"],
                    parent_wi=state["pp_wi"], parent_ns=state["pp_ns"],
                    parent_bsdf=state["pp_bsdf"],
                    parent_med=state["pp_med"],
                    scatter_base=state["pp_scatter"],
                    pdf_dir_base=state["pp_pdf_dir"],
                    reconnectable=state["pp_reconn"]
                    & state["pp_at_origin"],
                    # ME shift provenance (shiftBeamME analog): the
                    # origin vertex's own record index + whether the
                    # segment leaves the vertex itself (chain geometry
                    # is meaningless after a null crossing)
                    parent_idx=state["pp_idx"],
                    at_origin=state["pp_at_origin"])

        # --- vertex record ---
        alpha_in_med = alpha * ms.transmittance / jnp.maximum(
            ms.pdf_success, 1e-20)[..., None]
        alpha_in_surf = alpha * ms.transmittance / jnp.maximum(
            ms.pdf_failure, 1e-20)[..., None]

        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL
        store_surf = sevt & ~is_null

        vtype = jnp.where(mevt, VERT_MEDIUM,
                          jnp.where(store_surf, VERT_SURFACE, VERT_NONE))
        seg_tr_full = state["seg_tr"] * ms.transmittance
        vert = dict(
            vtype=vtype.astype(jnp.int32),
            p=jnp.where(mevt[..., None], ms.p, hit.p),
            wi=d,
            alpha=jnp.where(mevt[..., None], alpha_in_med, alpha_in_surf),
            med=jnp.where(mevt, cur_med, -1),
            seg_med=cur_med,
            bsdf=jnp.where(store_surf, bi, -1).astype(jnp.int32),
            ns=hit.ns,
            prim=jnp.where(store_surf, hit.prim, -1).astype(jnp.int32),
            path=jnp.arange(n, dtype=jnp.int32),
            depth=state["depth"] + 1,
            parent_p=state["pp_p"], parent_type=state["pp_type"],
            parent_wi=state["pp_wi"], parent_ns=state["pp_ns"],
            parent_bsdf=state["pp_bsdf"], parent_med=state["pp_med"],
            scatter_base=state["pp_scatter"], seg_tr=seg_tr_full,
            pdf_dir_base=state["pp_pdf_dir"],
            pdf_dist_base=state["seg_pdffail"] * jnp.where(
                mevt, ms.pdf_success, ms.pdf_failure),
            reconnectable=state["pp_reconn"],
            parent_idx=state["pp_idx"],
        )

        # --- continue the walk ---
        # medium: sample phase; surface: sample BSDF (importance mode)
        u2 = draw(k_scat, (n, 2))
        wo_med, pdf_phase = ph.sample_phase(scene, cur_med, -d, u2)
        alpha_med_out = alpha_in_med * ms.sigma_s

        ns = hit.ns  # true normal: dielectric needs the side sign
        s_ax, t_ax = coordinate_system(ns)
        wi_loc = to_local(ns, s_ax, t_ax, -d)
        u3 = draw(k_scat, (n, 3))
        bs = sample_bsdf(scene, bi, wi_loc, u3, transport="importance")
        wo_surf = to_world(ns, s_ax, t_ax, bs.wo)
        alpha_surf_out = alpha_in_surf * bs.weight

        new_d = jnp.where(mevt[..., None], wo_med,
                          jnp.where(sevt[..., None], wo_surf, d))
        new_o = jnp.where(mevt[..., None], ms.p,
                          jnp.where(sevt[..., None],
                                    hit.p + hit.ng * jnp.sign(
                                        dot(hit.ng, wo_surf, keepdims=True))
                                    * RAY_EPS, o))
        new_alpha = jnp.where(mevt[..., None], alpha_med_out,
                              jnp.where(sevt[..., None], alpha_surf_out,
                                        alpha))
        crossed = sevt & (dot(wo_surf, hit.ng) * dot(-d, hit.ng) < 0.0)
        new_med = jnp.where(mevt, cur_med,
                            jnp.where(crossed,
                                      medium_transition(scene, hit.prim,
                                                        hit.ng, wo_surf),
                                      cur_med))
        advances = mevt | store_surf
        new_depth = state["depth"] + advances.astype(jnp.int32)

        dead = (~hit.valid & ~ms.success) | (new_depth >= cfg.max_depth) \
            | (jnp.max(new_alpha, axis=-1) <= 0.0) | (sevt & ~bs.valid)
        q = jnp.minimum(
            jnp.max(new_alpha, axis=-1)
            / jnp.maximum(jnp.max(alpha, axis=-1), 1e-20), cfg.rr_clamp)
        do_rr = (new_depth >= cfg.rr_depth_photon) & active & advances
        u_rr = draw(k_rr, (n,))
        rr_kill = do_rr & (u_rr >= q)
        new_alpha = jnp.where((do_rr & ~rr_kill)[..., None],
                              new_alpha / jnp.maximum(q, 1e-6)[..., None],
                              new_alpha)
        new_active = active & ~dead & ~rr_kill

        # --- parent-cache carries for the NEXT segment ---
        stored = mevt | store_surf
        scatter_med_new = ms.sigma_s * pdf_phase[..., None]
        scatter_surf_new = bs.weight * bs.pdf[..., None]   # f*cos (0 delta)
        reconn_surf = is_diffuse_like(scene, bi, cfg.bounce_roughness) \
            & ~bs.is_delta

        def upd(old, new):
            m = stored
            if new.ndim > m.ndim:
                m = m[..., None]
            return jnp.where(m, new, old)

        null_cross = sevt & is_null
        new_state = dict(
            o=new_o, d=new_d, med=new_med, alpha=new_alpha,
            active=new_active, depth=new_depth,
            pp_p=upd(state["pp_p"], vert["p"]),
            pp_type=upd(state["pp_type"], vtype.astype(jnp.int32)),
            pp_wi=upd(state["pp_wi"], d),
            pp_ns=upd(state["pp_ns"], hit.ns),
            pp_bsdf=upd(state["pp_bsdf"], vert["bsdf"]),
            pp_med=upd(state["pp_med"], jnp.where(mevt, cur_med, -1)),
            pp_scatter=upd(state["pp_scatter"],
                           jnp.where(mevt[..., None], scatter_med_new,
                                     scatter_surf_new)),
            pp_pdf_dir=upd(state["pp_pdf_dir"],
                           jnp.where(mevt, pdf_phase, bs.pdf)),
            pp_reconn=upd(state["pp_reconn"],
                          jnp.where(mevt, True, reconn_surf)),
            pp_idx=upd(state["pp_idx"],
                       step_i * n + jnp.arange(n, dtype=jnp.int32)),
            pp_at_origin=jnp.where(stored, True,
                                   jnp.where(null_cross, False,
                                             state["pp_at_origin"])),
            seg_tr=jnp.where(stored[..., None], 1.0,
                             jnp.where(null_cross[..., None],
                                       seg_tr_full, state["seg_tr"])),
            seg_pdffail=jnp.where(
                stored, 1.0,
                jnp.where(null_cross,
                          state["seg_pdffail"] * ms.pdf_failure,
                          state["seg_pdffail"])),
        )
        return (new_state, step_i + 1), (vert, beam)

    _, (verts, beams) = lax.scan(body, (state, jnp.int32(0)), step_keys)
    return (LightVertices(**verts), LightBeams(**beams))


def flatten_vertices(lv: LightVertices):
    """[S,P,...] -> [S*P,...] dict of arrays with a validity mask."""
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), lv)
    return flat, flat.vtype != VERT_NONE
