"""Volumetric path tracer with NEE + MIS (reference: integrators/volpath).

TPU design: a wavefront of W*H*spp lanes advanced in lockstep through a
`lax.scan` over bounces; data-dependent control (medium vs surface event,
null crossings, RR termination) becomes masked lane updates. This is the
"minimum end-to-end slice" integrator that validates the scene/BSDF/medium
stack (SURVEY.md §7 step 3) and the primal baseline for G-PT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core import qmc, rng
from ..core.config import VolPathConfig
from ..core.math import coordinate_system, dot, normalize, to_local, to_world
from ..render import film
from ..render import medium as med
from ..render import phase as ph
from ..render.bsdf import eval_bsdf, sample_bsdf
from ..render.emitter import (env_le, eval_radiance, pdf_direct_area,
                              pdf_env_sa, sample_direct)
from ..render.visibility import medium_transition, segment_transmittance
from ..scene.camera import generate_rays
from ..scene.intersect import intersect
from ..scene.types import BSDF_NULL, Scene

RAY_EPS = 1e-4


def _offset_ray(p, n, d):
    """Offset origin along the geometric normal toward the outgoing side."""
    side = jnp.sign(dot(n, d, keepdims=True))
    return p + n * side * RAY_EPS


def _mis(pdf_a, pdf_b):
    """Balance heuristic weight for strategy a."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


def _light_pdf_sa(scene, prim, p_light, n_light, p_from):
    """Solid-angle pdf at p_from of NEE sampling the point p_light."""
    seg = p_light - p_from
    d2 = jnp.maximum(dot(seg, seg), 1e-12)
    wl = seg / jnp.sqrt(d2)[..., None]
    cos_l = jnp.maximum(dot(n_light, -wl), 0.0)
    pdf_a = pdf_direct_area(scene, prim)
    return jnp.where(cos_l > 1e-6, pdf_a * d2 / jnp.maximum(cos_l, 1e-6), 0.0)


def _nee(scene, u3, p, med_idx, throughput, f_of_dir):
    """Shared next-event estimation from a vertex at p over ALL emitter
    groups (area | point/spot/directional | constant env).

    u3: [N,3] uniforms; f_of_dir(wl) -> (f [N,3], pdf_dir [N]): scatter
    value toward light dir. Returns radiance contribution [N,3].
    """
    ds = sample_direct(scene, p, u3)
    f, pdf_dir = f_of_dir(ds.wl)
    tr = segment_transmittance(scene, p, ds.p_light, med_idx)
    # delta strategies (pdf_sa == 0) have no competing BSDF strategy
    w = jnp.where(ds.pdf_sa > 0, _mis(ds.pdf_sa, pdf_dir), 1.0)
    contrib = throughput * f * tr * ds.li_over_pdf * w[..., None]
    return jnp.where(ds.valid[..., None], contrib, 0.0)


# uniforms consumed per path step in explicit primary-sample-space mode:
# medium 2 + NEE 3 + phase 2 + bsdf 3 + RR 1
PSS_DIMS_PER_STEP = 11


def trace_radiance(scene: Scene, cfg: VolPathConfig, o, d, med_idx, key,
                   tile_rngs=1, u_explicit=None):
    """Estimate incident radiance along rays (o, d). Returns [N,3].

    tile_rngs=k makes the per-lane random sequence repeat every n/k lanes
    (lane i and lane i + j*n/k consume identical uniforms) — the
    primary-sample-space replay used by the G-PT shift (gpt.py).

    u_explicit ([n, n_steps, PSS_DIMS_PER_STEP] or None): drive the walk
    from an explicit primary-sample-space vector instead of the key —
    the deterministic f(u) map PSSMLT mutates (pssmlt.cpp analog)."""
    n = o.shape[0]
    n_rng = n // tile_rngs
    n_steps = cfg.max_depth + cfg.null_bounces

    state = dict(
        o=o, d=d, med=jnp.broadcast_to(med_idx, (n,)),
        throughput=jnp.ones((n, 3)),
        L=jnp.zeros((n, 3)),
        active=jnp.ones((n,), bool),
        spec=jnp.ones((n,), bool),       # camera "bounce" counts as delta
        last_pdf=jnp.zeros((n,)),
        scatter_p=o,                     # last real scatter vertex
        depth=jnp.zeros((n,), jnp.int32),
    )
    xs = jax.random.split(key, n_steps) if u_explicit is None \
        else jnp.moveaxis(u_explicit, 1, 0)

    def body(state, step_in):
        if u_explicit is None:
            k_med, k_nee, k_scat, k_rr = jax.random.split(step_in, 4)

            def U(k, *tail):
                u = jax.random.uniform(k, (n_rng,) + tail)
                if tile_rngs == 1:
                    return u
                return jnp.tile(u, (tile_rngs,) + (1,) * len(tail))

            u_med = U(k_med, 2)
            u_nee3 = U(k_nee, 3)
            u_ph2 = U(k_scat, 2)
            u_bs3 = U(k_scat, 3)
            u_rr = U(k_rr)
        else:
            u_med = step_in[:, 0:2]
            u_nee3 = step_in[:, 2:5]
            u_ph2 = step_in[:, 5:7]
            u_bs3 = step_in[:, 7:10]
            u_rr = step_in[:, 10]
        o, d = state["o"], state["d"]
        active = state["active"]
        thr = state["throughput"]
        cur_med = state["med"]

        hit = intersect(scene, o, d)
        t_far = jnp.where(hit.valid, hit.t, jnp.inf)

        # Media can only be sampled when t_far is finite or vacuum lane
        ms = med.sample_distance(scene, cur_med, o, d, t_far,
                                 u_med[:, 0], u_channel=u_med[:, 1])

        # ---------------- medium event ----------------
        mevt = active & ms.success
        thr_med = thr * ms.sigma_s * ms.transmittance \
            / jnp.maximum(ms.pdf_success, 1e-20)[..., None]

        u2 = u_ph2
        wo_med, pdf_med = ph.sample_phase(scene, cur_med, -d, u2)

        # ---------------- surface event ----------------
        sevt = active & ~ms.success & hit.valid
        thr_surf = thr * ms.transmittance \
            / jnp.maximum(ms.pdf_failure, 1e-20)[..., None]

        # emitter hit: MIS against the NEE strategy (pdf measured from
        # the last REAL scatter vertex, not a null crossing)
        Le = eval_radiance(scene, hit.prim, hit.ng, -d)
        pdf_l_sa = _light_pdf_sa(scene, hit.prim, hit.p, hit.ng,
                                 state["scatter_p"])
        w_hit = jnp.where(state["spec"] | jnp.logical_not(cfg.nee),
                          1.0, _mis(state["last_pdf"], pdf_l_sa))
        L_hit = thr_surf * Le * w_hit[..., None]

        # local frame at hit
        # TRUE shading normal (no viewer-facing flip): sample_bsdf/
        # eval_bsdf are sign-aware, and dielectric refraction NEEDS the
        # inside/outside sign (rel IOR + TIR; flipping it made every
        # glass exit refract with eta instead of 1/eta)
        ns = hit.ns
        s_ax, t_ax = coordinate_system(ns)
        wi_loc = to_local(ns, s_ax, t_ax, -d)
        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL

        u3 = u_bs3
        bs = sample_bsdf(scene, bi, wi_loc, u3)
        wo_surf = to_world(ns, s_ax, t_ax, bs.wo)

        # ---------------- merged NEE (one shadow batch per bounce) --------
        if cfg.nee:
            def scatter_f(wl):
                # medium lanes: phase; surface lanes: bsdf * |cos|
                f_ph_ = ph.eval_phase(scene, cur_med, -d, wl)
                wl_loc = to_local(ns, s_ax, t_ax, wl)
                f_b, pdf_b = eval_bsdf(scene, bi, wi_loc, wl_loc)
                f_b = f_b * jnp.abs(wl_loc[..., 2:3])
                f = jnp.where(mevt[..., None],
                              f_ph_[..., None] * jnp.ones((1, 3)), f_b)
                pdf = jnp.where(mevt, f_ph_, pdf_b)
                return f, pdf

            p_nee = jnp.where(mevt[..., None], ms.p,
                              _offset_ray(hit.p, hit.ng, -d))
            thr_nee = jnp.where(mevt[..., None], thr_med, thr_surf)
            L_nee = _nee(scene, u_nee3, p_nee, cur_med, thr_nee,
                         scatter_f)
            L_nee = jnp.where((mevt | (sevt & ~is_null))[..., None],
                              L_nee, 0.0)
        else:
            L_nee = jnp.zeros((n, 3))

        # escaped rays: constant environment emitter, MIS vs the NEE env
        # strategy (uniform-sphere direction)
        esc = active & ~ms.success & ~hit.valid
        w_env = jnp.where(state["spec"] | jnp.logical_not(cfg.nee), 1.0,
                          _mis(state["last_pdf"], pdf_env_sa(scene, d)))
        L_env = thr_surf * env_le(scene, d) * w_env[..., None]

        # ---------------- merge events ----------------
        L = state["L"] + L_nee \
            + jnp.where(sevt[..., None], L_hit, 0.0) \
            + jnp.where(esc[..., None], L_env, 0.0)

        new_d = jnp.where(mevt[..., None], wo_med,
                          jnp.where(sevt[..., None], wo_surf, d))
        new_o = jnp.where(mevt[..., None], ms.p,
                          jnp.where(sevt[..., None],
                                    _offset_ray(hit.p, hit.ng, wo_surf), o))
        new_thr = jnp.where(mevt[..., None], thr_med,
                            jnp.where(sevt[..., None],
                                      thr_surf * bs.weight, thr))
        # medium transition on transmission through the surface
        crossed = sevt & (dot(wo_surf, hit.ng) * dot(-d, hit.ng) < 0.0)
        new_med = jnp.where(crossed,
                            medium_transition(scene, hit.prim, hit.ng,
                                              wo_surf), cur_med)

        # null crossings are passthrough: they must NOT touch the MIS
        # state (spec/last_pdf/scatter origin) — treating them as delta
        # scatters double-counts light behind medium walls (weight-1
        # emitter hits on top of full NEE)
        scat = sevt & ~is_null
        new_spec = jnp.where(mevt, False,
                             jnp.where(scat, bs.is_delta, state["spec"]))
        new_pdf = jnp.where(mevt, pdf_med,
                            jnp.where(scat, bs.pdf, state["last_pdf"]))
        new_scatter_p = jnp.where(mevt[..., None], ms.p,
                                  jnp.where(scat[..., None], hit.p,
                                            state["scatter_p"]))

        # depth bookkeeping: null passthrough does not advance depth
        advances = mevt | (sevt & ~is_null)
        new_depth = state["depth"] + advances.astype(jnp.int32)

        dead = (~hit.valid & ~ms.success) | (new_depth >= cfg.max_depth) \
            | (jnp.max(new_thr, axis=-1) <= 0.0) | ~bs.valid & sevt
        # Russian roulette
        q = jnp.minimum(jnp.max(new_thr, axis=-1), cfg.rr_clamp)
        do_rr = (new_depth >= cfg.rr_depth) & active
        rr_kill = do_rr & (u_rr >= q)
        new_thr = jnp.where((do_rr & ~rr_kill)[..., None],
                            new_thr / jnp.maximum(q, 1e-6)[..., None],
                            new_thr)
        new_active = active & ~dead & ~rr_kill

        return dict(o=new_o, d=new_d, med=new_med, throughput=new_thr, L=L,
                    active=new_active, spec=new_spec, last_pdf=new_pdf,
                    scatter_p=new_scatter_p, depth=new_depth), None

    state, _ = lax.scan(body, state, xs)
    return state["L"]


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           max_lanes=1 << 20):
    """Render the full frame; returns [H,W,3].

    Batches as many spp as fit into `max_lanes` wavefront lanes per jitted
    pass — the TPU-native replacement for the reference's per-block sample
    loops (BlockedRenderProcess, renderproc.h:38)."""
    H, W = scene.height, scene.width
    spp_per_pass = max(1, min(cfg.spp, max_lanes // (H * W)))
    n_passes = -(-cfg.spp // spp_per_pass)

    @functools.partial(jax.jit, static_argnames=("nspp",))
    def pixel_u(it, nspp):
        # kept OUT of the main program: the QMC bit-arithmetic fused into
        # the full wavefront blows up XLA:CPU LLVM compile time
        key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
        k_pix, _ = jax.random.split(key, 2)
        pix = jnp.tile(jnp.arange(H * W), nspp)
        si = jnp.repeat(it * nspp + jnp.arange(nspp), H * W)
        return qmc.pixel_samples(cfg.sampler, k_pix, pix, si, cfg.spp)

    @functools.partial(jax.jit, static_argnames=("nspp",))
    def one_pass(it, nspp, u):
        key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
        _, k_lens, k_path = jax.random.split(key, 3)
        py, px = jnp.mgrid[0:H, 0:W]
        px = jnp.tile(px.reshape(-1), nspp).astype(jnp.float32)
        py = jnp.tile(py.reshape(-1), nspp).astype(jnp.float32)
        u_lens = jax.random.uniform(k_lens, u.shape) \
            if scene.cam_aperture > 0 else None
        o, d, _ = generate_rays(scene, px, py, u, u_lens=u_lens)
        L = trace_radiance(scene, cfg, o, d, scene.cam_medium, k_path)
        if cfg.rfilter == "box":
            return (jnp.mean(L.reshape(nspp, H, W, 3), axis=0) * nspp,
                    jnp.full((H, W), float(nspp)))
        return film.splat_filtered(film.new_film(H, W), jnp.zeros((H, W)),
                                   px + u[..., 0], py + u[..., 1], L,
                                   rfilter=cfg.rfilter)

    img = jnp.zeros((H, W, 3))
    wsum = jnp.zeros((H, W))
    done = 0
    it = 0
    while done < cfg.spp:
        nspp = min(spp_per_pass, cfg.spp - done)
        di, dw = one_pass(it, nspp, pixel_u(it, nspp))
        img, wsum = img + di, wsum + dw
        done += nspp
        it += 1
    return film.develop_filtered(img, wsum)
