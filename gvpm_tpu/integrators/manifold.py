"""Manifold (ME) shift: specular-chain photon shifts.

The reference resolves shifts of photons whose parent chain crosses
specular vertices with a Newton manifold walk over the chain vertices
(SpecularManifold::init/move/det, libbidir/manifold.cpp:44-70;
manifoldWalkGPM, mut_manifold.cpp:1310; shiftPhotonManifold,
gvpm/shift/shift_volume_photon.cpp:160-295).

TPU re-design — NOT a port of the walk: a pure-delta chain is a
DETERMINISTIC map from the outgoing direction at the diffuse anchor b
(2 dof) [+ the final propagated distance t for volume photons (1 dof)]
to the photon position c. So instead of walking chain vertices with
block-tridiagonal tangent solves, we Newton-solve the anchor direction:

    find u = (a, b[, t]) s.t. retrace(b, w1(u)) lands on c'

where retrace() intersects each chain primitive analytically (the prims
are known from the photon's stored provenance, LightVertices.parent_idx)
and reflects/refracts with the SAME discrete branch as the base chain.
The Jacobian of the residual comes from jax.jacfwd — the manifold
tangent calculus (manifold.cpp's dp/du, curvature terms) is exactly what
autodiff computes, so none of it is hand-written. Fixed iteration count
(max_manifold_iterations, default 5) with masked lanes.

The same retrace Jacobian evaluated at the solution and at u=0 yields
the generalized geometric terms rho = |dc/d(omega, t)| whose ratio is
the manifold determinant the reference computes via SpecularManifold::det
— used both in the shifted throughput and in the MIS pdf ratio
(in volume/area measure, mirroring shift.reconnect_photon).

Chain segment transmittances are recomputed exactly per segment with the
stored seg_med (homogeneous media), so a chain that dips through a glass
interior (no medium) inside fog is handled correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import coordinate_system, dot, normalize
from ..scene.types import BSDF_CONDUCTOR, BSDF_DIELECTRIC, Scene
from . import shift

K_MAX = 3          # maximum specular chain length (paper scenes need <= 2)
NEWTON_EPS = 1e-4  # residual tolerance, relative to scene scale
MAX_STEP = 0.15    # trust-region bound per Newton step (tangent units)
FOLD_EPS = 3e-3    # dimensionless Jacobian floor: |dX/d(omega,t)| / t^2.
                   # Near caustic FOLDS the manifold determinant -> 0 and
                   # the rho ratio is numerically meaningless; such lanes
                   # fall to the unilateral weight (the reference kills
                   # invalid Jacobians, shift_volume_photon.cpp:218-222)
MAX_DEV = 0.35     # max total direction-parameter deviation: near
                   # caustic folds the inverse map is multi-valued and an
                   # unbounded Newton jumps to a DIFFERENT chain solution
                   # (wrong ratios with a converged residual); the
                   # reference bounds its walk the same way
                   # (mut_manifold.cpp step-size control)


# --------------------------------------------------------------------------
# chain extraction
# --------------------------------------------------------------------------

def pull_chains(scene: Scene, pv, idx=None, virt=None):
    """Walk parent_idx from each photon up to K_MAX specular parents.

    pv: flattened LightVertices dict; idx: [L] photon indices.
    virt (optional): dict of [L] arrays replacing the START vertex's
    record for lanes that have no stored record — a VIRTUAL photon.
    Keys: p (position), seg_med, parent_idx, reconnectable,
    parent_type, parent_bsdf. Used by the beam ME shift, where the
    virtual photon is the chord point y on the beam and its parent is
    the beam's origin vertex (shiftBeamME analog,
    shift_volume_beams.cpp:748).
    Returns a dict of arrays with leading dim L:
      ok          — photon admits an ME shift (pure-delta chain of length
                    1..K_MAX ending at a reconnectable anchor)
      k           — chain length
      prim[K]     — chain prims, anchor-to-photon order (slot j >= k: -1)
      enter[K]    — sphere-root selector: base ray entered the prim
      branch_refl[K] — base took the reflection branch at this vertex
      eta[K]      — dielectric int/ext IOR of the prim's bsdf
      is_diel[K]  — dielectric (vs conductor)
      seg_med[K+1]— medium of segment j (anchor->s1, ..., sk->photon)
      anchor_*    — anchor vertex data (from the FIRST chain vertex's
                    parent_* caches): p, ns, wi, type, bsdf, med
      sc_base     — cached scatter value at the anchor toward s1 [L,3]
      pdf_dir_base— cached direction pdf at the anchor [L]
      w1_base     — base outgoing direction at the anchor [L,3]
      t_last      — base length of the final segment (sk -> photon) [L]
    """
    L = virt["p"].shape[0] if virt is not None else idx.shape[0]

    def vfield(name, j):
        return pv[name][jnp.clip(j, 0, pv[name].shape[0] - 1)]

    def startf(name):
        return virt[name] if virt is not None else vfield(name, idx)

    # walk up: cur starts at the (possibly virtual) photon
    cur = idx if virt is None else jnp.zeros((L,), jnp.int32)
    chain_idx = []          # photon-to-anchor order while walking
    alive = jnp.ones((L,), bool)
    done = jnp.zeros((L,), bool)   # reached a reconnectable vertex
    for _step in range(K_MAX):
        if _step == 0:
            par = startf("parent_idx")
            rec = startf("reconnectable")
            ptype = startf("parent_type")
            pbsdf = startf("parent_bsdf")
        else:
            par = vfield("parent_idx", cur)
            rec = vfield("reconnectable", cur)
            ptype = vfield("parent_type", cur)
            pbsdf = vfield("parent_bsdf", cur)
        bty = scene.bsdf_type[jnp.clip(pbsdf, 0,
                                       scene.bsdf_type.shape[0] - 1)]
        is_delta = (bty == BSDF_CONDUCTOR) | (bty == BSDF_DIELECTRIC)
        step_ok = alive & ~done & ~rec & (ptype == shift.VERT_SURFACE) \
            & is_delta & (par >= 0)
        chain_idx.append((jnp.where(step_ok, par, -1), step_ok))
        # after stepping to the parent, check if ITS parent reconnects
        nxt_rec = vfield("reconnectable", par)
        done = done | (step_ok & nxt_rec)
        alive = alive & step_ok
        cur = jnp.where(step_ok, par, cur)

    # chain length: number of successful steps until `done`
    k = jnp.zeros((L,), jnp.int32)
    ok_steps = jnp.zeros((L,), bool)
    for j, (ci, sok) in enumerate(chain_idx):
        take = sok & (k == j)  # contiguous prefix
        k = jnp.where(take, j + 1, k)
    ok_steps = done & (k >= 1)

    # first chain vertex NEAREST the anchor = last walked index
    # re-walk to store anchor-to-photon ordered slots
    # slots[j] = chain vertex j (s_{j+1}); photon itself is the end point
    slots = jnp.full((K_MAX, L), -1, jnp.int32)
    cur = idx if virt is None else jnp.zeros((L,), jnp.int32)
    walked = [cur]
    for j, (ci, sok) in enumerate(chain_idx):
        cur = jnp.where(ci >= 0, ci, cur)
        walked.append(cur)
    # walked[m] = vertex m steps above the photon; chain vertex s_1 (next
    # to anchor) is walked[k-0-1]... assemble per-slot with masks
    for j in range(K_MAX):
        # slot j (0-based from anchor): vertex (k-1-j) steps above photon
        sel = jnp.zeros((L,), jnp.int32)
        for m in range(1, K_MAX + 1):
            sel = jnp.where(k - 1 - j == m - 1, walked[m], sel)
        slots = slots.at[j].set(jnp.where(j < k, sel, -1))

    first = slots[0]  # s_1, whose parent is the anchor
    firstc = jnp.clip(first, 0, pv["p"].shape[0] - 1)

    prim = jnp.stack([vfield("prim", jnp.clip(slots[j], 0, 10 ** 9))
                      for j in range(K_MAX)])
    prim = jnp.where(slots >= 0, prim, -1)

    # per-slot geometry flags from the BASE chain
    pos = jnp.stack([pv["p"][jnp.clip(slots[j], 0, pv["p"].shape[0] - 1)]
                     for j in range(K_MAX)])           # [K,L,3]
    wi_ch = jnp.stack([pv["wi"][jnp.clip(slots[j], 0,
                                         pv["p"].shape[0] - 1)]
                       for j in range(K_MAX)])         # [K,L,3] arriving
    ns_ch = jnp.stack([pv["ns"][jnp.clip(slots[j], 0,
                                         pv["p"].shape[0] - 1)]
                       for j in range(K_MAX)])
    # outgoing dir at slot j: toward slot j+1 (or the photon for j=k-1)
    photon_p = virt["p"] if virt is not None else pv["p"][idx]
    nxt = jnp.concatenate([pos[1:], photon_p[None]], axis=0)
    is_last = jnp.arange(K_MAX)[:, None] == (k - 1)[None, :]
    nxt = jnp.where(is_last[..., None], photon_p[None], nxt)
    wo_ch = normalize(nxt - pos)
    enter = dot(wi_ch, ns_ch) < 0.0                    # entering the prim
    same_side = (dot(wo_ch, ns_ch) * dot(-wi_ch, ns_ch)) > 0.0
    branch_refl = same_side

    bsdf_ch = jnp.stack([vfield("bsdf", jnp.clip(slots[j], 0, 10 ** 9))
                         for j in range(K_MAX)])
    bsdf_ch = jnp.where(slots >= 0, bsdf_ch, 0)
    bc = jnp.clip(bsdf_ch, 0, scene.bsdf_type.shape[0] - 1)
    is_diel = scene.bsdf_type[bc] == BSDF_DIELECTRIC
    eta = scene.bsdf_eta[bc]

    seg_med_last = (virt["seg_med"] if virt is not None
                    else pv["seg_med"][idx])
    seg_med = jnp.stack(
        [vfield("seg_med", jnp.clip(slots[j], 0, 10 ** 9))
         for j in range(K_MAX)] + [seg_med_last])
    seg_med = jnp.where(
        jnp.concatenate([slots >= 0,
                         jnp.ones((1, L), bool)]), seg_med, -1)

    t_last = jnp.linalg.norm(
        photon_p - jnp.take_along_axis(
            pos, jnp.clip(k - 1, 0, K_MAX - 1)[None, :, None].repeat(
                3, axis=2), axis=0)[0], axis=-1)

    return dict(
        ok=ok_steps, k=k, prim=prim, enter=enter,
        branch_refl=branch_refl, eta=eta, is_diel=is_diel,
        seg_med=seg_med,
        anchor_p=pv["parent_p"][firstc],
        anchor_ns=pv["parent_ns"][firstc],
        anchor_wi=pv["parent_wi"][firstc],
        anchor_type=pv["parent_type"][firstc],
        anchor_bsdf=pv["parent_bsdf"][firstc],
        anchor_med=pv["parent_med"][firstc],
        sc_base=pv["scatter_base"][firstc],
        pdf_dir_base=pv["pdf_dir_base"][firstc],
        w1_base=normalize(pos[0] - pv["parent_p"][firstc]),
        t_last=t_last,
        base_pos=pos,
    )


# --------------------------------------------------------------------------
# deterministic chain retrace (single lane; vmapped by callers)
# --------------------------------------------------------------------------

def _prim_hit(scene: Scene, prim, p, d, enter):
    """Analytic intersection with a KNOWN primitive. Triangles use their
    infinite plane (the Newton walk may momentarily leave the footprint —
    the reference's walk does the same in the tangent plane); spheres
    pick the entering/exiting root matching the base chain.
    Returns (t, n_geo, ok)."""
    T = scene.n_tris
    is_tri = prim < T
    ti = jnp.clip(prim, 0, max(T - 1, 0))
    si = jnp.clip(prim - T, 0, max(scene.n_spheres - 1, 0))

    if T > 0:
        p0 = scene.tri_p0[ti]
        n_t = jnp.cross(scene.tri_e1[ti], scene.tri_e2[ti])
        n_t = n_t / jnp.maximum(jnp.linalg.norm(n_t), 1e-12)
        denom = jnp.sum(d * n_t)
        t_tri = jnp.sum((p0 - p) * n_t) / jnp.where(
            jnp.abs(denom) > 1e-9, denom, 1e-9)
        ok_tri = (jnp.abs(denom) > 1e-9) & (t_tri > 1e-5)
    else:
        n_t = jnp.zeros(3)
        t_tri = jnp.array(jnp.inf)
        ok_tri = jnp.array(False)

    if scene.n_spheres > 0:
        c = scene.sph_center[si]
        r = scene.sph_radius[si]
        oc = p - c
        b = jnp.sum(oc * d)
        cq = jnp.sum(oc * oc) - r * r
        disc = b * b - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -b - sq
        t_far = -b + sq
        t_sph = jnp.where(enter, t_near, t_far)
        # if the selected root is behind, fall to the other
        other = jnp.where(enter, t_far, t_near)
        t_sph = jnp.where(t_sph > 1e-5, t_sph,
                          jnp.where(other > 1e-5, other, -1.0))
        ok_sph = (disc > 0.0) & (t_sph > 1e-5)
        n_s = (p + d * t_sph - c) / jnp.maximum(r, 1e-12)
    else:
        n_s = jnp.zeros(3)
        t_sph = jnp.array(-1.0)
        ok_sph = jnp.array(False)

    t = jnp.where(is_tri, t_tri, t_sph)
    n = jnp.where(is_tri, n_t, n_s)
    return t, n, jnp.where(is_tri, ok_tri, ok_sph)


def _bounce(d, n, eta, is_diel, refl):
    """Reflect/refract d at normal n, same branch as the base chain.
    Returns (d_new, cos_i_signed, ok). cos_i is wrt the OUTWARD normal
    (sign tells inside/outside, feeding the Fresnel)."""
    cos_i = -jnp.sum(d * n)                # >0: arriving from outside
    d_refl = d + 2.0 * cos_i * n
    rel_eta = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    # refract (Snell), normal flipped to the incoming side
    nf = n * jnp.sign(cos_i)
    ci = jnp.abs(cos_i)
    sin2_t = jnp.maximum(0.0, (1.0 - ci * ci)) / (rel_eta * rel_eta)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    d_refr = (d + nf * ci) / rel_eta - nf * cos_t
    d_refr = d_refr / jnp.maximum(jnp.linalg.norm(d_refr), 1e-12)
    use_refl = refl | ~is_diel
    d_new = jnp.where(use_refl, d_refl, d_refr)
    ok = jnp.where(use_refl, True, ~tir)
    return d_new, cos_i, ok


def _fresnel_diel(cos_i, eta):
    rel = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    ci = jnp.abs(cos_i)
    sin2_t = (1.0 - ci * ci) / (rel * rel)
    tir = sin2_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_s = (ci - rel * ct) / jnp.maximum(ci + rel * ct, 1e-12)
    r_p = (rel * ci - ct) / jnp.maximum(rel * ci + ct, 1e-12)
    return jnp.where(tir, 1.0, 0.5 * (r_s * r_s + r_p * r_p))


def _retrace(scene: Scene, ch, w1, want_pos=False):
    """Trace the delta chain of one photon from its anchor along w1.
    ch: per-lane chain pytree (vmapped by callers); returns (exit_p,
    exit_d, ok, fres[K], cos_i[K], seg_len[K][, pos[K,3]])."""
    p = ch["anchor_p"]
    d = w1
    ok = jnp.array(True)
    fres = []
    coss = []
    lens = []
    poss = []
    for j in range(K_MAX):
        live = j < ch["k"]
        t, n, hok = _prim_hit(scene, ch["prim"][j], p, d, ch["enter"][j])
        p_new = p + d * t
        d_new, cos_i, bok = _bounce(d, n, ch["eta"][j], ch["is_diel"][j],
                                    ch["branch_refl"][j])
        F = jnp.where(ch["is_diel"][j],
                      _fresnel_diel(cos_i, ch["eta"][j]), 1.0)
        ok = ok & jnp.where(live, hok & bok, True)
        fres.append(jnp.where(live, F, 1.0))
        coss.append(jnp.where(live, cos_i, 1.0))
        lens.append(jnp.where(live, t, 0.0))
        p = jnp.where(live, p_new, p)
        d = jnp.where(live, d_new, d)
        poss.append(p)
    out = (p, d, ok, jnp.stack(fres), jnp.stack(coss), jnp.stack(lens))
    if want_pos:
        out = out + (jnp.stack(poss),)
    return out


# --------------------------------------------------------------------------
# occlusion of the shifted chain (VERDICT r4 missing #4)
# --------------------------------------------------------------------------

def _occluded_non_null(scene: Scene, a, b, eps=2e-3):
    """Shadow test a->b that looks THROUGH null-BSDF boundaries (medium
    hulls): up to two null crossings are skipped per segment, matching
    evalTransmittance's null-passthrough semantics (scene.cpp)."""
    from ..scene.intersect import intersect as _intersect
    from ..scene.types import BSDF_NULL
    seg = b - a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-20))
    d = seg / dist[:, None]
    o = a + d * (eps * dist)[:, None]
    t_rem = dist * (1.0 - 2.0 * eps)
    blocked = jnp.zeros(dist.shape, bool)
    for _ in range(3):
        hit = _intersect(scene, o, d, t_max=t_rem)
        bi = jnp.clip(scene.prim_bsdf(hit.prim), 0,
                      scene.bsdf_type.shape[0] - 1)
        is_null = scene.bsdf_type[bi] == BSDF_NULL
        blocked = blocked | (hit.valid & ~is_null)
        adv = jnp.where(hit.valid & is_null,
                        hit.t + eps * dist, t_rem)
        o = o + d * adv[:, None]
        t_rem = jnp.maximum(t_rem - adv, 0.0)
    return blocked


def chain_occluded(scene: Scene, ch, w1_new, end_p):
    """One occlusion sweep over the SHIFTED chain segments at the Newton
    solution. The reference's manifold walk ray-traces every iteration
    and rejects occluded proposals (manifold.cpp, mut_manifold.cpp:1310);
    the TPU walk re-hits only the stored chain primitives, so without
    this a shifted chain passing through a blocker was silently
    accepted. Returns blocked [L]."""
    _, _, _, _, _, _, poss = jax.vmap(
        lambda chl, w: _retrace(scene, chl, w, want_pos=True))(
        _lanes(ch), w1_new)                       # poss: [L, K, 3]
    L = w1_new.shape[0]
    starts = jnp.concatenate([ch["anchor_p"][:, None], poss], axis=1)
    ends_d = jnp.concatenate([poss, poss[:, -1:]], axis=1)
    jj = jnp.arange(K_MAX + 1)[None, :]
    k = ch["k"][:, None]
    ends = jnp.where((jj == k)[..., None], end_p[:, None], ends_d)
    live = jj <= k                                # segments 0..k
    blocked_seg = _occluded_non_null(
        scene, starts.reshape(-1, 3), ends.reshape(-1, 3))
    blocked_seg = blocked_seg.reshape(L, K_MAX + 1) & live
    return jnp.any(blocked_seg, axis=1)


# --------------------------------------------------------------------------
# the ME shift (volume target)
# --------------------------------------------------------------------------

def me_shift_volume(scene: Scene, ch, c_target, n_iters=5,
                    scene_scale=1.0):
    """Shift photons with delta parent chains to c_target (volume photon).

    ch: chain dict from pull_chains (leading dim L); c_target: [L,3].
    Returns (alpha_ratio [L,3], pdf_ratio [L], ok [L]): multiply the
    photon's stored alpha by alpha_ratio; pdf_ratio feeds the pairwise
    MIS exactly like shift.reconnect_photon's.
    """
    s_ax, t_ax = coordinate_system(ch["w1_base"])

    def solve_one(chl, sa, ta, ct):
        def c_of(u):
            w1 = chl["w1_base"] + u[0] * sa + u[1] * ta
            w1 = w1 / jnp.maximum(jnp.linalg.norm(w1), 1e-12)
            ep, ed, ok, F, ci, ln = _retrace(scene, chl, w1)
            return ep + ed * u[2], (ok, F, ci, ln, w1)

        def resid(u):
            return c_of(u)[0] - ct

        u = jnp.array([0.0, 0.0, chl["t_last"]])
        Jfn = jax.jacfwd(resid)

        def newton(u, _):
            r = resid(u)
            J = Jfn(u)
            # 3x3 solve via adjugate (no data-dependent branches)
            det = jnp.linalg.det(J)
            Jinv = jnp.linalg.inv(
                jnp.where(jnp.abs(det) > 1e-18, J, jnp.eye(3)))
            du = Jinv @ r
            # trust region on the direction parameters (du[2] is the
            # free-flight distance, scene-scaled — leave it unclamped)
            dn = jnp.sqrt(du[0] ** 2 + du[1] ** 2)
            lim = jnp.minimum(1.0, MAX_STEP / jnp.maximum(dn, 1e-12))
            du = du * jnp.array([lim, lim, 1.0])
            ok_step = jnp.abs(det) > 1e-18
            return jnp.where(ok_step, u - du, u), None

        u, _ = jax.lax.scan(newton, u, None, length=n_iters)
        c_fin, (ok_tr, F, ci, ln, w1) = c_of(u)
        # exit direction = incident direction at the shifted photon
        ep2, ed2, _, _, _, _ = _retrace(scene, chl, w1)
        r = jnp.linalg.norm(c_fin - ct)
        conv = (r < NEWTON_EPS * scene_scale) \
            & (jnp.sqrt(u[0] ** 2 + u[1] ** 2) < MAX_DEV)
        # geometric expansion |dc/d(a,b,t)| at the solution and at base
        J_off = Jfn(u)
        J_base = Jfn(jnp.array([0.0, 0.0, chl["t_last"]]))
        # direction-parameterization measure: w1(u) = norm(w0+a s+b t),
        # d(omega)/d(a,b) = (1+a^2+b^2)^(-3/2)
        s_off = (1.0 + u[0] ** 2 + u[1] ** 2) ** -1.5
        rho_off = jnp.abs(jnp.linalg.det(J_off)) / jnp.maximum(s_off,
                                                               1e-12)
        rho_base = jnp.abs(jnp.linalg.det(J_base))
        return (u, w1, conv & ok_tr, F, ci, ln, rho_off, rho_base,
                u[2], ed2)

    (u, w1_new, conv, F_off, ci_off, len_off, rho_off, rho_base, t_off,
     wi_new) = jax.vmap(solve_one, in_axes=(0, 0, 0, 0))(
        _lanes(ch), s_ax, t_ax, c_target)
    # vmap returns [L,K]; chain arrays are [K,L]
    F_off, len_off = F_off.T, len_off.T

    # base chain quantities (retrace at u=0 — reproduces stored geometry)
    _, _, ok_b, F_base, ci_base, len_base = jax.vmap(
        lambda chl: _retrace(scene, chl, chl["w1_base"]))(_lanes(ch))
    F_base, len_base = F_base.T, len_base.T

    # scatter + pdf at the anchor toward the new direction
    sc_new, pdf_new, ok_an = shift.parent_scatter(
        scene, ch["anchor_type"], ch["anchor_wi"], ch["anchor_ns"],
        ch["anchor_bsdf"], ch["anchor_med"], w1_new)
    sc_ratio = sc_new / jnp.maximum(ch["sc_base"], 1e-20)
    pdf_dir_ratio = pdf_new / jnp.maximum(ch["pdf_dir_base"], 1e-20)

    # Fresnel/branch-probability ratios per chain vertex
    live = jnp.arange(K_MAX)[:, None] < ch["k"][None]
    refl = ch["branch_refl"]
    f_vert_base = jnp.where(refl, F_base, 1.0 - F_base)
    f_vert_off = jnp.where(refl, F_off, 1.0 - F_off)
    # conductors: F ratio; dielectrics: F (or 1-F) appears in BOTH the
    # value and the discrete branch pdf
    fr = jnp.where(live, f_vert_off / jnp.maximum(f_vert_base, 1e-12),
                   1.0)
    f_chain_ratio = jnp.prod(fr, axis=0)
    pdf_chain_ratio = jnp.prod(
        jnp.where(live & ch["is_diel"],
                  f_vert_off / jnp.maximum(f_vert_base, 1e-12), 1.0),
        axis=0)

    # transmittance + final-distance-pdf ratios, exact per segment
    dlen = jnp.concatenate([len_off - len_base,
                            (t_off - ch["t_last"])[None]], axis=0)
    st = jax.vmap(lambda m: _sigma_t(scene, m))(ch["seg_med"].T)  # [L,K+1,3]
    tr_ratio = jnp.exp(-jnp.sum(st * dlen.T[..., None], axis=1))
    stl = _sigma_t(scene, ch["seg_med"][-1])
    dens_new = jnp.mean(stl * jnp.exp(-stl * t_off[..., None]), axis=-1)
    dens_old = jnp.mean(stl * jnp.exp(-stl * ch["t_last"][..., None]),
                        axis=-1)
    pdf_dist_ratio = jnp.where(dens_old > 1e-20,
                               dens_new / jnp.maximum(dens_old, 1e-20),
                               1.0)

    rho_ratio = rho_base / jnp.maximum(rho_off, 1e-20)   # alpha factor
    alpha_ratio = sc_ratio * f_chain_ratio[..., None] * tr_ratio \
        * rho_ratio[..., None]
    pdf_ratio = pdf_dir_ratio * pdf_chain_ratio * pdf_dist_ratio \
        * rho_ratio
    t2 = jnp.maximum(t_off, 1e-3) ** 2
    t2b = jnp.maximum(ch["t_last"], 1e-3) ** 2
    ok = (ch["ok"] & conv & ok_b & ok_an
          & (ch["pdf_dir_base"] > 1e-20) & (pdf_new > 0.0)
          & (rho_off > FOLD_EPS * t2) & (rho_base > FOLD_EPS * t2b))
    ok = ok & ~chain_occluded(scene, ch, w1_new, c_target)
    return (jnp.where(ok[..., None], alpha_ratio, 0.0),
            jnp.where(ok, pdf_ratio, 0.0), ok, wi_new)


def me_shift_beam(scene: Scene, ch, y_target, n_iters=5,
                  scene_scale=1.0):
    """ME shift of a BEAM pair (reference shiftBeamME,
    shift_volume_beams.h:440 / shift_volume_beams.cpp:748).

    ch: chain dict from pull_chains(..., virt=...) where the virtual
    photon is the BASE chord/intersection point y on the beam and the
    final chain vertex is the beam's (delta) origin vertex A. The walk
    solves the chain so the new beam passes exactly through y_target.

    Unlike me_shift_volume, the FINAL segment (A' -> y') is the beam
    itself: its transmittance / kernel / survival terms are re-
    evaluated by the beam estimator on the returned geometry, so the
    ratios here cover only the anchor scatter, chain Fresnel, CHAIN
    transmittances and the manifold measure.

    Returns (origin_new [L,3], dir_new [L,3], t_new [L],
    alpha_ratio [L,3], pdf_ratio [L], ok [L]).
    """
    s_ax, t_ax = coordinate_system(ch["w1_base"])

    def solve_one(chl, sa, ta, ct):
        def c_of(u):
            w1 = chl["w1_base"] + u[0] * sa + u[1] * ta
            w1 = w1 / jnp.maximum(jnp.linalg.norm(w1), 1e-12)
            ep, ed, ok, F, ci, ln = _retrace(scene, chl, w1)
            return ep + ed * u[2], (ep, ed, ok, F, ci, ln, w1)

        def resid(u):
            return c_of(u)[0] - ct

        u = jnp.array([0.0, 0.0, chl["t_last"]])
        Jfn = jax.jacfwd(resid)

        def newton(u, _):
            r = resid(u)
            J = Jfn(u)
            det = jnp.linalg.det(J)
            Jinv = jnp.linalg.inv(
                jnp.where(jnp.abs(det) > 1e-18, J, jnp.eye(3)))
            du = Jinv @ r
            dn = jnp.sqrt(du[0] ** 2 + du[1] ** 2)
            lim = jnp.minimum(1.0, MAX_STEP / jnp.maximum(dn, 1e-12))
            du = du * jnp.array([lim, lim, 1.0])
            return jnp.where(jnp.abs(det) > 1e-18, u - du, u), None

        u, _ = jax.lax.scan(newton, u, None, length=n_iters)
        c_fin, (ep, ed, ok_tr, F, ci, ln, w1) = c_of(u)
        r = jnp.linalg.norm(c_fin - ct)
        conv = (r < NEWTON_EPS * scene_scale) \
            & (jnp.sqrt(u[0] ** 2 + u[1] ** 2) < MAX_DEV)
        J_off = Jfn(u)
        J_base = Jfn(jnp.array([0.0, 0.0, chl["t_last"]]))
        s_off = (1.0 + u[0] ** 2 + u[1] ** 2) ** -1.5
        rho_off = jnp.abs(jnp.linalg.det(J_off)) / jnp.maximum(s_off,
                                                               1e-12)
        rho_base = jnp.abs(jnp.linalg.det(J_base))
        return (u, w1, conv & ok_tr, F, ln, rho_off, rho_base,
                u[2], ep, ed)

    (u, w1_new, conv, F_off, len_off, rho_off, rho_base, t_off,
     org_new, dir_new) = jax.vmap(solve_one, in_axes=(0, 0, 0, 0))(
        _lanes(ch), s_ax, t_ax, y_target)
    F_off, len_off = F_off.T, len_off.T

    _, _, ok_b, F_base, _, len_base = jax.vmap(
        lambda chl: _retrace(scene, chl, chl["w1_base"]))(_lanes(ch))
    F_base, len_base = F_base.T, len_base.T

    sc_new, pdf_new, ok_an = shift.parent_scatter(
        scene, ch["anchor_type"], ch["anchor_wi"], ch["anchor_ns"],
        ch["anchor_bsdf"], ch["anchor_med"], w1_new)
    sc_ratio = sc_new / jnp.maximum(ch["sc_base"], 1e-20)
    pdf_dir_ratio = pdf_new / jnp.maximum(ch["pdf_dir_base"], 1e-20)

    live = jnp.arange(K_MAX)[:, None] < ch["k"][None]
    refl = ch["branch_refl"]
    f_vert_base = jnp.where(refl, F_base, 1.0 - F_base)
    f_vert_off = jnp.where(refl, F_off, 1.0 - F_off)
    fr = jnp.where(live, f_vert_off / jnp.maximum(f_vert_base, 1e-12),
                   1.0)
    f_chain_ratio = jnp.prod(fr, axis=0)
    pdf_chain_ratio = jnp.prod(
        jnp.where(live & ch["is_diel"],
                  f_vert_off / jnp.maximum(f_vert_base, 1e-12), 1.0),
        axis=0)

    # chain-segment transmittance ratios ONLY (final segment belongs to
    # the beam estimator)
    dlen = len_off - len_base                          # [K, L]
    st = jax.vmap(lambda m: _sigma_t(scene, m))(
        ch["seg_med"][:K_MAX].T)                       # [L, K, 3]
    tr_ratio = jnp.exp(-jnp.sum(st * dlen.T[..., None], axis=1))

    rho_ratio = rho_base / jnp.maximum(rho_off, 1e-20)
    alpha_ratio = sc_ratio * f_chain_ratio[..., None] * tr_ratio \
        * rho_ratio[..., None]
    pdf_ratio = pdf_dir_ratio * pdf_chain_ratio * rho_ratio
    t2 = jnp.maximum(t_off, 1e-3) ** 2
    t2b = jnp.maximum(ch["t_last"], 1e-3) ** 2
    ok = (ch["ok"] & conv & ok_b & ok_an
          & (ch["pdf_dir_base"] > 1e-20) & (pdf_new > 0.0)
          & (t_off > 1e-5)
          & (rho_off > FOLD_EPS * t2) & (rho_base > FOLD_EPS * t2b))
    # occlusion of the shifted CHAIN (anchor -> ... -> A'); the beam
    # segment A' -> y' itself is re-evaluated by the beam estimator
    ok = ok & ~chain_occluded(scene, ch, w1_new, org_new)
    return (org_new, dir_new, t_off,
            jnp.where(ok[..., None], alpha_ratio, 0.0),
            jnp.where(ok, pdf_ratio, 0.0), ok)


def _sigma_t(scene: Scene, med_idx):
    mi = jnp.clip(med_idx, 0, scene.med_sigma_a.shape[0] - 1)
    st = scene.med_sigma_a[mi] + scene.med_sigma_s[mi]
    return jnp.where((med_idx >= 0)[..., None], st, 0.0)


def _lanes(ch):
    """Per-lane view of the chain dict for vmap (K-leading arrays move
    the lane axis first)."""
    out = {}
    for k, v in ch.items():
        if k in ("prim", "enter", "branch_refl", "eta", "is_diel",
                 "seg_med", "base_pos"):
            out[k] = jnp.moveaxis(v, 1, 0) if v.ndim >= 2 else v
        elif k in ("ok",):
            continue
        else:
            out[k] = v
    return out


# --------------------------------------------------------------------------
# the ME shift (surface target)
# --------------------------------------------------------------------------

def me_shift_surface(scene: Scene, ch, photon_prim, photon_ns,
                     photon_enter, c_target, n_iters=5, scene_scale=1.0):
    """ME shift of SURFACE photons: the chain exit ray is intersected
    with the photon's own primitive, so the unknowns are just the anchor
    direction (2 dof) and the measure is area (shift_surface.cpp
    shiftPhotonManifold analog). photon_enter: sphere-root selector for
    the final hit (True when the base segment arrived from outside).

    Returns (alpha_ratio [L,3], pdf_ratio [L], ok [L], wi_new [L,3]).
    """
    s_ax, t_ax = coordinate_system(ch["w1_base"])
    # tangent frame at the target surface for the 2D residual
    ts_ax, tt_ax = coordinate_system(photon_ns)

    def solve_one(chl, sa, ta, prim_e, ent_e, tsa, tta, ct):
        def p_of(u):
            w1 = chl["w1_base"] + u[0] * sa + u[1] * ta
            w1 = w1 / jnp.maximum(jnp.linalg.norm(w1), 1e-12)
            ep, ed, ok, F, ci, ln = _retrace(scene, chl, w1)
            t_end, n_end, hok = _prim_hit(scene, prim_e, ep, ed, ent_e)
            p_end = ep + ed * t_end
            return p_end, (ok & hok, F, ci, ln, w1, t_end)

        def resid(u):
            p_end, _ = p_of(u)
            d = p_end - ct
            return jnp.array([jnp.sum(d * tsa), jnp.sum(d * tta)])

        def tang(u):
            p_end, _ = p_of(u)
            return jnp.array([jnp.sum(p_end * tsa), jnp.sum(p_end * tta)])

        u = jnp.zeros(2)
        Jfn = jax.jacfwd(resid)

        def newton(u, _):
            r = resid(u)
            J = Jfn(u)
            det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
            inv_ok = jnp.abs(det) > 1e-18
            dsafe = jnp.where(inv_ok, det, 1.0)
            du = jnp.array([(J[1, 1] * r[0] - J[0, 1] * r[1]) / dsafe,
                            (-J[1, 0] * r[0] + J[0, 0] * r[1]) / dsafe])
            dn = jnp.linalg.norm(du)
            du = du * jnp.minimum(1.0, MAX_STEP / jnp.maximum(dn, 1e-12))
            return jnp.where(inv_ok, u - du, u), None

        u, _ = jax.lax.scan(newton, u, None, length=n_iters)
        p_fin, (ok_tr, F, ci, ln, w1, t_end) = p_of(u)
        ep2, ed2, _, _, _, _ = _retrace(scene, chl, w1)
        conv = (jnp.linalg.norm(resid(u)) < NEWTON_EPS * scene_scale) \
            & (jnp.linalg.norm(u) < MAX_DEV)
        Jt = jax.jacfwd(tang)
        s_off = (1.0 + u[0] ** 2 + u[1] ** 2) ** -1.5
        rho_off = jnp.abs(jnp.linalg.det(Jt(u))) / jnp.maximum(s_off,
                                                               1e-12)
        rho_base = jnp.abs(jnp.linalg.det(Jt(jnp.zeros(2))))
        return (u, w1, conv & ok_tr, F, ci, ln, rho_off, rho_base,
                t_end, ed2)

    (u, w1_new, conv, F_off, ci_off, len_off, rho_off, rho_base, t_off,
     wi_new) = jax.vmap(solve_one)(_lanes(ch), s_ax, t_ax, photon_prim,
                                   photon_enter, ts_ax, tt_ax, c_target)
    F_off, len_off = F_off.T, len_off.T

    _, _, ok_b, F_base, ci_base, len_base = jax.vmap(
        lambda chl: _retrace(scene, chl, chl["w1_base"]))(_lanes(ch))
    F_base, len_base = F_base.T, len_base.T

    sc_new, pdf_new, ok_an = shift.parent_scatter(
        scene, ch["anchor_type"], ch["anchor_wi"], ch["anchor_ns"],
        ch["anchor_bsdf"], ch["anchor_med"], w1_new)
    sc_ratio = sc_new / jnp.maximum(ch["sc_base"], 1e-20)
    pdf_dir_ratio = pdf_new / jnp.maximum(ch["pdf_dir_base"], 1e-20)

    live = jnp.arange(K_MAX)[:, None] < ch["k"][None]
    refl = ch["branch_refl"]
    f_vert_base = jnp.where(refl, F_base, 1.0 - F_base)
    f_vert_off = jnp.where(refl, F_off, 1.0 - F_off)
    fr = jnp.where(live, f_vert_off / jnp.maximum(f_vert_base, 1e-12),
                   1.0)
    f_chain_ratio = jnp.prod(fr, axis=0)
    pdf_chain_ratio = jnp.prod(
        jnp.where(live & ch["is_diel"],
                  f_vert_off / jnp.maximum(f_vert_base, 1e-12), 1.0),
        axis=0)

    dlen = jnp.concatenate([len_off - len_base,
                            (t_off - ch["t_last"])[None]], axis=0)
    st = jax.vmap(lambda m: _sigma_t(scene, m))(ch["seg_med"].T)
    tr_ratio = jnp.exp(-jnp.sum(st * dlen.T[..., None], axis=1))
    # pdf_failure ratio on the last segment (reaching the surface)
    stl = _sigma_t(scene, ch["seg_med"][-1])
    f_new = jnp.mean(jnp.exp(-stl * t_off[..., None]), axis=-1)
    f_old = jnp.mean(jnp.exp(-stl * ch["t_last"][..., None]), axis=-1)
    pdf_dist_ratio = jnp.where(f_old > 1e-20,
                               f_new / jnp.maximum(f_old, 1e-20), 1.0)

    rho_ratio = rho_base / jnp.maximum(rho_off, 1e-20)
    alpha_ratio = sc_ratio * f_chain_ratio[..., None] * tr_ratio \
        * rho_ratio[..., None]
    pdf_ratio = pdf_dir_ratio * pdf_chain_ratio * pdf_dist_ratio \
        * rho_ratio
    t2 = jnp.maximum(t_off, 1e-3) ** 2
    t2b = jnp.maximum(ch["t_last"], 1e-3) ** 2
    ok = (ch["ok"] & conv & ok_b & ok_an
          & (ch["pdf_dir_base"] > 1e-20) & (pdf_new > 0.0)
          & (rho_off > FOLD_EPS * t2) & (rho_base > FOLD_EPS * t2b))
    ok = ok & ~chain_occluded(scene, ch, w1_new, c_target)
    return (jnp.where(ok[..., None], alpha_ratio, 0.0),
            jnp.where(ok, pdf_ratio, 0.0), ok, wi_new)
