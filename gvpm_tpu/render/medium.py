"""Participating media, batched: homogeneous closed forms +
heterogeneous delta/ratio tracking.

Faithful re-expression of the reference's homogeneous medium sampling
(src/medium/homogeneous.cpp:293-430) with its three distance-sampling
strategies (include/mitsuba/render/medium.h:104-148), plus a
heterogeneous grid medium (src/medium/heterogeneous.cpp re-designed as
null-collision tracking — the TPU-friendly fixed-step form of its
ray-marching integrator):

  * NORMAL        — classic free-flight sampling: with probability
                    `sampling_weight` draw t ~ sigma_g * exp(-sigma_g t)
                    (sigma_g = green channel, the reference's EBalance pick
                    of channel min(0.5*S, S-1) = 1, homogeneous.cpp:327-331);
                    report balance-averaged pdfSuccess/pdfFailure over RGB.
  * LONG          — "long beam": march to t = -log(eps)/sigma_g, i.e. until
                    transmittance is negligible (homogeneous.cpp:341).
  * ALWAYS_VALID  — forced medium interaction on [0, t_max): normalized
                    truncated exponential (homogeneous.cpp:335-339,383-392);
                    requires finite t_max; sampling weight forced to 1.

A medium index of -1 denotes vacuum; all lanes are computed and masked.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..scene.types import NO_MEDIUM, Scene
from ..core.tables import take

EPSILON = 1e-4  # matches the reference's Epsilon for single precision

NORMAL = 0
LONG = 1
ALWAYS_VALID = 2

MAX_TRACK_STEPS = 64  # delta/ratio-tracking flight budget per segment


@flax.struct.dataclass
class MediumSample:
    success: jnp.ndarray        # [N] bool — medium interaction happened
    t: jnp.ndarray              # [N] sampled distance (== t_max on failure)
    p: jnp.ndarray              # [N,3] interaction point
    transmittance: jnp.ndarray  # [N,3] exp(-sigma_t * t)
    pdf_success: jnp.ndarray    # [N] pdf of the sampled interaction
    pdf_failure: jnp.ndarray    # [N] prob of passing through
    sigma_s: jnp.ndarray        # [N,3]
    sigma_a: jnp.ndarray        # [N,3]


def _tables(scene: Scene, mi):
    """Per-lane medium coefficients; vacuum (mi<0) becomes all-zero."""
    idx = jnp.clip(mi, 0, scene.med_sigma_a.shape[0] - 1)
    in_med = (mi != NO_MEDIUM)[..., None]
    sa = jnp.where(in_med, take(scene.med_sigma_a, idx), 0.0)
    ss = jnp.where(in_med, take(scene.med_sigma_s, idx), 0.0)
    return sa, ss, sa + ss


def sampling_weight(scene: Scene, mi):
    """Medium vs surface sampling weight: max(albedo, 0.5) as in
    Medium::configure (reference medium.cpp); 0 for vacuum."""
    sa, ss, st = _tables(scene, mi)
    albedo = jnp.max(jnp.where(st > 0, ss / jnp.maximum(st, 1e-20), 0.0),
                     axis=-1)
    w = jnp.maximum(albedo, 0.5)
    return jnp.where(mi != NO_MEDIUM, w, 0.0)


# --------------------------------------------------------------------------
# heterogeneous grid medium: trilinear density + null-collision tracking


def het_sigma_t(scene: Scene, p):
    """sigma_t(p) of the heterogeneous grid: trilinear density * scale;
    zero outside the grid AABB. p: [N,3] -> [N,3]."""
    g = scene.het_density
    Gx, Gy, Gz = g.shape
    ext = jnp.maximum(scene.het_hi - scene.het_lo, 1e-12)
    rel = (p - scene.het_lo) / ext
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    res = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], jnp.float32)
    f = jnp.clip(rel, 0.0, 1.0) * res
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0,
                  jnp.asarray([max(Gx - 2, 0), max(Gy - 2, 0),
                               max(Gz - 2, 0)]))
    w = f - i0
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]

    def corner(dx, dy, dz):
        return g[jnp.minimum(ix + dx, Gx - 1),
                 jnp.minimum(iy + dy, Gy - 1),
                 jnp.minimum(iz + dz, Gz - 1)]

    c00 = corner(0, 0, 0) * (1 - wx) + corner(1, 0, 0) * wx
    c10 = corner(0, 1, 0) * (1 - wx) + corner(1, 1, 0) * wx
    c01 = corner(0, 0, 1) * (1 - wx) + corner(1, 0, 1) * wx
    c11 = corner(0, 1, 1) * (1 - wx) + corner(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    dens = c0 * (1 - wz) + c1 * wz
    dens = jnp.where(inside, dens, 0.0)
    return dens[..., None] * scene.het_sigma_scale


def _het_keys(key, u, n):
    """Per-lane tracking keys; when no key is supplied, derive one from
    the bit pattern of the per-lane uniform (distinct per lane/step)."""
    if key is not None:
        return jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n))
    seeds = jax.lax.bitcast_convert_type(
        jnp.asarray(u, jnp.float32), jnp.uint32)
    return jax.vmap(jax.random.key)(seeds)


def het_track_sample(scene: Scene, o, d, t_max, keys):
    """Analog delta tracking (Woodcock with RGB null-collision weights).

    Returns dict(success, t, w_null [N,3], pdf_real [N], sigma_t_x [N,3]).
    Unbiasedness contract: E[w_null * 1{success} * f(x)/pdf_real]
    = int Tr(t) f(x_t) dt and E[w_null * 1{escape}] = Tr(t_max).
    """
    n = o.shape[0]
    maj = scene.het_majorant

    def body(carry, k):
        t, w, status = carry  # status 0=flying, 1=collided, 2=escaped
        ks = jax.vmap(lambda kk, i: jax.random.fold_in(kk, i),
                      in_axes=(0, None))(keys, k)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (2,)))(ks)
        flying = status == 0
        t_new = t - jnp.log1p(-u[:, 0] * (1 - 1e-7)) / maj
        esc = t_new >= t_max
        x = o + d * t_new[..., None]
        st = het_sigma_t(scene, x)
        st_mean = jnp.mean(st, axis=-1)
        p_real = jnp.clip(st_mean / maj, 0.0, 1.0)
        real = u[:, 1] < p_real
        # null collision: spectral correction (maj - st)/(maj*(1-p_real))
        w_null_fac = (maj - st) / jnp.maximum(
            maj * (1.0 - p_real)[..., None], 1e-20)
        new_status = jnp.where(
            flying, jnp.where(esc, 2, jnp.where(real, 1, 0)), status)
        upd_null = flying & ~esc & ~real
        w = jnp.where(upd_null[..., None], w * w_null_fac, w)
        t = jnp.where(flying & ~esc, t_new, t)
        return (t, w, new_status), None

    init = (jnp.zeros((n,)), jnp.ones((n, 3)),
            jnp.zeros((n,), jnp.int32))
    (t, w, status), _ = lax.scan(body, init,
                                 jnp.arange(MAX_TRACK_STEPS))
    # lanes still flying after the budget: treat as escaped (w is the
    # unbiased partial product; bias ~ Tr overestimate, negligible at 64
    # flights per majorant mean-free-path)
    success = status == 1
    x = o + d * t[..., None]
    st_x = het_sigma_t(scene, x)
    p_real = jnp.clip(jnp.mean(st_x, axis=-1) / maj, 1e-20, 1.0)
    return dict(success=success, t=t, w_null=w,
                pdf_real=maj * p_real, sigma_t_x=st_x)


def het_transmittance(scene: Scene, o, d, t_max, keys):
    """Ratio-tracking transmittance estimate along [0, t_max). [N,3]."""
    n = o.shape[0]
    maj = scene.het_majorant

    def body(carry, k):
        t, w, flying = carry
        ks = jax.vmap(lambda kk, i: jax.random.fold_in(kk, i),
                      in_axes=(0, None))(keys, k)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(ks)
        t_new = t - jnp.log1p(-u * (1 - 1e-7)) / maj
        esc = t_new >= t_max
        x = o + d * t_new[..., None]
        st = het_sigma_t(scene, x)
        fac = jnp.clip(1.0 - st / maj, 0.0, 1.0)
        w = jnp.where((flying & ~esc)[..., None], w * fac, w)
        t = jnp.where(flying & ~esc, t_new, t)
        return (t, w, flying & ~esc), None

    init = (jnp.zeros((n,)), jnp.ones((n, 3)), jnp.ones((n,), bool))
    (_, w, _), _ = lax.scan(body, init, jnp.arange(MAX_TRACK_STEPS))
    return w


def transmittance(scene: Scene, mi, dist, o=None, d=None, key=None):
    """exp(-sigma_t * dist) per channel; 1 for vacuum. For lanes in the
    heterogeneous medium (scene.het_medium), a ratio-tracking estimate —
    requires o/d; falls back to majorant-row closed form otherwise."""
    _, _, st = _tables(scene, mi)
    tr = jnp.exp(-st * jnp.maximum(dist, 0.0)[..., None])
    tr = jnp.where(jnp.max(tr, axis=-1, keepdims=True) < 1e-20, 0.0, tr)
    if scene.het_medium >= 0 and o is not None:
        keys = _het_keys(key, dist + 0.12345, o.shape[0])
        tr_het = het_transmittance(scene, o, d, dist, keys)
        tr = jnp.where((mi == scene.het_medium)[..., None], tr_het, tr)
    return tr


def sample_distance(scene: Scene, mi, o, d, t_max, u, strategy=NORMAL,
                    force_weight_one=False, u_channel=None,
                    key=None) -> MediumSample:
    """Sample a free-flight distance along (o, d) within [0, t_max).

    `u`: [N] uniforms. `strategy` is static. Vacuum lanes always fail with
    pdf_failure = 1, transmittance = 1.

    Channel selection: the reference's EBalance deterministically samples
    with the green channel while reporting channel-averaged pdfs
    (homogeneous.cpp:327-331, 383-392) — biased for non-gray sigma_t. Pass
    `u_channel` ([N] uniforms) to pick the channel uniformly at random,
    which makes the averaged pdfs exact (true spectral single-sample
    balance). Omit it for reference-faithful green-channel behavior.
    """
    sa, ss, st = _tables(scene, mi)
    if strategy == ALWAYS_VALID:
        u_channel = None   # truncated-exp normalization needs one channel
    if u_channel is None:
        sigma_g = st[..., 1]                   # EBalance green-channel pick
    else:
        ch = jnp.minimum((u_channel * 3.0).astype(jnp.int32), 2)
        sigma_g = jnp.take_along_axis(st, ch[..., None], axis=-1)[..., 0]
    sigma_g_safe = jnp.maximum(sigma_g, 1e-20)
    in_med = (mi != NO_MEDIUM) & (jnp.max(st, axis=-1) > 0.0)

    w = sampling_weight(scene, mi)
    if strategy == ALWAYS_VALID or force_weight_one:
        w = jnp.where(in_med, 1.0, w)          # computeOnlyVolumeInteraction

    take = u < w
    ur = jnp.where(take, u / jnp.maximum(w, 1e-20), 0.0)

    if strategy == ALWAYS_VALID:
        max_dist = jnp.maximum(t_max - EPSILON, 0.0)
        norm_g = 1.0 - jnp.exp(-sigma_g_safe * max_dist)
        t_sample = -jnp.log1p(-ur * norm_g) / sigma_g_safe
    elif strategy == LONG:
        t_sample = jnp.full_like(u, -jnp.log(EPSILON)) / sigma_g_safe
    else:
        t_sample = -jnp.log(jnp.maximum(1.0 - ur, 1e-20)) / sigma_g_safe

    t_sample = jnp.where(take & in_med, t_sample, jnp.inf)
    success = t_sample < t_max
    t = jnp.where(success, t_sample, t_max)

    # pdfs: balance average over channels (homogeneous.cpp:383-401)
    tr_c = jnp.exp(-st * t[..., None])
    if strategy == ALWAYS_VALID:
        # exact pdf of the truncated-exponential actually sampled (the
        # reference averages channels here, homogeneous.cpp:383-392, which
        # is only exact for gray media — we keep the estimator unbiased)
        norm_g = 1.0 - jnp.exp(-sigma_g * jnp.maximum(t_max - EPSILON, 0.0))
        pdf_success = jnp.where(
            norm_g > 1e-12,
            sigma_g / jnp.maximum(norm_g, 1e-12) * jnp.exp(-sigma_g * t),
            0.0)
        pdf_failure = jnp.zeros_like(pdf_success)
    else:
        pdf_failure = jnp.mean(tr_c, axis=-1)
        pdf_success = jnp.mean(st * tr_c, axis=-1)

    pdf_success = pdf_success * w
    pdf_failure = w * pdf_failure + (1.0 - w)

    tr = jnp.where(jnp.max(tr_c, axis=-1, keepdims=True) < 1e-20, 0.0, tr_c)
    # vacuum lanes: clean failure
    pdf_failure = jnp.where(in_med, pdf_failure, 1.0)
    pdf_success = jnp.where(in_med, pdf_success, 0.0)
    success = success & in_med

    ms = MediumSample(
        success=success, t=t, p=o + d * t[..., None],
        transmittance=jnp.where(in_med[..., None], tr, 1.0),
        pdf_success=pdf_success, pdf_failure=pdf_failure,
        sigma_s=ss, sigma_a=sa)
    if scene.het_medium >= 0:
        ms = _het_override(scene, ms, mi, o, d, t_max, u, strategy, key)
    return ms


def _het_override(scene: Scene, ms: MediumSample, mi, o, d, t_max, u,
                  strategy, key):
    """Replace lanes inside the heterogeneous medium with null-collision
    tracking results. Contract per lane (analog delta tracking):
      success: Tr/pdf_success = w_null/(maj*p_real), sigma_s = local
      failure: Tr/pdf_failure = w_null  (pdf_failure = 1)
    so every downstream estimator stays unchanged."""
    is_het = mi == scene.het_medium
    keys = _het_keys(key, u + 0.7071, o.shape[0])
    if strategy == ALWAYS_VALID:
        md = jnp.maximum(t_max - EPSILON, 1e-12)
        finite = jnp.isfinite(t_max) & (t_max > EPSILON)
        mds = jnp.where(finite, md, 1.0)
        t_h = jnp.clip(u, 0.0, 1.0 - 1e-6) * mds
        tr_h = het_transmittance(scene, o, d, t_h, keys)
        ps_h = jnp.where(finite, 1.0 / mds, 0.0)
        pf_h = jnp.zeros_like(ps_h)
        succ_h = finite
        stx = het_sigma_t(scene, o + d * t_h[..., None])
    else:  # NORMAL / LONG -> analog delta tracking
        tk = het_track_sample(scene, o, d, t_max, keys)
        t_h, tr_h = tk["t"], tk["w_null"]
        ps_h, succ_h = tk["pdf_real"], tk["success"]
        pf_h = jnp.ones_like(ps_h)
        stx = tk["sigma_t_x"]
    ss_h = stx * scene.het_albedo
    sa_h = stx * (1.0 - scene.het_albedo)
    hv = is_het[..., None]
    return MediumSample(
        success=jnp.where(is_het, succ_h, ms.success),
        t=jnp.where(is_het, t_h, ms.t),
        p=jnp.where(hv, o + d * t_h[..., None], ms.p),
        transmittance=jnp.where(hv, tr_h, ms.transmittance),
        pdf_success=jnp.where(is_het, ps_h, ms.pdf_success),
        pdf_failure=jnp.where(is_het, pf_h, ms.pdf_failure),
        sigma_s=jnp.where(hv, ss_h, ms.sigma_s),
        sigma_a=jnp.where(hv, sa_h, ms.sigma_a))


def pdf_distance(scene: Scene, mi, t, t_max, hit_surface, strategy=NORMAL):
    """pdf of an already-known distance outcome (Medium::eval analog).

    Returns (pdf_success(t), pdf_failure(t_max)).
    """
    sa, ss, st = _tables(scene, mi)
    in_med = (mi != NO_MEDIUM) & (jnp.max(st, axis=-1) > 0.0)
    w = sampling_weight(scene, mi)
    if strategy == ALWAYS_VALID:
        w = jnp.where(in_med, 1.0, w)
        sigma_g = st[..., 1]
        norm_g = 1.0 - jnp.exp(-sigma_g * jnp.maximum(t_max - EPSILON, 0.0))
        ps = jnp.where(norm_g > 1e-12,
                       sigma_g / jnp.maximum(norm_g, 1e-12)
                       * jnp.exp(-sigma_g * t), 0.0) * w
        pf = jnp.zeros_like(ps)
    else:
        tq = jnp.where(hit_surface, t_max, t)
        tr_c = jnp.exp(-st * tq[..., None])
        ps = jnp.mean(st * tr_c, axis=-1) * w
        pf = w * jnp.mean(tr_c, axis=-1) + (1.0 - w)
    ps = jnp.where(in_med, ps, 0.0)
    pf = jnp.where(in_med, pf, 1.0)
    return ps, pf
