"""Homogeneous participating media, batched.

Faithful re-expression of the reference's homogeneous medium sampling
(src/medium/homogeneous.cpp:293-430) with its three distance-sampling
strategies (include/mitsuba/render/medium.h:104-148):

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
import jax.numpy as jnp

from ..scene.types import NO_MEDIUM, Scene

EPSILON = 1e-4  # matches the reference's Epsilon for single precision

NORMAL = 0
LONG = 1
ALWAYS_VALID = 2


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
    sa = jnp.where(in_med, scene.med_sigma_a[idx], 0.0)
    ss = jnp.where(in_med, scene.med_sigma_s[idx], 0.0)
    return sa, ss, sa + ss


def sampling_weight(scene: Scene, mi):
    """Medium vs surface sampling weight: max(albedo, 0.5) as in
    Medium::configure (reference medium.cpp); 0 for vacuum."""
    sa, ss, st = _tables(scene, mi)
    albedo = jnp.max(jnp.where(st > 0, ss / jnp.maximum(st, 1e-20), 0.0),
                     axis=-1)
    w = jnp.maximum(albedo, 0.5)
    return jnp.where(mi != NO_MEDIUM, w, 0.0)


def transmittance(scene: Scene, mi, dist):
    """exp(-sigma_t * dist) per channel; 1 for vacuum."""
    _, _, st = _tables(scene, mi)
    tr = jnp.exp(-st * jnp.maximum(dist, 0.0)[..., None])
    return jnp.where(jnp.max(tr, axis=-1, keepdims=True) < 1e-20, 0.0, tr)


def sample_distance(scene: Scene, mi, o, d, t_max, u, strategy=NORMAL,
                    force_weight_one=False, u_channel=None) -> MediumSample:
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

    return MediumSample(
        success=success, t=t, p=o + d * t[..., None],
        transmittance=jnp.where(in_med[..., None], tr, 1.0),
        pdf_success=pdf_success, pdf_failure=pdf_failure,
        sigma_s=ss, sigma_a=sa)


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
