"""Media-aware visibility: transmittance along segments through null
boundaries (reference: Scene::evalTransmittance walking through null BSDFs
+ attached media, src/librender/scene.cpp).

Media are delimited by BSDF_NULL surfaces carrying interior/exterior medium
indices; crossing one switches the active medium by surface sidedness.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..scene.intersect import intersect
from ..scene.types import BSDF_NULL, Scene
from . import medium as med
from ..core.math import dot

MAX_NULL_CROSSINGS = 4
SEG_EPS = 1e-3


def medium_transition(scene: Scene, prim, ng, d):
    """Medium index after crossing `prim` along direction d."""
    entering = dot(d, ng) < 0.0
    return jnp.where(entering, scene.prim_med_in(prim),
                     scene.prim_med_out(prim))


def segment_transmittance(scene: Scene, a, b, med_start):
    """Transmittance of open segment a->b given the medium at a.

    Returns [N,3]; zero where a non-null surface blocks the segment.
    Handles up to MAX_NULL_CROSSINGS null-boundary crossings.
    """
    seg = b - a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-20))
    d = seg / dist[:, None]

    def step(carry, _):
        o, remaining, cur_med, tr, alive = carry
        hit = intersect(scene, o + d * SEG_EPS,
                        d, t_max=remaining - 2.0 * SEG_EPS)
        seg_len = jnp.where(hit.valid, hit.t + SEG_EPS, remaining)
        tr_new = tr * med.transmittance(scene, cur_med, seg_len,
                                        o=o + d * SEG_EPS, d=d)
        bi = scene.prim_bsdf(hit.prim)
        is_null = hit.valid & (scene.bsdf_type[
            jnp.clip(bi, 0, scene.bsdf_type.shape[0] - 1)] == BSDF_NULL)
        blocked = hit.valid & ~is_null
        tr_new = jnp.where(blocked[:, None], 0.0, tr_new)
        new_med = medium_transition(scene, hit.prim, hit.ng, d)
        cur_med = jnp.where(is_null, new_med, cur_med)
        o_new = jnp.where(hit.valid[:, None], hit.p, o)
        rem_new = jnp.where(hit.valid, remaining - seg_len, 0.0)
        alive_new = alive & is_null & (rem_new > SEG_EPS)
        tr = jnp.where(alive[:, None], tr_new, tr)
        return (jnp.where(alive[:, None], o_new, o),
                jnp.where(alive, rem_new, remaining),
                cur_med, tr, alive_new), None

    n = a.shape[0]
    init = (a, dist, jnp.broadcast_to(med_start, (n,)),
            jnp.ones((n, 3)), jnp.ones((n,), bool))
    (o, rem, cm, tr, alive), _ = lax.scan(step, init, None,
                                          length=MAX_NULL_CROSSINGS)
    # lanes still alive after K crossings: treat as blocked (conservative)
    return jnp.where(alive[:, None], 0.0, tr)
