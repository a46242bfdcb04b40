"""Phase functions: isotropic + Henyey-Greenstein, batched.

reference: src/phase/{isotropic.cpp,hg.cpp}. Value == pdf for both
(normalized over the sphere), so eval() returns one number per lane.
Directions follow the flow convention of the reference's PhaseFunction:
`wi` points toward the previous vertex, `wo` toward the next; the HG cosine
uses the *forward* direction -wi against wo.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.math import coordinate_system, dot, to_world
from ..scene.types import PHASE_HG, Scene


def eval_phase(scene: Scene, mi, wi, wo):
    """p(wi -> wo); returns [N]. mi: medium index per lane (>= 0)."""
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = scene.med_g[idx]
    ptype = scene.med_phase[idx]
    cos_theta = dot(-wi, wo)
    hg = warp.hg_pdf(cos_theta, g)
    iso = jnp.full_like(hg, warp.INV_FOURPI)
    return jnp.where(ptype == PHASE_HG, hg, iso)


def pdf_phase(scene: Scene, mi, wi, wo):
    return eval_phase(scene, mi, wi, wo)


def sample_phase(scene: Scene, mi, wi, u2):
    """Sample wo; returns (wo [N,3], pdf [N]). Weight is always 1."""
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = scene.med_g[idx]
    ptype = scene.med_phase[idx]
    fwd = -wi
    d_local, pdf_hg = warp.square_to_hg(u2, g)
    s, t = coordinate_system(fwd)
    wo_hg = to_world(fwd, s, t, d_local)
    wo_iso = warp.square_to_uniform_sphere(u2)
    is_hg = (ptype == PHASE_HG)
    wo = jnp.where(is_hg[..., None], wo_hg, wo_iso)
    pdf = jnp.where(is_hg, pdf_hg, warp.INV_FOURPI)
    return wo, pdf
