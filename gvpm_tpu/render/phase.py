"""Phase functions: isotropic, Henyey-Greenstein, Rayleigh — batched.

reference: src/phase/{isotropic.cpp,hg.cpp,rayleigh.cpp}. Value == pdf
for all (normalized over the sphere), so eval() returns one number per
lane. Directions follow the flow convention of the reference's
PhaseFunction: `wi` points toward the previous vertex, `wo` toward the
next; the scattering cosine uses the *forward* direction -wi against wo.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.math import coordinate_system, dot, safe_sqrt, to_world
from ..scene.types import PHASE_HG, PHASE_RAYLEIGH, Scene
from ..core.tables import take


def rayleigh_pdf(cos_theta):
    """Rayleigh phase value 3/(16pi)(1+cos^2)."""
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)


def _rayleigh_sample_cos(u):
    """Invert the Rayleigh CDF: solve c^3 + 3c + (4 - 8u) = 0 (Cardano,
    single real root — rayleigh.cpp solves the same cubic)."""
    d = 4.0 - 8.0 * u
    s = jnp.sqrt(d * d * 0.25 + 1.0)
    return jnp.cbrt(-0.5 * d + s) + jnp.cbrt(-0.5 * d - s)


def eval_phase(scene: Scene, mi, wi, wo):
    """p(wi -> wo); returns [N]. mi: medium index per lane (>= 0)."""
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = take(scene.med_g, idx)
    ptype = take(scene.med_phase, idx)
    cos_theta = dot(-wi, wo)
    hg = warp.hg_pdf(cos_theta, g)
    iso = jnp.full_like(hg, warp.INV_FOURPI)
    ray = rayleigh_pdf(cos_theta)
    return jnp.where(ptype == PHASE_HG, hg,
                     jnp.where(ptype == PHASE_RAYLEIGH, ray, iso))


def pdf_phase(scene: Scene, mi, wi, wo):
    return eval_phase(scene, mi, wi, wo)


def sample_phase(scene: Scene, mi, wi, u2):
    """Sample wo; returns (wo [N,3], pdf [N]). Weight is always 1."""
    idx = jnp.clip(mi, 0, scene.med_g.shape[0] - 1)
    g = take(scene.med_g, idx)
    ptype = take(scene.med_phase, idx)
    fwd = -wi
    d_local, pdf_hg = warp.square_to_hg(u2, g)
    s, t = coordinate_system(fwd)
    wo_hg = to_world(fwd, s, t, d_local)
    wo_iso = warp.square_to_uniform_sphere(u2)
    # rayleigh: exact CDF inversion around the forward axis
    cos_r = jnp.clip(_rayleigh_sample_cos(u2[..., 0]), -1.0, 1.0)
    sin_r = safe_sqrt(1.0 - cos_r * cos_r)
    phi = 2.0 * jnp.pi * u2[..., 1]
    wo_ray = to_world(fwd, s, t, jnp.stack(
        [sin_r * jnp.cos(phi), sin_r * jnp.sin(phi), cos_r], axis=-1))
    is_hg = (ptype == PHASE_HG)
    is_ray = (ptype == PHASE_RAYLEIGH)
    wo = jnp.where(is_hg[..., None], wo_hg,
                   jnp.where(is_ray[..., None], wo_ray, wo_iso))
    pdf = jnp.where(is_hg, pdf_hg,
                    jnp.where(is_ray, rayleigh_pdf(cos_r),
                              warp.INV_FOURPI))
    return wo, pdf
