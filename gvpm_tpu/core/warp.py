"""Sampling warps: [0,1)^2 -> distributions on spheres/disks/triangles.

Batched re-design of the reference's warping utilities
(src/libcore/warp.cpp). Every warp returns (value, pdf) where useful so
integrators never re-derive densities.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)
FOURPI = 4.0 * jnp.pi


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf():
    return INV_FOURPI


def square_to_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_cosine_hemisphere(u):
    """Concentric-disk based cosine hemisphere sample (warp.cpp analog)."""
    d = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * INV_PI


def square_to_uniform_disk_concentric(u):
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    phi = jnp.where(
        use_x,
        (jnp.pi / 4.0) * jnp.where(jnp.abs(x) > 1e-12, y / jnp.where(x == 0, 1.0, x), 0.0),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * jnp.where(jnp.abs(y) > 1e-12, x / jnp.where(y == 0, 1.0, y), 0.0),
    )
    both_zero = (x == 0.0) & (y == 0.0)
    r = jnp.where(both_zero, 0.0, r)
    phi = jnp.where(both_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk(u):
    """Uniform unit disk (polar mapping); returns (x, y)."""
    r = safe_sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in the cone around +z with the given cutoff
    cosine; returns (d, pdf_sa) (warp.cpp squareToUniformCone)."""
    cos_t = 1.0 - u[..., 0] * (1.0 - cos_cutoff)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    d = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                  axis=-1)
    pdf = INV_TWOPI / jnp.maximum(1.0 - cos_cutoff, 1e-12)
    return d, jnp.broadcast_to(pdf, cos_t.shape)


def square_to_uniform_triangle(u):
    """Barycentric sample of the unit triangle; returns (b1, b2)."""
    su = safe_sqrt(u[..., 0])
    b1 = 1.0 - su
    b2 = u[..., 1] * su
    return jnp.stack([b1, b2], axis=-1)


def square_to_hg(u, g):
    """Henyey-Greenstein direction around +z, with pdf.

    reference: src/phase/hg.cpp sample(); g broadcastable over batch.
    """
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-3
    # HG inversion
    sqr = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * u[..., 0], 1e-12)
    cos_t_hg = jnp.where(
        jnp.abs(g) > 1e-12,
        (1.0 + g * g - sqr * sqr) / jnp.maximum(2.0 * g, jnp.where(g >= 0, 1e-12, -jnp.inf)),
        0.0,
    )
    # guard g ~ 0 via isotropic branch
    cos_t = jnp.where(iso, 1.0 - 2.0 * u[..., 0], jnp.clip(cos_t_hg, -1.0, 1.0))
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    d = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return d, hg_pdf(cos_t, g)


def hg_pdf(cos_theta, g):
    """HG phase function value == its pdf (normalized over sphere).

    cos_theta is between the incoming and outgoing PROPAGATION directions
    (forward scattering = +1), hence the -2g term. Mitsuba's hg.cpp uses
    +dot(wi,wo) because its wi points backward — same function.
    """
    g = jnp.asarray(g)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.maximum(denom * safe_sqrt(denom), 1e-12)


def square_to_exponential(u, sigma):
    """Distance with pdf sigma*exp(-sigma*t); returns (t, pdf)."""
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sigma
    return t, sigma * jnp.exp(-sigma * t)
