"""Batched 3D math primitives.

All functions are shape-polymorphic over leading batch dimensions: a "vector"
is an array whose last axis has size 3. Everything is pure jnp so it traces
under jit/vmap/shard_map.

Replaces the reference's scalar Point/Vector/Normal/Frame/AABB/Ray classes
(reference: include/mitsuba/core/{vector.h,frame.h,aabb.h,ray.h}) with
structure-of-arrays equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-4          # ray epsilon (reference uses Epsilon = 1e-4 for Float=float)
DELTA_EPS = 1e-6    # pdf/denominator guard
INF = jnp.inf


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def length2(v, keepdims=False):
    return dot(v, v, keepdims=keepdims)


def normalize(v):
    return v * jnp.reciprocal(jnp.maximum(length(v, keepdims=True), 1e-20))


def normalize_with_length(v):
    l = jnp.maximum(length(v, keepdims=True), 1e-20)
    return v / l, l[..., 0]


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rcp(x, eps=1e-20):
    """Reciprocal with sign-preserving clamp away from zero."""
    ax = jnp.maximum(jnp.abs(x), eps)
    return jnp.sign(jnp.where(x == 0.0, 1.0, x)) / ax


def lerp(a, b, t):
    return a + (b - a) * t


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Duff et al. branchless ONB — batched, no data-dependent branches
    (reference frame.h uses coordinateSystem(); this is the TPU-friendly
    version).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    t = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return s, t


def to_local(n, s, t, v):
    """World vector -> local frame coords (x along s, y along t, z along n)."""
    return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)


def to_world(n, s, t, v):
    return (s * v[..., 0:1] + t * v[..., 1:2] + n * v[..., 2:3])


def reflect_local(wo):
    """Mirror reflection in the local frame (z = normal)."""
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def reflect(w, n):
    """Reflect world-space direction w about normal n (w points away)."""
    return 2.0 * dot(w, n, keepdims=True) * n - w


def refract_local(wi, eta):
    """Refraction in local frame. wi points away from surface.

    eta = int_ior/ext_ior of the surface. Returns (wt, total_internal_refl).
    """
    cos_i = wi[..., 2]
    rel_eta = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    sin2_t = (1.0 - cos_i * cos_i) / (rel_eta * rel_eta)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    cos_t = jnp.where(cos_i > 0.0, -cos_t, cos_t)
    scale = -1.0 / rel_eta
    wt = jnp.stack([scale * wi[..., 0], scale * wi[..., 1], cos_t], axis=-1)
    return wt, tir


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance for dielectrics.

    cos_i signed (positive = outside). eta = int/ext IOR ratio.
    Returns (F, cos_t) with cos_t signed opposite to cos_i.
    """
    rel_eta = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    abs_ci = jnp.abs(cos_i)
    sin2_t = (1.0 - abs_ci * abs_ci) / (rel_eta * rel_eta)
    tir = sin2_t >= 1.0
    abs_ct = safe_sqrt(1.0 - sin2_t)
    r_s = (abs_ci - rel_eta * abs_ct) / jnp.maximum(abs_ci + rel_eta * abs_ct, 1e-12)
    r_p = (rel_eta * abs_ci - abs_ct) / jnp.maximum(rel_eta * abs_ci + abs_ct, 1e-12)
    F = 0.5 * (r_s * r_s + r_p * r_p)
    F = jnp.where(tir, 1.0, F)
    cos_t = jnp.where(cos_i > 0.0, -abs_ct, abs_ct)
    return F, cos_t


def fresnel_conductor(cos_i, eta, k):
    """Approximate unpolarized conductor Fresnel (per-channel eta, k)."""
    ci2 = jnp.clip(cos_i * cos_i, 0.0, 1.0)[..., None]
    e2k2 = eta * eta + k * k
    t0 = e2k2 * ci2
    two_e_ci = 2.0 * eta * jnp.sqrt(ci2)
    r_par2 = (t0 - two_e_ci + 1.0 - ci2 + ci2 * ci2) / jnp.maximum(
        t0 + two_e_ci + 1.0 - ci2 + ci2 * ci2, 1e-12)
    r_perp2 = (e2k2 - two_e_ci + ci2) / jnp.maximum(e2k2 + two_e_ci + ci2, 1e-12)
    return jnp.clip(0.5 * (r_par2 + r_perp2), 0.0, 1.0)


# ---------------------------------------------------------------------------
# AABB helpers (arrays of [min(3), max(3)] pairs)
# ---------------------------------------------------------------------------

def aabb_union(lo_a, hi_a, lo_b, hi_b):
    return jnp.minimum(lo_a, lo_b), jnp.maximum(hi_a, hi_b)


def ray_aabb(o, d, lo, hi, t_min=0.0, t_max=jnp.inf):
    """Slab test. Returns (hit, near, far)."""
    inv = safe_rcp(d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    near = jnp.maximum(near, t_min)
    far = jnp.minimum(far, t_max)
    return near <= far, near, far


def spherical_direction(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def max_component(v):
    return jnp.max(v, axis=-1)


def mean_component(v):
    return jnp.mean(v, axis=-1)
