"""Batched ray-scene intersection.

The reference accelerates with a SAH kd-tree + SSE traversal
(include/mitsuba/render/{skdtree.h:69,gkdtree.h:706,sahkdtree3.h:107}).
Pointer-chasing trees are hostile to the TPU's vector units, so the
TPU-native design streams *all* primitives against the ray batch in fixed
tiles with a running min — a wavefront any/closest-hit that is pure VPU
work, fuses under XLA, and is exact.

Why no BVH/grid traversal on-device (measured roofline, v5e): any
tree/grid walk turns intersection into per-ray GATHERS of node/triangle
rows, and TPU gathers pay per index — measured ~75M 128-byte-row
gathers/s, vs ~0.5 Tflop/s of VPU streaming where triangle tiles are
broadcast constants (no gathers at all). A 32-tris-per-cell DDA walk of
~64 steps costs ~2k row-gathers per ray (~7 s for a 262k-ray wavefront);
brute-force streaming of T triangles costs ~60*T flops per ray (~3 s at
T=50k, linear in T). Break-even is T ~ 2e5 primitives — far above the
paper scenes (O(10^2..10^4) prims), so streaming IS the accelerator on
this hardware. The native binned-SAH BVH (native/host_ops.cpp
gv_build_bvh) remains the host-side index for mesh tooling and is the
building block for a coarse-front + ray-sorted traversal if >2e5-prim
scenes become a target.

Exports:
  intersect(scene, o, d, t_max) -> Hit        (closest hit)
  occluded(scene, a, b)         -> bool mask  (segment visibility)
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from ..core.math import EPS, cross, dot, normalize, safe_rcp
from ..core.tables import take
from .types import Scene

TILE = 256  # triangle tile per scan step; keeps temps ~ N*TILE floats


@flax.struct.dataclass
class Hit:
    valid: jnp.ndarray    # [N] bool
    t: jnp.ndarray        # [N]
    prim: jnp.ndarray     # [N] int32 global prim id
    uv: jnp.ndarray       # [N,2] triangle barycentrics (unused for spheres)
    p: jnp.ndarray        # [N,3]
    ng: jnp.ndarray       # [N,3] geometric normal
    ns: jnp.ndarray       # [N,3] shading normal
    wi: jnp.ndarray       # [N,3] direction toward the origin of the ray


def _tri_tile_hit(o, d, p0, e1, e2, t_best):
    """Moller-Trumbore for a tile: o,d [N,3]; p0,e1,e2 [K,3]."""
    pvec = cross(d[:, None, :], e2[None, :, :])              # [N,K,3]
    det = dot(e1[None], pvec)                                # [N,K]
    inv_det = safe_rcp(det)
    tvec = o[:, None, :] - p0[None, :, :]
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1[None, :, :])
    v = dot(d[:, None, :], qvec) * inv_det
    t = dot(e2[None], qvec) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > EPS) & (t < t_best[:, None]))
    t = jnp.where(ok, t, jnp.inf)
    k = jnp.argmin(t, axis=1)                                # [N]
    n = jnp.arange(o.shape[0])
    return t[n, k], k, u[n, k], v[n, k]


def _sphere_hit(o, d, c, r, t_best):
    """Analytic sphere hit: c [S,3], r [S]. Returns per-ray best."""
    oc = o[:, None, :] - c[None, :, :]                       # [N,S,3]
    b = dot(oc, d[:, None, :])
    cq = dot(oc, oc) - (r * r)[None, :]
    disc = b * b - cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > EPS, t0, t1)
    ok = ok & (t > EPS) & (t < t_best[:, None])
    t = jnp.where(ok, t, jnp.inf)
    s = jnp.argmin(t, axis=1)
    n = jnp.arange(o.shape[0])
    return t[n, s], s


def _scan_tris(scene: Scene, o, d, t_max):
    T = scene.n_tris
    n_tiles = -(-T // TILE)
    pad = n_tiles * TILE - T
    p0 = jnp.pad(scene.tri_p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(scene.tri_e1, ((0, pad), (0, 0)),
                 constant_values=0.0)
    e2 = jnp.pad(scene.tri_e2, ((0, pad), (0, 0)))
    p0 = p0.reshape(n_tiles, TILE, 3)
    e1 = e1.reshape(n_tiles, TILE, 3)
    e2 = e2.reshape(n_tiles, TILE, 3)

    def step(carry, tile):
        t_best, idx, uu, vv = carry
        tp0, te1, te2, base = tile
        t, k, u, v = _tri_tile_hit(o, d, tp0, te1, te2, t_best)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        idx = jnp.where(better, base + k.astype(jnp.int32), idx)
        uu = jnp.where(better, u, uu)
        vv = jnp.where(better, v, vv)
        return (t_best, idx, uu, vv), None

    n = o.shape[0]
    init = (jnp.full((n,), jnp.inf).at[:].set(t_max),
            jnp.full((n,), -1, jnp.int32), jnp.zeros((n,)), jnp.zeros((n,)))
    bases = (jnp.arange(n_tiles) * TILE).astype(jnp.int32)
    (t_best, idx, u, v), _ = lax.scan(step, init, (p0, e1, e2, bases))
    return t_best, idx, u, v


def intersect(scene: Scene, o, d, t_max=None) -> Hit:
    """Closest hit for a ray batch. o,d: [N,3]; d must be normalized."""
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), jnp.inf)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max), (n,))

    t_best, idx, u, v = _scan_tris(scene, o, d, t_max)

    prim = idx
    if scene.n_spheres > 0:
        ts, si = _sphere_hit(o, d, scene.sph_center, scene.sph_radius, t_best)
        sph_better = ts < t_best
        t_best = jnp.where(sph_better, ts, t_best)
        prim = jnp.where(sph_better, scene.n_tris + si.astype(jnp.int32), idx)

    valid = (prim >= 0) & jnp.isfinite(t_best)
    p = o + d * t_best[:, None]

    # normals
    ti = jnp.clip(prim, 0, scene.n_tris - 1)
    ng_tri = normalize(cross(take(scene.tri_e1, ti), take(scene.tri_e2, ti)))
    vn = take(scene.tri_vn, ti)                              # [N,3,3]
    w = jnp.stack([1.0 - u - v, u, v], axis=-1)              # [N,3]
    ns_tri = normalize(jnp.sum(vn * w[..., None], axis=-2))
    if scene.n_spheres > 0:
        si = jnp.clip(prim - scene.n_tris, 0, scene.n_spheres - 1)
        ng_sph = normalize(p - take(scene.sph_center, si))
        is_tri = prim < scene.n_tris
        ng = jnp.where(is_tri[:, None], ng_tri, ng_sph)
        ns = jnp.where(is_tri[:, None], ns_tri, ng_sph)
    else:
        ng, ns = ng_tri, ns_tri

    return Hit(valid=valid, t=jnp.where(valid, t_best, jnp.inf), prim=prim,
               uv=jnp.stack([u, v], axis=-1), p=p, ng=ng, ns=ns, wi=-d)


def occluded(scene: Scene, a, b, eps=1e-3):
    """True where the open segment a->b is blocked (shadow ray).

    NULL-BSDF boundaries count as blockers here; transmittance through
    media/null surfaces is handled by the caller (evalTransmittance path,
    reference: scene.cpp). Use `segment_transmittance` in render.medium for
    media-aware visibility.
    """
    seg = b - a
    dist = jnp.sqrt(jnp.maximum(dot(seg, seg), 1e-20))
    d = seg / dist[:, None]
    hit = intersect(scene, a + d * (eps * dist)[:, None], d,
                    t_max=dist * (1.0 - 2.0 * eps))
    return hit.valid
