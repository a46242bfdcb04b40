"""Host-side scene construction (numpy), compiled into a `Scene` pytree.

Replaces the reference's XML SceneHandler + Properties + PluginManager
pipeline (reference: include/mitsuba/render/scenehandler.h:83,
src/libcore/properties.cpp, plugin.cpp) with a small imperative Python API:

    b = SceneBuilder()
    white = b.diffuse([0.8, 0.8, 0.8])
    med   = b.homogeneous(sigma_a=[...], sigma_s=[...], g=0.0)
    b.rectangle(origin, edge1, edge2, bsdf=white)
    b.area_light(..., radiance=[10,10,10])
    b.camera(origin, target, up, fov=45)
    scene = b.build()

All geometry becomes triangles or analytic spheres; emitters are area
emitters attached to prims (the only type gvpm supports — reference
gvpm.cpp:148-158 errors on anything else).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.spectrum import luminance
from .types import (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE, BSDF_NULL,
                    BSDF_PHONG, BSDF_PLASTIC, BSDF_ROUGH_CONDUCTOR,
                    BSDF_ROUGH_DIELECTRIC, DE_DIRECTIONAL, DE_POINT, DE_SPOT,
                    NO_EMITTER, NO_MEDIUM, PHASE_HG, PHASE_ISOTROPIC, Scene)


def _v(x):
    return np.asarray(x, dtype=np.float32)


def look_at(origin, target, up):
    """Camera-to-world matrix; camera space: +x right, +y up, +z forward."""
    origin, target, up = _v(origin), _v(target), _v(up)
    fwd = target - origin
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        raise ValueError("up parallel to viewing direction")
    right /= np.linalg.norm(right)
    new_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = new_up
    m[:3, 2] = fwd
    m[:3, 3] = origin
    return m


class SceneBuilder:
    def __init__(self):
        self._tris = []          # (p0, e1, e2, vn(3,3), bsdf, emitter, mi, mo)
        self._spheres = []       # (c, r, bsdf, emitter, mi, mo)
        self._bsdfs = []         # dict rows
        self._media = []         # dict rows
        self._emitters = []      # radiance rows
        self._delta = []         # delta/infinite emitter rows (dicts)
        self._env = (0.0, 0.0, 0.0)
        self._env_map = None
        self._het = None         # heterogeneous medium (at most one)
        self._cam = None
        self._cam_medium = NO_MEDIUM

    # ---------------- materials ----------------
    def _add_bsdf(self, **row):
        base = dict(type=BSDF_DIFFUSE, albedo=(0.5, 0.5, 0.5), eta=1.5,
                    k=(0.0, 0.0, 0.0), eta3=(1.0, 1.0, 1.0), alpha=0.1)
        base.update(row)
        self._bsdfs.append(base)
        return len(self._bsdfs) - 1

    def diffuse(self, albedo):
        return self._add_bsdf(type=BSDF_DIFFUSE, albedo=tuple(albedo))

    def conductor(self, eta3=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                  reflectance=(1.0, 1.0, 1.0)):
        return self._add_bsdf(type=BSDF_CONDUCTOR, albedo=tuple(reflectance),
                              eta3=tuple(eta3), k=tuple(k))

    def dielectric(self, int_ior=1.5, ext_ior=1.0):
        return self._add_bsdf(type=BSDF_DIELECTRIC, eta=int_ior / ext_ior,
                              albedo=(1.0, 1.0, 1.0))

    def rough_conductor(self, alpha=0.1, eta3=(0.2, 0.92, 1.1),
                        k=(3.9, 2.45, 2.14), reflectance=(1.0, 1.0, 1.0)):
        return self._add_bsdf(type=BSDF_ROUGH_CONDUCTOR, alpha=alpha,
                              albedo=tuple(reflectance), eta3=tuple(eta3),
                              k=tuple(k))

    def rough_dielectric(self, alpha=0.1, int_ior=1.5, ext_ior=1.0):
        return self._add_bsdf(type=BSDF_ROUGH_DIELECTRIC, alpha=alpha,
                              eta=int_ior / ext_ior, albedo=(1.0, 1.0, 1.0))

    def phong(self, diffuse=(0.5, 0.5, 0.5), specular=(0.2, 0.2, 0.2),
              exponent=30.0):
        # phong stores: albedo = diffuse refl, k = specular refl, alpha = exponent
        return self._add_bsdf(type=BSDF_PHONG, albedo=tuple(diffuse),
                              k=tuple(specular), alpha=exponent)

    def plastic(self, diffuse=(0.5, 0.5, 0.5), int_ior=1.49):
        return self._add_bsdf(type=BSDF_PLASTIC, albedo=tuple(diffuse),
                              eta=int_ior)

    def null_bsdf(self):
        return self._add_bsdf(type=BSDF_NULL, albedo=(1.0, 1.0, 1.0))

    # ---------------- media ----------------
    def homogeneous(self, sigma_a, sigma_s, g=0.0, phase="auto"):
        """phase: 'auto' (isotropic / hg by g), 'isotropic', 'hg',
        'rayleigh' (src/phase/rayleigh.cpp)."""
        from .types import PHASE_RAYLEIGH
        if phase == "auto":
            pid = PHASE_ISOTROPIC if abs(g) < 1e-6 else PHASE_HG
        else:
            pid = {"isotropic": PHASE_ISOTROPIC, "hg": PHASE_HG,
                   "rayleigh": PHASE_RAYLEIGH}[phase]
        self._media.append(dict(sigma_a=tuple(sigma_a), sigma_s=tuple(sigma_s),
                                g=g, phase=pid))
        return len(self._media) - 1

    def heterogeneous(self, density, lo, hi, sigma_t_scale=(1.0, 1.0, 1.0),
                      albedo=(0.9, 0.9, 0.9), g=0.0, phase="auto"):
        """Grid-density medium (src/medium/heterogeneous.cpp):
        sigma_t(x) = trilinear(density, x) * sigma_t_scale;
        sigma_s = albedo * sigma_t. density: numpy [Gx,Gy,Gz] >= 0.
        One heterogeneous medium per scene (delta/ratio tracking)."""
        if self._het is not None:
            raise ValueError("only one heterogeneous medium per scene")
        density = np.asarray(density, np.float32)
        if density.ndim != 3:
            raise ValueError("density must be [Gx,Gy,Gz]")
        # the medium-table row carries the phase function and the
        # majorant-level coefficients (used by homogeneous-only paths)
        maj_sig = density.max() * np.asarray(sigma_t_scale, np.float32)
        mid = self.homogeneous(
            sigma_a=tuple(maj_sig * (1.0 - np.asarray(albedo))),
            sigma_s=tuple(maj_sig * np.asarray(albedo)), g=g, phase=phase)
        self._het = dict(density=density, lo=_v(lo), hi=_v(hi),
                         scale=_v(sigma_t_scale), albedo=_v(albedo),
                         medium=mid)
        return mid

    # ---------------- emitters ----------------
    def _add_emitter(self, radiance):
        self._emitters.append(tuple(radiance))
        return len(self._emitters) - 1

    # ---------------- geometry ----------------
    def triangle(self, p0, p1, p2, bsdf, emitter=NO_EMITTER,
                 med_in=NO_MEDIUM, med_out=NO_MEDIUM, normals=None):
        p0, p1, p2 = _v(p0), _v(p1), _v(p2)
        e1, e2 = p1 - p0, p2 - p0
        ng = np.cross(e1, e2)
        n = np.linalg.norm(ng)
        if n < 1e-12:
            return
        ng = ng / n
        vn = np.stack([ng, ng, ng]) if normals is None else _v(normals)
        self._tris.append((p0, e1, e2, vn, bsdf, emitter, med_in, med_out))

    def rectangle(self, origin, edge1, edge2, bsdf, emitter=NO_EMITTER,
                  med_in=NO_MEDIUM, med_out=NO_MEDIUM):
        """Two triangles; geometric normal = edge1 x edge2 direction."""
        o, e1, e2 = _v(origin), _v(edge1), _v(edge2)
        self.triangle(o, o + e1, o + e1 + e2, bsdf, emitter, med_in, med_out)
        self.triangle(o, o + e1 + e2, o + e2, bsdf, emitter, med_in, med_out)

    def cube(self, lo, hi, bsdf, emitter=NO_EMITTER, med_in=NO_MEDIUM,
             med_out=NO_MEDIUM, inward=False):
        """Axis-aligned box; normals face outward unless inward=True."""
        lo, hi = _v(lo), _v(hi)
        d = hi - lo
        ex, ey, ez = (np.array([d[0], 0, 0], np.float32),
                      np.array([0, d[1], 0], np.float32),
                      np.array([0, 0, d[2]], np.float32))
        faces = [
            (lo, ey, ex),            # z = lo (normal -z)
            (lo + ez, ex, ey),       # z = hi (normal +z)
            (lo, ex, ez),            # y = lo (normal -y)
            (lo + ey, ez, ex),       # y = hi (normal +y)
            (lo, ez, ey),            # x = lo (normal -x)
            (lo + ex, ey, ez),       # x = hi (normal +x)
        ]
        for o, e1, e2 in faces:
            if inward:
                e1, e2 = e2, e1
            self.rectangle(o, e1, e2, bsdf, emitter, med_in, med_out)

    def sphere(self, center, radius, bsdf, emitter=NO_EMITTER,
               med_in=NO_MEDIUM, med_out=NO_MEDIUM):
        self._spheres.append((_v(center), float(radius), bsdf, emitter,
                              med_in, med_out))

    def mesh(self, vertices, faces, bsdf, emitter=NO_EMITTER,
             med_in=NO_MEDIUM, med_out=NO_MEDIUM, normals=None):
        """Indexed triangle mesh (vertices [V,3], faces [F,3] int)."""
        vertices = _v(vertices)
        faces = np.asarray(faces, dtype=np.int64)
        for f in faces:
            vn = None if normals is None else _v(normals)[f]
            self.triangle(vertices[f[0]], vertices[f[1]], vertices[f[2]],
                          bsdf, emitter, med_in, med_out, normals=vn)

    def area_light(self, radiance):
        """Returns an emitter id to attach to geometry."""
        return self._add_emitter(radiance)

    def point_light(self, position, intensity, medium=NO_MEDIUM):
        """Isotropic point light (emitters/point.cpp); intensity in W/sr."""
        self._delta.append(dict(type=DE_POINT, p=tuple(position),
                                dir=(0.0, 0.0, 1.0),
                                intensity=tuple(intensity),
                                cos_cutoff=-1.0, cos_falloff=-1.0,
                                medium=medium))

    def spot_light(self, position, target, intensity, cutoff_deg=20.0,
                   beam_width_deg=None, medium=NO_MEDIUM):
        """Spot light with linear falloff between beamWidth and cutoff
        (emitters/spot.cpp: falloffCurve)."""
        if beam_width_deg is None:
            beam_width_deg = cutoff_deg * 0.75
        axis = _v(target) - _v(position)
        axis = axis / np.linalg.norm(axis)
        self._delta.append(dict(
            type=DE_SPOT, p=tuple(position), dir=tuple(axis),
            intensity=tuple(intensity),
            cos_cutoff=float(np.cos(np.radians(cutoff_deg))),
            cos_falloff=float(np.cos(np.radians(beam_width_deg))),
            medium=medium))

    def directional_light(self, direction, irradiance, medium=NO_MEDIUM):
        """Distant directional light (emitters/directional.cpp);
        irradiance on a surface facing the light, W/m^2."""
        d = _v(direction)
        d = d / np.linalg.norm(d)
        self._delta.append(dict(type=DE_DIRECTIONAL, p=(0.0, 0.0, 0.0),
                                dir=tuple(d), intensity=tuple(irradiance),
                                cos_cutoff=-1.0, cos_falloff=-1.0,
                                medium=medium))

    def constant_env(self, radiance):
        """Constant environment emitter (emitters/constant.cpp)."""
        self._env = tuple(radiance)

    def envmap(self, image, scale=(1.0, 1.0, 1.0)):
        """Lat-long environment map (emitters/envmap.cpp): image [He,We,3]
        HDR texels, y-up spherical parameterization, luminance
        importance-sampled for NEE and photon emission."""
        img = np.asarray(image, np.float32)
        assert img.ndim == 3 and img.shape[2] == 3, img.shape
        self._env_map = img
        self._env = tuple(scale)

    def medium_box(self, lo, hi, medium, bsdf=None):
        """Axis-aligned null-boundary box filled with `medium`."""
        if bsdf is None:
            bsdf = self.null_bsdf()
        self.cube(lo, hi, bsdf, med_in=medium, med_out=NO_MEDIUM)

    # ---------------- camera ----------------
    def camera(self, origin, target, up=(0, 1, 0), fov=45.0,
               medium=NO_MEDIUM, aperture_radius=0.0,
               focus_distance=None):
        """Perspective pinhole; aperture_radius > 0 makes a thinlens
        sensor focused at focus_distance (default: |target - origin|)."""
        if focus_distance is None:
            focus_distance = float(np.linalg.norm(_v(target) - _v(origin)))
        self._cam = (look_at(origin, target, up), float(fov),
                     float(aperture_radius), float(focus_distance))
        self._cam_medium = medium

    # ---------------- build ----------------
    def build(self, width=256, height=256) -> Scene:
        if self._cam is None:
            raise ValueError("no camera set")
        T = max(len(self._tris), 1)
        if not self._tris:  # degenerate placeholder triangle far away
            self._tris.append((_v([1e8, 1e8, 1e8]), _v([1, 0, 0]),
                               _v([0, 1, 0]),
                               np.tile(_v([0, 0, 1]), (3, 1)), 0, NO_EMITTER,
                               NO_MEDIUM, NO_MEDIUM))
            T = 1
        if not self._bsdfs:
            self.diffuse((0.5, 0.5, 0.5))
        if not self._media:  # dummy vacuum medium so tables are non-empty
            self._media.append(dict(sigma_a=(0., 0., 0.), sigma_s=(0., 0., 0.),
                                    g=0.0, phase=PHASE_ISOTROPIC))
        if not self._emitters:
            self._emitters.append((0.0, 0.0, 0.0))

        tp0 = np.stack([t[0] for t in self._tris])
        te1 = np.stack([t[1] for t in self._tris])
        te2 = np.stack([t[2] for t in self._tris])
        tvn = np.stack([t[3] for t in self._tris])
        tb = np.array([t[4] for t in self._tris], np.int32)
        tem = np.array([t[5] for t in self._tris], np.int32)
        tmi = np.array([t[6] for t in self._tris], np.int32)
        tmo = np.array([t[7] for t in self._tris], np.int32)

        S = len(self._spheres)
        if S:
            sc = np.stack([s[0] for s in self._spheres])
            sr = np.array([s[1] for s in self._spheres], np.float32)
            sb = np.array([s[2] for s in self._spheres], np.int32)
            sem = np.array([s[3] for s in self._spheres], np.int32)
            smi = np.array([s[4] for s in self._spheres], np.int32)
            smo = np.array([s[5] for s in self._spheres], np.int32)
        else:
            sc = np.zeros((0, 3), np.float32)
            sr = np.zeros((0,), np.float32)
            sb = sem = smi = smo = np.zeros((0,), np.int32)

        # emitter flux CDF over emissive prims (Scene::weightEmitterFlux)
        em_rad = np.asarray(self._emitters, np.float32)
        em_prim, em_area, em_flux = [], [], []
        tri_area = 0.5 * np.linalg.norm(np.cross(te1, te2), axis=-1)
        for i in range(len(self._tris)):
            if tem[i] != NO_EMITTER:
                em_prim.append(i)
                em_area.append(tri_area[i])
                em_flux.append(tri_area[i] * np.pi *
                               float(luminance(jnp.asarray(em_rad[tem[i]]))))
        for i in range(S):
            if sem[i] != NO_EMITTER:
                em_prim.append(T + i)
                a = 4.0 * np.pi * sr[i] ** 2
                em_area.append(a)
                em_flux.append(a * np.pi *
                               float(luminance(jnp.asarray(em_rad[sem[i]]))))
        if em_prim:
            em_prim = np.array(em_prim, np.int32)
            em_area = np.array(em_area, np.float32)
            flux = np.array(em_flux, np.float64)
            area_total = flux.sum()
            cdf = np.cumsum(flux / area_total).astype(np.float32)
            cdf[-1] = 1.0
        else:
            em_prim = np.zeros((0,), np.int32)
            em_area = np.zeros((0,), np.float32)
            cdf = np.zeros((0,), np.float32)
            area_total = 0.0

        # world bounds
        pts = np.concatenate([tp0, tp0 + te1, tp0 + te2], axis=0)
        if S:
            pts = np.concatenate([pts, sc - sr[:, None], sc + sr[:, None]])
        world_lo = pts.min(axis=0)
        world_hi = pts.max(axis=0)

        # medium AABB: bounds of prims that reference a medium
        # (reference: volume_utils.h:220 max_AABB_medium)
        has_med = (tmi != NO_MEDIUM) | (tmo != NO_MEDIUM)
        if has_med.any():
            mpts = np.concatenate([tp0[has_med], (tp0 + te1)[has_med],
                                   (tp0 + te2)[has_med]])
            med_lo, med_hi = mpts.min(axis=0), mpts.max(axis=0)
        else:
            med_lo, med_hi = world_lo, world_hi
        shas = (smi != NO_MEDIUM) | (smo != NO_MEDIUM)
        if S and shas.any():
            med_lo = np.minimum(med_lo, (sc - sr[:, None])[shas].min(axis=0))
            med_hi = np.maximum(med_hi, (sc + sr[:, None])[shas].max(axis=0))

        cam_mat, fov, cam_ap, cam_focus = self._cam

        # --- delta / env emitter power bookkeeping -----------------------
        # scene bounding-sphere radius: conversion factor for infinite
        # emitters (directional flux = E*pi*R^2; constant env flux =
        # 4*pi^2*R^2*L — emitters/constant.cpp uses the same measure)
        wc = 0.5 * (world_lo + world_hi)
        wr = float(np.linalg.norm(world_hi - wc)) + 1e-6
        De = len(self._delta)
        if De:
            de_type = np.array([d["type"] for d in self._delta], np.int32)
            de_p = np.stack([_v(d["p"]) for d in self._delta])
            de_dir = np.stack([_v(d["dir"]) for d in self._delta])
            de_int = np.stack([_v(d["intensity"]) for d in self._delta])
            de_cc = np.array([d["cos_cutoff"] for d in self._delta],
                             np.float32)
            de_cf = np.array([d["cos_falloff"] for d in self._delta],
                             np.float32)
            de_med = np.array([d["medium"] for d in self._delta], np.int32)
            lum = np.array([float(luminance(jnp.asarray(i)))
                            for i in de_int], np.float64)
            # power: point 4*pi*I; spot: solid angle of the falloff curve
            # (2*pi*(1 - 0.5*(cosFall+cosCut)), spot.cpp); directional:
            # E * pi R^2
            sa_spot = 2.0 * np.pi * (1.0 - 0.5 * (de_cf + de_cc))
            de_power = np.where(
                de_type == DE_POINT, 4.0 * np.pi * lum,
                np.where(de_type == DE_SPOT, sa_spot * lum,
                         np.pi * wr * wr * lum))
            delta_total = de_power.sum()
            de_cdf = np.cumsum(de_power / max(delta_total, 1e-30))
            de_cdf = de_cdf.astype(np.float32)
            de_cdf[-1] = 1.0
        else:
            de_type = de_med = np.zeros((0,), np.int32)
            de_p = de_dir = de_int = np.zeros((0, 3), np.float32)
            de_cc = de_cf = de_cdf = np.zeros((0,), np.float32)
            delta_total = 0.0
        # heterogeneous-medium tables
        if self._het is not None:
            het_density = self._het["density"]
            het_lo, het_hi = self._het["lo"], self._het["hi"]
            het_scale = self._het["scale"]
            het_albedo = self._het["albedo"]
            het_maj = float(het_density.max() * het_scale.max()) + 1e-8
            het_medium = self._het["medium"]
        else:
            het_density = np.zeros((0, 0, 0), np.float32)
            het_lo = np.zeros(3, np.float32)
            het_hi = np.ones(3, np.float32)
            het_scale = np.ones(3, np.float32)
            het_albedo = np.ones(3, np.float32)
            het_maj = 1.0
            het_medium = -1

        # environment map tables: sin-weighted luminance CDFs over the
        # lat-long grid (emitters/envmap.cpp importance tables). For the
        # constant case (1x1 ones) the sampler is a uniform sphere.
        emap = self._env_map if self._env_map is not None \
            else np.ones((1, 1, 3), np.float32)
        He, We = emap.shape[:2]
        scale_rgb = np.asarray(_v(self._env), np.float32)
        lum_px = (emap * scale_rgb).astype(np.float64) @ \
            np.array([0.212671, 0.715160, 0.072169])
        sin_row = np.sin((np.arange(He) + 0.5) / He * np.pi)
        wpx = lum_px * sin_row[:, None]
        row_w = wpx.sum(axis=1)
        Z = float(row_w.sum())
        if Z > 0:
            env_row_cdf = np.cumsum(row_w) / Z
            wpx_safe = np.where(row_w[:, None] > 0, wpx, 1.0)
            env_cond_cdf = np.cumsum(wpx_safe, axis=1) \
                / wpx_safe.sum(axis=1, keepdims=True)
        else:
            env_row_cdf = np.linspace(1.0 / He, 1.0, He)
            env_cond_cdf = np.tile(np.linspace(1.0 / We, 1.0, We), (He, 1))
        # spherical-mean luminance = Z * dtheta * dphi / 4pi — the pdf
        # normalizer of emitter.pdf_env_sa
        env_mean_lum = Z * (np.pi / He) * (2.0 * np.pi / We) / (4.0 * np.pi)

        env_total = 4.0 * np.pi ** 2 * wr * wr * (
            float(luminance(jnp.asarray(scale_rgb)))
            if He * We == 1 else env_mean_lum)
        total = area_total + delta_total + env_total
        if total > 0:
            group_p = np.array([area_total, delta_total, env_total],
                               np.float64) / total
        else:
            group_p = np.array([1.0, 0.0, 0.0])

        f32 = jnp.float32
        return Scene(
            tri_p0=jnp.asarray(tp0, f32), tri_e1=jnp.asarray(te1, f32),
            tri_e2=jnp.asarray(te2, f32), tri_vn=jnp.asarray(tvn, f32),
            tri_bsdf=jnp.asarray(tb), tri_emitter=jnp.asarray(tem),
            tri_med_in=jnp.asarray(tmi), tri_med_out=jnp.asarray(tmo),
            sph_center=jnp.asarray(sc, f32), sph_radius=jnp.asarray(sr, f32),
            sph_bsdf=jnp.asarray(sb), sph_emitter=jnp.asarray(sem),
            sph_med_in=jnp.asarray(smi), sph_med_out=jnp.asarray(smo),
            bsdf_type=jnp.asarray([b["type"] for b in self._bsdfs], jnp.int32),
            bsdf_albedo=jnp.asarray([b["albedo"] for b in self._bsdfs], f32),
            bsdf_eta=jnp.asarray([b["eta"] for b in self._bsdfs], f32),
            bsdf_k=jnp.asarray([b["k"] for b in self._bsdfs], f32),
            bsdf_eta3=jnp.asarray([b["eta3"] for b in self._bsdfs], f32),
            bsdf_alpha=jnp.asarray([b["alpha"] for b in self._bsdfs], f32),
            med_sigma_a=jnp.asarray([m["sigma_a"] for m in self._media], f32),
            med_sigma_s=jnp.asarray([m["sigma_s"] for m in self._media], f32),
            med_g=jnp.asarray([m["g"] for m in self._media], f32),
            med_phase=jnp.asarray([m["phase"] for m in self._media], jnp.int32),
            het_density=jnp.asarray(het_density, f32),
            het_lo=jnp.asarray(het_lo, f32),
            het_hi=jnp.asarray(het_hi, f32),
            het_sigma_scale=jnp.asarray(het_scale, f32),
            het_albedo=jnp.asarray(het_albedo, f32),
            het_majorant=jnp.asarray(het_maj, f32),
            het_medium=het_medium,
            em_radiance=jnp.asarray(em_rad, f32),
            em_prim=jnp.asarray(em_prim),
            em_prim_area=jnp.asarray(em_area, f32),
            em_cdf=jnp.asarray(cdf, f32),
            em_power=jnp.asarray(total, f32),
            de_type=jnp.asarray(de_type),
            de_p=jnp.asarray(de_p, f32),
            de_dir=jnp.asarray(de_dir, f32),
            de_intensity=jnp.asarray(de_int, f32),
            de_cos_cutoff=jnp.asarray(de_cc, f32),
            de_cos_falloff=jnp.asarray(de_cf, f32),
            de_medium=jnp.asarray(de_med),
            de_cdf=jnp.asarray(de_cdf, f32),
            env_radiance=jnp.asarray(_v(self._env), f32),
            env_map=jnp.asarray(emap, f32),
            env_row_cdf=jnp.asarray(env_row_cdf, f32),
            env_cond_cdf=jnp.asarray(env_cond_cdf, f32),
            env_mean_lum=jnp.asarray(env_mean_lum, f32),
            light_group_p=jnp.asarray(group_p, f32),
            cam_to_world=jnp.asarray(cam_mat, f32),
            cam_tan_half_fov_x=jnp.asarray(
                np.tan(np.radians(fov) * 0.5), f32),
            cam_medium=jnp.asarray(self._cam_medium, jnp.int32),
            world_lo=jnp.asarray(world_lo, f32),
            world_hi=jnp.asarray(world_hi, f32),
            medium_lo=jnp.asarray(med_lo, f32),
            medium_hi=jnp.asarray(med_hi, f32),
            width=width, height=height,
            cam_aperture=cam_ap, cam_focus=cam_focus,
        )
