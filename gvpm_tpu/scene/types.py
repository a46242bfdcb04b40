"""Scene representation: flat structure-of-arrays tables.

The reference builds a pointer graph of plugin Objects (Scene -> Shapes ->
BSDF/Emitter/Medium, reference: src/librender/scene.cpp). The TPU design
flattens everything into index tables so the whole scene is a single pytree
of device arrays, traced once under jit:

  * primitives:  triangles [T] + analytic spheres [S]; a global prim id is
                 tri index in [0,T) or T + sphere index.
  * materials:   one SoA table indexed by prim.bsdf
  * media:       homogeneous media table indexed per-prim (interior/exterior)
                 (reference: src/medium/homogeneous.cpp)
  * emitters:    area lights; per-emissive-prim power CDF for flux-weighted
                 emitter sampling (reference: Scene::weightEmitterFlux,
                 scene.cpp:322)
  * camera:      perspective with ray differentials (reference:
                 gvpm_gatherpoint.h:238 uses differentials for radius init)
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# BSDF type ids (bsdf_type table values)
BSDF_DIFFUSE = 0
BSDF_CONDUCTOR = 1          # smooth mirror with conductor Fresnel
BSDF_DIELECTRIC = 2         # smooth glass
BSDF_ROUGH_CONDUCTOR = 3    # Beckmann microfacet
BSDF_ROUGH_DIELECTRIC = 4
BSDF_NULL = 5               # passthrough (medium boundary)
BSDF_PHONG = 6
BSDF_PLASTIC = 7

# Phase function ids
PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2

# Delta/infinite emitter type ids (de_type table values)
DE_POINT = 0        # isotropic point light (emitters/point.cpp)
DE_SPOT = 1         # spot light with linear falloff (emitters/spot.cpp)
DE_DIRECTIONAL = 2  # distant directional light (emitters/directional.cpp)

NO_MEDIUM = -1
NO_EMITTER = -1
NO_BSDF = -1


@flax.struct.dataclass
class Scene:
    # --- triangles: p(u,v) = p0 + u*e1 + v*e2 ---
    tri_p0: jnp.ndarray        # [T,3]
    tri_e1: jnp.ndarray        # [T,3]
    tri_e2: jnp.ndarray        # [T,3]
    tri_vn: jnp.ndarray        # [T,3,3] per-vertex shading normals
    tri_bsdf: jnp.ndarray      # [T] int32
    tri_emitter: jnp.ndarray   # [T] int32 (-1 none)
    tri_med_in: jnp.ndarray    # [T] int32 interior medium (-1 none)
    tri_med_out: jnp.ndarray   # [T] int32 exterior medium (-1 none)

    # --- spheres ---
    sph_center: jnp.ndarray    # [S,3]
    sph_radius: jnp.ndarray    # [S]
    sph_bsdf: jnp.ndarray      # [S] int32
    sph_emitter: jnp.ndarray   # [S] int32
    sph_med_in: jnp.ndarray    # [S] int32
    sph_med_out: jnp.ndarray   # [S] int32

    # --- BSDF table ---
    bsdf_type: jnp.ndarray     # [B] int32
    bsdf_albedo: jnp.ndarray   # [B,3] diffuse/specular reflectance
    bsdf_eta: jnp.ndarray      # [B]   IOR ratio (dielectric) or dummy
    bsdf_k: jnp.ndarray        # [B,3] conductor extinction
    bsdf_eta3: jnp.ndarray     # [B,3] conductor eta (per channel)
    bsdf_alpha: jnp.ndarray    # [B]   microfacet roughness

    # --- media table (homogeneous) ---
    med_sigma_a: jnp.ndarray   # [M,3]
    med_sigma_s: jnp.ndarray   # [M,3]
    med_g: jnp.ndarray         # [M] HG g (0 => isotropic)
    med_phase: jnp.ndarray     # [M] int32 phase type

    # --- heterogeneous medium (one grid-density medium per scene;
    #     reference: src/medium/heterogeneous.cpp + gridvolume .vol) ---
    het_density: jnp.ndarray   # [Gx,Gy,Gz] density grid ((0,0,0) = none)
    het_lo: jnp.ndarray        # [3] grid AABB
    het_hi: jnp.ndarray        # [3]
    het_sigma_scale: jnp.ndarray  # [3] sigma_t(x) = density(x) * scale
    het_albedo: jnp.ndarray    # [3] sigma_s = albedo * sigma_t
    het_majorant: jnp.ndarray  # [] gray majorant for delta/ratio tracking

    # --- emitters (area) ---
    em_radiance: jnp.ndarray   # [E,3]
    em_prim: jnp.ndarray       # [Te] int32 global prim id of emissive prim
    em_prim_area: jnp.ndarray  # [Te]
    em_cdf: jnp.ndarray        # [Te] inclusive flux CDF (conditional on
                               #      picking the area-light group)
    em_power: jnp.ndarray      # [] total emitted power, ALL emitter kinds

    # --- delta / infinite emitters (point | spot | directional) ---
    de_type: jnp.ndarray       # [De] int32 DE_*
    de_p: jnp.ndarray          # [De,3] position (point/spot; unused dir.)
    de_dir: jnp.ndarray        # [De,3] unit axis (spot/directional)
    de_intensity: jnp.ndarray  # [De,3] W/sr (point/spot), W/m^2 (dir.)
    de_cos_cutoff: jnp.ndarray # [De] cos of spot total-width half-angle
    de_cos_falloff: jnp.ndarray  # [De] cos of spot falloff-start half-angle
    de_medium: jnp.ndarray     # [De] int32 medium containing the emitter
    de_cdf: jnp.ndarray        # [De] power CDF (conditional on delta group)

    # --- environment (constant OR lat-long map; emitters/constant.cpp,
    #     emitters/envmap.cpp) ---
    env_radiance: jnp.ndarray  # [3] scale (zeros = no environment emitter)
    env_map: jnp.ndarray       # [He,We,3] lat-long texture; [1,1,3] ones
                               # = constant environment
    env_row_cdf: jnp.ndarray   # [He] inclusive CDF over rows, sin-weighted
    env_cond_cdf: jnp.ndarray  # [He,We] inclusive CDF within each row
    env_mean_lum: jnp.ndarray  # [] sin-weighted mean map luminance (the
                               #    pdf normalizer)

    # --- group pick probabilities: (area, delta, env), sums to 1 ---
    light_group_p: jnp.ndarray # [3] power share per emitter group

    # --- camera (perspective pinhole) ---
    cam_to_world: jnp.ndarray  # [4,4] camera->world
    cam_tan_half_fov_x: jnp.ndarray  # [] tan(fov_x/2)
    cam_medium: jnp.ndarray    # [] int32 medium containing the camera

    # --- bounds ---
    world_lo: jnp.ndarray      # [3]
    world_hi: jnp.ndarray      # [3]
    medium_lo: jnp.ndarray     # [3] AABB of media region (volume_utils.h:220)
    medium_hi: jnp.ndarray     # [3]

    # --- static metadata (not traced) ---
    width: int = flax.struct.field(pytree_node=False, default=256)
    height: int = flax.struct.field(pytree_node=False, default=256)
    # thinlens sensor (src/sensors/thinlens.cpp); 0 aperture = pinhole
    cam_aperture: float = flax.struct.field(pytree_node=False, default=0.0)
    cam_focus: float = flax.struct.field(pytree_node=False, default=1.0)
    # medium-table row that is heterogeneous (-1 = all homogeneous);
    # static so homogeneous scenes compile zero tracking code
    het_medium: int = flax.struct.field(pytree_node=False, default=-1)

    @property
    def n_tris(self):
        return self.tri_p0.shape[0]

    @property
    def n_spheres(self):
        return self.sph_center.shape[0]

    @property
    def n_prims(self):
        return self.n_tris + self.n_spheres

    # Per-global-prim attribute lookup (works for traced prim index arrays).
    def prim_attr(self, tri_tab, sph_tab, prim):
        is_tri = prim < self.n_tris
        ti = jnp.clip(prim, 0, self.n_tris - 1)
        si = jnp.clip(prim - self.n_tris, 0, max(self.n_spheres - 1, 0))
        from ..core.tables import take
        if self.n_spheres == 0:
            return take(tri_tab, ti)
        tv = take(tri_tab, ti)
        return jnp.where(_bshape(is_tri, tv), tv, take(sph_tab, si))

    def prim_bsdf(self, prim):
        return self.prim_attr(self.tri_bsdf, self.sph_bsdf, prim)

    def prim_emitter(self, prim):
        return self.prim_attr(self.tri_emitter, self.sph_emitter, prim)

    def prim_med_in(self, prim):
        return self.prim_attr(self.tri_med_in, self.sph_med_in, prim)

    def prim_med_out(self, prim):
        return self.prim_attr(self.tri_med_out, self.sph_med_out, prim)


def _bshape(cond, like):
    """Broadcast a boolean against a table row (handles trailing dims)."""
    extra = like.ndim - cond.ndim
    return cond.reshape(cond.shape + (1,) * extra) if extra > 0 else cond
