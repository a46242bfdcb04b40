"""Find the breaking scale of the beam-family bench configs."""
import time, jax
import jax.numpy as jnp
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium

def probe(side, n_photons, beams, seg_tile, vol):
    kw = dict(max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=1, initial_scale_volume=0.8,
        grid_max_photons_per_cell=32, vol_segments_per_pixel=1,
        grid_dims=(64, 64, 64), cull_k=32, gather_budget=96,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
        beam_seg_tile=seg_tile, beams=beams, use_manifold=False)
    scene = box_medium(width=side, height=side)
    cfg = GradientConfig(**kw)
    r_b = sppm.base_volume_radius(scene, cfg)
    t0 = time.perf_counter()
    try:
        p, gx, gy, st = gvpm.render_pass(scene, cfg, vol, n_photons,
                                         0, 0, 1.0, 1.0, r_b)
        print(f"OK   {vol} side={side} beams={beams} st={seg_tile} "
              f"visits={int(st['visits'])} "
              f"t={time.perf_counter()-t0:.1f}s", flush=True)
        return True
    except Exception as e:
        print(f"FAIL {vol} side={side} beams={beams} st={seg_tile}: "
              f"{type(e).__name__} {str(e)[:90]}", flush=True)
        return False

probe(128, 1 << 16, 1 << 12, 4096, "beam1d")
probe(256, 1 << 17, 1 << 13, 4096, "beam1d")
probe(512, 1 << 18, 1 << 14, 4096, "beam1d")
