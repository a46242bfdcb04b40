import sys, time, jax
import jax.numpy as jnp
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium
side, nph, beams, st, vol = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), int(sys.argv[4]),
                             sys.argv[5])
kw = dict(max_depth=12, null_bounces=6, max_cam_depth=6,
    surface_photons=nph, volume_photons=nph,
    grid_hash_size=1 << 20, volume_samples=1, initial_scale_volume=0.8,
    grid_max_photons_per_cell=32, vol_segments_per_pixel=1,
    grid_dims=(64, 64, 64), cull_k=32, gather_budget=96,
    grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
    beam_seg_tile=st, beams=beams, use_manifold=False)
scene = box_medium(width=side, height=side)
cfg = GradientConfig(**kw)
r_b = sppm.base_volume_radius(scene, cfg)
t0 = time.perf_counter()
p, gx, gy, stt = gvpm.render_pass(scene, cfg, vol, nph, 0, 0, 1.0, 1.0, r_b)
print(f"OK {vol} side={side} nph={nph} beams={beams} st={st} "
      f"visits={int(stt['visits'])} t={time.perf_counter()-t0:.1f}s",
      flush=True)
