"""On-chip check + timing of the fused Pallas gather driver at paper
scale. Usage: python tools/repro_pallas.py [driver] [side] [Qt] [W]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium


def main():
    driver = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    qt = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    win = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    n_photons = 1 << 18
    cfg = GradientConfig(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=2,
        initial_scale_volume=0.8,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        vol_segments_per_pixel=2,
        grid_dims=(64, 64, 64), gather_window=2048,
        window_q_tile=256, cull_k=32, gather_budget=96,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
        gather_driver=driver, pallas_q_tile=qt, pallas_window=win,
        use_manifold=False)
    scene = box_medium(width=side, height=side)
    r_vol = sppm.base_volume_radius(scene, cfg)
    print(f"[pallas] driver={driver} side={side} Qt={qt} W={win}",
          flush=True)
    t0 = time.perf_counter()
    out = gvpm.render_pass(scene, cfg, "distance", n_photons, 0, 0, 1.0,
                           1.0, r_vol)
    v = int(out[3]["visits"])
    print(f"[pallas] compile+run1: {time.perf_counter()-t0:.1f}s "
          f"visits={v}", flush=True)
    for it in (1, 2):
        t0 = time.perf_counter()
        p, gx, gy, st = gvpm.render_pass(scene, cfg, "distance",
                                         n_photons, 0, it, 1.0, 1.0,
                                         r_vol)
        v = int(st["visits"])
        dt = time.perf_counter() - t0
        fin = bool(jnp.isfinite(p).all() & jnp.isfinite(gx).all())
        print(f"[pallas] pass{it}={dt:.3f}s visits={v} "
              f"visits/s={v/dt:,.0f} dropped={int(st['win_dropped'])} "
              f"finite={fin}", flush=True)


if __name__ == "__main__":
    main()
