"""Isolated single-config repro for the r4 beam/plane TPU worker faults.

Runs ONE technique config in ONE process (a crashed TPU worker poisons
every later jax call in the process, so bench r4's plane0d crash may
have taken beam1d/beam3d down with it). Usage:

  python tools/repro_beam.py <volume> [side] [seg_tile] [beam_tile] [photons_log2] [beams_log2]
"""
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
    volume = sys.argv[1]
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    seg_tile = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    beam_tile = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    lp = int(sys.argv[5]) if len(sys.argv) > 5 else 18
    lb = int(sys.argv[6]) if len(sys.argv) > 6 else 14
    iscale = float(sys.argv[7]) if len(sys.argv) > 7 else 1.0
    n_photons = 1 << lp
    beams = 1 << lb

    base_kw = dict(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=1,
        initial_scale_volume=0.8, initial_scale=iscale,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        vol_segments_per_pixel=1,
        grid_dims=(64, 64, 64), gather_window=2048,
        window_q_tile=256, cull_k=32, gather_budget=96,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
        beams=beams, beam_seg_tile=seg_tile, beam_tile=beam_tile)
    cfg = GradientConfig(use_manifold=False, **base_kw)
    scene = box_medium(width=side, height=side)
    r_vol = sppm.base_volume_radius(scene, cfg)

    print(f"[repro] {volume} side={side} seg_tile={seg_tile} "
          f"beam_tile={beam_tile} photons=2^{lp} beams=2^{lb}",
          flush=True)
    t0 = time.perf_counter()
    out = gvpm.render_pass(scene, cfg, volume, n_photons, 0, 0, 1.0, 1.0,
                           r_vol)
    # host fetch is the only reliable fence on this backend
    v = int(out[3]["visits"])
    t_compile = time.perf_counter() - t0
    print(f"[repro] compile+run1 ok: {t_compile:.1f}s visits={v}",
          flush=True)
    t0 = time.perf_counter()
    p, gx, gy, st = gvpm.render_pass(scene, cfg, volume, n_photons, 0, 1,
                                     1.0, 1.0, r_vol)
    v = int(st["visits"])
    dt = time.perf_counter() - t0
    fin = bool(jnp.isfinite(p).all() & jnp.isfinite(gx).all())
    print(f"[repro] OK pass={dt:.3f}s visits={v} visits/s={v/dt:,.0f} "
          f"finite={fin}", flush=True)


if __name__ == "__main__":
    main()
