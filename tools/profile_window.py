"""On-chip sweep of the windowed volume gather (q_tile, window) at paper
scale — the tuning evidence for bench.py's defaults.

Usage: python tools/profile_window.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from gvpm_tpu.core import rng
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import (gatherpoint, gradient_gather, gvpm,
                                  ptracer, sppm)
from gvpm_tpu.ops import cellgrid, hashgrid
from gvpm_tpu.scenes import box_medium


def fence(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def main():
    side, n_photons = 512, 1 << 18
    cfg = GradientConfig(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=2,
        initial_scale_volume=0.8,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        vol_segments_per_pixel=2, use_manifold=False,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20)
    scene = box_medium(width=side, height=side)
    r_vol = sppm.base_volume_radius(scene, cfg)
    seed, it = 0, 1
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_gather = rng.pass_key(seed, it, rng.STREAM_GATHER)
    H = W = side
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)

    shoot = jax.jit(lambda k: sppm.shoot_photons(scene, cfg, n_photons, k))
    photons, beams = shoot(k_light)
    trace = jax.jit(lambda k, x, y: gatherpoint.trace(scene, cfg, k, x, y))
    base, cam_beams = trace(k_cam, px, py)
    fence(base)

    def build(photons):
        packed = gradient_gather.pack_photons(scene, photons)
        gv, pv = cellgrid.build_cells(
            photons["p"], photons["vtype"] == ptracer.VERT_MEDIUM,
            scene.medium_lo, scene.medium_hi, 2.0 * r_vol, cfg.grid_dims,
            packed, max_rows=cfg.grid_volume_rows)
        return gv, pv

    grid_v, packed_v = jax.jit(build)(photons)
    fence(packed_v)

    def flat_cb(c):
        cd = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), c)
        return dict(valid=cd.valid, o=cd.o, d=cd.d, length=cd.length,
                    med=cd.med, thr=cd.thr, pdf_prod=cd.pdf_prod,
                    depth=cd.depth)

    n = px.shape[0]
    xi, yi = px.astype(jnp.int32), py.astype(jnp.int32)
    border = jnp.stack([xi == W - 1, xi == 0, yi == H - 1, yi == 0])
    cb = flat_cb(cam_beams)
    scb_list = [flat_cb(c) for c in
                [trace(k_cam, px + dx, py + dy)[1]
                 for dx, dy in gvpm.OFFSETS]]
    n_steps = cam_beams.valid.shape[0]
    lane_full = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_steps)
    budget = min(cb["valid"].shape[0], n * cfg.vol_segments_per_pixel)
    order = jnp.argsort(~cb["valid"])[:budget]
    cb = {kk: vv[order] for kk, vv in cb.items()}
    scb_list = [{kk: vv[order] for kk, vv in s.items()} for s in scb_list]
    lane = lane_full[order]
    border_lane = jnp.stack([border[i][lane] for i in range(4)])
    fence(border_lane)
    print("valid volume queries:", int(jnp.sum(cb["valid"])), "of",
          budget, flush=True)

    sweeps = (("cull", 256, 2048, 32), ("cull", 128, 1024, 32),
              ("cull", 256, 1024, 32), ("cull", 256, 4096, 32),
              ("cull", 256, 2048, 16),
              ("window", 256, 768, 0), ("window", 128, 384, 0))
    for (drv, qt, w, kk) in sweeps:
        def vg(cb, scb_list, grid_v, packed_v, border_lane):
            return gradient_gather.volume_gather(
                scene, cb, scb_list, grid_v, packed_v, n_photons,
                r_vol, k_gather, border_lane,
                n_samples=cfg.volume_samples,
                max_per_cell=cfg.grid_max_photons_per_cell,
                window=w, window_q_tile=qt, min_depth=0,
                driver=drv, k_budget=max(kk, 1),
                use_manifold=False)

        f = jax.jit(vg)
        out = f(cb, scb_list, grid_v, packed_v, border_lane)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(2):
            out = f(cb, scb_list, grid_v, packed_v, border_lane)
            fence(out)
        dt = (time.perf_counter() - t0) / 2
        visits = int(jnp.sum(out[3]))
        dr = [int(v) for v in out[5]]
        print(f"{drv:6s} qt={qt:4d} W={w:4d} K={kk:3d}: {dt:7.3f}s  "
              f"visits={visits}  dropped={dr}", flush=True)

    # legacy dense driver for comparison
    gridh, packedh = jax.jit(lambda ph: hashgrid.build_sorted(
        ph["p"], ph["vtype"] == ptracer.VERT_MEDIUM, scene.medium_lo,
        2.0 * r_vol, gradient_gather.pack_photons(scene, ph),
        hash_size=cfg.grid_hash_size,
        max_rows=cfg.grid_volume_rows))(photons)
    fence(packedh)

    def vgd(cb, scb_list, gridh, packedh, border_lane):
        return gradient_gather.volume_gather(
            scene, cb, scb_list, gridh, packedh, n_photons,
            r_vol, k_gather, border_lane, n_samples=cfg.volume_samples,
            max_per_cell=cfg.grid_max_photons_per_cell,
            q_tile=cfg.gather_q_tile, min_depth=0, use_manifold=False)

    f = jax.jit(vgd)
    out = f(cb, scb_list, gridh, packedh, border_lane)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(2):
        out = f(cb, scb_list, gridh, packedh, border_lane)
        fence(out)
    dt = (time.perf_counter() - t0) / 2
    print(f"dense (hash) driver: {dt:7.3f}s  visits="
          f"{int(jnp.sum(out[3]))}", flush=True)


if __name__ == "__main__":
    main()
