"""Per-phase profile of the G-VPM gradient pass on the current backend.

Phases are jitted separately and separated by host-fetch barriers (the
axon tunnel's block_until_ready is unreliable — a reduced-scalar fetch
is the only true barrier). This is the measurement VERDICT r2 demanded:
where do the 14 s/pass actually go?

Usage: python tools/profile_pass.py [small|paper]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gvpm_tpu.core import rng
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import (gatherpoint, gradient_gather, gvpm,
                                  ptracer, sppm)
from gvpm_tpu.ops import hashgrid
from gvpm_tpu.render import medium as med
from gvpm_tpu.scenes import box_medium


def barrier(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def timed(label, fn, *args, reps=2, results=None):
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        barrier(out)
    dt = (time.perf_counter() - t0) / reps
    results[label] = round(dt, 4)
    print(f"{label:<28}{dt:8.3f}s", flush=True)
    return out


def main(mode="paper"):
    on_tpu = jax.default_backend() not in ("cpu",)
    if mode == "paper" and on_tpu:
        side, n_photons = 512, 1 << 18
        cfg = GradientConfig(
            max_depth=12, null_bounces=6, max_cam_depth=6,
            surface_photons=n_photons, volume_photons=n_photons,
            grid_hash_size=1 << 20, volume_samples=2,
            initial_scale_volume=0.4,
            grid_max_photons_per_cell=32, gather_q_tile=2048,
            vol_segments_per_pixel=2, use_manifold=False)
    else:
        side, n_photons = 64, 1 << 14
        cfg = GradientConfig(
            max_depth=6, null_bounces=3, max_cam_depth=4,
            surface_photons=n_photons, volume_photons=n_photons,
            grid_hash_size=1 << 15, volume_samples=2,
            grid_max_photons_per_cell=16, use_manifold=False)

    scene = box_medium(width=side, height=side)
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    seed, it = 0, 1
    results = {}

    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_gather = rng.pass_key(seed, it, rng.STREAM_GATHER)
    H = W = side
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    xi, yi = px.astype(jnp.int32), py.astype(jnp.int32)
    border = jnp.stack([xi == W - 1, xi == 0, yi == H - 1, yi == 0])

    # ---- phase 1: photon shooting ----
    shoot = jax.jit(lambda k: sppm.shoot_photons(scene, cfg, n_photons, k))
    photons, beams = timed("photon_shoot", shoot, k_light,
                           results=results)

    # ---- phase 2: camera wavefronts (base + 4 offsets) ----
    trace = jax.jit(lambda k, px, py: gatherpoint.trace(scene, cfg, k,
                                                        px, py))
    base, cam_beams = timed("camera_trace_base", trace, k_cam, px, py,
                            results=results)
    t0 = time.perf_counter()
    sgps, scbs = [], []
    for dx, dy in gvpm.OFFSETS:
        g, cbm = trace(k_cam, px + dx, py + dy)
        sgps.append(g)
        scbs.append(cbm)
    barrier(scbs[-1])
    results["camera_trace_offsets"] = round(time.perf_counter() - t0, 4)
    print(f"{'camera_trace_offsets':<28}"
          f"{results['camera_trace_offsets']:8.3f}s", flush=True)

    # ---- phase 3: pack + grid builds ----
    pp = photons["p"]
    surf_valid = photons["vtype"] == ptracer.VERT_SURFACE
    med_valid = photons["vtype"] == ptracer.VERT_MEDIUM
    r_surf = base.radius
    cell = 2.0 * jnp.maximum(
        jnp.max(jnp.where(base.valid, r_surf, 0.0)), 1e-5)
    r_vol = r_vol_base

    def build(photons, cell):
        pp = photons["p"]
        sv = photons["vtype"] == ptracer.VERT_SURFACE
        mv = photons["vtype"] == ptracer.VERT_MEDIUM
        packed = gradient_gather.pack_photons(scene, photons)
        gs, ps = hashgrid.build_sorted(
            pp, sv, scene.world_lo, cell, packed,
            hash_size=cfg.grid_hash_size, max_rows=cfg.grid_surface_rows)
        gv, pv_ = hashgrid.build_sorted(
            pp, mv, scene.medium_lo, 2.0 * r_vol, packed,
            hash_size=cfg.grid_hash_size, max_rows=cfg.grid_volume_rows)
        return gs, ps, gv, pv_

    grid_s, packed_s, grid_v, packed_v = timed(
        "pack_and_grid_build", jax.jit(build), photons, cell,
        results=results)

    # ---- phase 4: surface gather ----
    base_s = base.replace(radius=r_surf)
    gbudget = cfg.gather_budget or None

    def sgather(base_s, sgps, grid_s, packed_s, border):
        return gradient_gather.surface_gather(
            scene, base_s, sgps, grid_s, packed_s, n_photons, border,
            max_per_cell=cfg.grid_max_photons_per_cell,
            q_tile=cfg.gather_q_tile, budget=gbudget,
            min_depth=cfg.min_depth, use_manifold=False)

    timed("surface_gather", jax.jit(sgather), base_s, sgps, grid_s,
          packed_s, border, results=results)

    # ---- phase 5: volume gather (distance) ----
    def flat_cb(c):
        cd = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), c)
        return dict(valid=cd.valid, o=cd.o, d=cd.d, length=cd.length,
                    med=cd.med, thr=cd.thr, pdf_prod=cd.pdf_prod,
                    depth=cd.depth)

    n = px.shape[0]
    cb = flat_cb(cam_beams)
    scb_list = [flat_cb(c) for c in scbs]
    n_steps = cam_beams.valid.shape[0]
    lane_full = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_steps)
    budget = min(cb["valid"].shape[0], n * cfg.vol_segments_per_pixel)
    order = jnp.argsort(~cb["valid"])[:budget]
    cb = {kk: vv[order] for kk, vv in cb.items()}
    scb_list = [{kk: vv[order] for kk, vv in s.items()}
                for s in scb_list]
    lane = lane_full[order]
    border_lane = jnp.stack([border[i][lane] for i in range(4)])
    barrier(border_lane)

    def vgather(cb, scb_list, grid_v, packed_v, border_lane):
        return gradient_gather.volume_gather(
            scene, cb, scb_list, grid_v, packed_v, n_photons,
            r_vol, k_gather, border_lane,
            n_samples=cfg.volume_samples,
            max_per_cell=cfg.grid_max_photons_per_cell,
            q_tile=cfg.gather_q_tile, budget=gbudget,
            min_depth=cfg.min_depth, use_manifold=False)

    timed("volume_gather", jax.jit(vgather), cb, scb_list, grid_v,
          packed_v, border_lane, results=results)

    # ---- total: the fused render_pass as the bench runs it ----
    def full():
        return gvpm.render_pass(scene, cfg, "distance", n_photons, seed,
                                it, 1.0, 1.0, r_vol_base)

    timed("full_render_pass", full, results=results)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "paper")
