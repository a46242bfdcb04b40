"""Per-phase timing of the G-VPM gradient pass at bench scale.

Times each phase of gvpm.render_pass separately (own jit, own
block_until_ready) so bench regressions are attributable:

  shoot    photon/beam random walk (sppm.shoot_photons)
  trace    camera wavefront, base + 4 offsets (gatherpoint.trace x5)
  build    pack_photons + 2x hashgrid.build_sorted
  surface  gradient_gather.surface_gather
  volume   gradient_gather.volume_gather (distance) / bre / beams
  full     the fused render_pass for reference (phases overlap under XLA)

Also reports occupancy: candidate slots vs cell-passing candidates vs
kernel-passing visits, for the roofline note in bench.py.
"""

import argparse
import time

import jax
import jax.numpy as jnp

from gvpm_tpu.core import rng
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gatherpoint, gradient_gather, gvpm, sppm
from gvpm_tpu.ops import hashgrid
from gvpm_tpu.scenes import box_medium


def timed(fn, *args, reps=2, label="", **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"[compile+run {label}: {time.perf_counter() - t0:.1f}s]",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:18s} {dt * 1e3:10.1f} ms", flush=True)
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--photons", type=int, default=1 << 18)
    ap.add_argument("--volume", default="distance")
    ap.add_argument("--manifold", action="store_true")
    args = ap.parse_args()

    side, n_photons = args.side, args.photons
    cfg = GradientConfig(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=2,
        initial_scale_volume=0.4,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        gather_budget=48, grid_surface_rows=4 * n_photons,
        grid_volume_rows=2 * n_photons,
        vol_segments_per_pixel=2, use_manifold=args.manifold)
    scene = box_medium(width=side, height=side)
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    seed, it = 0, 1
    k_cam = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_light = rng.pass_key(seed, it, rng.STREAM_LIGHT)
    k_gather = rng.pass_key(seed, it, rng.STREAM_GATHER)

    H, W = scene.height, scene.width
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    xi, yi = px.astype(jnp.int32), py.astype(jnp.int32)
    border = jnp.stack([xi == W - 1, xi == 0, yi == H - 1, yi == 0])

    report = {}

    # --- shoot ---
    shoot = jax.jit(lambda k: sppm.shoot_photons(scene, cfg, n_photons, k))
    report["shoot"], (photons, beams) = timed(shoot, k_light, label="shoot")

    # --- camera trace (x5) ---
    trace1 = jax.jit(lambda k, ax, ay: gatherpoint.trace(scene, cfg, k,
                                                         ax, ay))
    t1, (base, cam_beams) = timed(trace1, k_cam, px, py, label="trace_x1")
    report["trace_x5"] = 5 * t1

    # --- grid build ---
    def build(photons):
        surf_valid = photons["vtype"] == 1
        cell = 2.0 * jnp.maximum(
            jnp.max(jnp.where(base.valid, base.radius, 0.0)), 1e-5)
        gs, pv_s = hashgrid.build_sorted(
            photons["p"], surf_valid, scene.world_lo, cell, photons,
            hash_size=cfg.grid_hash_size, max_rows=cfg.grid_surface_rows)
        med_valid = photons["vtype"] == 2
        gv, pv_v = hashgrid.build_sorted(
            photons["p"], med_valid, scene.medium_lo, 2.0 * r_vol_base,
            photons, hash_size=cfg.grid_hash_size,
            max_rows=cfg.grid_volume_rows)
        return ((gs, gradient_gather.pack_photons(scene, pv_s)),
                (gv, gradient_gather.pack_photons(scene, pv_v)))
    report["build"], ((grid_s, packed_s), (grid_v, packed_v)) = \
        timed(jax.jit(build), photons, label="build")

    # --- surface gather ---
    sgps, scbs = [], []
    for dx, dy in gvpm.OFFSETS:
        g, cbm = trace1(k_cam, px + dx, py + dy)
        sgps.append(g)
        scbs.append(cbm)

    def surf(base, sgps, packed_s, photons):
        return gradient_gather.surface_gather(
            scene, base, sgps, grid_s, packed_s, n_photons, border,
            max_per_cell=cfg.grid_max_photons_per_cell,
            q_tile=cfg.gather_q_tile, budget=cfg.gather_budget or None,
            use_manifold=cfg.use_manifold,
            me_budget=cfg.me_pair_budget, pv_chain=photons)
    report["surface"], sout = timed(jax.jit(surf), base, sgps, packed_s,
                                    photons, label="surface")
    report["surface_visits"] = int(jnp.sum(sout[3]))

    # --- volume gather ---
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
    scb_list = [{kk: vv[order] for kk, vv in s.items()} for s in scb_list]
    lane = lane_full[order]
    border_lane = jnp.stack([border[i][lane] for i in range(4)])

    if args.volume == "distance":
        def vol(cb, scb_list, packed_v, photons):
            return gradient_gather.volume_gather(
                scene, cb, scb_list, grid_v, packed_v, n_photons,
                r_vol_base, k_gather, border_lane,
                n_samples=cfg.volume_samples,
                max_per_cell=cfg.grid_max_photons_per_cell,
                q_tile=cfg.gather_q_tile,
                budget=cfg.gather_budget or None,
                use_manifold=cfg.use_manifold,
                me_budget=cfg.me_pair_budget, pv_chain=photons)
        report["volume"], vout = timed(jax.jit(vol), cb, scb_list,
                                       packed_v, photons, label="volume")
        report["volume_visits"] = int(jnp.sum(vout[3]))

    # --- occupancy ---
    n_surf_q = int(base.p.shape[0])
    n_vol_q = int(cb["o"].shape[0]) * cfg.volume_samples
    cand_per_q = 8 * cfg.grid_max_photons_per_cell
    report["surface_queries"] = n_surf_q
    report["volume_queries"] = n_vol_q
    report["candidates"] = (n_surf_q + n_vol_q) * cand_per_q
    nsurf = int(jnp.sum(photons["vtype"] == 1))
    nmed = int(jnp.sum(photons["vtype"] == 2))
    report["photons_surface"] = nsurf
    report["photons_medium"] = nmed
    report["grid_s_occupancy"] = hashgrid.cell_histogram(grid_s)
    report["grid_v_occupancy"] = hashgrid.cell_histogram(grid_v)

    # --- full fused pass for comparison ---
    full = lambda: gvpm.render_pass(scene, cfg, args.volume, n_photons,
                                    seed, it, 1.0, 1.0, r_vol_base)
    report["full_pass"], out = timed(full, label="full_pass")
    report["full_visits"] = int(out[3]["visits"])

    for k, v in report.items():
        if isinstance(v, float):
            print(f"{k:18s} {v * 1e3:10.1f} ms")
        else:
            print(f"{k:18s} {v}")


if __name__ == "__main__":
    main()
