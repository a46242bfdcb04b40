"""Stage-by-stage isolation of the plane0d/beam TPU fault: run the
deferred head, fence it, then dispatch chunks one at a time with a
fence and a progress print after each. Usage:
  python tools/repro_plane_stages.py [volume] [side] [seg_tile] [lp] [lb]
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


def fence(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:4]))


def main():
    volume = sys.argv[1] if len(sys.argv) > 1 else "plane0d"
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    seg_tile = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    lp = int(sys.argv[4]) if len(sys.argv) > 4 else 18
    lb = int(sys.argv[5]) if len(sys.argv) > 5 else 14
    n_photons = 1 << lp
    cfg = GradientConfig(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=n_photons, volume_photons=n_photons,
        grid_hash_size=1 << 20, volume_samples=1,
        initial_scale_volume=0.8,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        vol_segments_per_pixel=1,
        grid_dims=(64, 64, 64), gather_window=2048,
        window_q_tile=256, cull_k=32, gather_budget=96,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
        beams=1 << lb, beam_seg_tile=seg_tile, use_manifold=False)
    scene = box_medium(width=side, height=side)
    r_vol = sppm.base_volume_radius(scene, cfg)
    print(f"[stage] {volume} side={side} seg_tile={seg_tile} "
          f"photons=2^{lp} beams=2^{lb}", flush=True)

    t0 = time.perf_counter()
    p_s, S_s, W_s, stats = gvpm._render_pass_jit(
        scene, cfg, volume, n_photons, 0, 1, 1.0, 1.0, r_vol,
        defer_beams=True)
    v_head = int(stats["visits"])
    print(f"[stage] HEAD ok {time.perf_counter()-t0:.1f}s "
          f"surface_visits={v_head}", flush=True)

    pend = stats.pop("pending")
    cb, scb, lane = pend["cb"], pend["scb"], pend["lane"]
    bl, lbv, r_b = pend["border_lane"], pend["lb"], pend["r_b"]
    pvc = pend.get("pv_chain")
    if os.environ.get("GVPM_SCRUB_PENDING"):
        def scrub(d):
            return {k: (jnp.nan_to_num(v, nan=0.0, posinf=0.0,
                                       neginf=0.0)
                        if v.dtype == jnp.float32 else v)
                    for k, v in d.items()}
        cb = scrub(cb)
        scb = [scrub(s) for s in scb]
        lbv = scrub(lbv)
        print("[stage] pending SCRUBBED", flush=True)
    fence(cb)
    m = cb["o"].shape[0]
    st_sz = min(seg_tile or m, m)
    n_chunks = -(-m // st_sz)
    pad = n_chunks * st_sz - m

    def ck(a):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, st_sz) + a.shape[1:])

    cbc = {k: ck(v) for k, v in cb.items()}
    scbc = [{k: ck(v) for k, v in s.items()} for s in scb]
    blc = ck(jnp.moveaxis(bl, 0, 1))
    print(f"[stage] chunk prep ok: m={m} chunks={n_chunks}", flush=True)

    dump = os.environ.get("GVPM_DUMP_PENDING")
    if dump:
        import numpy as np
        out = {}
        ci = 0
        for k, v in cbc.items():
            out[f"cb_{k}"] = np.asarray(v[ci])
        for i, s in enumerate(scbc):
            for k, v in s.items():
                out[f"scb{i}_{k}"] = np.asarray(v[ci])
        for k, v in lbv.items():
            out[f"lb_{k}"] = np.asarray(v)
        out["bl"] = np.asarray(jnp.moveaxis(blc[ci], -1, 0))
        out["r_b"] = np.asarray(r_b)
        np.savez(dump, **out)
        print(f"[stage] pending chunk 0 dumped to {dump}", flush=True)
        return

    for ci in range(n_chunks):
        t0 = time.perf_counter()
        cb_i = {k: v[ci] for k, v in cbc.items()}
        scb_i = [{k: v[ci] for k, v in s.items()} for s in scbc]
        bl_i = jnp.moveaxis(blc[ci], -1, 0)
        key_i = jax.random.fold_in(pend["key"], ci)
        out = gvpm._beam_chunk(scene, cfg, volume, n_photons, lbv, cb_i,
                               scb_i, bl_i, r_b, key_i, pvc)
        v = int(out[3])
        print(f"[stage] chunk {ci}/{n_chunks} ok "
              f"{time.perf_counter()-t0:.2f}s visits={v}", flush=True)
    print("[stage] ALL OK", flush=True)


if __name__ == "__main__":
    main()
