"""Benchmark: G-VPM gradient passes at paper scale, reporting REAL
photon visits per second, per technique, with a per-phase breakdown.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N, "phases": {...}, "configs": {...}}.

Headline workload (BASELINE.md / generatorGVPM.py paper config shape):
512x512 film, 256k light paths/pass (~1M+ stored photons), maxDepth 12,
VPM distance estimator, full gradient pass (base + 4 shifted camera
paths, surface + volume gathers with diffuse-reconnection shifts and
pairwise MIS, gradient assembly), fused Pallas window-sweep driver
(ops/pallas_gather.py). Secondary configs cover the paper's technique
matrix (generatorGVPM.py:74-84): distance+ME (manifold shift on),
beam 1D/3D (BASELINE's north-star estimator) and plane 0D in
crash-isolated subprocesses, plus an equal-time relMSE track.

The metric counts photons/beams that actually pass the kernel test
inside the gathers (render_pass returns the counter) — NOT candidate
slots. vs_baseline: BASELINE.md target is >= 10x one 64-core CPU node
running the reference (~20M real gathers/s measured class for
Mitsuba-era SPPM on such a node), i.e. 2e8 visits/s == 1.0.

Timing uses a host fetch of each pass's stats as the barrier — on the
axon remote-TPU backend block_until_ready returns before execution
finishes, so device_get is the only reliable fence (measured: matmul
"19,490 TFLOP/s" under block_until_ready).

On a CPU host (no TPU) a tiny config keeps the bench runnable in CI;
recorded numbers come from the chip.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent executable cache: the 4 technique configs compile several
# large programs; warm runs (and the driver's end-of-round run) reuse them
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

if os.environ.get("GVPM_BENCH_CPU"):
    import jax._src.xla_bridge as _xb
    if _xb.backends_are_initialized():
        _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium

REFERENCE_NODE_GATHERS_PER_S = 20e6   # one 64-core CPU node, reference class
TARGET = 10.0 * REFERENCE_NODE_GATHERS_PER_S


def fence(x):
    """Host-fetch barrier (see module docstring)."""
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def run_config(scene, cfg, volume, n_photons, r_vol, passes):
    args = (scene, cfg, volume, n_photons, 0, 0, 1.0, 1.0, r_vol)
    out = gvpm.render_pass(*args)   # compile
    fence(out)
    t0 = time.perf_counter()
    visits = shok = dropped = 0
    for it in range(1, passes + 1):
        p, gx, gy, st = gvpm.render_pass(scene, cfg, volume, n_photons,
                                         0, it, 1.0, 1.0, r_vol)
        visits += int(st["visits"])          # host fetch == barrier
        shok += int(st["shift_ok"])
        dropped += int(st.get("win_dropped", 0))
    dt = (time.perf_counter() - t0) / passes
    v = visits // passes
    return dict(visits_per_s=round(v / dt, 1),
                visits_per_pass=v,
                pass_seconds=round(dt, 4),
                shift_success_per_pass=shok // passes,
                window_dropped_rows=dropped // passes)


def phase_breakdown(scene, cfg, n_photons, r_vol):
    """Separately-jitted phases of the distance pass (the roofline
    evidence VERDICT r2 demanded). Phases overlap inside the fused
    render_pass, so these add up to >= the fused time."""
    from gvpm_tpu.core import rng
    from gvpm_tpu.integrators import gatherpoint, gradient_gather, ptracer
    from gvpm_tpu.ops import cellgrid

    res = {}
    k_cam = rng.pass_key(0, 1, rng.STREAM_CAMERA)
    k_light = rng.pass_key(0, 1, rng.STREAM_LIGHT)
    H, W = scene.height, scene.width
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)

    def timed(label, fn, *a, reps=2):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            fence(fn(*a))
        res[label] = round((time.perf_counter() - t0) / reps, 3)
        return out

    shoot = jax.jit(lambda k: sppm.shoot_photons(scene, cfg, n_photons, k))
    photons, beams = timed("photon_shoot", shoot, k_light)

    trace = jax.jit(lambda k, x, y: gatherpoint.trace(scene, cfg, k, x, y))
    base, _cb = timed("camera_trace_1of5", trace, k_cam, px, py)

    def build(photons, cell):
        rowid = jnp.arange(photons["p"].shape[0], dtype=jnp.int32)

        def pack_rows(sel):
            ph = {f: v[sel] for f, v in photons.items()}
            return gradient_gather.pack_photons(
                scene, ph, valid=(ph["vtype"] != ptracer.VERT_NONE))

        gs, sel_s = cellgrid.build_cells(
            photons["p"], photons["vtype"] == ptracer.VERT_SURFACE,
            scene.world_lo, scene.world_hi, cell, cfg.grid_dims, rowid,
            max_rows=cfg.grid_surface_rows)
        gv, sel_v = cellgrid.build_cells(
            photons["p"], photons["vtype"] == ptracer.VERT_MEDIUM,
            scene.medium_lo, scene.medium_hi, 2.0 * r_vol, cfg.grid_dims,
            rowid, max_rows=cfg.grid_volume_rows)
        return gs, pack_rows(sel_s), gv, pack_rows(sel_v)

    cell = 2.0 * jnp.maximum(
        jnp.max(jnp.where(base.valid, base.radius, 0.0)), 1e-5)
    timed("pack_and_grid_build", jax.jit(build), photons, cell)
    return res


def _try(label, fn, configs, *a, **kw):
    """Crash isolation (VERDICT r3 weak #1): one technique config's
    OOM/compile failure must not erase the others' already-computed
    numbers. Each config records either its result dict or its error
    string; progress is flushed to stderr as it happens."""
    import sys
    import traceback
    try:
        out = fn(*a, **kw)
        configs[label] = out
        print(f"[bench] {label}: {out}", file=sys.stderr, flush=True)
        return out
    except Exception as e:  # noqa: BLE001 — any device failure isolated
        msg = f"{type(e).__name__}: {str(e)[:500]}"
        configs[label] = {"error": msg}
        print(f"[bench] {label} FAILED: {msg}", file=sys.stderr,
              flush=True)
        traceback.print_exc(limit=3, file=sys.stderr)
        return None


def relmse_track(side=128, budget_s=15.0, ref_spp=1024, ref_chunk=64):
    """Equal-time image-error track — the reference's actual evaluation
    protocol (scripts/results/run_mse.py, generatorGVPM.py:6 equal-time
    relMSE), which visit counts cannot proxy (VERDICT r4 missing #2:
    subsample compensation hides variance behind visits/s).

    Reference image: unbiased volpath at ref_spp (spp accumulated in
    ref_chunk-sized jitted chunks). Each technique then renders
    progressive passes until `budget_s` of wall clock (post-compile) and
    records relMSE of its accumulated image against the reference.
    gvpm runs its full gradient pass + screened-Poisson reconstruction.
    """
    from gvpm_tpu.core.config import PhotonConfig, VolPathConfig
    from gvpm_tpu.integrators import volpath
    from gvpm_tpu.ops import poisson
    from gvpm_tpu.utils.image import relmse

    scene = box_medium(width=side, height=side)
    res = {}

    # --- reference (unbiased) ---
    t0 = time.perf_counter()
    vcfg = VolPathConfig(spp=ref_chunk, max_depth=12)
    acc = None
    n_chunks = max(1, ref_spp // ref_chunk)
    for s in range(n_chunks):
        out = volpath.render(scene, vcfg, seed=1000 + s)
        img = out["image"] if isinstance(out, dict) else out
        acc = img if acc is None else acc + img
    ref = acc / n_chunks
    fence(ref)
    res["ref"] = dict(spp=n_chunks * ref_chunk,
                      seconds=round(time.perf_counter() - t0, 1))

    n_photons = 1 << 16
    pkw = dict(max_depth=12, null_bounces=6, max_cam_depth=6,
               surface_photons=n_photons, volume_photons=n_photons,
               beams=1 << 12, grid_hash_size=1 << 18,
               initial_scale_volume=0.5, volume_samples=2,
               vol_segments_per_pixel=2, grid_dims=(64, 64, 64))

    def run_progressive(pass_fn, r_vol, dim):
        # compile outside the clock, then accumulate passes until budget
        img = pass_fn(0, 1.0, 1.0, r_vol)
        fence(img)
        surf_scale = vol_scale = 1.0
        acc = None
        it = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s:
            img = pass_fn(it, surf_scale, vol_scale, r_vol)
            fence(img)
            acc = img if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, img)
            ratio = sppm.radius_ratio(it, 0.7)
            surf_scale *= ratio ** 0.5
            if dim > 0:
                vol_scale *= ratio ** (1.0 / dim)
            it += 1
        return acc, it, time.perf_counter() - t0

    for tech in ("distance", "bre", "beam1d", "beam3d", "plane0d"):
        cfg = PhotonConfig(**pkw)
        r_vol = sppm.base_volume_radius(scene, cfg)

        def pass_fn(it, ss, vs, rv, cfg=cfg, tech=tech):
            return sppm.render_pass(scene, cfg, tech, n_photons, 7, it,
                                    ss, vs, rv)

        def one(tech=tech, cfg=cfg, r_vol=r_vol):
            acc, its, dt = run_progressive(
                pass_fn, r_vol, sppm.KERNEL_DIM[tech])
            return dict(
                relmse_at_budget=round(
                    float(relmse(acc / its, ref)), 5),
                passes=its, seconds=round(dt, 1))
        _try(f"sppm:{tech}", one, res)

    # gvpm distance: gradient passes + Poisson reconstruction
    gcfg = GradientConfig(use_manifold=False, gather_driver="pallas",
                          grid_surface_rows=1 << 19,
                          grid_volume_rows=1 << 19, **pkw)
    r_vol = sppm.base_volume_radius(scene, gcfg)

    def gpass(it, ss, vs, rv):
        return gvpm.render_pass(scene, gcfg, "distance", n_photons, 7,
                                it, ss, vs, rv)[:3]

    def one_gvpm():
        (p, gx, gy), its, dt = run_progressive(gpass, r_vol, 3)
        recon = poisson.solve(p / its, gx / its, gy / its, alpha=0.2,
                              iters=50, irls_iters=4, l1=True)
        return dict(relmse_at_budget=round(float(relmse(recon, ref)), 5),
                    passes=its, seconds=round(dt, 1))
    _try("gvpm:distance", one_gvpm, res)
    return res


BEAM_FILM = 128
BEAM_PHOTONS = 1 << 18
BEAM_COUNT = 1 << 14


def _beam_child(tech):
    """In-subprocess single beam/plane technique run (prints one JSON
    line the parent parses). GVPM_BENCH_CHILD_REDUCED=1 drops to a
    config measured to survive the open backend fault (64^2, 2^17
    paths, 4k beams, 1 seg/pixel, 1 chord sample — docs/PERF.md r5)."""
    reduced = os.environ.get("GVPM_BENCH_CHILD_REDUCED") == "1"
    film = 64 if reduced else BEAM_FILM
    photons = (1 << 17) if reduced else BEAM_PHOTONS
    beams_n = (1 << 12) if reduced else BEAM_COUNT
    base_kw = dict(
        max_depth=12, null_bounces=6, max_cam_depth=6,
        surface_photons=photons, volume_photons=photons,
        grid_hash_size=1 << 20,
        volume_samples=1 if reduced else 2,
        initial_scale_volume=0.8,
        grid_max_photons_per_cell=32, gather_q_tile=2048,
        vol_segments_per_pixel=1 if reduced else 2,
        grid_dims=(64, 64, 64), gather_window=2048,
        window_q_tile=256, cull_k=32, gather_budget=96,
        grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
        beam_seg_tile=8192, beams=beams_n)
    scene = box_medium(width=film, height=film)
    cfg = GradientConfig(use_manifold=False, **base_kw)
    r_b = sppm.base_volume_radius(scene, cfg)
    out = run_config(scene, cfg, tech, photons, r_b, 2)
    out["film"] = film
    out["photons"] = photons
    out["beams"] = beams_n
    if reduced:
        out["config_note"] = ("reduced config: full per-pixel workload "
                              "faults the TPU worker (open backend bug, "
                              "docs/PERF.md r5 isolation notes)")
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def _try_subprocess(tech, configs, timeout_s=1800):
    """Crash-isolated technique run: one child process per config, with
    a reduced-config retry so a worker fault still yields a recorded
    rate instead of r4's bare error strings."""
    import subprocess
    import sys

    def run_child(reduced):
        env = dict(os.environ, GVPM_BENCH_CHILD=tech)
        if reduced:
            env["GVPM_BENCH_CHILD_REDUCED"] = "1"
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s)
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("CHILD_RESULT "):
                return json.loads(line[len("CHILD_RESULT "):])
        tail = (r.stderr.strip().splitlines() or ["no output"])[-1]
        return {"error": tail[:300]}

    try:
        out = run_child(False)
        if "error" in out:
            full_err = out["error"]
            out = run_child(True)
            out["full_config_error"] = full_err[:200]
        configs[tech] = out
    except subprocess.TimeoutExpired:
        configs[tech] = {"error": f"timeout after {timeout_s}s"}
    tag = "" if "error" not in configs[tech] else " FAILED"
    print(f"[bench] {tech}{tag}: {configs[tech]}",
          file=os.sys.stderr, flush=True)


def main():
    child = os.environ.get("GVPM_BENCH_CHILD")
    if child:
        _beam_child(child)
        return
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # 256k light PATHS x maxDepth 12 stores ~1M+ photons per map —
        # the paper's 1M-photons-per-pass scale (generatorGVPM.py:45-48
        # counts STORED photons). initial_scale_volume puts the 3D
        # kernel in the classic-PM gather regime (O(10) photons per
        # query ball — the reference's early-pass regime where density
        # estimation, not tracing, dominates).
        side, n_photons, passes = 512, 1 << 18, 3
        base_kw = dict(
            max_depth=12, null_bounces=6, max_cam_depth=6,
            surface_photons=1 << 18, volume_photons=1 << 18,
            grid_hash_size=1 << 20, volume_samples=2,
            initial_scale_volume=0.8,
            grid_max_photons_per_cell=32, gather_q_tile=2048,
            vol_segments_per_pixel=2,
            grid_dims=(64, 64, 64), gather_window=2048,
            window_q_tile=256, cull_k=32, gather_budget=96,
            grid_surface_rows=1 << 20, grid_volume_rows=1 << 20,
            # r5 headline: the fused Pallas window-sweep kernel
            # (ops/pallas_gather.py) — no random fetches, no candidate
            # subsampling; Qt/W from the on-chip r5 sweep
            gather_driver="pallas", pallas_q_tile=96, pallas_window=384,
            beam_seg_tile=8192)
        beams = 1 << 14
    else:
        side, n_photons, passes = 64, 1 << 14, 2
        base_kw = dict(
            max_depth=6, null_bounces=3, max_cam_depth=4,
            surface_photons=1 << 14, volume_photons=1 << 14,
            grid_hash_size=1 << 15, volume_samples=2,
            grid_max_photons_per_cell=16,
            grid_dims=(32, 32, 32), gather_window=512,
            window_q_tile=64)
        beams = 1 << 10

    scene = box_medium(width=side, height=side)

    configs = {}
    only = os.environ.get("GVPM_BENCH_ONLY", "")
    phases = {}
    cfg = GradientConfig(use_manifold=False, **base_kw)
    r_vol = sppm.base_volume_radius(scene, cfg)
    if only != "beams":
        # --- headline: VPM distance ---
        _try("distance", run_config, configs, scene, cfg, "distance",
             n_photons, r_vol, passes)
        phases = _try("phases", phase_breakdown, {}, scene, cfg,
                      n_photons, r_vol) or {}

    # --- technique matrix (generatorGVPM.py:74-84) ---
    # GVPM_BENCH_ONLY=distance skips the secondary configs (each is a
    # separate multi-minute compile; the persistent cache makes repeat
    # full runs cheap)
    if only != "distance":
        if only != "beams":
            cfg_me = GradientConfig(use_manifold=True, **base_kw)
            _try("distance_me", run_config, configs, scene, cfg_me,
                 "distance", n_photons, r_vol, max(1, passes - 1))
        # Beam/plane techniques: FULL per-pixel workload (2 medium
        # segments/pixel, 2 chord samples — no halving, VERDICT r4
        # next #1) at paper photon/beam counts (2^18 paths, 16k beams
        # ~ generatorGVPM.py's 2e4), dispatched per segment chunk from
        # the host (gvpm.render_pass_hosted). Film is 128^2: the pair
        # sweep is O(segments x beams), so visits/s — the recorded rate
        # — is film-size invariant, while a 512^2 sweep would take
        # ~20 min per pass with the current dense enumeration (the
        # sub-beam spatial cull is the open lever, see docs/PERF.md).
        # Each technique runs in its OWN SUBPROCESS on TPU: a worker
        # fault (the still-open plane0d crash class, docs/PERF.md r5
        # notes) poisons every later jax call in its process, so r4's
        # in-process isolation lost beam1d/beam3d to plane0d's crash.
        if on_tpu:
            for tech in ("beam1d", "beam3d", "plane0d"):
                _try_subprocess(tech, configs)
        else:
            side_b = side
            scene_b = box_medium(width=side_b, height=side_b)
            kw_b = dict(base_kw, beams=beams)
            cfg_b = GradientConfig(use_manifold=False, **kw_b)
            r_b = sppm.base_volume_radius(scene_b, cfg_b)
            for tech in ("plane0d", "beam1d", "beam3d"):
                _try(tech, run_config, configs, scene_b, cfg_b, tech,
                     n_photons, r_b, max(1, passes - 1))

    # --- equal-time relMSE track (the reference's protocol) ---
    relmse_box = {}
    if on_tpu and not os.environ.get("GVPM_BENCH_SKIP_RELMSE"):
        _try("relmse", relmse_track, relmse_box)
    relmse_res = relmse_box.get("relmse") or {}

    head = configs.get("distance") or {}
    failed = "error" in head or not head
    n_pix = side * side
    cfgd = GradientConfig(use_manifold=False, **base_kw)
    rays = 5 * n_pix * cfgd.max_cam_depth \
        + n_photons * (cfgd.max_depth + cfgd.null_bounces)
    vps = 0.0 if failed else head["visits_per_s"]

    print(json.dumps({
        "metric": "gradient_photon_visits_per_s_per_chip",
        "value": vps,
        "unit": "photon-visits/s",
        "vs_baseline": round(vps / TARGET, 4),
        "visits_per_pass": 0 if failed else head["visits_per_pass"],
        "pass_seconds": 0 if failed else head["pass_seconds"],
        "wavefront_mrays_per_s": 0 if failed else round(
            rays / head["pass_seconds"] / 1e6, 2),
        "phases": phases,
        "configs": configs,
        "relmse": relmse_res,
        "config": {"film": side, "photons": n_photons,
                   "max_depth": cfgd.max_depth, "volume": "distance",
                   "driver": cfgd.gather_driver,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
