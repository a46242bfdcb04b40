"""Benchmark: the G-VPM gradient pass (the product's hot loop) at paper
scale, reporting REAL photon visits per second.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Workload (BASELINE.md / generatorGVPM.py paper config shape): 512x512
film, 1M light paths per pass, maxDepth 12, VPM distance estimator, full
gradient pass (base + 4 shifted camera paths, surface + volume gathers
with diffuse-reconnection shifts and pairwise MIS, gradient assembly).

The metric counts photons that actually pass the kernel test inside the
gathers (gvpm.render_pass returns the counter) — NOT candidate slots;
round-1's candidate-slot metric overcounted by the masked fraction.
vs_baseline: BASELINE.md target is >= 10x one 64-core CPU node running
the reference (~20M real gathers/s measured class for Mitsuba-era SPPM
on such a node), i.e. 2e8 visits/s == 1.0.

On a CPU host (no TPU) a tiny config is used — that mode exists only so
the bench stays runnable in CI; the recorded numbers come from the chip.
"""

import json
import os
import time

import jax

if os.environ.get("GVPM_BENCH_CPU"):
    # the container's sitecustomize pins the axon/TPU backend at
    # interpreter start; force-reset onto the virtual CPU mesh the same
    # way tests/conftest.py does
    import jax._src.xla_bridge as _xb
    if _xb.backends_are_initialized():
        _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium

REFERENCE_NODE_GATHERS_PER_S = 20e6   # one 64-core CPU node, reference class
TARGET = 10.0 * REFERENCE_NODE_GATHERS_PER_S


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # 256k light PATHS x maxDepth 12 stores ~1M+ photons per map —
        # the paper's 1M-photons-per-pass scale (the reference counts
        # STORED photons, generatorGVPM.py:45-48, not emitted paths)
        side, n_photons, passes = 512, 1 << 18, 3
        cfg = GradientConfig(
            max_depth=12, null_bounces=6, max_cam_depth=6,
            surface_photons=n_photons, volume_photons=n_photons,
            grid_hash_size=1 << 20, volume_samples=2,
            # gather-dominated regime: ~20 medium photons per 3D kernel
            # (classic PM occupancy; the paper's late-pass radii are
            # smaller, where rendering is trace-bound, not gather-bound)
            initial_scale_volume=0.4,
            grid_max_photons_per_cell=32, gather_q_tile=2048,
            vol_segments_per_pixel=2, use_manifold=False)
    else:
        side, n_photons, passes = 64, 1 << 14, 2
        cfg = GradientConfig(
            max_depth=6, null_bounces=3, max_cam_depth=4,
            surface_photons=n_photons, volume_photons=n_photons,
            grid_hash_size=1 << 15, volume_samples=2,
            grid_max_photons_per_cell=16, use_manifold=False)

    scene = box_medium(width=side, height=side)
    r_vol = sppm.base_volume_radius(scene, cfg)

    args = (scene, cfg, "distance", n_photons, 0, 0, 1.0, 1.0, r_vol)
    out = gvpm.render_pass(*args)  # compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    visits = 0
    for it in range(1, passes + 1):
        p, gx, gy, st = gvpm.render_pass(scene, cfg, "distance",
                                         n_photons, 0, it, 1.0, 1.0,
                                         r_vol)
        visits += int(st["visits"])
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / passes
    rate = (visits / passes) / dt

    # wavefront rays actually traced per pass: 5 camera wavefronts
    # (base + 4 offsets) x steps + photon walk steps
    n_pix = side * side
    rays = 5 * n_pix * cfg.max_cam_depth \
        + n_photons * (cfg.max_depth + cfg.null_bounces)

    print(json.dumps({
        "metric": "gradient_photon_visits_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "photon-visits/s",
        "vs_baseline": round(rate / TARGET, 4),
        "visits_per_pass": visits // passes,
        "pass_seconds": round(dt, 4),
        "wavefront_mrays_per_s": round(rays / dt / 1e6, 2),
        "config": {"film": side, "photons": n_photons,
                   "max_depth": cfg.max_depth, "volume": "distance",
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
