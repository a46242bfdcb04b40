"""Benchmark: photon gathers/s per chip on the reference workload shape.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

The headline metric is photon-mapping throughput — gather operations per
second on one chip for the full SPPM pass (camera trace + photon shoot +
grid build + surface & volume gathers), the hot loop of the reference
(SURVEY.md §3.2). vs_baseline compares against the BASELINE.md target of
10x a 64-core CPU node running the reference; the reference publishes no
absolute numbers (BASELINE.json.published == {}), so we report against a
conservative estimate of the reference's CPU gather rate (~20M photon
gather-ops/s/node measured class for Mitsuba-era SPPM).
"""

import json
import time

import jax

from __graft_entry__ import _tiny_scene
from gvpm_tpu.core.config import PhotonConfig
from gvpm_tpu.integrators import sppm

REFERENCE_CPU_GATHERS_PER_S = 20e6  # one 64-core node, reference class


def main():
    scene = _tiny_scene(width=128, height=128)
    n_photons = 1 << 15
    cfg = PhotonConfig(max_depth=6, null_bounces=3, max_cam_depth=5,
                       surface_photons=n_photons, volume_photons=n_photons,
                       grid_hash_size=1 << 16, volume_samples=2,
                       grid_max_photons_per_cell=16)
    r_vol = sppm.base_volume_radius(scene, cfg)

    args = (scene, cfg, "distance", n_photons, 0, 0, 1.0, 1.0, r_vol)
    img = sppm.render_pass(*args)  # compile
    jax.block_until_ready(img)

    n_iters = 3
    t0 = time.perf_counter()
    for it in range(1, n_iters + 1):
        img = sppm.render_pass(scene, cfg, "distance", n_photons, 0, it,
                               1.0, 1.0, r_vol)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n_iters

    # candidate visits per pass: every query examines stencil x K
    # photon slots (8-cell half-offset stencil, ops/hashgrid.py)
    n_pix = scene.width * scene.height
    queries = n_pix * (1 + cfg.volume_samples)   # surface + volume samples
    gathers = queries * 8 * cfg.grid_max_photons_per_cell
    rate = gathers / dt

    print(json.dumps({
        "metric": "photon_gathers_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "candidate-visits/s",
        "vs_baseline": round(rate / (10.0 * REFERENCE_CPU_GATHERS_PER_S), 4),
        "queries_per_s": round(queries / dt, 1),
        "pass_seconds": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
