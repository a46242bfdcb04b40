"""Equal-time / equal-sample comparison harness.

Mirror of the reference's experiment scripts (scripts/run.py,
scripts/results/run_mse.py, computeSpeedup.py): render a scene with each
technique under a shared wall-clock or pass budget, compute relMSE
against a reference image, and emit a CSV + JSON summary.

Usage:
  python tools/compare.py --scene box-medium --ref ref.pfm \
      --techniques sppm:distance sppm:beam1d gvpm:distance \
      --time-max 300 -o results/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def render_reference(scene, seconds, seed=1234):
    """Long volpath run as the reference image (the reference project
    downloads precomputed references; we generate with the PT baseline)."""
    import jax.numpy as jnp
    from gvpm_tpu.core.config import VolPathConfig
    from gvpm_tpu.integrators import volpath
    img = jnp.zeros((scene.height, scene.width, 3))
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < seconds:
        img = img + volpath.render(
            scene, VolPathConfig(spp=8, max_depth=12), seed=seed + it)
        it += 1
    return np.asarray(img / max(it, 1))


def run_technique(scene, tech, time_max, photons, seed):
    from gvpm_tpu.core.config import (GradientConfig, PhotonConfig,
                                      VolPathConfig)
    from gvpm_tpu.integrators import gpt, gvpm, sppm, volpath
    integ, _, vol = tech.partition(":")
    t0 = time.perf_counter()
    times = []

    class Budget(Exception):
        pass

    def cb(it, img):
        times.append(time.perf_counter() - t0)
        if times[-1] > time_max:
            raise Budget

    out = None
    try:
        if integ == "volpath":
            img = volpath.render(scene, VolPathConfig(
                spp=100000 if time_max else 32, max_depth=12), seed=seed)
            out = {"image": img}
        elif integ == "gpt":
            out = gpt.render(scene, VolPathConfig(spp=100000,
                                                  max_depth=12),
                             seed=seed, callback=cb)
        elif integ == "sppm":
            cfg = PhotonConfig(surface_photons=photons,
                               volume_photons=photons, max_passes=100000)
            out = sppm.render(scene, cfg, volume=vol or "distance",
                              seed=seed, callback=cb)
        elif integ == "gvpm":
            cfg = GradientConfig(surface_photons=photons,
                                 volume_photons=photons,
                                 max_passes=100000)
            out = gvpm.render(scene, cfg, volume=vol or "distance",
                              seed=seed, callback=cb)
    except Budget:
        pass
    wall = time.perf_counter() - t0
    return out, wall, times


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="box-medium")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--ref", default=None, help="reference PFM path")
    ap.add_argument("--ref-seconds", type=float, default=120.0)
    ap.add_argument("--techniques", nargs="+",
                    default=["sppm:distance", "sppm:bre", "sppm:beam1d",
                             "gvpm:distance"])
    ap.add_argument("--time-max", type=float, default=60.0)
    ap.add_argument("--photons", type=int, default=65536)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default="results")
    args = ap.parse_args(argv)

    from gvpm_tpu import scenes
    from gvpm_tpu.utils import image as imglib

    os.makedirs(args.output, exist_ok=True)
    scene = scenes.get(args.scene, width=args.width, height=args.height)

    if args.ref and os.path.exists(args.ref):
        ref = imglib.read_pfm(args.ref)
    else:
        print("rendering reference...", flush=True)
        ref = render_reference(scene, args.ref_seconds)
        imglib.write_pfm(os.path.join(args.output,
                                      f"{args.scene}_ref.pfm"), ref)

    rows = []
    for tech in args.techniques:
        print("technique", tech, flush=True)
        out, wall, times = run_technique(scene, tech, args.time_max,
                                         args.photons, args.seed)
        img, _ = imglib.nan_scrub(np.asarray(out["image"]))
        name = tech.replace(":", "_")
        imglib.write_pfm(os.path.join(args.output,
                                      f"{args.scene}_{name}.pfm"), img)
        imglib.write_png(os.path.join(args.output,
                                      f"{args.scene}_{name}.png"),
                         imglib.tonemap(img))
        row = dict(technique=tech, wall_s=round(wall, 2),
                   passes=len(times),
                   relmse=imglib.relmse(img, ref),
                   mse=imglib.mse(img, ref))
        rows.append(row)
        print("  ", row, flush=True)

    with open(os.path.join(args.output, f"{args.scene}_summary.json"),
              "w") as f:
        json.dump(rows, f, indent=2)
    with open(os.path.join(args.output, f"{args.scene}_summary.csv"),
              "w") as f:
        f.write("technique,wall_s,passes,relmse,mse\n")
        for r in rows:
            f.write(f"{r['technique']},{r['wall_s']},{r['passes']},"
                    f"{r['relmse']:.6g},{r['mse']:.6g}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
