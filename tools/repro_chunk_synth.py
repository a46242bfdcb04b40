"""Synthetic-input isolation of the beam/plane chunk fault: build the
chunk operands directly (no photon shoot, no camera trace, no gather
head) and dispatch ONE _beam_chunk program. A crash here indicts the
chunk program alone. Each config runs in a subprocess (a TPU worker
crash poisons the parent process).

  python tools/repro_chunk_synth.py                 # run the matrix
  python tools/repro_chunk_synth.py one <vol> <m> <lb> [tile]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def one(volume, m, lbeams, tile):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import time

    from gvpm_tpu.core.config import GradientConfig
    from gvpm_tpu.integrators import estimators, gvpm
    from gvpm_tpu.scenes import box_medium

    scene = box_medium(width=16, height=16)
    cfg = GradientConfig(use_manifold=False, beam_tile=tile,
                         volume_samples=2)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 10)
    lo, hi = scene.medium_lo, scene.medium_hi

    def unit(kk, n):
        v = jax.random.normal(kk, (n, 3))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    nb = lbeams
    bo = lo + (hi - lo) * jax.random.uniform(ks[0], (nb, 3))
    beams = dict(
        valid=jnp.ones(nb, bool), o=bo, d=unit(ks[1], nb),
        length=0.2 + jax.random.uniform(ks[2], (nb,)),
        alpha=jnp.ones((nb, 3)), med=jnp.zeros(nb, jnp.int32),
        parent_p=bo - 0.3 * unit(ks[3], nb),
        parent_type=jnp.ones(nb, jnp.int32),
        parent_wi=unit(ks[4], nb), parent_ns=unit(ks[5], nb),
        parent_bsdf=jnp.zeros(nb, jnp.int32),
        parent_med=jnp.zeros(nb, jnp.int32),
        scatter_base=jnp.full((nb, 3), 0.3),
        pdf_dir_base=jnp.full((nb,), 0.3),
        reconnectable=jnp.ones(nb, bool),
        parent_idx=jnp.zeros(nb, jnp.int32),
        at_origin=jnp.ones(nb, bool))
    co = lo + (hi - lo) * jax.random.uniform(ks[6], (m, 3))
    cb = dict(valid=jnp.ones(m, bool), o=co, d=unit(ks[7], m),
              length=0.3 + jax.random.uniform(ks[8], (m,)),
              med=jnp.zeros(m, jnp.int32), thr=jnp.ones((m, 3)),
              pdf_prod=jnp.ones(m), depth=jnp.ones(m, jnp.int32),
              gid=jnp.arange(m, dtype=jnp.int32))
    if volume == "plane0d":
        cb["pixel"] = jnp.arange(m, dtype=jnp.int32)
    scb = [dict(cb, o=cb["o"] + 0.001 * (i + 1)) for i in range(4)]
    bl = jnp.zeros((4, m), bool)
    lb = (estimators.make_planes(scene, beams, ks[9])
          if volume == "plane0d" else beams)
    r_b = jnp.float32(0.05)

    if os.environ.get("GVPM_MANIFEST"):
        from repro_chunk_replay import manifest
        manifest(cb, scb, lb, bl, r_b, ks[9])
    t0 = time.perf_counter()
    out = gvpm._beam_chunk(scene, cfg, volume, 1 << 18, lb, cb, scb, bl,
                           r_b, ks[9], None)
    v = int(out[3])
    print(f"OK {volume} m={m} beams={lbeams} tile={tile} "
          f"{time.perf_counter()-t0:.1f}s visits={v}", flush=True)


def matrix():
    cases = [("plane0d", 4096, 1024, 256),
             ("plane0d", 4096, 16384, 256),
             ("plane0d", 1024, 16384, 256),
             ("beam1d", 4096, 16384, 256),
             ("beam3d", 4096, 16384, 256)]
    for vol, m, lb, tile in cases:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", vol,
             str(m), str(lb), str(tile)],
            capture_output=True, text=True, timeout=900)
        tail = (r.stdout + r.stderr).strip().splitlines()
        keep = [ln for ln in tail
                if "OK " in ln or "UNAVAILABLE" in ln
                or "RESOURCE" in ln or "Error" in ln][-2:]
        print(f"[{vol} m={m} beams={lb} tile={tile}] rc={r.returncode}",
              *keep, sep="\n  ", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]))
    else:
        matrix()
