"""Replay one dumped beam/plane chunk in a FRESH process — splits
data-dependent faults from backend-state-dependent ones.
  python tools/repro_chunk_replay.py <npz> [volume]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm
from gvpm_tpu.scenes import box_medium


def _synth_like(name, a, key, lo, hi):
    """Synthetic benign replacement with the same shape/dtype."""
    import numpy as onp
    rng = onp.random.default_rng(abs(hash(name)) % (2**31))
    if a.dtype == np.bool_:
        return jnp.ones(a.shape, bool)
    if np.issubdtype(a.dtype, np.integer):
        if name.endswith("med") or name.endswith("bsdf") \
                or name.endswith("type"):
            return jnp.zeros(a.shape, a.dtype)
        return jnp.asarray(rng.integers(0, 4, a.shape), a.dtype)
    if a.ndim == 2 and a.shape[1] == 3:
        if name.endswith("_d") or "w0" in name or "w1" in name \
                or "_wi" in name or "_ns" in name:
            v = rng.normal(size=a.shape)
            v /= onp.linalg.norm(v, axis=-1, keepdims=True)
            return jnp.asarray(v, jnp.float32)
        v = lo + (hi - lo) * rng.uniform(size=a.shape)
        return jnp.asarray(v, jnp.float32)
    return jnp.asarray(0.3 + 0.5 * rng.uniform(size=a.shape),
                       jnp.float32)


def main():
    path = sys.argv[1]
    volume = sys.argv[2] if len(sys.argv) > 2 else "plane0d"
    synth_groups = sys.argv[3].split(",") if len(sys.argv) > 3 else []
    z = np.load(path)
    import numpy as onp
    lo = onp.array([-1.0, -1.0, -1.0])
    hi = onp.array([1.0, 1.0, 1.0])

    def load(prefix, strip):
        out = {}
        for k in z.files:
            if not k.startswith(prefix):
                continue
            name = k[strip:]
            a = z[k]
            grp = prefix.rstrip("_").rstrip("0123")
            if grp in synth_groups:
                out[name] = _synth_like(k, a, None, lo, hi)
            else:
                out[name] = jnp.asarray(a)
        return out

    cb = load("cb_", 3)
    scb = [load(f"scb{i}_", 5) for i in range(4)]
    lb = load("lb_", 3)
    bl = jnp.asarray(z["bl"])
    r_b = jnp.asarray(z["r_b"])
    if "blz" in synth_groups:
        bl = jnp.zeros_like(bl)
    if "rb05" in synth_groups:
        r_b = jnp.float32(0.05)
    if "scbpix" in synth_groups:
        for s in scb:
            s["pixel"] = cb.get("pixel",
                                jnp.arange(s["o"].shape[0],
                                           dtype=jnp.int32))
    if synth_groups:
        print(f"[replay] synthesized groups: {synth_groups}", flush=True)
    cfg = GradientConfig(use_manifold=False, beam_tile=256,
                         volume_samples=2)
    scene = box_medium(width=16, height=16)
    key = jax.random.PRNGKey(3)
    if "devify" in synth_groups:
        # re-materialize every operand as the OUTPUT of a device
        # computation (layout experiment)
        devify = jax.jit(lambda t: jax.tree_util.tree_map(
            lambda a: a + 0 if a.dtype != jnp.bool_ else a & a, t))
        cb, scb, lb, bl = devify((cb, scb, lb, bl))
        print("[replay] operands devified", flush=True)
    if os.environ.get("GVPM_MANIFEST"):
        manifest(cb, scb, lb, bl, r_b, key)
    t0 = time.perf_counter()
    out = gvpm._beam_chunk(scene, cfg, volume, 1 << 18, lb, cb, scb, bl,
                           r_b, key, None)
    v = int(out[3])
    print(f"REPLAY OK {volume} {time.perf_counter()-t0:.1f}s visits={v}",
          flush=True)


def manifest(cb, scb, lb, bl, r_b, key):
    import numpy as onp
    rows = []
    def add(prefix, d):
        for k in sorted(d):
            a = onp.asarray(d[k])
            rows.append(f"{prefix}{k}: {a.dtype} {a.shape} "
                        f"[{onp.nanmin(a) if a.size else 0:.4g}, "
                        f"{onp.nanmax(a) if a.size else 0:.4g}]")
    add("cb_", cb)
    for i, s in enumerate(scb):
        add(f"scb{i}_", s)
    add("lb_", lb)
    a = onp.asarray(bl)
    rows.append(f"bl: {a.dtype} {a.shape} [{a.min()}, {a.max()}]")
    a = onp.asarray(r_b)
    rows.append(f"r_b: {a.dtype} {a.shape} {float(a):.6g}")
    a = onp.asarray(key)
    rows.append(f"key: {a.dtype} {a.shape}")
    for r in rows:
        print("MANIFEST", r, flush=True)


if __name__ == "__main__":
    main()
