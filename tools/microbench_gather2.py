"""Microbench v2 — with matmul calibration and defeat-the-optimizer
variations, because v1 reported 260 TB/s 'gather bandwidth' (i.e., the
measured thing was not the gather).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def _force(out):
    # axon backend: block_until_ready returns before execution finishes;
    # a host fetch of a reduced scalar is the only reliable barrier
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]))


def timeit(fn, *args, n=3):
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    results = {}
    key = jax.random.key(0)

    # ---- calibration: bf16 matmul, known flops ----
    M = 8192
    a = jax.random.normal(key, (M, M), jnp.bfloat16)
    b = jax.random.normal(key, (M, M), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    dt = timeit(mm, a, b)
    results["matmul_8k_bf16_TFLOPs"] = round(2 * M**3 / dt / 1e12, 1)

    # ---- calibration: HBM copy bandwidth ----
    big = jax.random.normal(key, (1 << 28,), jnp.float32)  # 1 GB

    @jax.jit
    def cp(x):
        return x * 1.0000001

    dt = timeit(cp, big)
    results["copy_GB_per_s"] = round(2 * big.nbytes / dt / 1e9, 1)

    # ---- random row gather, output keeps per-chunk structure ----
    P = 1 << 20
    NIDX = 1 << 23
    CH = 1 << 17
    for F in (16, 32, 64, 128):
        table = jax.random.normal(key, (P, F), jnp.float32)
        idx = jax.random.randint(jax.random.key(1), (NIDX,), 0, P,
                                 jnp.int32)

        @jax.jit
        def g(table, idx):
            def chunk(c, ix):
                rows = table[ix]                     # [CH, F]
                # per-chunk nonlinear reduce (not rewritable as matvec)
                return c + jnp.max(rows, axis=0) + jnp.sum(
                    rows * rows, axis=0), 0.0
            c, _ = lax.scan(chunk, jnp.zeros((F,)), idx.reshape(-1, CH))
            return c

        dt = timeit(g, table, idx)
        results[f"rand_gather_F{F}"] = {
            "Mindices_per_s": round(NIDX / dt / 1e6, 1),
            "GB_per_s": round(NIDX * F * 4 / dt / 1e9, 1)}

    # ---- [Qt, B] 2D tile gather like gather_dense does ----
    F = 128
    table = jax.random.normal(key, (P, F), jnp.float32)
    Qt, B = 2048, 64
    ntiles = NIDX // (Qt * B)
    idx2 = jax.random.randint(jax.random.key(2), (ntiles, Qt, B), 0, P,
                              jnp.int32)

    @jax.jit
    def g2(table, idx2):
        def chunk(c, ix):
            rows = table[ix]                         # [Qt, B, F]
            return c + jnp.sum(rows * rows, axis=(1, 2)), 0.0
        c, _ = lax.scan(chunk, jnp.zeros((Qt,)), idx2)
        return c

    dt = timeit(g2, table, idx2)
    n = ntiles * Qt * B
    results["tile2d_gather_F128"] = {
        "Mindices_per_s": round(n / dt / 1e6, 1),
        "GB_per_s": round(n * F * 4 / dt / 1e9, 1)}

    # ---- contiguous windows via dynamic_slice in a scan ----
    for W in (512, 2048):
        nwin = 4096
        starts = jnp.sort(jax.random.randint(
            jax.random.key(4), (nwin,), 0, P - W, jnp.int32))

        @jax.jit
        def wslice(table, starts):
            def chunk(c, s):
                win = lax.dynamic_slice(table, (s, 0), (W, F))
                return c + jnp.sum(win * win, axis=0), 0.0
            c, _ = lax.scan(chunk, jnp.zeros((F,)), starts)
            return c

        dt = timeit(wslice, table, starts)
        results[f"window_slice_W{W}"] = {
            "Mrows_per_s": round(nwin * W / dt / 1e6, 1),
            "GB_per_s": round(nwin * W * F * 4 / dt / 1e9, 1)}

    print(json.dumps({"backend": jax.default_backend(),
                      "results": results}, indent=1))


if __name__ == "__main__":
    main()
