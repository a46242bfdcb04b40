"""Microbench v3 — amortizes the ~25ms axon-tunnel per-call overhead by
repeating each op K times inside one jitted scan with a carry
dependency, and forces completion with a host fetch.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def measure(fn, *args, reps=1):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = time.perf_counter() - t0
    return dt / reps


def main():
    results = {}
    key = jax.random.key(0)
    K = 16

    # ---- calibration: bf16 matmul ----
    M = 8192
    a = jax.random.normal(key, (M, M), jnp.bfloat16)
    b = jax.random.normal(key, (M, M), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        def step(c, _):
            return jnp.dot(a + c.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.float32)[:1, :1], 0.
        c, _ = lax.scan(step, jnp.zeros((1, 1)), None, length=K)
        return c

    dt = measure(mm, a, b, reps=K)
    results["matmul_8k_bf16_TFLOPs"] = round(2 * M**3 / dt / 1e12, 1)

    # ---- HBM copy ----
    big = jax.random.normal(key, (1 << 27,), jnp.float32)  # 512 MB

    @jax.jit
    def cp(x):
        def step(c, _):
            return c * 1.0000001, 0.0
        c, _ = lax.scan(step, x, None, length=K)
        return c[:1]

    dt = measure(cp, big, reps=K)
    results["copy_GB_per_s"] = round(2 * big.nbytes / dt / 1e9, 1)

    # ---- random row gather ----
    P = 1 << 20
    NIDX = 1 << 23
    CH = 1 << 17
    KG = 4
    for F in (8, 16, 32, 64, 128):
        table = jax.random.normal(key, (P, F), jnp.float32)
        idx = jax.random.randint(jax.random.key(1), (NIDX,), 0, P,
                                 jnp.int32)

        @jax.jit
        def g(table, idx):
            def rep(c0, r):
                def chunk(c, ix):
                    rows = table[(ix + r) & (P - 1)]
                    return c + jnp.sum(rows * rows, axis=0), 0.0
                c, _ = lax.scan(chunk, c0, idx.reshape(-1, CH))
                return c, 0.0
            c, _ = lax.scan(rep, jnp.zeros((F,)),
                            jnp.arange(KG, dtype=jnp.int32))
            return c

        dt = measure(g, table, idx, reps=KG)
        results[f"rand_gather_F{F}"] = {
            "Mindices_per_s": round(NIDX / dt / 1e6, 1),
            "GB_per_s": round(NIDX * F * 4 / dt / 1e9, 1)}

    # ---- contiguous windows via dynamic_slice in a scan ----
    F = 128
    table = jax.random.normal(key, (P, F), jnp.float32)
    for W in (256, 1024, 4096):
        nwin = 2048
        starts = jnp.sort(jax.random.randint(
            jax.random.key(4), (nwin,), 0, P - W - KG, jnp.int32))

        @jax.jit
        def wslice(table, starts):
            def rep(c0, r):
                def chunk(c, s):
                    win = lax.dynamic_slice(table, (s + r, 0), (W, F))
                    return c + jnp.sum(win * win, axis=0), 0.0
                c, _ = lax.scan(chunk, c0, starts)
                return c, 0.0
            c, _ = lax.scan(rep, jnp.zeros((F,)),
                            jnp.arange(KG, dtype=jnp.int32))
            return c

        dt = measure(wslice, table, starts, reps=KG)
        results[f"window_slice_W{W}"] = {
            "Mrows_per_s": round(nwin * W / dt / 1e6, 1),
            "GB_per_s": round(nwin * W * F * 4 / dt / 1e9, 1)}

    # ---- vmapped windows (batched dynamic_slice == gather of runs?) ----
    W = 512
    nwin = 2048
    starts = jnp.sort(jax.random.randint(
        jax.random.key(4), (nwin,), 0, P - W - KG, jnp.int32))

    @jax.jit
    def wvmap(table, starts):
        def rep(c0, r):
            def one(s):
                return jnp.sum(
                    lax.dynamic_slice(table, (s + r, 0), (W, F)) ** 2,
                    axis=0)
            c = jnp.sum(jax.vmap(one)(starts), axis=0)
            return c0 + c, 0.0
        c, _ = lax.scan(rep, jnp.zeros((F,)),
                        jnp.arange(KG, dtype=jnp.int32))
        return c

    dt = measure(wvmap, table, starts, reps=KG)
    results["window_vmap_W512"] = {
        "Mrows_per_s": round(nwin * W / dt / 1e6, 1),
        "GB_per_s": round(nwin * W * F * 4 / dt / 1e9, 1)}

    print(json.dumps({"backend": jax.default_backend(),
                      "results": results}, indent=1))


if __name__ == "__main__":
    main()
