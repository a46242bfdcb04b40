"""Microbenchmark: TPU random-gather and windowed-slice throughput.

Measures the primitives the G-VPM gather hot loop can be built from, so
the design choice (row width / budget / contiguous windows) is driven by
chip numbers instead of folklore:

  1. random row gather, row width F in {8, 16, 32, 64, 128} f32
  2. same indices, sorted ascending (locality)
  3. contiguous dynamic-slice windows per tile (the cell-major design)
  4. the rank->row prefix decode used by hashgrid.gather_dense

Run on the TPU:  python tools/microbench_gather.py
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    P = 1 << 20            # photon rows
    NIDX = 1 << 24         # ~16M gather indices (bench does ~335M/pass)
    CH = 1 << 19           # reduce in chunks so gathers aren't resident
    key = jax.random.key(0)
    results = {}

    for F in (8, 16, 32, 64, 128):
        table = jax.random.normal(key, (P, F), jnp.float32)
        idx = jax.random.randint(jax.random.key(1), (NIDX,), 0, P,
                                 jnp.int32)

        @jax.jit
        def g(table, idx):
            def chunk(ix):
                return jnp.sum(table[ix], axis=0)
            return jnp.sum(lax.map(chunk, idx.reshape(-1, CH)), axis=0)

        dt = timeit(g, table, idx)
        results[f"rand_gather_F{F}"] = {
            "Mindices_per_s": round(NIDX / dt / 1e6, 1),
            "GB_per_s": round(NIDX * F * 4 / dt / 1e9, 1)}

        idx_s = jnp.sort(idx)
        dt = timeit(g, table, idx_s)
        results[f"sorted_gather_F{F}"] = {
            "Mindices_per_s": round(NIDX / dt / 1e6, 1),
            "GB_per_s": round(NIDX * F * 4 / dt / 1e9, 1)}

    # tile-local gather: indices within a q_tile hit a small row range
    # (what cell-sorted queries + cell-sorted photons give you)
    F = 128
    table = jax.random.normal(key, (P, F), jnp.float32)
    Qt, B, ntiles = 2048, 64, NIDX // (2048 * 64)
    NIDX = ntiles * Qt * B
    base = jnp.sort(jax.random.randint(jax.random.key(2), (ntiles,), 0,
                                       P - 4096, jnp.int32))
    local = jax.random.randint(jax.random.key(3), (ntiles, Qt * B), 0,
                               4096, jnp.int32)
    tl_idx = base[:, None] + local

    @jax.jit
    def g_tiled(table, tl_idx):
        def chunk(ix):
            return jnp.sum(table[ix], axis=0)
        return jnp.sum(lax.map(chunk, tl_idx), axis=0)

    dt = timeit(g_tiled, table, tl_idx)
    n = ntiles * Qt * B
    results["tilelocal_gather_F128"] = {
        "Mindices_per_s": round(n / dt / 1e6, 1),
        "GB_per_s": round(n * F * 4 / dt / 1e9, 1)}

    # contiguous windows: lax.map over tiles, dynamic_slice a [W, F]
    # window + broadcast-eval [Qt, W] (the cell-major shape)
    for W in (256, 512, 1024):
        starts = jnp.sort(jax.random.randint(
            jax.random.key(4), (4096,), 0, P - W, jnp.int32))

        @jax.jit
        def wslice(table, starts):
            def chunk(s):
                win = lax.dynamic_slice(table, (s, 0), (W, F))
                return jnp.sum(win, axis=0)
            return jnp.sum(lax.map(chunk, starts), axis=0)

        dt = timeit(wslice, table, starts)
        results[f"window_slice_W{W}"] = {
            "Mrows_per_s": round(4096 * W / dt / 1e6, 1),
            "GB_per_s": round(4096 * W * F * 4 / dt / 1e9, 1)}

    # dense pair math throughput: [Qt, W] fused VPU ops (what the
    # window eval costs per pair) — ~60 flops/pair proxy
    Qt, W = 256, 1024
    q = jax.random.normal(key, (Qt, 8))
    w = jax.random.normal(key, (W, 8))

    @jax.jit
    def pair_eval(q, w):
        acc = jnp.zeros((Qt,))
        for it in range(16):
            d = q[:, None, :3] - w[None, :, :3] * (1.0 + it * 0.01)
            d2 = jnp.sum(d * d, -1)
            m = d2 < 0.5
            acc = acc + jnp.sum(jnp.where(m, jnp.exp(-d2), 0.0), axis=1)
        return acc

    dt = timeit(pair_eval, q, w)
    results["pair_eval_60flops"] = {
        "Gpairs_per_s": round(16 * Qt * W / dt / 1e9, 2)}

    print(json.dumps({"backend": jax.default_backend(),
                      "results": results}, indent=1))


if __name__ == "__main__":
    main()
