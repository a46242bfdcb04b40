"""Microbench the cull-driver phases on the chip: narrow-window slice,
ball test + prefix sums, searchsorted rank-select, K-row fetch + eval
stand-in — each phase cumulative, repeated inside one jitted scan with
a carry dependency (the axon tunnel needs a host fetch as the barrier;
see microbench_gather3.py)."""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def measure(fn, *args, reps=1):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.key(0)
    P = 1 << 20
    Qt, W, K, F = 256, 768, 32, 128
    n_tiles = 64          # tiles per rep inside the scan
    rows = jax.random.normal(key, (P, F))
    narrow = jnp.transpose(rows[:, :3])          # [3, P]
    xq = jax.random.uniform(key, (n_tiles, Qt, 3))
    lo = jax.random.randint(key, (n_tiles, 4), 0, P - W)
    r0 = jax.random.randint(key, (n_tiles, 4, Qt), 0, P - W)
    r1 = r0 + 64
    ranks = jnp.arange(1, K + 1, dtype=jnp.int32)
    vss = jax.vmap(lambda c, t: jnp.searchsorted(c, t, side="left"),
                   in_axes=(0, None))
    res = {}

    def run(label, tile_fn):
        @jax.jit
        def f(narrow, rows, xq, lo, r0, r1):
            def step(c, t):
                o = tile_fn(narrow, rows, xq[t] + c, lo[t], r0[t], r1[t])
                return jnp.sum(o) * 1e-20, 0.0
            c, _ = lax.scan(step, 0.0, jnp.arange(n_tiles))
            return c
        dt = measure(f, narrow, rows, xq, lo, r0, r1) / n_tiles
        res[label] = round(dt * 1e6, 1)   # us/tile

    def phase_slice(narrow, rows, x, lo, r0, r1):
        acc = 0.0
        for r in range(4):
            nw = lax.dynamic_slice(narrow, (0, lo[r]), (3, W))
            acc += jnp.sum(nw)
        return acc

    def cull_core(narrow, x, lo_r, r0_r, r1_r):
        nw = lax.dynamic_slice(narrow, (0, lo_r), (3, W))
        j = jnp.arange(W, dtype=jnp.int32)[None, :]
        absrow = lo_r + j
        member = (absrow >= r0_r[:, None]) & (absrow < r1_r[:, None])
        dx = nw[0][None, :] - x[:, 0:1]
        dy = nw[1][None, :] - x[:, 1:2]
        dz = nw[2][None, :] - x[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        hit = member & (d2 < 0.01)
        return hit, absrow

    def phase_ball(narrow, rows, x, lo, r0, r1):
        acc = 0.0
        for r in range(4):
            hit, _ = cull_core(narrow, x, lo[r], r0[r], r1[r])
            acc += jnp.sum(hit)
        return acc

    def phase_select(narrow, rows, x, lo, r0, r1):
        cnt = jnp.zeros((Qt,), jnp.int32)
        cand = jnp.zeros((Qt, K), jnp.int32)
        for r in range(4):
            hit, absrow = cull_core(narrow, x, lo[r], r0[r], r1[r])
            cs = cnt[:, None] + jnp.cumsum(hit.astype(jnp.int32), axis=1)
            cnt_new = cs[:, -1]
            jj = vss(cs, ranks)
            fresh = (ranks[None] > cnt[:, None]) & (ranks[None] <= cnt_new[:, None])
            cand = jnp.where(fresh, lo[r] + jnp.minimum(jj, W - 1), cand)
            cnt = cnt_new
        return jnp.sum(cand)

    def phase_fetch(narrow, rows, x, lo, r0, r1):
        cnt = jnp.zeros((Qt,), jnp.int32)
        cand = jnp.zeros((Qt, K), jnp.int32)
        for r in range(4):
            hit, absrow = cull_core(narrow, x, lo[r], r0[r], r1[r])
            cs = cnt[:, None] + jnp.cumsum(hit.astype(jnp.int32), axis=1)
            cnt_new = cs[:, -1]
            jj = vss(cs, ranks)
            fresh = (ranks[None] > cnt[:, None]) & (ranks[None] <= cnt_new[:, None])
            cand = jnp.where(fresh, lo[r] + jnp.minimum(jj, W - 1), cand)
            cnt = cnt_new
        got = rows[cand]                       # [Qt, K, F]
        return jnp.sum(got)

    run("slice4_us", phase_slice)
    run("ball_us", phase_ball)
    run("select_us", phase_select)
    run("fetch_us", phase_fetch)

    # variant: narrow as blocked [P//128, 128] per-coordinate tables
    nb = [rows[:, c].reshape(P // 128, 128) for c in range(3)]
    def phase_ball_blk(narrow, rows, x, lo, r0, r1):
        acc = 0.0
        Wr = W // 128
        for r in range(4):
            lo_b = (lo[r] // 128)
            sl = [lax.dynamic_slice(t, (lo_b, 0), (Wr, 128)) for t in nb]
            base = lo_b * 128
            j = (jax.lax.broadcasted_iota(jnp.int32, (Wr, 128), 0) * 128
                 + jax.lax.broadcasted_iota(jnp.int32, (Wr, 128), 1))
            absrow = base + j[None]
            member = (absrow >= r0[r][:, None, None]) & (absrow < r1[r][:, None, None])
            dx = sl[0][None] - x[:, 0:1, None]
            dy = sl[1][None] - x[:, 1:2, None]
            dz = sl[2][None] - x[:, 2:3, None]
            d2 = dx * dx + dy * dy + dz * dz
            acc += jnp.sum(member & (d2 < 0.01))
        return acc
    run("ball_blocked_us", phase_ball_blk)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
