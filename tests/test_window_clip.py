"""Window-clipping compensation validation (VERDICT r3 task 9 / ADVICE
r3): a clustered photon distribution must force gather_window's clipping
path, the dropped counter must fire (the test bites), and the
covered-fraction compensation must keep the summed energy within a
stated tolerance of the exact dense evaluation. The ranked-cull driver
(gather_ranked_cull) has no window at all — its budgets are validated
for exactness when sized amply."""

import jax
import jax.numpy as jnp
import numpy as np

from gvpm_tpu.ops import cellgrid

DIMS = (8, 8, 8)


def _setup(key, P=4096, Q=128):
    kp, kq = jax.random.split(key)
    # photons clustered into one z-slab corner -> long runs, so a small
    # window MUST clip
    p = jax.random.uniform(kp, (P, 3)) * jnp.asarray([0.3, 0.3, 0.12])
    x = jax.random.uniform(kq, (Q, 3)) * jnp.asarray([0.3, 0.3, 0.12])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    rows = jnp.concatenate([p, jnp.ones((P, 125))], axis=1)
    grid, rows_s = cellgrid.build_cells(p, jnp.ones((P,), bool), lo, hi,
                                        0.06, DIMS, rows)
    return grid, rows_s, x


def _energy_window(grid, rows_s, x, r2, window):
    def ev(qi, rows, row0, ok, scale):
        p3 = rows[:, :3]
        d2 = jnp.sum((p3[None] - x[qi][:, None]) ** 2, axis=-1)
        inside = ok & (d2 < r2)
        return dict(e=jnp.sum(jnp.where(inside, scale, 0.0), axis=1))

    out, dropped = cellgrid.gather_window(grid, x, ev, rows_s,
                                          q_tile=32, window=window)
    return float(jnp.sum(out["e"])), int(dropped)


def test_clipping_fires_and_energy_is_compensated():
    grid, rows_s, x = _setup(jax.random.key(7))
    r2 = 0.03 ** 2
    e_exact, d0 = _energy_window(grid, rows_s, x, r2, window=1 << 14)
    assert d0 == 0 and e_exact > 0
    e_clip, d1 = _energy_window(grid, rows_s, x, r2, window=96)
    assert d1 > 0, "clustered setup failed to force clipping"
    # covered-fraction compensation: energy within 40% (it is an
    # importance SUBSAMPLE, spatially approximate by design — the
    # contract is 'counted and bounded', not exact; the default cull
    # driver does not clip at all)
    assert abs(e_clip / e_exact - 1.0) < 0.4, (e_clip, e_exact, d1)


def test_ranked_cull_exact_when_budgeted():
    grid, rows_s, x = _setup(jax.random.key(3), P=1024, Q=64)
    r2 = 0.03 ** 2
    narrow = cellgrid.narrow_table(rows_s)

    def ev(qi, idx, ok, scale):
        p3 = rows_s[idx][..., :3]
        d2 = jnp.sum((p3 - x[qi][:, None]) ** 2, axis=-1)
        inside = ok & (d2 < r2)
        return dict(e=jnp.sum(jnp.where(inside, scale, 0.0), axis=1))

    out, dropped, over = cellgrid.gather_ranked_cull(
        grid, x, r2, narrow, ev, rows_s, q_tile=32, budget=1024,
        k_budget=512)
    e_exact, _ = _energy_window(grid, rows_s, x, r2, window=1 << 14)
    assert int(dropped) == 0 and int(over) == 0
    np.testing.assert_allclose(float(jnp.sum(out["e"])), e_exact,
                               rtol=1e-5)
