"""Hash-grid range queries vs brute force (reference analog:
test_kd.cpp test03_pointKDTree kNN-vs-bruteforce)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.ops import hashgrid


def test_range_query_matches_bruteforce():
    key = jax.random.key(0)
    P, Q = 4096, 128
    r = 0.07
    pts = jax.random.uniform(key, (P, 3))
    valid = jnp.arange(P) < P - 100  # some invalid photons
    grid = hashgrid.build(pts, valid, jnp.zeros(3), r, hash_size=1 << 12)
    q = jax.random.uniform(jax.random.key(1), (Q, 3)) * 0.8 + 0.1

    def fold2(carry, idx, ok, scale):
        cnt, s = carry
        d2 = jnp.sum((pts[idx] - q) ** 2, axis=-1)
        inside = ok & (d2 < r * r)
        return (cnt + inside.astype(jnp.int32) * scale.astype(jnp.int32),
                s + jnp.where(inside, d2 * scale, 0.0))

    cnt, s = hashgrid.gather(grid, q, fold2,
                             (jnp.zeros(Q, jnp.int32), jnp.zeros(Q)),
                             max_per_cell=64)

    # brute force
    d2 = jnp.sum((pts[None, :, :] - q[:, None, :]) ** 2, axis=-1)
    inside = (d2 < r * r) & valid[None, :]
    cnt_bf = jnp.sum(inside, axis=1)
    s_bf = jnp.sum(jnp.where(inside, d2, 0.0), axis=1)

    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_bf))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_bf), rtol=1e-5)


def test_no_double_count_on_hash_collisions():
    # tiny hash table forces many collisions; dedupe must still be exact
    key = jax.random.key(2)
    P, Q = 512, 64
    r = 0.15
    pts = jax.random.uniform(key, (P, 3)) * 2.0
    valid = jnp.ones(P, bool)
    grid = hashgrid.build(pts, valid, jnp.zeros(3), r, hash_size=16)
    q = jax.random.uniform(jax.random.key(3), (Q, 3)) * 1.6 + 0.2

    def fold(carry, idx, ok, scale):
        d2 = jnp.sum((pts[idx] - q) ** 2, axis=-1)
        inside = ok & (d2 < r * r)
        return carry + inside.astype(jnp.int32)

    cnt = hashgrid.gather(grid, q, fold, jnp.zeros(Q, jnp.int32),
                          max_per_cell=P)
    d2 = jnp.sum((pts[None] - q[:, None]) ** 2, axis=-1)
    cnt_bf = jnp.sum(d2 < r * r, axis=1)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_bf))
@pytest.mark.slow
def test_dense_matches_fold():
    """With a budget that never binds, the prefix-compacted dense path
    must visit exactly the same photon set as the fold gather (and the
    brute force)."""
    key = jax.random.key(7)
    P, Q = 2048, 300
    r = 0.09
    pts = jax.random.uniform(key, (P, 3))
    valid = jnp.ones(P, bool)
    grid = hashgrid.build(pts, valid, jnp.zeros(3), r, hash_size=1 << 10)
    q = jax.random.uniform(jax.random.key(8), (Q, 3))

    def fold(carry, idx, ok, scale):
        d2 = jnp.sum((pts[idx] - q) ** 2, axis=-1)
        inside = ok & (d2 < r * r)
        return carry + jnp.where(inside, scale * (1.0 + d2), 0.0)

    ref = hashgrid.gather(grid, q, fold, jnp.zeros(Q), max_per_cell=P)

    def eval_fn(qi, idx, ok, scale):
        d2 = jnp.sum((pts[idx] - q[qi][:, None, :]) ** 2, axis=-1)
        inside = ok & (d2 < r * r)
        return jnp.sum(jnp.where(inside, scale * (1.0 + d2), 0.0),
                       axis=1)

    dense = hashgrid.gather_dense(grid, q, eval_fn, q_tile=128,
                                  budget=512)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                               rtol=1e-5)


def test_dense_overflow_compensation_unbiased():
    """When the candidate budget binds, the strided subsample with
    scale T/B must stay unbiased: the mean over many query jitters of
    the capped estimate matches the uncapped sum within a few percent.
    """
    key = jax.random.key(11)
    P = 4096
    r = 0.12
    pts = jax.random.uniform(key, (P, 3))
    grid = hashgrid.build(pts, jnp.ones(P, bool), jnp.zeros(3),
                          2.0 * r, hash_size=1 << 10)
    Q = 512
    q = jax.random.uniform(jax.random.key(12), (Q, 3)) * 0.6 + 0.2

    def eval_fn(qi, idx, ok, scale):
        d2 = jnp.sum((pts[idx] - q[qi][:, None, :]) ** 2, axis=-1)
        inside = ok & (d2 < r * r)
        return jnp.sum(jnp.where(inside, scale * (1.0 + d2), 0.0),
                       axis=1)

    full = hashgrid.gather_dense(grid, q, eval_fn, q_tile=128,
                                 budget=1024, stencil=8)
    capped = hashgrid.gather_dense(grid, q, eval_fn, q_tile=128,
                                   budget=16, stencil=8)
    # every query overflows (E[neighbors in stencil] ~ 110 >> 16)
    tf, tc = float(jnp.sum(full)), float(jnp.sum(capped))
    assert tf > 0
    assert abs(tc - tf) / tf < 0.05, (tc, tf)
