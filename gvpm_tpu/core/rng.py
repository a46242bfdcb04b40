"""Deterministic PRNG management.

The reference achieves reproducibility by pinning work-units to workers in
"deterministic" mode (gvpm_proc.cpp:352-378). On TPU we get a stronger
guarantee for free: every sample is keyed by (seed, pass, stream, index)
via threefry fold_in, so results are bitwise identical for any device count
or sharding layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream ids — stable namespace so adding a consumer never perturbs others.
STREAM_CAMERA = 0
STREAM_LIGHT = 1
STREAM_GATHER = 2
STREAM_SHIFT = 3
STREAM_PLANE = 4
STREAM_NEE = 5
STREAM_TEST = 7


def pass_key(seed, it, stream):
    """Key for (global seed, progressive pass index, consumer stream)."""
    k = jax.random.key(seed)
    k = jax.random.fold_in(k, it)
    return jax.random.fold_in(k, stream)


def index_keys(key, n):
    """Per-element keys for a batch of n independent samples."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))


def uniform(key, shape=(), lo=0.0, hi=1.0):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def lane_uniform(key, lanes, suffix=()):
    """Uniform draws keyed by (key, lane id) — [len(lanes), *suffix].

    Unlike jax.random.uniform(key, (n,...)), whose bits depend on a
    lane's POSITION in the batch, these depend only on the lane's ID:
    slicing, sharding, or reordering the batch leaves each lane's
    randoms unchanged. This is what makes camera wavefronts (keyed by
    pixel id) and photon walks (keyed by global path index) bitwise
    device-count-invariant (module docstring contract; the reference's
    'deterministic' work-unit pinning, gvpm_proc.cpp:352-378)."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(lanes)
    return jax.vmap(lambda k: jax.random.uniform(k, suffix))(keys)
