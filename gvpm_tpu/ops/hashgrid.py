"""Spatial hash grid: the TPU-native photon index.

Replaces the reference's left-balanced PointKDTree (kdtree.h:217,
photonmap.h:34): pointer-free, build = one sort, query = fixed-fanout
gathers — exactly the memory-access shape the TPU likes. The radius-r
range query visits the 27 neighbor cells (requires r <= cell_size) with a
static per-cell photon cap; hash collisions are deduplicated by comparing
exact cell coordinates, so estimates stay unbiased.

Build is O(P log P) (argsort); query is O(Q * 27 * K) gathers, K =
max_photons_per_cell. All shapes static -> one XLA compilation.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

P1, P2, P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes

NEIGHBOR_OFFSETS = [(ox, oy, oz)
                    for ox in (-1, 0, 1)
                    for oy in (-1, 0, 1)
                    for oz in (-1, 0, 1)]


@flax.struct.dataclass
class HashGrid:
    origin: jnp.ndarray       # [3]
    cell_size: jnp.ndarray    # []
    sorted_idx: jnp.ndarray   # [P] photon index ordered by bucket
    cell_key: jnp.ndarray     # [P] bucket of each *sorted* photon
    cell_of: jnp.ndarray      # [P,3] int32 cell coords per photon (unsorted;
                              #       SORTED order when identity_order)
    bucket_start: jnp.ndarray  # [H+1]
    hash_size: int = flax.struct.field(pytree_node=False, default=1 << 18)
    identity_order: bool = flax.struct.field(pytree_node=False,
                                             default=False)


def _cell_coords(origin, cell_size, p):
    return jnp.floor((p - origin) / cell_size).astype(jnp.int32)


def _bucket(cell, hash_size):
    h = (cell[..., 0] * P1) ^ (cell[..., 1] * P2) ^ (cell[..., 2] * P3)
    return (h & (hash_size - 1)).astype(jnp.int32)


def build(positions, valid, origin, cell_size, hash_size=1 << 18):
    """positions [P,3]; invalid photons land in an overflow bucket."""
    cell = _cell_coords(origin, cell_size, positions)
    b = _bucket(cell, hash_size)
    b = jnp.where(valid, b, hash_size)  # overflow bucket (never queried)
    order = jnp.argsort(b)
    b_sorted = b[order]
    bucket_start = jnp.searchsorted(
        b_sorted, jnp.arange(hash_size + 1, dtype=b_sorted.dtype)
    ).astype(jnp.int32)
    return HashGrid(origin=origin, cell_size=jnp.asarray(cell_size),
                    sorted_idx=order.astype(jnp.int32), cell_key=b_sorted,
                    cell_of=cell, bucket_start=bucket_start,
                    hash_size=hash_size)


def build_sorted(positions, valid, origin, cell_size, payload,
                 hash_size=1 << 18, max_rows=0):
    """build() + payload permutation into grid order.

    TPU gathers with random indices are the hot cost of the dense query
    path (one slow HBM gather PER FIELD per candidate tile). Permuting
    every queried field into bucket order ONCE (a [P]-sized gather per
    field) makes candidate slots index payload rows DIRECTLY
    (identity_order grids skip the sorted_idx indirection in
    gather_dense) and photons of one cell occupy CONSECUTIVE rows, so
    the per-tile gathers hit contiguous memory.

    max_rows > 0 additionally slices the sorted tables to that many
    rows: invalid photons sort to the END (overflow bucket), so this
    only drops real photons when the valid count exceeds the budget
    (caller's responsibility to size it; bucket_start is clamped so
    truncated cells stay consistent).

    Returns (grid, payload_sorted) — payload is a pytree of [P, ...]
    arrays; query results index into the SORTED order.
    """
    g = build(positions, valid, origin, cell_size, hash_size)
    payload_sorted = jax.tree_util.tree_map(lambda a: a[g.sorted_idx],
                                            payload)
    cell_sorted = g.cell_of[g.sorted_idx]
    sorted_idx = g.sorted_idx
    bucket_start = g.bucket_start
    if max_rows and max_rows < positions.shape[0]:
        payload_sorted = jax.tree_util.tree_map(
            lambda a: a[:max_rows], payload_sorted)
        cell_sorted = cell_sorted[:max_rows]
        sorted_idx = sorted_idx[:max_rows]
        bucket_start = jnp.minimum(bucket_start, max_rows)
    return g.replace(cell_of=cell_sorted, sorted_idx=sorted_idx,
                     bucket_start=bucket_start,
                     identity_order=True), payload_sorted


def gather(grid: HashGrid, x, fold, init, max_per_cell=32,
           compensate_overflow=True):
    """Fold over all photons whose cell is within the 27-neighborhood of x.

    x: [Q,3] query points. fold(carry, ph_idx [Q] int32, valid [Q] bool,
    scale [Q] f32) -> carry. Photons are visited at most once per query
    (exact cell-coord match filters hash collisions). Caller applies the
    actual distance test inside `fold` and multiplies contributions by
    `scale`.

    Overflow compensation: when a cell holds more than `max_per_cell`
    photons, only the first K (a uniformly random subset — photon order
    within a cell is independent of position) are visited, each scaled by
    count/K. This keeps the estimator unbiased where a hard cap would
    silently drop energy; the count is per hash *bucket*, exact up to
    rare hash collisions at sane load factors.
    """
    assert not grid.identity_order, \
        "fold gather expects an unsorted-payload grid (use build())"
    qcell = _cell_coords(grid.origin, grid.cell_size, x)  # [Q,3]
    carry = init
    for off in NEIGHBOR_OFFSETS:
        ncell = qcell + jnp.asarray(off, jnp.int32)
        nb = _bucket(ncell, grid.hash_size)
        start = grid.bucket_start[nb]
        end = grid.bucket_start[nb + 1]
        full = end - start
        count = jnp.minimum(full, max_per_cell)
        if compensate_overflow:
            scale = jnp.maximum(full, 1).astype(jnp.float32) \
                / jnp.maximum(count, 1).astype(jnp.float32)
            scale = jnp.where(full > max_per_cell, scale, 1.0)
        else:
            scale = jnp.ones(x.shape[:-1], jnp.float32)

        def body(k, carry):
            slot = jnp.clip(start + k, 0, grid.sorted_idx.shape[0] - 1)
            idx = grid.sorted_idx[slot]
            ok = k < count
            # exact-cell check kills hash collisions and double visits
            ok = ok & jnp.all(grid.cell_of[idx] == ncell, axis=-1)
            return fold(carry, idx, ok, scale)

        carry = lax.fori_loop(0, max_per_cell, body, carry)
    return carry


OFFSETS8 = [(ox, oy, oz) for ox in (0, 1) for oy in (0, 1)
            for oz in (0, 1)]


def gather_dense(grid: HashGrid, x, eval_fn, max_per_cell=32,
                 q_tile=256, compensate_overflow=True, stencil=27):
    """Vectorized range-query: materialize all S*K candidates per query
    and evaluate them in one shot (S = stencil size).

    The fold-based `gather` issues 27*K small dependent gathers — fine on
    CPU, serial death on TPU. This variant builds the candidate index
    tensor [Qt, S*K] with ONE gather, so downstream per-field gathers
    are large and parallel; queries are processed in chunks of `q_tile`
    via lax.map to bound memory.

    stencil=27: cell_size >= r, visit the 27-neighborhood.
    stencil=8:  cell_size >= 2r, visit the 2x2x2 block anchored at
                floor(g - 0.5) — covers every point within r of x with
                3.4x fewer candidates (the preferred TPU configuration).

    eval_fn(q_idx [Qt], idx [Qt,M], ok [Qt,M], scale [Qt,M]) -> pytree of
    arrays with leading dim Qt, already reduced over M. q_idx are indices
    into the original query array (use them to slice captured per-query
    data). Returns the pytree with leading dim Q.
    """
    Q = x.shape[0]
    K = max_per_cell
    S = stencil
    M = S * K
    n_chunks = -(-Q // q_tile)
    pad = n_chunks * q_tile - Q
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    q_ids = jnp.arange(n_chunks * q_tile) % Q  # padded lanes wrap (masked)
    valid_q = jnp.arange(n_chunks * q_tile) < Q

    offs = jnp.asarray(
        NEIGHBOR_OFFSETS if S == 27 else OFFSETS8, jnp.int32)
    P = grid.sorted_idx.shape[0]

    def chunk(args):
        xq, qi, vq = args
        if S == 8:
            g = (xq - grid.origin) / grid.cell_size
            qcell = jnp.floor(g - 0.5).astype(jnp.int32)
        else:
            qcell = _cell_coords(grid.origin, grid.cell_size, xq)
        ncell = qcell[:, None, :] + offs[None, :, :]           # [Qt,S,3]
        nb = _bucket(ncell, grid.hash_size)                    # [Qt,27]
        start = grid.bucket_start[nb]
        end = grid.bucket_start[nb + 1]
        full = end - start
        count = jnp.minimum(full, K)
        if compensate_overflow:
            scale27 = jnp.where(
                full > K,
                full.astype(jnp.float32)
                / jnp.maximum(count, 1).astype(jnp.float32), 1.0)
        else:
            scale27 = jnp.ones_like(full, jnp.float32)
        ks = jnp.arange(K, dtype=jnp.int32)
        slots = start[:, :, None] + ks[None, None, :]          # [Qt,27,K]
        ok = ks[None, None, :] < count[:, :, None]
        slots = jnp.clip(slots, 0, P - 1)
        if grid.identity_order:
            idx = slots        # payload pre-permuted into grid order
        else:
            idx = grid.sorted_idx[slots]
        ok = ok & jnp.all(grid.cell_of[idx] == ncell[:, :, None, :],
                          axis=-1)
        ok = ok & vq[:, None, None]
        scale = jnp.broadcast_to(scale27[:, :, None], ok.shape)
        return eval_fn(qi, idx.reshape(-1, M), ok.reshape(-1, M),
                       scale.reshape(-1, M))

    out = jax.lax.map(chunk, (xp.reshape(n_chunks, q_tile, 3),
                              q_ids.reshape(n_chunks, q_tile),
                              valid_q.reshape(n_chunks, q_tile)))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:Q], out)


def cell_histogram(grid: HashGrid):
    """Occupancy diagnostics: (max, mean nonzero) photons per bucket."""
    counts = grid.bucket_start[1:] - grid.bucket_start[:-1]
    nz = counts > 0
    return (int(jnp.max(counts)),
            float(jnp.sum(counts) / jnp.maximum(jnp.sum(nz), 1)))
