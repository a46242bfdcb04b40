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
    cell_pack: jnp.ndarray    # [P] int32 10-bit-packed cell coords in
                              #     SORTED order (collision fingerprint)
    bucket_start: jnp.ndarray  # [H+1]
    hash_size: int = flax.struct.field(pytree_node=False, default=1 << 18)
    identity_order: bool = flax.struct.field(pytree_node=False,
                                             default=False)


def _pack_cell(cell):
    """Cell coords -> one i32 fingerprint (10 bits/axis). Two cells get
    the same fingerprint only when >= 1024 cells apart per axis AND
    hash-colliding — never within any stencil."""
    return ((cell[..., 0] & 1023)
            | ((cell[..., 1] & 1023) << 10)
            | ((cell[..., 2] & 1023) << 20)).astype(jnp.int32)


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
                    cell_of=cell, cell_pack=_pack_cell(cell[order]),
                    bucket_start=bucket_start, hash_size=hash_size)


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
    cell_pack = g.cell_pack
    sorted_idx = g.sorted_idx
    bucket_start = g.bucket_start
    if max_rows and max_rows < positions.shape[0]:
        # slice the permutation FIRST: the payload gather then touches
        # only max_rows rows (gathers pay per index)
        cell_pack = cell_pack[:max_rows]
        sorted_idx = sorted_idx[:max_rows]
        bucket_start = jnp.minimum(bucket_start, max_rows)
    payload_sorted = jax.tree_util.tree_map(lambda a: a[sorted_idx],
                                            payload)
    cell_sorted = g.cell_of[sorted_idx]
    return g.replace(cell_of=cell_sorted, cell_pack=cell_pack,
                     sorted_idx=sorted_idx, bucket_start=bucket_start,
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


def stencil_ranges(grid: HashGrid, xq, stencil, dedup_buckets=False):
    """Per-query (start, count) row ranges of the stencil cells.

    Returns (start [Qt,S], count [Qt,S], pack [Qt,S]) into the grid's
    SORTED row order; pack is the _pack_cell fingerprint each slot
    expects. Hash collisions (two cells sharing a bucket) are resolved
    one of two ways:

    - dedup_buckets=True ("ball" mode): a bucket shared by several
      stencil cells keeps only its first slot, so every bucket — and
      thus every photon — is enumerated at most once. Far-cell
      collision photons still appear as candidates; callers whose
      membership test is a ball around `xq` reject them for free
      (every true neighbor lies in a stencil cell, every collision
      photon is >= one cell away). No per-row fingerprint gather.

    - dedup_buckets=False ("exact" mode): all slots enumerate their
      full buckets; the caller must compare `pack` against each
      candidate row's cell_pack (one extra 4-byte gather per lane).
      Required when the membership test is NOT a ball around xq (the
      BRE cylinder-step test), where a collision photon could pass.
    """
    S = stencil
    if S == 8:
        g = (xq - grid.origin) / grid.cell_size
        qcell = jnp.floor(g - 0.5).astype(jnp.int32)
    else:
        qcell = _cell_coords(grid.origin, grid.cell_size, xq)
    offs = jnp.asarray(
        NEIGHBOR_OFFSETS if S == 27 else OFFSETS8, jnp.int32)
    ncell = qcell[:, None, :] + offs[None, :, :]               # [Qt,S,3]
    nb = _bucket(ncell, grid.hash_size)                        # [Qt,S]
    start = grid.bucket_start[nb]
    count = grid.bucket_start[nb + 1] - start
    if dedup_buckets:
        dup = jnp.zeros(nb.shape, bool)
        for s in range(1, S):
            dup = dup.at[:, s].set(jnp.any(nb[:, :s] == nb[:, s:s + 1],
                                           axis=1))
        count = jnp.where(dup, 0, count)
    return start, count, _pack_cell(ncell)


def gather_dense(grid: HashGrid, x, eval_fn, max_per_cell=32,
                 q_tile=256, compensate_overflow=True, stencil=27,
                 budget=None, exact_cells=False):
    """Vectorized range-query with PREFIX-COMPACTED candidates.

    The round-2 version materialized all S*K candidate SLOTS per query
    ([Qt, stencil*max_per_cell] planes); with mean cell occupancy ~5-8
    photons that left ~85-95% of slots empty, and every slot still paid
    a full per-field row gather downstream — measured 0.6% candidate
    occupancy and 10s+ of the 14s bench pass. This version enumerates
    only REAL stored rows: the stencil cells' (start,count) ranges are
    prefix-summed per query and lane k in [0,B) maps through a rank ->
    (cell, offset) decode, so every candidate lane is a photon that
    exists in a stencil cell. B = `budget` (default 2*max_per_cell).

    When a query's stencil holds more than B rows, a strided subsample
    rank = floor(k*T/B) is visited with compensation scale T/B —
    photon order within a bucket is emission order (independent of
    position), so the estimate stays unbiased in expectation, matching
    the per-cell overflow compensation of `gather`.

    stencil=27: cell_size >= r; stencil=8: cell_size >= 2r, 2x2x2 block
    anchored at floor(g - 0.5) (the preferred TPU configuration).

    eval_fn(q_idx [Qt], idx [Qt,B], ok [Qt,B], scale [Qt,B]) -> pytree
    of arrays with leading dim Qt, already reduced over B. q_idx are
    indices into the original query array. Returns the pytree with
    leading dim Q. Candidates are rows in the grid's SORTED order when
    identity_order (build_sorted), else original photon indices.

    exact_cells=False assumes the caller's membership test is a BALL of
    radius <= cell coverage around x (collision photons auto-reject,
    stencil_ranges dedup_buckets mode — saves one gather per lane);
    exact_cells=True additionally fingerprint-checks every candidate's
    cell (required for non-ball tests, e.g. BRE's cylinder step).
    """
    Q = x.shape[0]
    S = stencil
    B = budget if budget is not None else 2 * max_per_cell
    n_chunks = -(-Q // q_tile)
    pad = n_chunks * q_tile - Q
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    q_ids = jnp.arange(n_chunks * q_tile) % Q  # padded lanes wrap (masked)
    valid_q = jnp.arange(n_chunks * q_tile) < Q
    P = grid.sorted_idx.shape[0]

    def chunk(args):
        xq, qi, vq = args
        start, count, pack = stencil_ranges(
            grid, xq, S, dedup_buckets=not exact_cells)        # [Qt,S]
        off = jnp.cumsum(count, axis=1)                        # inclusive
        T = off[:, -1]                                         # [Qt]
        ks = jnp.arange(B, dtype=jnp.int32)[None, :]           # [1,B]
        over = (T > B)[:, None]
        if compensate_overflow:
            rank = jnp.where(over, (ks * T[:, None]) // B, ks)
            scale = jnp.broadcast_to(
                jnp.where(over, T[:, None].astype(jnp.float32) / B, 1.0),
                (xq.shape[0], B))
            ok = (ks < jnp.minimum(T, B)[:, None]) & vq[:, None]
        else:
            rank = ks
            scale = jnp.ones((xq.shape[0], B), jnp.float32)
            ok = (ks < T[:, None]) & vq[:, None]
        # rank -> (cell j, offset): j = #cells whose inclusive cumsum
        # <= rank; row = start[j] + rank - exclusive_cumsum[j]
        j = jnp.zeros(rank.shape, jnp.int32)
        for s in range(S - 1):
            j = j + (rank >= off[:, s][:, None])
        row = (jnp.take_along_axis(start, j, axis=1) + rank
               - jnp.take_along_axis(off - count, j, axis=1))
        row = jnp.clip(row, 0, P - 1)
        if exact_cells:
            # far-cell hash collisions: candidate must really live in
            # the stencil cell its slot expects (one 4B gather/lane)
            ok = ok & (grid.cell_pack[row]
                       == jnp.take_along_axis(pack, j, axis=1))
        if grid.identity_order:
            idx = row          # payload pre-permuted into grid order
        else:
            idx = grid.sorted_idx[row]
        return eval_fn(qi, idx, ok, scale)

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
