"""Fused Pallas window-sweep gather — the round-5 G-VPM hot-loop kernel.

Why a kernel (docs/PERF.md round-4 roofline): the ranked-cull driver is
fetch-bound — (B + K) random row fetches per query tile put its ceiling
at 4-6M visits/s, and the B-budget strided subsample drops ~45% of real
ball hits behind a variance-heavy compensation scale. The windowed XLA
driver (r3) streamed rows contiguously but paid ~0.7 ns/element for
EVERY small op on the [Qt, W] pair planes — XLA:CPU-style op-at-a-time
dispatch, ~60x below VPU rate.

This kernel keeps the r3 *memory* plan (queries sorted by 27-stencil
anchor; each query tile streams contiguous windows of the cell-major
row table — one DMA per run, no random fetches) and fixes the *compute*
plan: the whole 5-way shift evaluation runs inside ONE Mosaic kernel on
[Qt, W] planes, so the ~600 flops/pair execute at VPU rate with zero
per-op dispatch, no top_k / searchsorted / scatter, and NO candidate
subsampling (every stencil row in the window is evaluated exactly;
window clipping keeps the r3 covered-fraction compensation and is
counted). Reference analog of the loop being replaced:
VolumeGradientPositionQuery over PointKDTree balls,
shift_volume_photon.cpp:489-655 + gvpm_accel.h:110-114.

Layout: the packed photon table enters FEATURE-MAJOR [F=128, P] so a
window is table[:, lo:lo+W] — 128 contiguous W-row stripes per DMA —
and every row field is a [1, W] lane-dim plane broadcast against
[Qt, 1] query planes.

Contract:

  plan   = plan_windows(grid, x, q_valid, q_tile, window)
  out    = fused_gather(plan, table_T, qrows, params, eval_fn, n_add,
                        window, me=..., interpret=...)

eval_fn(qv: QView, wv: WinView, ok [Qt,W], scale [Qt,W], params)
  -> (add [Qt, n_add] f32 — summed over runs,
      me_key [Qt, 1] f32 or None — min-combined over runs (absolute row
      of the first ME-eligible pair, BIG_F when none))
Both views expose .f3/.f1/.i1/.b1 slot accessors like
gradient_gather.RowView.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellgrid import CellGrid, anchor_ids27

BIG_F = 1e30


# 27-stencil: nine (dy, dz) runs of three x-consecutive cells each
RUN_OFFS_27 = [(dy, dz) for dz in range(3) for dy in range(3)]
N_RUNS = 9


class QView:
    """Named [Qt, 1] plane access into a query-row block [Qt, FQ]."""

    def __init__(self, ref, slots):
        self.ref = ref
        self.slots = slots

    def f3(self, name):
        k = self.slots[name]
        return (self.ref[:, k:k + 1], self.ref[:, k + 1:k + 2],
                self.ref[:, k + 2:k + 3])

    def f1(self, name):
        k = self.slots[name]
        return self.ref[:, k:k + 1]

    def i1(self, name):
        return self.f1(name).astype(jnp.int32)

    def b1(self, name):
        return self.f1(name) > 0.5


class WinView:
    """Named [1, W] plane access into a feature-major window [F, W].

    Slot layout matches gradient_gather.SLOT so _shift_caches /
    _reconnect_planar run unchanged inside the kernel."""

    def __init__(self, rows, slots):
        self.rows = rows
        self.slots = slots

    def f3(self, name):
        k = self.slots[name]
        return (self.rows[k:k + 1, :], self.rows[k + 1:k + 2, :],
                self.rows[k + 2:k + 3, :])

    def f1(self, name):
        k = self.slots[name]
        return self.rows[k:k + 1, :]

    def i1(self, name):
        return self.f1(name).astype(jnp.int32)

    def b1(self, name):
        return self.f1(name) > 0.5


def plan_windows(grid: CellGrid, x, q_valid, q_tile, window):
    """XLA-side query plan: sort by 27-stencil anchor, derive per-query
    run ranges and per-tile aligned window starts.

    Returns dict(order [Qp], r0/r1 [n_tiles, Qt, R], lo [n_tiles, R],
    vq [n_tiles, Qt], n_tiles, Q).
    """
    Q = x.shape[0]
    Nx, Ny, Nz = grid.dims
    n_cells = Nx * Ny * Nz
    P = grid.sorted_idx.shape[0]
    W = min(window, P)
    if P >= 128:
        W = max(128, (W // 128) * 128)   # aligned DMA slice size
    aid = anchor_ids27(grid, x)
    if q_valid is not None:
        aid = jnp.where(q_valid, aid, n_cells)
    order = jnp.argsort(aid).astype(jnp.int32)
    n_tiles = -(-Q // q_tile)
    pad = n_tiles * q_tile - Q
    qi = jnp.pad(order, (0, pad))
    vq = jnp.arange(n_tiles * q_tile) < Q
    if q_valid is not None:
        vq = vq & jnp.pad(q_valid[order], (0, pad),
                          constant_values=False)
    a = jnp.pad(aid[order], (0, pad), constant_values=n_cells)
    run_off = jnp.asarray([(dz * Ny + dy) * Nx for dy, dz in RUN_OFFS_27],
                          jnp.int32)
    s = a[:, None] + run_off[None, :]                       # [Qp, R]
    s = jnp.clip(s, 0, n_cells - 3)
    r0 = grid.bucket_start[s]
    r1 = grid.bucket_start[s + 3]
    r0 = jnp.where(vq[:, None], r0, 0)
    r1 = jnp.where(vq[:, None], jnp.maximum(r1, r0), 0)
    r0t = r0.reshape(n_tiles, q_tile, N_RUNS)
    r1t = r1.reshape(n_tiles, q_tile, N_RUNS)
    lo = jnp.min(jnp.where(vq.reshape(n_tiles, q_tile)[..., None],
                           r0t, P), axis=1)                 # [T, R]
    lo = (lo // 128) * 128                                  # aligned DMA
    lo = jnp.clip(lo, 0, max(P - W, 0)).astype(jnp.int32)
    # FLAT [n_tiles*R]: a 2D scalar-prefetch operand pads its last dim
    # to 128 lanes in SMEM (2 MB at 4096 tiles — over the 1 MB budget)
    return dict(order=order, qi=qi, vq=vq.reshape(n_tiles, q_tile),
                r0=r0t.astype(jnp.int32), r1=r1t.astype(jnp.int32),
                lo=lo.reshape(-1), n_tiles=n_tiles, Q=Q, W=W)


def _kernel(lo_ref, rr_ref, vq_ref, q_ref, par_ref, tbl_ref, out_ref,
            win, sem, *, eval_fn, q_slots, row_slots, n_add, W, me,
            interpret):
    Qt = q_ref.shape[0]
    ti = pl.program_id(0)
    qv = QView(q_ref, q_slots)
    acc = jnp.zeros((Qt, n_add), jnp.float32)
    me_key = jnp.full((Qt, 1), BIG_F, jnp.float32)
    me_scale = jnp.zeros((Qt, 1), jnp.float32)
    vq = vq_ref[:, 0:1] > 0

    def dma(slot, r):
        # plan_windows 128-aligns window starts; multiple_of carries
        # the proof to Mosaic's memref slicer
        lo_a = pl.multiple_of(lo_ref[ti * N_RUNS + r], 128)
        return pltpu.make_async_copy(
            tbl_ref.at[:, pl.ds(lo_a, W)],
            win.at[slot], sem.at[slot])

    if not interpret:
        dma(0, 0).start()
    for r in range(N_RUNS):
        lo = lo_ref[ti * N_RUNS + r]
        if interpret:
            rows = tbl_ref[:, pl.ds(lo, W)]
        else:
            if r + 1 < N_RUNS:
                dma((r + 1) % 2, r + 1).start()
            dma(r % 2, r).wait()
            rows = win[r % 2]
        wv = WinView(rows, row_slots)
        r0 = rr_ref[:, r:r + 1]
        r1 = rr_ref[:, N_RUNS + r:N_RUNS + r + 1]
        absrow = lo + lax.broadcasted_iota(jnp.int32, (1, W), 1)
        ok = (absrow >= r0) & (absrow < r1) & vq
        total = jnp.maximum(r1 - r0, 0)
        cov = jnp.maximum(jnp.minimum(r1, lo + W) - jnp.maximum(r0, lo),
                          0)
        scale = jnp.where((cov > 0) & (cov < total),
                          total.astype(jnp.float32)
                          / jnp.maximum(cov, 1).astype(jnp.float32), 1.0)
        scale = jnp.broadcast_to(scale, (Qt, W))
        dropped = jnp.where(vq, (total - cov).astype(jnp.float32), 0.0)
        add, mk = eval_fn(qv, wv, ok, scale, par_ref, absrow)
        acc = acc + add
        # window-clipped rows per query (compensated), in the last col
        # (kept as its own accumulator: Mosaic has no scatter-add)
        drop_acc = dropped if r == 0 else drop_acc + dropped
        if me and mk is not None:
            key_r, scale_r = mk
            better = key_r < me_key
            me_key = jnp.where(better, key_r, me_key)
            me_scale = jnp.where(better, scale_r, me_scale)
    out_ref[:, :n_add] = acc
    out_ref[:, n_add - 1:n_add] = drop_acc
    if me:
        out_ref[:, n_add:n_add + 1] = me_key
        out_ref[:, n_add + 1:n_add + 2] = me_scale


def fused_gather(planv, table_T, qrows, params, eval_fn, n_add,
                 q_slots, row_slots, me=False, interpret=False):
    """Run the fused kernel over the planned tiles.

    planv: plan_windows output; table_T [F, P] feature-major row table;
    qrows [Qp, FQ] per-query fields IN SORTED ORDER (caller indexes by
    plan order); params [1, 8] f32 SMEM scalars. Returns [n_tiles*Qt,
    n_add(+1)] raw tile output (sorted order; caller unsort + split).
    """
    n_tiles = planv["n_tiles"]
    Qt = planv["vq"].shape[1]
    W = planv["W"]
    F = table_T.shape[0]
    n_out = n_add + (2 if me else 0)
    rr = jnp.concatenate([planv["r0"], planv["r1"]],
                         axis=-1).reshape(n_tiles * Qt, 2 * N_RUNS)
    vq2 = planv["vq"].astype(jnp.int32).reshape(n_tiles * Qt, 1)
    kern = functools.partial(
        _kernel, eval_fn=eval_fn, q_slots=q_slots, row_slots=row_slots,
        n_add=n_add, W=W, me=me, interpret=interpret)
    # `lo` rides the scalar-prefetch slot (whole array in SMEM, indexed
    # by program_id) — a (1, R) SMEM block would violate Mosaic's
    # (8, 128)-divisible block rule
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Qt, 2 * N_RUNS), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qt, 1), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qt, qrows.shape[1]), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i, lo: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Qt, n_out), lambda i, lo: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, F, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * Qt, n_out),
                                       jnp.float32),
        interpret=interpret,
    )(planv["lo"], rr, vq2, qrows, params, table_T)
    return out


def unsort(planv, flat):
    """[n_tiles*Qt, k] kernel output -> original query order [Q, k]."""
    Q = planv["Q"]
    out = jnp.zeros((Q,) + flat.shape[1:], flat.dtype)
    return out.at[planv["order"]].set(flat[:Q])
