"""Hybrid BSR2 + row-stream SpMM plan (v5) — the r4 performance
generation.

The r3 bench exposed two structural costs in the v3 hybrid
(scripts/ablate_v3.py, on v5e):

* the BSR half pads every (superblock, block-col) cell's block list to
  a multiple of the DMA group ``g`` — at density-representative
  occupancy that nearly DOUBLES the densified bytes (23232 padded vs
  11975 real blocks at threshold 96), and the (superblock, block-col)
  grid itself burns a step per mostly-empty cell;
* the residual rides the v2 edge kernel whose (rb, ct) cell partition
  collapses to fill 0.13 in the sparse leftovers.

v5 removes the cell structure from BOTH halves by making x fully
VMEM-resident (stripes when it doesn't fit):

* **BSR2**: dense 128×128 bf16 blocks stream globally in (superblock,
  block-col, block-row) order — grid is (K-tile, superblock) only.
  Each block's x tile is a dynamic lane-offset slice of the resident x
  selected by a scalar-prefetched ``bc`` array; per-cell padding is
  gone (only the global tail pads to ``g``).
* **Residual**: the v4 static-S row-stream plan
  (:mod:`isplib_tpu.sparse.tiling_v4`).

Both halves produce (rows, K) partials that add.  Column **stripes**
bound the resident x: each stripe owns the blocks/groups whose columns
fall in its range and is a separate kernel launch; per-stripe partials
add.  Reference lineage: same FusedMM role as v3
(``/root/reference/csrc/fusedMM.h:77-99``) with the block/edge split
now byte-exact rather than cell-padded.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tiling_v4 import StreamPlanV4, build_plan_v4_arrays

__all__ = ["BSR2Plan", "HybridPlanV5", "build_plan_v5_arrays"]

_BS = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSR2Plan:
    """Globally-streamed dense 128×128 blocks over a VMEM-resident x.

    ``blocks``: (nb // g, g·128, 128) bf16, member-major (r5 layout):
    group b member m holds
    ``blocks[b, m·128 + c_local, r_local] = A[row, col]`` — the whole
    group is ONE (g·128, 128) contraction operand for the fused
    (kt, g·128)×(g·128, 128) MXU pass.
    ``rb_locals``: (nb,) int32 — row-block index within the superblock;
    CONSTANT within each group (blocks are sorted by (superblock,
    block-row, block-col) and each block-row run is padded to a g
    multiple), so the kernel accumulates once per group.
    ``bcs``: (nb,) int32 — block-col (stripe-local) of each block: the
    kernel slices the resident x at ``bcs[b]·128`` per member.
    ``super_starts``: (n_super + 1,) int32 — *group* range per
    superblock.  ``rank``: deferred plans only — (n_br·n_bc_global,)
    int32 block → slot map consumed by the on-device scatter (−1 = not
    densified).
    """

    blocks: Optional[jax.Array]
    rb_locals: jax.Array
    bcs: jax.Array
    super_starts: jax.Array
    nb: int = dataclasses.field(metadata=dict(static=True))  # incl. padding
    nrb_s: int = dataclasses.field(metadata=dict(static=True))
    n_super: int = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    kt: int = dataclasses.field(default=32, metadata=dict(static=True))
    g: int = dataclasses.field(default=8, metadata=dict(static=True))
    col_offset: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    rank: Optional[jax.Array] = None

    @property
    def n_bc(self) -> int:
        return _cdiv(self.num_cols, _BS)

    @property
    def r_padded(self) -> int:
        return self.n_super * self.nrb_s * _BS

    @property
    def c_padded(self) -> int:
        return self.n_bc * _BS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridPlanV5:
    """Per-stripe BSR2 + v4 stream halves; all partials add.

    ``bsr2s`` / ``streams``: tuples with one entry per column stripe
    (either may be empty or hold ``None`` for a stripe with no such
    edges).  ``stripe_bounds``: static (start, end) col ranges.
    """

    bsr2s: Tuple[Optional[BSR2Plan], ...]
    streams: Tuple[Optional[StreamPlanV4], ...]
    stripe_bounds: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    dense_edges: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    sparse_edges: int = dataclasses.field(default=0,
                                          metadata=dict(static=True))

    @property
    def nc(self) -> int:  # autotuner/bench diagnostic parity
        return (sum(p.ng for p in self.streams if p is not None)
                + sum(p.nb for p in self.bsr2s if p is not None))

    @property
    def fill(self) -> float:
        ngs = [p for p in self.streams if p is not None]
        if not ngs:
            return 1.0
        tot = sum(p.ng for p in ngs)
        return sum(p.fill * p.ng for p in ngs) / max(tot, 1)

    @property
    def fill_fraction(self) -> float:
        return self.fill


def build_plan_v5_arrays(
    row: np.ndarray, col: np.ndarray, val: np.ndarray,
    num_rows: int, num_cols: int,
    rb: int = 512, ct: int = 0, eb: int = 0,  # ct/eb ignored (API parity)
    k: int = 32,
    dense_threshold: int = 64,
    S: int = 8,
    g: int = 8,
    gd: int = 8,
    max_block_bytes: int = 2 << 30,
    x_vmem_bytes: int = 48 << 20,
    vmem_out_bytes: int = 4 << 20,
    defer_edges: bool = False,
) -> HybridPlanV5:
    """Build the v5 hybrid plan from host COO arrays.

    ``dense_threshold``: min edges for a 128×128 block to densify.
    The byte-exact crossover on v5e is ~55 edges/block (32 KiB block at
    819 GB/s ≈ 40 ns vs ~0.7 ns/edge streaming).
    ``S``: residual gather window width in tiles (v4 static span).
    ``x_vmem_bytes``: resident-x budget — column stripes are cut so
    ``kt · stripe_cols · 4`` fits.
    ``defer_edges``: defer BOTH halves' device payloads (blocks via the
    rank scatter, stream edges via edge_of_slot packing).
    """
    del ct, eb
    nnz = int(row.shape[0])
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    n_br = _cdiv(num_rows, _BS)
    n_bc = _cdiv(num_cols, _BS)
    k_pad = ((max(k, 1) + 31) // 32) * 32
    kt = min(k_pad, 256)
    nrb_s = max(1, min(n_br, vmem_out_bytes // (kt * _BS * 4)))
    n_super = _cdiv(n_br, nrb_s)

    # ---- dense/sparse split (global 128x128 block counts) -------------
    dense_edges = 0
    bid = None
    counts = None
    if nnz:
        from .. import native
        if (native.available() and native.has_bsr()
                and bool(np.all(row[1:] >= row[:-1]))):
            counts = native.bsr_count(row, col, _BS, n_br, n_bc)
        else:
            bid = (row // _BS) * n_bc + (col // _BS)
            counts = np.bincount(bid, minlength=n_br * n_bc)
        thr = max(dense_threshold, 1)
        nb_cap = max(1, max_block_bytes // (_BS * _BS * 2))
        if int(np.count_nonzero(counts >= thr)) > nb_cap:
            # precise cap: the smallest threshold whose block count fits
            # the byte budget (the r4 doubling loop overshot — e.g.
            # 64 → 256 where ~150 fits, leaving dense coverage on the
            # table at full scale)
            cs = np.sort(counts[counts >= thr])[::-1]
            thr = int(cs[nb_cap]) + 1
        if bid is None:
            bid = (row // _BS) * n_bc + (col // _BS)
        dense_b = counts >= thr
        is_dense = dense_b[bid]
        dense_edges = int(is_dense.sum())

    # ---- column stripes -----------------------------------------------
    # Two budgets bound a stripe: the resident x (kt · cols · 4 B of
    # VMEM) and the stream plan's per-group scalar-prefetch array
    # (group_base lives in 1 MB of SMEM — a single full-Reddit stripe
    # produced a 2.65 MB prefetch operand and failed to compile).
    # Stripes are cut at BALANCED stream-edge quantiles (greedy cuts
    # skewed widths on power-law graphs and collapsed group fill), then
    # any over-wide stripe is split for the x budget.
    max_stripe_cols = max(S * _BS, (x_vmem_bytes // (kt * 4))
                          // (S * _BS) * (S * _BS))
    max_stream_edges = 14_000_000  # ~160k groups at typical fill ≈ 640KB
    stripe_bounds = []
    if nnz:
        win = S * _BS
        nwin = _cdiv(num_cols, win)
        cum = np.cumsum(np.bincount(col[~is_dense] // win,
                                    minlength=nwin))
        stream_total = int(cum[-1]) if len(cum) else 0
        n_e = max(1, _cdiv(stream_total, max_stream_edges))
        cuts = [0]
        for i in range(1, n_e):
            w = int(np.searchsorted(cum, i * stream_total / n_e)) + 1
            if w * win > cuts[-1] and w < nwin:
                cuts.append(w * win)
        cuts.append(num_cols)
        for c0, c1 in zip(cuts[:-1], cuts[1:]):
            while c1 - c0 > max_stripe_cols:  # x-budget sub-split
                stripe_bounds.append((c0, c0 + max_stripe_cols))
                c0 += max_stripe_cols
            stripe_bounds.append((c0, c1))
    else:
        stripe_bounds.append((0, num_cols))

    bsr2s: list = []
    streams: list = []
    for (c0, c1) in stripe_bounds:
        if nnz:
            in_stripe = (col >= c0) & (col < c1)
            d_mask = in_stripe & is_dense
            r_mask = in_stripe & ~is_dense
        else:
            d_mask = r_mask = np.zeros(0, bool)

        # ---- BSR2 half -------------------------------------------------
        # Blocks are row-block-run-major: sorted by (superblock,
        # block-row, block-col) and each block-row's list padded to a
        # multiple of g with inert zero blocks CARRYING THE RUN'S rbl —
        # every DMA group then shares one output row-block, so the
        # kernel fuses its g member matmuls into ONE deep
        # (kt, g·128)×(g·128, 128) MXU pass with a single accumulate
        # (r5: the per-member dynamic-offset RMW was the measured BSR2
        # bottleneck — 1.8x above the block-stream HBM time).
        bsr = None
        if nnz and d_mask.any():
            s_bids = np.unique(bid[d_mask])
            br = s_bids // n_bc
            bc = s_bids % n_bc
            order = np.lexsort((bc, br))  # br ascending => sid ascending
            s_bids, br, bc = s_bids[order], br[order], bc[order]
            sid = br // nrb_s
            # pad each block-row RUN to a multiple of g
            ubr, run_of = np.unique(br, return_inverse=True)
            cnt_u = np.bincount(run_of)
            cnt_ug = -(-cnt_u // g) * g
            run_start = np.zeros(len(ubr) + 1, np.int64)
            run_start[1:] = np.cumsum(cnt_u)
            run_start_g = np.zeros(len(ubr) + 1, np.int64)
            run_start_g[1:] = np.cumsum(cnt_ug)
            pos = np.arange(len(s_bids)) - run_start[run_of]
            new_pos = run_start_g[run_of] + pos
            nb = int(run_start_g[-1])

            rank = np.full(n_br * n_bc, -1, np.int32)
            rank[s_bids] = new_pos.astype(np.int32)
            # pads inherit the run's rbl (repeat covers them)
            rb_locals = np.repeat(
                (ubr - (ubr // nrb_s) * nrb_s).astype(np.int32), cnt_ug)
            bcs = np.zeros(nb, np.int32)
            bcs[new_pos] = (bc - c0 // _BS).astype(np.int32)
            sid_u = ubr // nrb_s
            g_per_super = np.bincount(
                sid_u, weights=cnt_ug, minlength=n_super).astype(np.int64)
            super_starts = np.zeros(n_super + 1, np.int64)
            np.cumsum(g_per_super // g, out=super_starts[1:])
            super_starts = super_starts.astype(np.int32)

            blocks = None
            if not defer_edges:
                blocks = _densify_host(
                    row[d_mask], col[d_mask] - c0, val[d_mask],
                    rank_local=_stripe_rank(rank, n_br, n_bc, c0, c1),
                    n_bc_local=_cdiv(c1 - c0, _BS), nb=nb, g=g)
            bsr = BSR2Plan(
                blocks=blocks, rb_locals=rb_locals, bcs=bcs,
                super_starts=super_starts, nb=nb, nrb_s=nrb_s,
                n_super=n_super, num_rows=num_rows, num_cols=c1 - c0,
                kt=kt, g=g, col_offset=c0,
                rank=rank if defer_edges else None)
        bsr2s.append(bsr)

        # ---- stream (residual) half ------------------------------------
        stream = None
        if nnz and r_mask.any():
            r_ids = np.flatnonzero(r_mask)
            stream = build_plan_v4_arrays(
                row[r_ids], col[r_ids] - c0, val[r_ids],
                num_rows, c1 - c0, rb=rb, k=k, S=S, gd=gd,
                orig_ids=r_ids, defer_edges=defer_edges, col_offset=c0)
        streams.append(stream)

    return HybridPlanV5(
        bsr2s=tuple(bsr2s), streams=tuple(streams),
        stripe_bounds=tuple(stripe_bounds),
        num_rows=num_rows, num_cols=num_cols,
        dense_edges=dense_edges, sparse_edges=nnz - dense_edges)


def _stripe_rank(rank: np.ndarray, n_br: int, n_bc: int, c0: int,
                 c1: int) -> np.ndarray:
    """Global rank map restricted to a stripe, re-indexed to the
    stripe-local (n_br × n_bc_local) block grid."""
    bc0, bc1 = c0 // _BS, _cdiv(c1, _BS)
    return (rank.reshape(n_br, n_bc)[:, bc0:bc1]).reshape(-1)


def _densify_host(row, col, val, rank_local, n_bc_local, nb, g):
    """Host-side bf16 block fill in the member-major kernel layout:
    ``blocks[b, m·128 + c_local, r_local]`` — one deep contraction
    operand per DMA group (tests / no-device builds; production defers
    to the on-device scatter)."""
    import ml_dtypes
    bid = (row // _BS) * n_bc_local + (col // _BS)
    p = rank_local[bid]
    blocks = np.zeros((nb, _BS, _BS), np.float32)
    np.add.at(blocks, (p, col % _BS, row % _BS), val)
    blocks = blocks.astype(ml_dtypes.bfloat16)
    return blocks.reshape(nb // g, g * _BS, _BS).copy()


# ---------------------------------------------------------------------------
# On-device materialization (deferred plans)
# ---------------------------------------------------------------------------

def materialize_v5_device(plan: HybridPlanV5, row, col, val
                          ) -> HybridPlanV5:
    """Fill all deferred halves from the resident device edge arrays."""
    from .tiling_v3 import _scatter_blocks
    from .tiling_v4 import materialize_v4_edges_device

    bsr2s = []
    for bsr in plan.bsr2s:
        if bsr is not None and bsr.blocks is None:
            assert bsr.rank is not None, "deferred plan lost its rank map"
            n_bc_global = _cdiv(plan.num_cols, _BS)
            blocks = _scatter_blocks(
                jnp.asarray(bsr.rank), row, col, val,
                n_bc=n_bc_global, nb=bsr.nb, g=bsr.g,
                num_rows=plan.num_rows, num_cols=plan.num_cols,
                member_major=True)
            bsr = dataclasses.replace(bsr, blocks=blocks)
        bsr2s.append(bsr)
    streams = []
    for st in plan.streams:
        if st is not None and st.edges is None:
            st = materialize_v4_edges_device(st, row, col, val)
        streams.append(st)
    return dataclasses.replace(plan, bsr2s=tuple(bsr2s),
                               streams=tuple(streams))
