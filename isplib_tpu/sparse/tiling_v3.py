"""Hybrid BSR + edge-streaming SpMM plan (v3).

The v2 edge-streaming kernel pays ~2·K·rb one-hot-matmul FLOPs *per edge*
(the scatter one-hot burns an MXU pass per 128 edges) plus a VPU gather.
On dense-ish graph regions that is far from speed-of-light: a 128×128
adjacency block holding ``n`` edges costs the edge path ``n·2·K·rb`` FLOPs
but a *densified* block-matmul only ``2·128·128·K`` — fewer MXU cycles
whenever ``n ≳ 128``, with **zero** gather/scatter work and full
MXU-friendly shapes.

The v3 plan therefore splits the adjacency per 128×128 block:

* blocks with ``≥ dense_threshold`` edges are **densified** into bf16
  (col-local, row-local) tiles consumed by a pure block-matmul kernel
  (:func:`isplib_tpu.kernels.spmm_bsr.spmm_bsr`),
* the residual edges go through the v2 edge-streaming plan.

Both halves produce (rows, K) partials that add.  This mirrors how the
reference's FusedMM autotuner picks register-blocked kernel variants per
graph at build time (``/root/reference/configure``,
``autotuner/findbestk.py``) — except the decision here is per-block and
data-driven rather than per-binary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from .tiling_v2 import TiledPlanV2, build_plan_v2_arrays

__all__ = ["BSRPlan", "HybridPlanV3", "build_plan_v3_arrays"]

_BS = 128  # dense block edge (MXU tile)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _cdiv_arr(a: np.ndarray, b: int) -> np.ndarray:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRPlan:
    """Dense 128×128 adjacency blocks in (superblock, block-col)-major order,
    packed in groups of ``g`` per DMA/matmul step.

    ``blocks``: (nb // g, 128, g·128) bf16 — group ``b``, member ``j``
    stores Aᵀ locally at lane band ``j``:
    ``blocks[b, c_local, j·128 + r_local] = A[row, col]``.  The kernel
    computes ``(kt, g·128) = xᵀ_tile(kt, 128) · blocks[b]`` — one DMA and
    one (wide) matmul cover g blocks, amortizing the ~0.3 µs/iteration
    DMA-issue + scalar overhead that dominated the ungrouped kernel
    (measured r2 sweep: 0.35 µs/block ≫ the 136 ns MXU cost).
    ``rb_locals``: (nb,) int32 — row-block index within the superblock
    (group ``b`` member ``j`` is entry ``b·g + j``; group-padding entries
    are all-zero blocks targeting row-block 0, inert under +=).
    ``cell_starts``: (n_super·n_bc + 1,) int32 — *group* range per
    (superblock, block-col) grid cell.

    ``blocks`` may be ``None`` in a *deferred* plan: ``rank`` then holds
    the (n_br·n_bc,) int32 block→slot map and
    :func:`materialize_blocks_device` scatters the blocks **on device**
    from the graph's (row, col, value) arrays — the densified blocks are
    ~30x the bytes of the edges they encode, and the edges are already
    resident, so shipping blocks through this environment's slow host→
    device tunnel is the single largest bench wall-time cost.
    """

    blocks: Optional[jax.Array]
    rb_locals: jax.Array
    cell_starts: jax.Array
    nb: int = dataclasses.field(metadata=dict(static=True))  # incl. padding
    nrb_s: int = dataclasses.field(metadata=dict(static=True))
    n_super: int = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    kt: int = dataclasses.field(default=256, metadata=dict(static=True))
    g: int = dataclasses.field(default=8, metadata=dict(static=True))
    rank: Optional[jax.Array] = None  # (n_br*n_bc,) int32; -1 = sparse

    @property
    def n_bc(self) -> int:
        return _cdiv(self.num_cols, _BS)

    @property
    def n_br(self) -> int:
        return _cdiv(self.num_rows, _BS)

    @property
    def r_padded(self) -> int:
        return self.n_super * self.nrb_s * _BS

    @property
    def c_padded(self) -> int:
        return self.n_bc * _BS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridPlanV3:
    """BSR dense half + v2 edge-streaming residual half (either optional)."""

    bsr: Optional[BSRPlan]
    residual: Optional[TiledPlanV2]
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    # diagnostics (static so they survive jit)
    dense_edges: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    sparse_edges: int = dataclasses.field(default=0,
                                          metadata=dict(static=True))

    @property
    def nc(self) -> int:  # autotuner/bench diagnostic parity with v2
        return (self.residual.nc if self.residual else 0) + \
            (self.bsr.nb if self.bsr else 0)

    @property
    def fill(self) -> float:
        if self.residual is None:
            return 1.0
        return self.residual.fill

    @property
    def fill_fraction(self) -> float:
        return self.fill


def build_plan_v3_arrays(
    row: np.ndarray, col: np.ndarray, val: np.ndarray,
    num_rows: int, num_cols: int,
    rb: int = 128, ct: int = 128, eb: int = 512,
    k: int = 32,
    dense_threshold: int = 96,
    vmem_out_bytes: int = 6 << 20,
    max_block_bytes: int = 2 << 30,
    g: int = 8,
    defer_blocks: bool = False,
    gd: int = 1,
) -> HybridPlanV3:
    """Build the hybrid plan from host COO arrays.

    ``dense_threshold``: min edges for a 128×128 block to be densified
    (the MXU-cycle crossover is ~100 edges at rb=128; autotunable).
    ``max_block_bytes`` caps the densified HBM footprint — beyond it the
    threshold is raised so only the densest blocks densify.
    ``g``: blocks per DMA/matmul group (see :class:`BSRPlan`).
    ``defer_blocks``: skip the host densify — the plan carries the
    block→slot ``rank`` map instead and the bf16 blocks are scattered on
    device by :func:`materialize_blocks_device` (the blocks are ~30x the
    bytes of their edges; never ship them through a slow tunnel).
    """
    nnz = int(row.shape[0])
    row = row.astype(np.int64)
    col = col.astype(np.int64)
    n_br = _cdiv(num_rows, _BS)
    n_bc = _cdiv(num_cols, _BS)

    k_pad = ((max(k, 1) + 31) // 32) * 32
    kt = min(k_pad, 256)
    nrb_s = max(1, min(n_br, vmem_out_bytes // (kt * _BS * 4)))
    n_super = _cdiv(n_br, nrb_s)

    bsr = None
    res_row, res_col, res_val = row, col, val
    res_ids = None  # identity: residual = full edge list
    dense_edges = 0
    if nnz:
        from .. import native
        use_native = native.available() and native.has_bsr() and \
            bool(np.all(row[1:] >= row[:-1]))
        if use_native:
            counts = native.bsr_count(row, col, _BS, n_br, n_bc)
        else:
            bid = (row // _BS) * n_bc + (col // _BS)
            counts = np.bincount(bid, minlength=n_br * n_bc)
        thr = max(dense_threshold, 1)
        # Respect the HBM cap: raise the threshold until the densified
        # footprint fits (each block = 32 KiB bf16).
        while True:
            nb = int(np.count_nonzero(counts >= thr))
            if nb * _BS * _BS * 2 <= max_block_bytes or nb == 0:
                break
            thr *= 2
        dense_b = counts >= thr
        dense_edges = int(counts[dense_b].sum())
        if dense_edges:
            dense_bids = np.flatnonzero(dense_b)
            br = dense_bids // n_bc
            bc = dense_bids % n_bc
            sid = br // nrb_s
            order = np.lexsort((br, bc, sid))
            dense_bids = dense_bids[order]
            br, bc, sid = br[order], bc[order], sid[order]
            nb_real = dense_bids.shape[0]

            # Pad each (superblock, block-col) cell to a multiple of g with
            # all-zero blocks (rbl 0, inert) so every DMA group is full.
            cell = sid * n_bc + bc  # ascending by construction
            n_cells = n_super * n_bc
            cnt = np.bincount(cell, minlength=n_cells)
            cnt_g = _cdiv_arr(cnt, g) * g
            starts = np.zeros(n_cells + 1, np.int64)
            starts[1:] = np.cumsum(cnt)
            starts_g = np.zeros(n_cells + 1, np.int64)
            starts_g[1:] = np.cumsum(cnt_g)
            pos_in_cell = np.arange(nb_real) - starts[cell]
            new_pos = starts_g[cell] + pos_in_cell
            nb = int(starts_g[-1])

            rank = np.full(n_br * n_bc, -1, np.int64)
            rank[dense_bids] = new_pos

            if defer_blocks:
                blocks = None
                if not use_native:
                    bid_all = bid
                else:
                    bid_all = (row // _BS) * n_bc + (col // _BS)
                res_ids = np.flatnonzero(rank[bid_all] < 0)
                res_row, res_col = row[res_ids], col[res_ids]
                res_val = val[res_ids]
            elif use_native:
                # OpenMP scatter-accumulate + bf16 round, written directly
                # in the grouped kernel layout (VERDICT r2 next #5: the
                # numpy densify took ~15 s on the 5.7M-edge bench graph)
                blocks_u16, is_dense = native.bsr_fill(
                    row, col, val, _BS, n_br, n_bc, g, rank, nb)
                blocks = blocks_u16.view(ml_dtypes.bfloat16)
                res_row, res_col, res_val = native.compact_residual(
                    row, col, val, is_dense)
            else:
                is_dense = dense_b[bid]
                d_row = row[is_dense]
                d_col = col[is_dense]
                d_val = val[is_dense]
                # Accumulate per ~256-block slabs so the transient f64
                # accumulator stays ≤ 32 MiB instead of nb*128 KiB
                # (ADVICE r2 #2: up to 4x the max_block_bytes cap).
                p_of_edge = rank[bid[is_dense]]
                eorder = np.argsort(p_of_edge, kind="stable")
                p_sorted = p_of_edge[eorder]
                flat_local = ((d_col[eorder] % _BS) * _BS
                              + (d_row[eorder] % _BS))
                val_sorted = d_val[eorder]
                blocks = np.zeros((nb, _BS, _BS), ml_dtypes.bfloat16)
                slab = 256
                for p0 in range(0, nb, slab):
                    lo, hi = np.searchsorted(p_sorted, (p0, p0 + slab))
                    if lo == hi:
                        continue
                    n_slab = min(slab, nb - p0)
                    idx = ((p_sorted[lo:hi] - p0) * (_BS * _BS)
                           + flat_local[lo:hi])
                    flat = np.bincount(idx, weights=val_sorted[lo:hi],
                                       minlength=n_slab * _BS * _BS)
                    blocks[p0:p0 + n_slab] = flat.astype(
                        ml_dtypes.bfloat16).reshape(n_slab, _BS, _BS)
                # pack groups of g along lanes: (nb/g, c, g*128 + r)
                blocks = (blocks.reshape(nb // g, g, _BS, _BS)
                          .transpose(0, 2, 1, 3)
                          .reshape(nb // g, _BS, g * _BS).copy())
                keep = ~is_dense
                res_row, res_col = row[keep], col[keep]
                res_val = val[keep]

            rb_locals = np.zeros(nb, np.int32)
            rb_locals[new_pos] = (br - sid * nrb_s).astype(np.int32)
            cell_starts = (starts_g // g).astype(np.int32)
            bsr = BSRPlan(
                blocks=blocks,
                rb_locals=rb_locals,
                cell_starts=cell_starts,
                nb=nb, nrb_s=nrb_s, n_super=n_super,
                num_rows=num_rows, num_cols=num_cols, kt=kt, g=g,
                rank=rank.astype(np.int32) if defer_blocks else None)

    residual = None
    if res_row.shape[0]:
        residual = build_plan_v2_arrays(
            res_row, res_col, res_val, num_rows, num_cols,
            rb=rb, ct=ct, eb=eb, k=k, vmem_out_bytes=vmem_out_bytes,
            defer_edges=defer_blocks, gd=gd,
            orig_ids=res_ids if defer_blocks else None)

    return HybridPlanV3(
        bsr=bsr, residual=residual,
        num_rows=num_rows, num_cols=num_cols,
        dense_edges=dense_edges,
        sparse_edges=nnz - dense_edges,
    )


# ---------------------------------------------------------------------------
# On-device block materialization (deferred plans)
# ---------------------------------------------------------------------------

def _scatter_blocks_impl(rank, row, col, val, *, n_bc: int, nb: int,
                         g: int, num_rows: int, num_cols: int,
                         member_major: bool = False):
    bid = (row // _BS).astype(jnp.int32) * n_bc + (col // _BS).astype(
        jnp.int32)
    valid = (row < num_rows) & (col < num_cols)
    p = jnp.where(valid, jnp.take(rank, jnp.where(valid, bid, 0)), -1)
    # flat layout per block slot: (p, c_local, r_local); invalid → dump slot
    flat = jnp.where(
        p >= 0,
        p * (_BS * _BS) + (col % _BS) * _BS + (row % _BS),
        nb * _BS * _BS)
    # TPU scatter with random indices lowers to a serial update loop
    # (measured: MINUTES for 5.7M updates); device-sorting the targets
    # and using a sorted segment_sum runs in ~0.2 s.
    order = jnp.argsort(flat)
    flat_s = jnp.take(flat, order)
    val_s = jnp.take(jnp.where(p >= 0, val, 0.0), order)
    acc = jax.ops.segment_sum(val_s, flat_s,
                              num_segments=nb * _BS * _BS + 1,
                              indices_are_sorted=True)
    if member_major:
        # v5 layout: blocks[b, m·128 + c_local, r_local] — the whole
        # group is one (g·128, 128) contraction operand
        blocks = acc[:-1].reshape(nb // g, g * _BS, _BS)
    else:
        blocks = acc[:-1].reshape(nb // g, g, _BS, _BS)
        blocks = (blocks.transpose(0, 2, 1, 3)
                  .reshape(nb // g, _BS, g * _BS))
    return blocks.astype(jnp.bfloat16)


_scatter_blocks = jax.jit(
    _scatter_blocks_impl,
    static_argnames=("n_bc", "nb", "g", "num_rows", "num_cols",
                     "member_major"))


def materialize_blocks_device(plan: HybridPlanV3, row, col, val
                              ) -> HybridPlanV3:
    """Fill a deferred plan's bf16 blocks (sorted on-device scatter) AND
    deferred residual edge planes (on-device gather pack) from the
    already-resident graph edge arrays.  No-op for materialized parts.

    ``row/col/val``: the padded device COO arrays matching the plan's
    orientation (CSR arrays for a forward plan, CSC for a transpose
    plan)."""
    bsr = plan.bsr
    if bsr is not None and bsr.blocks is None:
        assert bsr.rank is not None, "deferred plan lost its rank map"
        blocks = _scatter_blocks(
            jnp.asarray(bsr.rank), row, col, val,
            n_bc=bsr.n_bc, nb=bsr.nb, g=bsr.g,
            num_rows=bsr.num_rows, num_cols=bsr.num_cols)
        bsr = dataclasses.replace(bsr, blocks=blocks)
    residual = plan.residual
    if residual is not None and residual.edges is None:
        from .tiling_v2 import materialize_v2_edges_device
        residual = materialize_v2_edges_device(residual, row, col, val)
    if bsr is plan.bsr and residual is plan.residual:
        return plan
    return dataclasses.replace(plan, bsr=bsr, residual=residual)
