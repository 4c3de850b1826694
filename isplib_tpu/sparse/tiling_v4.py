"""Row-stream SpMM plan (v4) — the low-occupancy successor to the v2
column-tile streaming plan.

Why a fourth generation: the r3 bench showed both v2 and v3 collapse to
~0.6 Ge/s in the density-representative regime (~35 edges per 128×128
block, matching REAL Reddit).  On-chip ablation (scripts/ablate_v2.py)
attributed the per-chunk cost to (a) the static ct/128-long
select-chain gather (54%) and (b) chunk fill lost to the (rb, ct) cell
partition (fill 0.76 → 0.13 for v3 residuals).  v4 removes both at the
plan level:

* **No column-tile grid.**  Edges are sorted by (row block, window,
  col); lane groups are 128 consecutive edges of one (row block,
  S·128-col window) bucket — at low occupancy the group fill is set by
  the window size S, not by a (rb, ct) cell partition.
* **Static-S windowed gather.**  Each group records its window's first
  128-col x tile (``group_base``); the kernel unrolls exactly S gather
  visits over consecutive tiles of a fully VMEM-resident x (dynamic
  lane-offset slices — verified supported by Mosaic,
  scripts/probe_mosaic.py).  S is a *plan* parameter: on-chip ablation
  showed Mosaic lowers dynamic-trip-count loops to ~200 ns + ~76 ns per
  iteration of scalar-serialized while-loops, so the span must be
  compile-time static (scripts/ablate_v4.py).
* **Whole-x residency.**  x lives in VMEM as one (kt, C_pad) block:
  zero re-fetch, no per-cell DMA.  Graphs whose x exceeds the VMEM
  budget are split into column **stripes** by the v5 hybrid builder,
  one kernel launch per stripe (outputs summed).

Reference lineage: plays the role of FusedMM's CSR OpenMP loop
(``/root/reference/csrc/fusedMM.h:77-99``) in the sparse regime; the
dense regime stays with the v3 BSR plan.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StreamPlanV4", "build_plan_v4_arrays",
           "materialize_v4_edges_device"]

_LANE = 128

# Inert groups appended after the real ones so grouped DMA (gd groups per
# descriptor) may overread safely.  Upper-bounds the kernel's gd.
_TAIL = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamPlanV4:
    """Row-block-major lane groups with dynamic gather windows.

    ``edges``: (ng + tail, 3, 1, 128) int32 — plane 0 = col −
    group_base·128 (window-local, in [0, S·128)), plane 1 = float32
    value bit-cast, plane 2 = row − block·rb.  Pad slots: col 0, value
    0 (inert — the one-hot folds values, so a zero value contributes
    nothing), row 0.
    ``group_base``: (ng + tail,) int32 — first 128-col x tile of the
    group's S·128-col window (0 on pad groups).
    ``block_starts``: (nrb + 1,) int32 — group range per row block.
    Both scalar arrays ride SMEM scalar prefetch.

    A v4 "plan" may be one column stripe of a larger graph:
    ``col_offset`` locates it (cols here are stripe-local; x must be
    sliced to ``[col_offset, col_offset + num_cols)`` by the caller —
    the v5 hybrid wrapper does).
    """

    edges: Optional[jax.Array]
    group_base: jax.Array
    block_starts: jax.Array
    rb: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    ng: int = dataclasses.field(metadata=dict(static=True))
    nrb: int = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    # K-tile width of the VMEM-resident x block (the kernel adds a K grid
    # axis of cdiv(k_pad, kt) steps; x is re-fetched once per K tile).
    kt: int = dataclasses.field(default=32, metadata=dict(static=True))
    # groups per DMA descriptor (amortizes the DMA-issue cost); <= _TAIL.
    gd: int = dataclasses.field(default=8, metadata=dict(static=True))
    # column offset of this stripe within the full graph (0 = unstriped)
    col_offset: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    # Deferred plans: ``edges`` is None and ``edge_of_slot`` holds, per
    # slot (group·128 + lane), the edge's position in the graph's padded
    # CSR/CSC arrays (-1 = pad).  materialize_v4_edges_device packs the
    # planes on device (tunnel bytes: 1 index array vs 3 packed planes).
    edge_of_slot: Optional[jax.Array] = None

    @property
    def r_padded(self) -> int:
        return self.nrb * self.rb

    @property
    def nct(self) -> int:
        # padded to a full window so the kernel's static S visits never
        # slice past the resident x block
        return _cdiv(self.num_cols, self.S * _LANE) * self.S

    @property
    def c_padded(self) -> int:
        return self.nct * _LANE

    @property
    def fill_fraction(self) -> float:
        return self.fill


def build_plan_v4_arrays(
    row: np.ndarray, col: np.ndarray, val: np.ndarray,
    num_rows: int, num_cols: int,
    rb: int = 256, ct: int = 0, eb: int = 0,  # ct/eb ignored (API parity)
    k: int = 32,
    S: int = 8,
    gd: int = 8,
    orig_ids: Optional[np.ndarray] = None,
    defer_edges: bool = False,
    col_offset: int = 0,
) -> StreamPlanV4:
    """Build the v4 plan from host COO arrays (any order).

    ``S``: gather window width in 128-col tiles; the kernel unrolls S
    static visits per group.  Groups are bucketed by (row block,
    window) with windows aligned at S·128 — fill rises with S, visit
    cost rises linearly with S; the autotuner searches it.
    ``k`` sizes the x K tile: kt = min(k_pad, 256) — the resident x
    block is (kt, C_pad) f32 and must fit VMEM; callers with large C
    split stripes (version=5 builder).
    ``orig_ids``: position of each input edge in the graph's padded
    CSR/CSC arrays (identity by default) — set when building over a
    subset (e.g. a hybrid residual) so deferred packing references the
    full graph.  ``col`` here is stripe-local when ``col_offset`` > 0;
    deferred packing adds the offset back (global cols live on device).
    """
    del ct, eb
    assert rb % 8 == 0, "rb must be a sublane multiple"
    assert 1 <= gd <= _TAIL and S >= 1
    nnz = int(row.shape[0])
    nrb = max(1, _cdiv(num_rows, rb))
    k_pad = ((max(k, 1) + 31) // 32) * 32
    kt = min(k_pad, 256)

    if nnz == 0:
        return StreamPlanV4(
            edges=np.zeros((1 + _TAIL, 3, 1, _LANE), np.int32),
            group_base=np.zeros(1 + _TAIL, np.int32),
            block_starts=np.zeros(nrb + 1, np.int32),
            rb=rb, S=S, ng=1, nrb=nrb, num_rows=num_rows,
            num_cols=num_cols, fill=0.0, kt=kt, gd=gd,
            col_offset=col_offset)

    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    rbid = row // rb
    wid = col // (S * _LANE)
    order = np.lexsort((row, col, wid, rbid))  # block-major, window, col
    row, col, val = row[order], col[order], val[order]
    rbid, wid = rbid[order], wid[order]

    # lane groups: 128 consecutive edges of one (block, window) bucket
    bucket = rbid * (_cdiv(num_cols, S * _LANE) + 1) + wid
    new_b = np.empty(nnz, bool)
    new_b[0] = True
    np.not_equal(bucket[1:], bucket[:-1], out=new_b[1:])
    b_start = np.flatnonzero(new_b)
    b_ord = np.cumsum(new_b) - 1
    pos_in_b = np.arange(nnz, dtype=np.int64) - b_start[b_ord]
    new_g = new_b.copy()
    np.logical_or(new_g[1:], pos_in_b[1:] % _LANE == 0, out=new_g[1:])
    group_raw = np.cumsum(new_g) - 1
    lane = pos_in_b % _LANE

    first_of_group = np.flatnonzero(new_g)
    blk_of_group = rbid[first_of_group]
    blk_counts = np.bincount(blk_of_group, minlength=nrb)
    # pad every non-empty block's group list to a multiple of gd with
    # inert groups: the kernel's DMA batches then never overread into
    # another block and the per-group validity mask disappears (it was
    # an (rb, 128)-wide AND per group)
    blk_counts_p = -(-blk_counts // gd) * gd * (blk_counts > 0)
    block_starts = np.zeros(nrb + 1, np.int32)
    np.cumsum(blk_counts_p, out=block_starts[1:])
    raw_starts = np.zeros(nrb + 1, np.int64)
    np.cumsum(blk_counts, out=raw_starts[1:])
    # raw group id -> padded group id (per-block offset shift)
    grp_shift = (block_starts[:-1].astype(np.int64) - raw_starts[:-1])
    group = group_raw + grp_shift[rbid]
    ng = int(block_starts[-1])

    base = np.zeros(ng, np.int32)
    base[group[first_of_group]] = (wid[first_of_group] * S).astype(
        np.int32)

    local_col = (col - wid * (S * _LANE)).astype(np.int32)
    local_row = (row - rbid * rb).astype(np.int32)

    oid = order if orig_ids is None else np.asarray(orig_ids, np.int64)[order]

    group_base = np.concatenate([base, np.zeros(_TAIL, np.int32)])
    fill = float(nnz) / (ng * _LANE)

    if defer_edges:
        eos = np.full((ng + _TAIL) * _LANE, -1, np.int32)
        eos[group * _LANE + lane] = oid.astype(np.int32)
        return StreamPlanV4(
            edges=None, group_base=group_base,
            block_starts=block_starts,
            rb=rb, S=S, ng=ng, nrb=nrb, num_rows=num_rows,
            num_cols=num_cols, fill=fill, kt=kt, gd=gd,
            col_offset=col_offset, edge_of_slot=eos)

    cols_arr = np.zeros((ng, _LANE), np.int32)
    vals_arr = np.zeros((ng, _LANE), np.float32)
    rows_arr = np.zeros((ng, _LANE), np.int32)
    cols_arr[group, lane] = local_col
    vals_arr[group, lane] = val
    rows_arr[group, lane] = local_row

    edges = np.zeros((ng + _TAIL, 3, 1, _LANE), np.int32)
    edges[:ng, 0, 0] = cols_arr
    edges[:ng, 1, 0] = vals_arr.view(np.int32)
    edges[:ng, 2, 0] = rows_arr

    return StreamPlanV4(
        edges=edges, group_base=group_base,
        block_starts=block_starts,
        rb=rb, S=S, ng=ng, nrb=nrb, num_rows=num_rows, num_cols=num_cols,
        fill=fill, kt=kt, gd=gd, col_offset=col_offset)


# ---------------------------------------------------------------------------
# On-device edge packing (deferred plans)
# ---------------------------------------------------------------------------

def _pack_v4_edges_impl(edge_of_slot, group_base, block_starts, row, col,
                        val, *, rb: int, ng: int, nrb: int,
                        col_offset: int):
    eos = edge_of_slot                                   # ((ng+tail)*128,)
    n_slots = eos.shape[0]
    valid = eos >= 0
    e = jnp.where(valid, eos, 0)
    r = jnp.take(row, e)
    c = jnp.take(col, e) - col_offset        # device cols are global
    v = jnp.where(valid, jnp.take(val, e), 0.0)

    grp = jnp.arange(n_slots, dtype=jnp.int32) // _LANE
    blk = (jnp.searchsorted(block_starts,
                            jnp.minimum(grp, ng - 1).astype(
                                block_starts.dtype), side="right") - 1
           ).astype(jnp.int32)
    cols_l = jnp.where(valid, c - jnp.take(group_base, grp) * _LANE, 0)
    rows_l = jnp.where(valid, r - blk * rb, 0)
    planes = [cols_l.astype(jnp.int32),
              jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32),
              rows_l.astype(jnp.int32)]
    edges = (jnp.stack(planes, axis=0)            # (3, n_slots)
             .reshape(3, n_slots // _LANE, 1, _LANE)
             .transpose(1, 0, 2, 3))
    return edges


_pack_v4_edges = jax.jit(
    _pack_v4_edges_impl, static_argnames=("rb", "ng", "nrb", "col_offset"))


def materialize_v4_edges_device(plan: StreamPlanV4, row, col, val
                                ) -> StreamPlanV4:
    """Pack a deferred plan's edge planes on device (no-op when packed)."""
    if plan.edges is not None:
        return plan
    assert plan.edge_of_slot is not None, "deferred plan lost edge_of_slot"
    edges = _pack_v4_edges(
        jnp.asarray(plan.edge_of_slot), jnp.asarray(plan.group_base),
        jnp.asarray(plan.block_starts), row, col, val,
        rb=plan.rb, ng=plan.ng, nrb=plan.nrb, col_offset=plan.col_offset)
    return dataclasses.replace(plan, edges=edges)
