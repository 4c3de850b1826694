"""Train-structured max/min SpMM plans (v4mm) — the r5 rebuild of the
arg kernel's execution plan on the v4 row-stream skeleton.

The r4 max/min kernel rode the v2 cell plan: a (superblock, K, col-tile)
grid over mostly-empty cells, a 7-step ``pltpu.roll`` segmented scan per
128-edge sub-group, and five exact-move one-hot matmuls to push winner
(value, slot) pairs through the MXU — 0.347 Ge/s vs 15.9 for sum on the
same graph (VERDICT r4 weak #1).  An r5 on-chip ablation of a first
plain row-stream rebuild measured the costs that remain once the cell
grid and the matmuls are gone: ~58 ns per 128-edge group of fixed work
(gather + scatter + DMA) plus ~27 ns per segmented-scan step — and
power-law graphs force a depth-7 scan (53% of the headline graph's
edges sit in row runs longer than 64).  Max has no MXU semiring, so the
only lever left is to make the scan *amortized*.  That is what trains
do:

* Each (row, S·128-col window) pair is assigned ``ceil(deg_w / D)``
  **lanes**, where the **class depth D ∈ {1, 4, 16, 64}** is the
  largest class ≤ deg_w.  A lane carries up to D of the pair's edges in
  ascending-edge-id order.
* A **train** is ≤128 lanes of one (row-block, window) bucket laid out
  as D consecutive 128-lane groups (group d = every lane's d-th edge).
  The kernel folds a train's D groups **element-wise** into one
  (kt, 128) (value, edge-id) carry — one compare-select per edge, the
  VPU speed-of-light for max — and runs the segmented scan + scatter
  ONCE per train instead of once per group.
* Because every pair in a class-D plan has lanes-per-pair ≤ 4 (next
  class takes over at 4·D), lane runs are short and the per-train scan
  depth is ≤ 2-3 — measured from the plan, baked in static.

Tie-break = lowest edge id (torch_scatter parity), by construction
in-kernel: within a lane, the vertical fold's strict ``>`` keeps the
earlier group (lower id); across lanes of a run, edge ids ascend with
lane, and the scan's ``>=`` keeps the earlier lane; across trains and
groups of one block, visit order is ascending edge id per row and the
accumulator's strict ``>`` keeps the earlier visit.  Across class plans
and column stripes the combiner compares edge ids explicitly.

Values are EXACT f32 (no matmuls — the sum kernels' bf16 contract does
not apply).

Reference: max/min are co-equal reductions with ``z_arg`` winner ids in
FusedMM (``/root/reference/csrc/fusedmm.cpp:386-518,397-407``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MinMaxTrainPlan", "build_plan_v4mm_arrays",
           "build_minmax_stripes", "materialize_v4mm_edges_device",
           "D_CLASSES"]

_LANE = 128

# Class depths: a (row, window) pair with deg_w in [D, 4D) lands in
# class D, so lanes-per-pair ≤ 4 and per-train scan depth ≤ 2 (runs
# from pairs split across trains can push it slightly higher).
D_CLASSES = (1, 4, 16, 64)

# Inert trains appended after the real ones so batched DMA may overread.
_TAIL_T = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MinMaxTrainPlan:
    """One class-D stripe of the train-structured max/min plan.

    ``edges``: ((nt + tail)·D, 3, 1, 128) int32 — group g = train
    g//D's depth-(g%D) plane: 0 = col − group_base·128 (window-local),
    1 = float32 value bit-cast, 2 = original edge id (−1 pad).
    ``meta``: (nt + tail, 1 + rb//128, 1, 128) int32 — plane 0 =
    per-lane segment bitmask (bit b set iff lane l ≥ 2^b and lane
    l−2^b carries the same row), plane 1+s = slab-s scatter source
    (entry r = the segment-final lane of local row s·128+r, −1 absent).
    ``group_base``: (nt + tail,) int32 — first 128-col x tile of the
    train's window.  ``block_starts``: (nrb + 1,) int32 — TRAIN range
    per row block, each block's count padded to a multiple of the DMA
    batch (max(8 // D, 1) trains).
    """

    edges: Optional[jax.Array]
    meta: Optional[jax.Array]
    group_base: jax.Array
    block_starts: jax.Array
    D: int = dataclasses.field(metadata=dict(static=True))
    rb: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    nt: int = dataclasses.field(metadata=dict(static=True))
    nrb: int = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    scan_depth: int = dataclasses.field(default=7,
                                        metadata=dict(static=True))
    fill: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    kt: int = dataclasses.field(default=32, metadata=dict(static=True))
    col_offset: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    # Deferred plans: ``edges``/``meta`` are None; every plane is
    # derived on device from ``edge_of_slot`` ((nt+tail)·D·128 int32,
    # slot → padded-CSR edge position, −1 pad).
    edge_of_slot: Optional[jax.Array] = None

    @property
    def ng(self) -> int:
        return self.nt * self.D

    @property
    def nslab(self) -> int:
        return self.rb // _LANE

    @property
    def tb(self) -> int:
        """Trains per DMA batch."""
        return max(8 // self.D, 1)

    @property
    def r_padded(self) -> int:
        return self.nrb * self.rb

    @property
    def nct(self) -> int:
        return _cdiv(self.num_cols, self.S * _LANE) * self.S

    @property
    def c_padded(self) -> int:
        return self.nct * _LANE

    @property
    def fill_fraction(self) -> float:
        return self.fill


# Per-class default geometry: low-D classes pay the scatter once per
# few groups, so they want few 128-row slabs; high-D classes amortize
# the scatter over D groups and want tall blocks + wide windows for
# train fill.  Measured on v5e (r5 sweep).
CLASS_CFG = {1: dict(rb=256, S=4), 2: dict(rb=256, S=4),
             4: dict(rb=512, S=2), 16: dict(rb=1024, S=2),
             64: dict(rb=2048, S=2)}


def build_plan_v4mm_arrays(
    row: np.ndarray, col: np.ndarray, val: np.ndarray,
    num_rows: int, num_cols: int,
    rb: int = 0,
    k: int = 32,
    S: int = 2,
    orig_ids: Optional[np.ndarray] = None,
    defer_edges: bool = False,
    col_offset: int = 0,
    classes: Tuple[int, ...] = D_CLASSES,
    class_cfg: Optional[dict] = None,
) -> Tuple[MinMaxTrainPlan, ...]:
    """Build the per-class train plans from host COO arrays.

    Edges are partitioned by the cost model at the reference window
    ``S``; each class plan is then built with its own (rb, S) geometry
    from ``class_cfg`` (defaults ``CLASS_CFG``; ``rb`` > 0 overrides
    all classes).  Returns one plan per class depth D with any edges.
    ``orig_ids``: position of each input edge in the graph's padded CSR
    arrays (identity by default) — must ascend in (row, col) order.
    """
    assert S >= 1
    nnz = int(row.shape[0])
    k_pad = ((max(k, 1) + 31) // 32) * 32
    kt = min(k_pad, 256)
    classes = tuple(sorted(classes))
    cfg = dict(CLASS_CFG)
    if class_cfg:
        for d2, c in class_cfg.items():
            cfg[d2] = {**cfg.get(d2, {}), **c}
    if nnz == 0:
        return ()

    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    oid = (np.arange(nnz, dtype=np.int64) if orig_ids is None
           else np.asarray(orig_ids, np.int64))

    # (row, ref-window) pair degrees for classification
    wid = col // (S * _LANE)
    order = np.lexsort((col, row, wid))
    r_s, w_s = row[order], wid[order]
    nbw = _cdiv(num_cols, S * _LANE) + 1
    pair_key = r_s * nbw + w_s
    new_p = np.empty(nnz, bool)
    new_p[0] = True
    np.not_equal(pair_key[1:], pair_key[:-1], out=new_p[1:])
    p_of_edge = np.cumsum(new_p) - 1
    p_start = np.flatnonzero(new_p)
    deg_w = np.diff(np.append(p_start, nnz))

    # class of each pair: argmin of the measured per-edge cost model
    # (on-chip r5 ablation: ~30 ns fold per 128-slot group, ~28 ns
    # once-per-train scatter+fixed, ~27 ns per scan step; scan depth ≈
    # log2(lanes-per-pair)).  Slot waste multiplies the whole thing —
    # a deg_w=3 pair is CHEAPER in D=4 (one lane, no scan) than in
    # D=1 at perfect fill with a depth-2 scan.
    cls = np.zeros(len(p_start), np.int8)
    best = None
    for ci, d in enumerate(classes):
        lanes = -(-deg_w // d)
        depth_e = np.ceil(np.log2(np.clip(lanes, 1, None))).astype(
            np.float64)
        cost = (lanes * d / deg_w) * (30.0 + (28.0 + 27.0 * depth_e) / d)
        if best is None:
            best = cost
        else:
            upd = cost < best
            cls[upd] = ci
            best[upd] = cost[upd]

    plans = []
    for ci, D in enumerate(classes):
        sel_p = cls == ci
        if not sel_p.any():
            continue
        sel = order[sel_p[p_of_edge]]
        c = cfg.get(D, {})
        rb_c = rb if rb else c.get("rb", 512)
        S_c = c.get("S", S) if not rb else S
        plans.append(_build_class_plan(
            row[sel], col[sel], val[sel], oid[sel],
            D=D, rb=rb_c, S=S_c, kt=kt,
            num_rows=num_rows, num_cols=num_cols,
            col_offset=col_offset, defer_edges=defer_edges))
    return tuple(plans)


def _build_class_plan(row, col, val, oid, *, D, rb, S, kt, num_rows,
                      num_cols, col_offset, defer_edges):
    """One class's train layout with its own (rb, S) geometry.  Inputs
    are the class's edges (any order) with their original edge ids."""
    assert rb % _LANE == 0
    ne = int(row.shape[0])
    nrb = max(1, _cdiv(num_rows, rb))
    nslab = rb // _LANE
    tb = max(8 // D, 1)

    # sort by (block, window, row, col); lanes are pair-major
    rbid = row // rb
    wid = col // (S * _LANE)
    order = np.lexsort((col, row, wid, rbid))
    row, col, val, oid = row[order], col[order], val[order], oid[order]
    rbid, wid = rbid[order], wid[order]
    local_col = (col - wid * (S * _LANE)).astype(np.int32)

    nbw = _cdiv(num_cols, S * _LANE) + 1
    pair_key = (rbid * nbw + wid) * np.int64(rb + 1) + (row - rbid * rb)
    new_p = np.empty(ne, bool)
    new_p[0] = True
    np.not_equal(pair_key[1:], pair_key[:-1], out=new_p[1:])
    p_start = np.flatnonzero(new_p)
    p_of_edge = np.cumsum(new_p) - 1
    deg_w = np.diff(np.append(p_start, ne))
    rank = np.arange(ne, dtype=np.int64) - p_start[p_of_edge]

    # lane of each edge within its pair
    lane_in_pair = rank // D
    depth = (rank % D).astype(np.int64)
    lanes_of_pair = -(-deg_w // D)
    pair_lane_off = np.zeros(len(lanes_of_pair) + 1, np.int64)
    np.cumsum(lanes_of_pair, out=pair_lane_off[1:])
    lane_glob = pair_lane_off[p_of_edge] + lane_in_pair

    # buckets: lanes chop into 128-lane trains per (block, window)
    first_of_pair = np.flatnonzero(new_p)
    bucket_of_pair = rbid[first_of_pair] * nbw + wid[first_of_pair]
    n_pairs = len(first_of_pair)
    new_bucket_p = np.empty(n_pairs, bool)
    new_bucket_p[0] = True
    np.not_equal(bucket_of_pair[1:], bucket_of_pair[:-1],
                 out=new_bucket_p[1:])
    bucket_lane_start = pair_lane_off[:-1][new_bucket_p]
    b_of_pair = np.cumsum(new_bucket_p) - 1
    lane_in_bucket = lane_glob - bucket_lane_start[b_of_pair[p_of_edge]]
    train_in_bucket = lane_in_bucket // _LANE
    lane_in_train = lane_in_bucket % _LANE

    # global train numbering with per-block padding to a tb multiple
    n_lanes_bucket = np.diff(np.append(bucket_lane_start,
                                       pair_lane_off[-1]))
    trains_per_bucket = -(-n_lanes_bucket // _LANE)
    blk_of_bucket = (bucket_of_pair[new_bucket_p] // nbw).astype(np.int64)
    t_per_blk = np.bincount(blk_of_bucket, weights=trains_per_bucket,
                            minlength=nrb).astype(np.int64)
    t_per_blk_p = -(-t_per_blk // tb) * tb * (t_per_blk > 0)
    block_starts = np.zeros(nrb + 1, np.int32)
    np.cumsum(t_per_blk_p, out=block_starts[1:])
    raw_starts = np.zeros(nrb + 1, np.int64)
    np.cumsum(t_per_blk, out=raw_starts[1:])
    # raw train id (unpadded, bucket-major) -> padded id via block shift
    bucket_train_off = np.zeros(len(trains_per_bucket) + 1, np.int64)
    np.cumsum(trains_per_bucket, out=bucket_train_off[1:])
    blk_shift = block_starts[:-1].astype(np.int64) - raw_starts[:-1]
    train_of_edge = (bucket_train_off[b_of_pair[p_of_edge]]
                     + train_in_bucket + blk_shift[rbid])
    nt = int(block_starts[-1])

    # per-train window base
    base = np.zeros(nt, np.int32)
    base[bucket_train_off[b_of_pair[p_of_edge]] + train_in_bucket
         + blk_shift[rbid]] = (wid * S).astype(np.int32)
    group_base = np.concatenate([base, np.zeros(_TAIL_T, np.int32)])

    # ---- per-train lane rows → segmask + scatter sources --------------
    lrow = (row - rbid * rb).astype(np.int64)
    slot_lane = train_of_edge * _LANE + lane_in_train  # (train, lane) key
    # lane's row: every edge of the lane shares it; write d=0's
    lane_row = np.full((nt * _LANE,), -1, np.int64)
    lane_row[slot_lane[depth == 0]] = lrow[depth == 0]
    lane_row2 = lane_row.reshape(nt, _LANE)
    valid_lane = lane_row2 >= 0
    segmask = np.zeros((nt, _LANE), np.int32)
    max_run = 1
    same = np.zeros((nt, _LANE), bool)
    same[:, 1:] = (lane_row2[:, 1:] == lane_row2[:, :-1]) & \
        valid_lane[:, 1:] & valid_lane[:, :-1]
    # run position via cumulative per-train trick
    run_pos = np.zeros((nt, _LANE), np.int64)
    for l in range(1, _LANE):
        np.add(run_pos[:, l - 1] + 1, 0, out=run_pos[:, l],
               where=same[:, l])
    max_run = int(run_pos.max(initial=0)) + 1
    for b in range(7):
        d2 = 1 << b
        ok = np.zeros((nt, _LANE), bool)
        ok[:, d2:] = ((lane_row2[:, d2:] == lane_row2[:, :-d2])
                      & valid_lane[:, d2:] & valid_lane[:, :-d2])
        segmask |= ok.astype(np.int32) << b
    scan_depth = min(7, math.ceil(math.log2(max_run)) if max_run > 1
                     else 0)

    is_final = np.ones((nt, _LANE), bool)
    is_final[:, :-1] = ~same[:, 1:]
    is_final &= valid_lane
    tf, lf = np.nonzero(is_final)
    rf = lane_row2[tf, lf]
    src = np.full((nt, nslab, _LANE), -1, np.int32)
    src[tf, rf // _LANE, rf % _LANE] = lf.astype(np.int32)

    meta = np.full((nt + _TAIL_T, 1 + nslab, 1, _LANE), -1, np.int32)
    meta[:nt, 0, 0] = segmask
    meta[nt:, 0] = 0
    meta[:nt, 1:, 0, :] = src

    fill = float(ne) / (nt * D * _LANE)

    if defer_edges:
        eos = np.full((nt + _TAIL_T) * D * _LANE, -1, np.int32)
        eos[(train_of_edge * D + depth) * _LANE + lane_in_train] = \
            oid.astype(np.int32)
        return MinMaxTrainPlan(
            edges=None, meta=None, group_base=group_base,
            block_starts=block_starts, D=D, rb=rb, S=S, nt=nt, nrb=nrb,
            num_rows=num_rows, num_cols=num_cols, scan_depth=scan_depth,
            fill=fill, kt=kt, col_offset=col_offset, edge_of_slot=eos)

    ngp = (nt + _TAIL_T) * D
    cols_arr = np.zeros((ngp, _LANE), np.int32)
    vals_arr = np.zeros((ngp, _LANE), np.float32)
    eids_arr = np.full((ngp, _LANE), -1, np.int32)
    gsl = (train_of_edge * D + depth) * _LANE + lane_in_train
    cols_arr.reshape(-1)[gsl] = local_col
    vals_arr.reshape(-1)[gsl] = val
    eids_arr.reshape(-1)[gsl] = oid.astype(np.int32)

    edges = np.zeros((ngp, 3, 1, _LANE), np.int32)
    edges[:, 0, 0] = cols_arr
    edges[:, 1, 0] = vals_arr.view(np.int32)
    edges[:, 2, 0] = eids_arr

    return MinMaxTrainPlan(
        edges=edges, meta=meta, group_base=group_base,
        block_starts=block_starts, D=D, rb=rb, S=S, nt=nt, nrb=nrb,
        num_rows=num_rows, num_cols=num_cols, scan_depth=scan_depth,
        fill=fill, kt=kt, col_offset=col_offset)


def build_minmax_stripes(
    row: np.ndarray, col: np.ndarray, val: np.ndarray,
    num_rows: int, num_cols: int,
    rb: int = 0, k: int = 32, S: int = 2, gd: int = 8,
    x_vmem_bytes: int = 24 << 20,
    defer_edges: bool = False,
    classes: Tuple[int, ...] = D_CLASSES,
    class_cfg: Optional[dict] = None,
) -> Tuple[MinMaxTrainPlan, ...]:
    """Column-striped per-class v4mm train plans, flattened into one
    tuple.  The kernel wrapper combines all partials with explicit
    edge-id tie-breaks, so plan order only affects performance.
    ``rb=0`` (default) lets each class use its own measured geometry
    (``CLASS_CFG``); a nonzero ``rb`` forces it everywhere."""
    del gd  # batch size is derived from each class's D
    k_pad = ((max(k, 1) + 31) // 32) * 32
    kt = min(k_pad, 256)
    win = 8 * _LANE  # stripe granularity covers every class window
    max_cols = max(win, (x_vmem_bytes // (kt * 4)) // win * win)
    n_stripes = max(1, _cdiv(num_cols, max_cols))
    plans = []
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    for s in range(n_stripes):
        c0 = s * max_cols
        c1 = min((s + 1) * max_cols, num_cols)
        if n_stripes == 1:
            ids = None
            r_s, c_s, v_s = row, col, val
        else:
            m = (col >= c0) & (col < c1)
            ids = np.flatnonzero(m)
            r_s, c_s, v_s = row[ids], col[ids] - c0, val[ids]
        plans.extend(build_plan_v4mm_arrays(
            r_s, c_s, v_s, num_rows, c1 - c0, rb=rb, k=k, S=S,
            orig_ids=ids, defer_edges=defer_edges, col_offset=c0,
            classes=classes, class_cfg=class_cfg))
    return tuple(plans)


# ---------------------------------------------------------------------------
# On-device packing (deferred plans)
# ---------------------------------------------------------------------------

def _pack_v4mm_impl(edge_of_slot, group_base, block_starts, row, col,
                    val, *, D: int, rb: int, nt: int, col_offset: int):
    eos = edge_of_slot                             # ((nt+tail)*D*128,)
    n_slots = eos.shape[0]
    nslab = rb // _LANE
    ntp = n_slots // (D * _LANE)                   # nt + tail
    valid = eos >= 0
    e = jnp.where(valid, eos, 0)
    c = jnp.take(col, e) - col_offset
    v = jnp.where(valid, jnp.take(val, e), 0.0)

    idx = jnp.arange(n_slots, dtype=jnp.int32)
    grp = idx // _LANE
    trn = grp // D
    cols_l = jnp.where(valid, c - jnp.take(group_base, trn) * _LANE, 0)
    edges = jnp.stack(
        [cols_l.astype(jnp.int32),
         jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32),
         jnp.where(valid, eos, -1).astype(jnp.int32)], axis=0)
    edges = (edges.reshape(3, n_slots // _LANE, _LANE)
             .transpose(1, 0, 2))[:, :, None, :]

    # per-train meta from the d=0 plane's rows
    slot0 = (jnp.arange(ntp * _LANE, dtype=jnp.int32) // _LANE) * \
        (D * _LANE) + jnp.arange(ntp * _LANE, dtype=jnp.int32) % _LANE
    e0 = jnp.take(eos, slot0)
    lv = e0 >= 0
    r0 = jnp.take(row, jnp.where(lv, e0, 0))
    blk = (jnp.searchsorted(
        block_starts,
        jnp.minimum(jnp.arange(ntp * _LANE, dtype=jnp.int32) // _LANE,
                    nt - 1).astype(block_starts.dtype),
        side="right") - 1).astype(jnp.int32)
    lrow = jnp.where(lv, r0 - blk * rb, -1)
    lane = jnp.arange(ntp * _LANE, dtype=jnp.int32) % _LANE
    tr = jnp.arange(ntp * _LANE, dtype=jnp.int32) // _LANE

    segmask = jnp.zeros(ntp * _LANE, jnp.int32)
    for b in range(7):
        d2 = 1 << b
        rs = jnp.roll(lrow, d2)
        ts = jnp.roll(tr, d2)
        ok = (lane >= d2) & (tr == ts) & (lrow == rs) & lv \
            & (jnp.roll(lv, d2))
        segmask = segmask | (ok.astype(jnp.int32) << b)

    r_n = jnp.roll(lrow, -1)
    t_n = jnp.roll(tr, -1)
    same_next = (lane < _LANE - 1) & (tr == t_n) & (lrow == r_n) \
        & jnp.roll(lv, -1)
    final = lv & ~same_next
    pos = (tr * nslab + jnp.where(lv, lrow, 0) // _LANE) * _LANE \
        + jnp.where(lv, lrow, 0) % _LANE
    pos = jnp.where(final, pos, ntp * nslab * _LANE)
    src = jnp.full(ntp * nslab * _LANE + 1, -1, jnp.int32)
    src = src.at[pos].set(lane, mode="drop")[:-1]
    src = src.reshape(ntp, nslab, _LANE)
    meta = jnp.concatenate(
        [segmask.reshape(ntp, 1, _LANE), src], axis=1)[:, :, None, :]
    return edges, meta


_pack_v4mm = jax.jit(
    _pack_v4mm_impl, static_argnames=("D", "rb", "nt", "col_offset"))


def materialize_v4mm_edges_device(plan: MinMaxTrainPlan, row, col, val
                                  ) -> MinMaxTrainPlan:
    """Pack a deferred plan's planes on device (no-op when packed).

    ``edge_of_slot`` is retained on the materialized plan so per-call
    value substitution (:func:`replace_plan_values`) stays possible."""
    if plan.edges is not None:
        return plan
    assert plan.edge_of_slot is not None, "deferred plan lost edge_of_slot"
    edges, meta = _pack_v4mm(
        jnp.asarray(plan.edge_of_slot), jnp.asarray(plan.group_base),
        jnp.asarray(plan.block_starts), row, col, val,
        D=plan.D, rb=plan.rb, nt=plan.nt, col_offset=plan.col_offset)
    return dataclasses.replace(plan, edges=edges, meta=meta)


def replace_plan_values(plan: MinMaxTrainPlan, val) -> MinMaxTrainPlan:
    """Re-pack ONLY the value plane from a per-edge vector ``val``
    (padded CSR edge order) — lets a traced computation run the max/min
    kernel with runtime edge scalars (e.g. the fused pipeline's SDDMM
    output) without rebuilding the plan.  Requires ``edge_of_slot``."""
    assert plan.edge_of_slot is not None, (
        "value substitution needs edge_of_slot (build with "
        "defer_edges=True; device materialization retains it)")
    eos = jnp.asarray(plan.edge_of_slot)
    valid = eos >= 0
    # stop_gradient: the packed plane only affects FORWARD values; the
    # value gradient is carried by the graph's value leaf through the
    # arg-routed spmm VJP (and bitcast_convert has no AD rule anyway)
    val = jax.lax.stop_gradient(jnp.asarray(val))
    v = jnp.where(valid, jnp.take(val, jnp.where(valid, eos, 0)), 0.0)
    vplane = (jax.lax.bitcast_convert_type(v.astype(jnp.float32),
                                           jnp.int32)
              .reshape(-1, 1, 1, _LANE))
    edges = jax.lax.dynamic_update_slice(
        plan.edges, vplane, (0, 1, 0, 0))
    return dataclasses.replace(plan, edges=edges)
