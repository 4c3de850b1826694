"""Row-partitioned graphs for multi-chip SpMM.

The reference has NO distributed layer (its ``tests/dist`` is a
single-process CPU run, ``/root/reference/tests/dist/gcn/pyg-sparse.py:33``;
no torch.distributed / NCCL / MPI anywhere — SURVEY.md §2).  This module is
the graph analog of sequence parallelism, built TPU-first:

* nodes (and therefore adjacency rows and feature rows) are partitioned
  contiguously across the ``"data"`` mesh axis — each device owns
  ``rows_per_shard`` rows and the edges pointing INTO them, so the output
  needs no cross-device reduction;
* each shard's edges are **split into a local set and a halo set**: local
  edges read only locally-owned feature rows and can be aggregated while
  the boundary-feature ``all_to_all`` is in flight (XLA's latency-hiding
  scheduler overlaps the ICI collective with the independent local SpMM);
  halo edges read the received halo buffer and are aggregated second;
* send lists are precomputed, padded, static — XLA sees fixed shapes;
* gradients flow through the exchange automatically (``all_to_all`` and
  the local gather both have transposes), so ``jax.grad`` of a sharded
  train step yields the correct reduce-scattered feature gradients.

Everything here is host-side numpy, run once per (graph, mesh size).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ShardedGraph", "partition_rows"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Stacked per-shard COO, split into local and halo edge sets.

    All array leaves have leading dim ``num_shards`` and are intended to be
    sharded over the ``"data"`` mesh axis (one slice per device) inside
    ``shard_map``.

    Local edges (``*_loc``) have columns in ``[0, rows_per_shard)``
    (sentinel ``rows_per_shard`` = phantom zero row for pads).  Halo edges
    (``*_halo``) have columns in the received-halo index space
    ``[0, num_shards*halo)`` (position ``s*halo + k`` = the k-th entry
    received from shard s; sentinel ``num_shards*halo``).

    ``plans`` (optional, built with ``partition_rows(..., tiling=...)``):
    four stacked per-shard v2 tiling plans — (local fwd, local transpose,
    halo fwd, halo transpose) — every array leaf carrying a leading
    ``num_shards`` dim with identical static shapes (chunk counts padded
    to the per-shard max with inert chunks).  With plans present, the
    sum/mean sharded SpMM runs the Pallas tiled kernels per shard instead
    of the XLA segment-sum path (VERDICT r2 next #3); edge values are
    baked into the plans and treated as constants under AD there.
    """

    row_loc: jax.Array      # (D, EL) int32 — local row ids, sorted; pad=rps
    col_loc: jax.Array      # (D, EL) int32 — locally-owned col; pad=rps
    val_loc: jax.Array      # (D, EL) float32 — pad 0
    row_halo: jax.Array     # (D, EH) int32 — local row ids; pad=rps
    col_halo: jax.Array     # (D, EH) int32 — halo-space col; pad=D*halo
    val_halo: jax.Array     # (D, EH) float32 — pad 0
    deg: jax.Array          # (D, rps) float32 — true in-degree of each row
    send_ids: jax.Array     # (D, D, H) int32 — local x rows shard i sends
                            #   to shard j; pad slots point at rps (zero row)
    num_rows: int = dataclasses.field(metadata=dict(static=True))  # global
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))  # H per pair
    num_shards: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))   # global real
    local_edges: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    halo_edges: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    plans: Optional[tuple] = None  # (loc_fwd, loc_bwd, halo_fwd, halo_bwd)

    @property
    def halo_fraction(self) -> float:
        """Fraction of real edges that need a remote feature row."""
        return self.halo_edges / max(self.nnz, 1)


def _stack_plans(plans: list):
    """Stack per-shard host (numpy-leaf) v2 plans into one plan whose
    leaves carry a leading shard dim, padding each shard's chunk list to
    the max count with inert chunks (cols 0, vals 0, rows 0 → the kernel
    adds zeros into row-block 0).  Static fields must already agree."""
    import dataclasses as dc

    nc_max = max(p.nc for p in plans)
    edges, rbl, cells = [], [], []
    for p in plans:
        e = np.asarray(p.edges)
        r = np.asarray(p.rb_locals)
        cs = np.asarray(p.cell_starts).copy()
        if p.nc < nc_max:
            pad = nc_max - p.nc
            e = np.concatenate(
                [e, np.zeros((pad,) + e.shape[1:], e.dtype)], axis=0)
            r = np.concatenate([r, np.zeros(pad, r.dtype)])
            cs[-1] = nc_max  # pad chunks live in the last grid cell
        edges.append(e)
        rbl.append(r)
        cells.append(cs)
    p0 = plans[0]
    for p in plans[1:]:
        assert (p.rb, p.ct, p.eb, p.nrb_s, p.n_super, p.kt,
                p.num_rows, p.num_cols) == \
               (p0.rb, p0.ct, p0.eb, p0.nrb_s, p0.n_super, p0.kt,
                p0.num_rows, p0.num_cols), "shard plan statics diverge"
    return dc.replace(
        p0,
        edges=np.stack(edges),
        rb_locals=np.stack(rbl),
        cell_starts=np.stack(cells),
        nc=nc_max,
        fill=float(np.mean([p.fill for p in plans])),
    )


def _build_shard_plans(loc_sets: list, halo_sets: list, rps: int,
                       halo_space: int, tiling: dict):
    """Per-shard (local fwd, local bwd, halo fwd, halo bwd) stacked
    plans.  Each set is (row, col, val) numpy arrays in shard-local
    index spaces."""
    from ..sparse.tiling_v2 import build_plan_v2_arrays

    cfg = dict(rb=tiling.get("rb", 128), ct=tiling.get("ct", 128),
               eb=tiling.get("eb", 512), k=tiling.get("k", 32),
               vmem_out_bytes=tiling.get("vmem_out_bytes", 6 << 20))

    def plan(r, c, v, nr, ncl):
        return build_plan_v2_arrays(r, c, v, nr, ncl, **cfg)

    loc_fwd, loc_bwd, halo_fwd, halo_bwd = [], [], [], []
    for (lr, lc, lv), (hr, hc, hv) in zip(loc_sets, halo_sets):
        loc_fwd.append(plan(lr, lc, lv, rps, rps))
        loc_bwd.append(plan(lc, lr, lv, rps, rps))
        halo_fwd.append(plan(hr, hc, hv, rps, halo_space))
        halo_bwd.append(plan(hc, hr, hv, halo_space, rps))
    return tuple(_stack_plans(p)
                 for p in (loc_fwd, loc_bwd, halo_fwd, halo_bwd))


def partition_rows(
    row: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows: int,
    num_shards: int,
    edge_multiple: int = 512,
    halo_multiple: int = 128,
    verbose: bool = False,
    tiling: Optional[dict] = None,
) -> ShardedGraph:
    """Partition a square adjacency by contiguous row blocks.

    Args are global COO arrays (host numpy, real edges only).  Returns the
    stacked sharded graph; features must be sharded with the same
    contiguous row partition (``P("data")`` on axis 0, padded to
    ``num_shards * rows_per_shard`` rows).
    """
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    nnz = int(row.shape[0])
    if value is None:
        value = np.ones(nnz, np.float32)
    value = np.asarray(value, np.float32)

    d = num_shards
    rps = _cdiv(num_rows, d)

    owner = row // rps  # shard owning each edge (by destination row)

    # degrees (global, unweighted) for mean semantics
    deg_global = np.bincount(row, minlength=rps * d).astype(np.float32)

    # per-shard edge lists
    shard_edges = [np.flatnonzero(owner == s) for s in range(d)]

    # halo: for each (receiver i, sender s != i), unique cols of i's edges
    # owned by s
    recv_lists: list[list[np.ndarray]] = []
    halo_max = 1
    for i in range(d):
        ci = col[shard_edges[i]]
        lists = []
        for s in range(d):
            if s == i:
                lists.append(np.empty(0, np.int64))
                continue
            mask = (ci // rps) == s
            uniq = np.unique(ci[mask])
            lists.append(uniq)
            halo_max = max(halo_max, len(uniq))
        recv_lists.append(lists)
    halo = _round_up(halo_max, halo_multiple)

    # split each shard's edges into local vs halo sets
    loc_parts, halo_parts = [], []
    for i in range(d):
        e = shard_edges[i]
        local_mask = (col[e] // rps) == i
        loc_parts.append(e[local_mask])
        halo_parts.append(e[~local_mask])
    n_loc = sum(len(p) for p in loc_parts)
    n_halo = nnz - n_loc

    el_max = _round_up(max(max((len(p) for p in loc_parts), default=1), 1)
                       + 1, edge_multiple)
    eh_max = _round_up(max(max((len(p) for p in halo_parts), default=1), 1)
                       + 1, edge_multiple)

    halo_sentinel = d * halo
    row_loc = np.full((d, el_max), rps, np.int32)
    col_loc = np.full((d, el_max), rps, np.int32)   # phantom local row
    val_loc = np.zeros((d, el_max), np.float32)
    row_halo = np.full((d, eh_max), rps, np.int32)
    col_halo = np.full((d, eh_max), halo_sentinel, np.int32)
    val_halo = np.zeros((d, eh_max), np.float32)
    send_ids = np.full((d, d, halo), rps, np.int32)  # pad → zero row
    deg_s = deg_global.reshape(d, rps)

    loc_sets, halo_sets = [], []
    for i in range(d):
        e = loc_parts[i]
        r = (row[e] - i * rps)
        order = np.argsort(r, kind="stable")
        n = len(e)
        row_loc[i, :n] = r[order]
        col_loc[i, :n] = (col[e] - i * rps)[order]
        val_loc[i, :n] = value[e][order]
        loc_sets.append((row_loc[i, :n].astype(np.int64),
                         col_loc[i, :n].astype(np.int64),
                         val_loc[i, :n].copy()))

        e = halo_parts[i]
        r = (row[e] - i * rps)
        c = col[e]
        own = c // rps
        c_new = np.empty_like(c)
        for s in range(d):
            if s == i:
                continue
            m = own == s
            if not m.any():
                continue
            lst = recv_lists[i][s]
            pos = np.searchsorted(lst, c[m])
            c_new[m] = s * halo + pos
        order = np.argsort(r, kind="stable")
        n = len(e)
        row_halo[i, :n] = r[order]
        col_halo[i, :n] = c_new[order]
        val_halo[i, :n] = value[e][order]
        halo_sets.append((row_halo[i, :n].astype(np.int64),
                          col_halo[i, :n].astype(np.int64),
                          val_halo[i, :n].copy()))

    # sender side: shard s sends, to receiver i, exactly recv_lists[i][s]
    # (in the same sorted order), as s-local row ids
    for s in range(d):
        for i in range(d):
            if s == i:
                continue
            lst = recv_lists[i][s]
            send_ids[s, i, : len(lst)] = (lst - s * rps).astype(np.int32)

    if verbose:
        import sys
        print(f"[isplib_tpu.dist] partition: {d} shards, rps={rps}, "
              f"halo={halo}/pair, local_edges={n_loc} "
              f"halo_edges={n_halo} ({100 * n_halo / max(nnz, 1):.1f}%)",
              file=sys.stderr)

    plans = None
    if tiling is not None:
        from ..utils.transfer import tree_device_put
        plans = tree_device_put(_build_shard_plans(
            loc_sets, halo_sets, rps, halo_sentinel, dict(tiling)))

    return ShardedGraph(
        row_loc=jnp.asarray(row_loc),
        col_loc=jnp.asarray(col_loc),
        val_loc=jnp.asarray(val_loc),
        row_halo=jnp.asarray(row_halo),
        col_halo=jnp.asarray(col_halo),
        val_halo=jnp.asarray(val_halo),
        deg=jnp.asarray(deg_s),
        send_ids=jnp.asarray(send_ids),
        num_rows=num_rows,
        rows_per_shard=rps,
        halo=halo,
        num_shards=d,
        nnz=nnz,
        local_edges=n_loc,
        halo_edges=n_halo,
        plans=plans,
    )
