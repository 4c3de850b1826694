"""Row-partitioned graphs for multi-chip SpMM.

The reference has NO distributed layer (its ``tests/dist`` is a
single-process CPU run, ``/root/reference/tests/dist/gcn/pyg-sparse.py:33``;
no torch.distributed / NCCL / MPI anywhere — SURVEY.md §2).  This module is
the graph analog of sequence parallelism, built TPU-first:

* nodes (and therefore adjacency rows and feature rows) are partitioned
  contiguously across the ``"data"`` mesh axis — each device owns
  ``rows_per_shard`` rows and the edges pointing INTO them, so the output
  needs no cross-device reduction;
* each edge's source column is remapped at partition time into a
  ``[local | halo]`` index space: the halo is filled by a single
  ``all_to_all`` of boundary node features over ICI (send lists are
  precomputed, padded, static — XLA sees fixed shapes);
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
    """Stacked per-shard COO with halo-remapped columns.

    All array leaves have leading dim ``num_shards`` and are intended to be
    sharded over the ``"data"`` mesh axis (one slice per device) inside
    ``shard_map``.

    Column index space per shard: ``[0, rows_per_shard)`` = locally owned
    x rows; ``[rows_per_shard, rows_per_shard + num_shards*halo)`` = halo
    buffer slots (position ``rows_per_shard + s*halo + k`` holds the k-th
    entry received from shard s).  Sentinel column
    ``rows_per_shard + num_shards*halo`` addresses the phantom zero row.
    """

    row: jax.Array          # (D, E) int32 — local row ids, sorted; pad=rps
    col: jax.Array          # (D, E) int32 — [local|halo] index; pad=sentinel
    value: jax.Array        # (D, E) float32 — pad 0
    deg: jax.Array          # (D, rps) float32 — true in-degree of each row
    send_ids: jax.Array     # (D, D, H) int32 — local x rows shard i sends
                            #   to shard j; pad slots point at rps (zero row)
    num_rows: int = dataclasses.field(metadata=dict(static=True))  # global
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))  # H per pair
    num_shards: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))   # global real

    @property
    def sentinel_col(self) -> int:
        return self.rows_per_shard + self.num_shards * self.halo


def partition_rows(
    row: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows: int,
    num_shards: int,
    edge_multiple: int = 512,
    halo_multiple: int = 128,
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

    sentinel = rps + d * halo
    e_max = _round_up(max(max((len(e) for e in shard_edges), default=1), 1)
                      + 1, edge_multiple)

    rows_s = np.full((d, e_max), rps, np.int32)
    cols_s = np.full((d, e_max), sentinel, np.int32)
    vals_s = np.zeros((d, e_max), np.float32)
    send_ids = np.full((d, d, halo), rps, np.int32)  # pad → zero row
    deg_s = deg_global.reshape(d, rps)

    for i in range(d):
        e = shard_edges[i]
        r = row[e] - i * rps
        c = col[e]
        v = value[e]
        # remap columns into [local | halo] space
        c_new = np.empty_like(c)
        own = c // rps
        local_mask = own == i
        c_new[local_mask] = c[local_mask] - i * rps
        for s in range(d):
            if s == i:
                continue
            m = own == s
            if not m.any():
                continue
            lst = recv_lists[i][s]
            pos = np.searchsorted(lst, c[m])
            c_new[m] = rps + s * halo + pos
        order = np.argsort(r, kind="stable")
        n = len(e)
        rows_s[i, :n] = r[order]
        cols_s[i, :n] = c_new[order]
        vals_s[i, :n] = v[order]

    # sender side: shard s sends, to receiver i, exactly recv_lists[i][s]
    # (in the same sorted order), as s-local row ids
    for s in range(d):
        for i in range(d):
            if s == i:
                continue
            lst = recv_lists[i][s]
            send_ids[s, i, : len(lst)] = (lst - s * rps).astype(np.int32)

    return ShardedGraph(
        row=jnp.asarray(rows_s),
        col=jnp.asarray(cols_s),
        value=jnp.asarray(vals_s),
        deg=jnp.asarray(deg_s),
        send_ids=jnp.asarray(send_ids),
        num_rows=num_rows,
        rows_per_shard=rps,
        halo=halo,
        num_shards=d,
        nnz=nnz,
    )
