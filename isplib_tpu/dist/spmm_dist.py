"""Multi-chip SpMM: shard_map over the "data" mesh axis with halo
all_to_all over ICI.

Forward dataflow per device (all shapes static):

    send    = x_local[send_ids]            # (D, H, K) boundary features
    halo    = all_to_all(send)             # one ICI collective
    x_cat   = [x_local ; halo]             # gather space for local edges
    out     = local SpMM over remapped COO # no cross-device reduction

Differentiation is left to JAX AD: ``all_to_all`` transposes to the
reverse exchange and the local gather transposes to a scatter-add, so
``jax.grad`` of a sharded train step produces exactly the transpose-SpMM
+ halo-return the reference's backward would need — with zero extra code.
(The reference has no distributed path at all; SURVEY.md §2.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import xla_backend
from ..ops.semiring import Reduce
from .partition import ShardedGraph

__all__ = ["spmm_sharded", "pad_features", "unpad_output", "set_mesh",
           "get_mesh"]

_MESH: Mesh | None = None


def set_mesh(mesh: Mesh | None) -> None:
    """Set the process-default mesh used when ``spmm`` receives a
    ShardedGraph without an explicit mesh (e.g. inside nn layers)."""
    global _MESH
    _MESH = mesh


def get_mesh(axis_name: str = "data") -> Mesh:
    if _MESH is not None:
        return _MESH
    return _default_mesh(axis_name)


def pad_features(sg: ShardedGraph, x: jax.Array) -> jax.Array:
    """Pad global features to the partition's padded row count
    (num_shards * rows_per_shard)."""
    total = sg.num_shards * sg.rows_per_shard
    if x.shape[0] == total:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((total - x.shape[0], x.shape[1]), x.dtype)], axis=0)


def unpad_output(sg: ShardedGraph, out: jax.Array) -> jax.Array:
    return out[: sg.num_rows]


def _local_spmm(row, col, value, deg, send_ids, x_loc, *, reduce, axis_name,
                rps, halo, d):
    # squeeze the per-device leading shard dim
    row, col, value = row[0], col[0], value[0]
    deg, send_ids = deg[0], send_ids[0]

    # boundary gather (pad ids == rps clip to the last row; those halo
    # slots are never addressed by any remapped column)
    send = jnp.take(x_loc, send_ids, axis=0)          # (D, H, K)
    halo_feats = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True)
    x_cat = jnp.concatenate(
        [x_loc, halo_feats.reshape(d * halo, x_loc.shape[-1])], axis=0)

    return xla_backend.spmm_raw(row, col, value, deg, x_cat, rps, reduce)


def spmm_sharded(
    sg: ShardedGraph,
    x: jax.Array,
    reduce: str | Reduce = "sum",
    mesh: Mesh | None = None,
    axis_name: str = "data",
) -> jax.Array:
    """SpMM over a row-partitioned graph on a device mesh.

    ``x``: global features, (num_rows or padded, K); will be padded and
    sharded over ``axis_name``.  Returns global (num_rows, K).
    """
    if mesh is None:
        mesh = get_mesh(axis_name)
    reduce = Reduce.of(reduce)
    x = pad_features(sg, x)

    fn = shard_map(
        partial(_local_spmm, reduce=reduce, axis_name=axis_name,
                rps=sg.rows_per_shard, halo=sg.halo, d=sg.num_shards),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    out = fn(sg.row, sg.col, sg.value, sg.deg, sg.send_ids, x)
    return unpad_output(sg, out)


def _default_mesh(axis_name: str) -> Mesh:
    devs = jax.devices()
    return Mesh(np.asarray(devs), (axis_name,))
