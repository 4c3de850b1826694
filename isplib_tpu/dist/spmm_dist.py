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


def _local_spmm(row_loc, col_loc, val_loc, row_halo, col_halo, val_halo,
                deg, send_ids, x_loc, *, reduce, axis_name, rps, halo, d):
    # squeeze the per-device leading shard dim
    row_loc, col_loc, val_loc = row_loc[0], col_loc[0], val_loc[0]
    row_halo, col_halo, val_halo = row_halo[0], col_halo[0], val_halo[0]
    deg, send_ids = deg[0], send_ids[0]

    # 1. launch the boundary exchange (pad ids == rps hit the phantom row)
    send = jnp.take(_pad1(x_loc), send_ids, axis=0)   # (D, H, K)
    halo_feats = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True)
    halo_feats = halo_feats.reshape(d * halo, x_loc.shape[-1])

    # 2. local-only aggregation — independent of the collective, so XLA's
    #    latency-hiding scheduler runs it while the all_to_all flies
    # 3. halo aggregation once the exchange lands, then combine
    if reduce in (Reduce.SUM, Reduce.MEAN):
        out = xla_backend.spmm_raw(row_loc, col_loc, val_loc, deg, x_loc,
                                   rps, Reduce.SUM)
        out = out + xla_backend.spmm_raw(row_halo, col_halo, val_halo, deg,
                                         halo_feats, rps, Reduce.SUM)
        if reduce is Reduce.MEAN:
            out = out / jnp.maximum(deg, 1.0)[:, None].astype(out.dtype)
        return out

    # max/min: combine partial aggregates at the reduction identity, then
    # clamp empty rows to 0 (PyG semantics) using the global degree
    a = xla_backend.spmm_raw(row_loc, col_loc, val_loc, deg, x_loc,
                             rps, reduce, empty_to_zero=False)
    b = xla_backend.spmm_raw(row_halo, col_halo, val_halo, deg, halo_feats,
                             rps, reduce, empty_to_zero=False)
    out = jnp.maximum(a, b) if reduce is Reduce.MAX else jnp.minimum(a, b)
    return jnp.where((deg > 0)[:, None], out, jnp.zeros_like(out))


def _pad1(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)


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
        in_specs=(P(axis_name),) * 9,
        out_specs=P(axis_name),
        check_vma=False,
    )
    out = fn(sg.row_loc, sg.col_loc, sg.val_loc,
             sg.row_halo, sg.col_halo, sg.val_halo,
             sg.deg, sg.send_ids, x)
    return unpad_output(sg, out)


def _default_mesh(axis_name: str) -> Mesh:
    devs = jax.devices()
    return Mesh(np.asarray(devs), (axis_name,))
