"""Sparse graph containers — the TPU-native replacement for torch_sparse.SparseTensor.

Design notes (vs reference iSpLib):

* The reference consumes ``torch_sparse.SparseTensor`` CSR triples and lazily
  caches backward operands (csr2csc permutation, rowcount, etc.) keyed on data
  pointers (``/root/reference/isplib/__init__.py:48-99``).  Under JAX, arrays
  are immutable and jit-traced, so we instead precompute *everything* the
  forward and backward passes need, eagerly, at graph construction time, and
  carry it in one frozen pytree.  Construction happens once per graph (host,
  numpy); every field is then a device array with a static shape, so a jitted
  train step traced on this pytree never retraces.

* XLA demands static shapes.  We pad the edge list up to a multiple of
  ``edge_multiple`` using a *sentinel row/col* scheme: padded edges point at
  row ``num_rows`` (a dump row that is sliced away) and column ``num_cols``
  (a phantom zero-feature node).  This mirrors the reference's sentinel
  handling for invalid argmax ids (``/root/reference/csrc/fusedmm.cpp:147-178``)
  but applies it uniformly to all reductions.

* Indices are int32 (nnz < 2^31 for all reference datasets), values float32 —
  same dtype contract as the reference (``/root/reference/csrc/fusedmm.cpp:43-44``)
  except we use int32 rather than int64 because TPU vector units operate on
  32-bit lanes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CSRGraph",
    "from_edge_index",
    "from_scipy",
    "graph_from_host_arrays",
    "pad_to_multiple",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_multiple(n: int, multiple: int) -> int:
    """Next multiple of ``multiple`` ≥ n (≥ 1 block even when n == 0)."""
    return max(_round_up(max(n, 1), multiple), multiple)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """An immutable CSR adjacency with precomputed transpose (CSC) view.

    Semantics: entry ``(r, c)`` means *edge from source c to destination r* —
    i.e. ``spmm(graph, x)[r] = reduce_{e : row[e]=r} value[e] * x[col[e]]``,
    matching ``torch_sparse.matmul(adj_t, x)`` in the reference hot path
    (``/root/reference/isplib/__init__.py:48-157``).

    Array fields (pytree leaves; all static-shaped, padded):

    * ``rowptr``  — (R+1,) int32, CSR row pointers over the *padded* edge list.
      ``rowptr[R]`` == nnz_padded; the pad edges live in the dump row R... see
      below: pad edges are appended after all real edges and belong to no real
      row, so ``rowptr`` only covers real edges (rowptr[R] == nnz) while
      ``col``/``value``/``row`` have length nnz_padded.
    * ``row``     — (E,) int32 expanded row ids; pad entries = num_rows.
    * ``col``     — (E,) int32 column ids; pad entries = num_cols.
    * ``value``   — (E,) float32 edge weights; pad entries = 0.  Implicit
      value=None in the reference becomes an explicit ones vector (the
      reference materializes the same, cached: ``isplib/__init__.py:51-57``).
    * ``csc_row`` / ``csc_col`` / ``csc_value`` — the transpose adjacency in
      the same expanded-COO form, precomputed by sorting edges by column
      (replaces the reference's lazy ``csr2csc`` permutation caches,
      ``isplib/__init__.py:66-99``).  Used by the backward pass
      (grad_x = SpMM(Aᵀ, grad_out)).
    * ``csc2csr`` — (E,) int32 permutation: position of CSC edge e in CSR
      order.  Lets the backward of max/min map argmax edge ids between views
      and lets SDDMM write grad_value back in CSR order.
    * ``deg``     — (R,) float32 row degree counts (number of real incoming
      edges per row; *unweighted* count, matching ``rowcount`` semantics in
      ``isplib/__init__.py:83-99``).
    * ``deg_t``   — (C,) float32 column degree counts (out-degree), needed by
      the mean-reduction backward.

    Static fields (aux data — not traced):

    * ``num_rows`` / ``num_cols`` — logical matrix shape.
    * ``nnz`` — number of *real* edges (≤ len(col) == padded length).
    """

    rowptr: jax.Array
    row: jax.Array
    col: jax.Array
    value: jax.Array
    csc_colptr: jax.Array
    csc_row: jax.Array
    csc_col: jax.Array
    csc_value: jax.Array
    csc2csr: jax.Array
    deg: jax.Array
    deg_t: jax.Array
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    # -- convenience ---------------------------------------------------------
    @property
    def nnz_padded(self) -> int:
        return int(self.col.shape[0])

    @property
    def shape(self) -> tuple[int, int]:
        return (self.num_rows, self.num_cols)

    def transpose(self) -> "CSRGraph":
        """The transpose graph as a first-class CSRGraph (shares buffers)."""
        return CSRGraph(
            rowptr=self.csc_colptr,
            row=self.csc_row,
            col=self.csc_col,
            value=self.csc_value,
            csc_colptr=self.rowptr,
            csc_row=self.row,
            csc_col=self.col,
            csc_value=self.value,
            csc2csr=jnp.argsort(self.csc2csr),  # inverse permutation
            deg=self.deg_t,
            deg_t=self.deg,
            num_rows=self.num_cols,
            num_cols=self.num_rows,
            nnz=self.nnz,
        )

    def with_value(self, value: jax.Array) -> "CSRGraph":
        """Replace edge values (CSR order, length nnz or nnz_padded).

        Keeps the CSC view consistent by permuting through ``csc2csr``.
        """
        if value.shape[0] == self.nnz:
            value = jnp.concatenate(
                [value.astype(jnp.float32),
                 jnp.zeros((self.nnz_padded - self.nnz,), jnp.float32)]
            )
        value = value.astype(jnp.float32)
        return dataclasses.replace(
            self, value=value, csc_value=value[self.csc2csr]
        )


# ---------------------------------------------------------------------------
# Host-side constructors (numpy; run once per graph, outside jit)
# ---------------------------------------------------------------------------

def _build_arrays(
    row: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows: int,
    num_cols: int,
    edge_multiple: int,
    sort: bool = True,
) -> dict[str, Any]:
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    nnz = int(row.shape[0])
    if value is None:
        value = np.ones(nnz, dtype=np.float32)
    else:
        value = np.asarray(value, dtype=np.float32)

    if sort and nnz:
        # CSR order: sort by (row, col).
        from .. import native
        if native.available():
            perm, _ = native.sort_csr(row, col, num_rows, num_cols)
        else:
            perm = np.lexsort((col, row))  # last key is primary
        row, col, value = row[perm], col[perm], value[perm]

    # Always ≥ 1 pad edge: code elsewhere uses edge id nnz_padded-1 as a
    # guaranteed-inert sentinel (value 0, col == num_cols, row == num_rows) —
    # the TPU-shaped analog of the reference's invalid-arg sentinel
    # (/root/reference/csrc/fusedmm.cpp:417).
    padded = _round_up(nnz + 1, edge_multiple)
    pad = padded - nnz

    row_p = np.concatenate([row, np.full(pad, num_rows, dtype=np.int64)])
    col_p = np.concatenate([col, np.full(pad, num_cols, dtype=np.int64)])
    val_p = np.concatenate([value, np.zeros(pad, dtype=np.float32)])

    rowptr = np.zeros(num_rows + 1, dtype=np.int64)
    counts = np.bincount(row, minlength=num_rows)
    rowptr[1:] = np.cumsum(counts)

    # CSC view: stable sort of the padded edge list by column keeps pad edges
    # (col == num_cols) at the end, so the pad block is shared by both views.
    from .. import native
    if native.available():
        csc_perm, _ = native.sort_csr(col_p, row_p, num_cols + 1,
                                      num_rows + 1)
        csc_perm = csc_perm.astype(np.int64)
    else:
        csc_perm = np.lexsort((row_p, col_p))
    csc_row = row_p[csc_perm]
    csc_col = col_p[csc_perm]
    csc_val = val_p[csc_perm]
    col_counts = (np.bincount(col, minlength=num_cols) if nnz
                  else np.zeros(num_cols, dtype=np.int64))
    csc_colptr = np.zeros(num_cols + 1, dtype=np.int64)
    csc_colptr[1:] = np.cumsum(col_counts)

    deg = counts.astype(np.float32)
    deg_t = col_counts.astype(np.float32)

    # All-numpy result: device conversion happens once in _to_device.
    # (Device→host readback through this environment's TPU tunnel is
    # extremely slow, so anything host-side — tiling plans, partitioning —
    # must consume these numpy forms, never np.asarray(device_array).)
    return dict(
        rowptr=rowptr.astype(np.int32),
        row=row_p.astype(np.int32),
        col=col_p.astype(np.int32),
        value=val_p.astype(np.float32),
        csc_colptr=csc_colptr.astype(np.int32),
        csc_row=csc_col.astype(np.int32),   # transpose: row' = col
        csc_col=csc_row.astype(np.int32),   # transpose: col' = row
        csc_value=csc_val.astype(np.float32),
        csc2csr=csc_perm.astype(np.int32),
        deg=deg,
        deg_t=deg_t,
        num_rows=int(num_rows),
        num_cols=int(num_cols),
        nnz=nnz,
    )


# Host-array registry: from_edge_index/from_scipy keep the numpy forms of
# each constructed graph alive (by graph identity) so later consumers —
# tiling-plan builders, the autotuner, backend='auto' upgrades — never
# read the edge arrays back through the device (catastrophically slow on
# tunneled TPUs).  Entries die with the graph (weakref.finalize).
_HOST_ARRAYS: dict = {}


def register_host_arrays(graph, arrays: dict) -> None:
    import weakref
    key = id(graph)
    _HOST_ARRAYS[key] = arrays
    weakref.finalize(graph, _HOST_ARRAYS.pop, key, None)


def host_arrays(graph):
    """The numpy construction arrays of ``graph``, if still registered."""
    return _HOST_ARRAYS.get(id(graph))


def _device_csc_impl(row, col, value):
    """CSC view computed on device.  The input is CSR-ordered (sorted by
    (row, col)), so ONE stable sort by column yields exactly the host
    ``np.lexsort((row_p, col_p))`` order — same (col, row) ranking, same
    tie-breaks for duplicate edges, pad edges (col == num_cols) at the
    end — with no composite sort key to overflow."""
    perm = jnp.argsort(col, stable=True).astype(jnp.int32)
    return (jnp.take(col, perm), jnp.take(row, perm),
            jnp.take(value, perm), perm)


_device_csc = jax.jit(_device_csc_impl)


def graph_from_host_arrays(arrays: dict, device_csc: bool = True,
                           chunked: bool = True) -> "CSRGraph":
    """CSRGraph from a ``_build_arrays`` dict, minimizing host→device
    transfer: CSR edge arrays upload (chunked); the CSC view is
    recomputed on device with one stable sort instead of shipping four
    more edge-length arrays (~55% of the graph's bytes) through the
    tunnel.  The host arrays are registered for later plan builds."""
    from ..utils.transfer import chunked_device_put
    put = chunked_device_put if chunked else jnp.asarray

    arrays = dict(arrays)
    for k in ("num_rows", "num_cols", "nnz"):
        arrays[k] = int(arrays[k])
    dev = {k: arrays[k] for k in ("num_rows", "num_cols", "nnz")}
    for k in ("rowptr", "csc_colptr", "deg", "deg_t"):
        dev[k] = put(arrays[k])
    for k in ("row", "col", "value"):
        dev[k] = put(arrays[k])
    if device_csc:
        csc_row, csc_col, csc_value, csc2csr = _device_csc(
            dev["row"], dev["col"], dev["value"])
        dev.update(csc_row=csc_row, csc_col=csc_col, csc_value=csc_value,
                   csc2csr=csc2csr)
    else:
        for k in ("csc_row", "csc_col", "csc_value", "csc2csr"):
            dev[k] = put(arrays[k])
    graph = CSRGraph(**dev)
    register_host_arrays(graph, arrays)
    return graph


def _to_device(arrays: dict) -> dict:
    out = {}
    for k, v in arrays.items():
        out[k] = jnp.asarray(v) if isinstance(v, np.ndarray) else v
    return out


def from_edge_index(
    edge_index: np.ndarray,
    num_nodes: Optional[int] = None,
    num_src_nodes: Optional[int] = None,
    edge_value: Optional[np.ndarray] = None,
    edge_multiple: int = 512,
    transposed: bool = True,
    tiling: Optional[tuple[int, int, int]] = None,
):
    """Build a CSRGraph from a (2, E) COO edge_index.

    With ``transposed=True`` (default) the result is the *transposed*
    adjacency adj_t used for message passing (dst-major), matching PyG's
    ``ToSparseTensor`` transform that the reference applies to every dataset
    (``/root/reference/tests/cpu/dataset_loader.py``): edge (src, dst) becomes
    entry (row=dst, col=src).

    With ``tiling=(rb, ct, eb)`` the result is a
    :class:`~isplib_tpu.sparse.tiling.TiledGraph` with Pallas execution
    plans built directly from the host arrays (no device round trip).
    """
    edge_index = np.asarray(edge_index)
    src, dst = edge_index[0], edge_index[1]
    if transposed:
        row, col = dst, src
    else:
        row, col = src, dst
    if num_nodes is None:
        num_nodes = int(max(row.max(initial=-1), col.max(initial=-1)) + 1)
    num_rows = num_nodes
    num_cols = num_src_nodes if num_src_nodes is not None else num_nodes
    arrays = _build_arrays(row, col, edge_value, num_rows, num_cols,
                           edge_multiple)
    return _finalize(arrays, tiling)


def from_scipy(mat, edge_multiple: int = 512,
               tiling: Optional[tuple[int, int, int]] = None):
    """Build from any scipy.sparse matrix (e.g. loaded from a .mtx file,
    the autotuner input format of the reference, ``README.md:147-168``)."""
    coo = mat.tocoo()
    arrays = _build_arrays(
        coo.row, coo.col, coo.data.astype(np.float32),
        int(coo.shape[0]), int(coo.shape[1]), edge_multiple,
    )
    return _finalize(arrays, tiling)


def _finalize(arrays: dict, tiling):
    graph = CSRGraph(**_to_device(arrays))
    register_host_arrays(graph, arrays)
    if tiling is None:
        return graph
    from .tiling import build_tiling_from_numpy  # cycle-free deferred import
    if isinstance(tiling, dict):
        # full plan config, e.g. dict(version=5, rb=512, dense_threshold=
        # 128, S=8) — the r4 default generation
        return build_tiling_from_numpy(graph, arrays, **tiling)
    rb, ct, eb = tiling  # legacy (rb, ct, eb) triple → v2 plan
    return build_tiling_from_numpy(graph, arrays, rb=rb, ct=ct, eb=eb)
