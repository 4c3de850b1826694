"""Graph transforms (host-side, run once per graph).

The reference relies on PyG transforms: ``ToSparseTensor`` at load time
(``/root/reference/tests/cpu/dataset_loader.py:10``) and ``T.GCNNorm`` on
the compile path (``/root/reference/tests/cpu/gcn-compile.py:45``).  Here
transforms are plain functions CSRGraph → CSRGraph, built with numpy since
they run exactly once, outside jit.
"""

from __future__ import annotations

import numpy as np

from ..sparse.graph import CSRGraph, from_edge_index

__all__ = ["gcn_norm", "add_self_loops", "row_normalize"]


def _coo(graph: CSRGraph):
    row = np.asarray(graph.row)[: graph.nnz]
    col = np.asarray(graph.col)[: graph.nnz]
    val = np.asarray(graph.value)[: graph.nnz]
    return row, col, val


def add_self_loops(graph: CSRGraph, fill_value: float = 1.0,
                   edge_multiple: int = 512) -> CSRGraph:
    """A + fill·I (square graphs only)."""
    assert graph.num_rows == graph.num_cols
    row, col, val = _coo(graph)
    loop = np.arange(graph.num_rows)
    has_loop = np.zeros(graph.num_rows, bool)
    has_loop[row[row == col]] = True
    new = loop[~has_loop]
    row = np.concatenate([row, new])
    col = np.concatenate([col, new])
    val = np.concatenate([val, np.full(new.shape, fill_value, np.float32)])
    return from_edge_index(
        np.stack([col, row]), num_nodes=graph.num_rows, edge_value=val,
        edge_multiple=edge_multiple,
    )


def gcn_norm(graph: CSRGraph, add_loops: bool = True,
             edge_multiple: int = 512) -> CSRGraph:
    """Â = D^{-1/2} (A + I) D^{-1/2} — PyG ``gcn_norm`` semantics.

    The reference's compile-path baseline applies this via ``T.GCNNorm``;
    its dynamic-shape self-loop insertion is exactly what breaks
    torch.compile there (``/root/reference/tests/cpu/tmp/error.log``).
    Done offline in numpy, the jitted train step never sees dynamic shapes.
    """
    if add_loops:
        graph = add_self_loops(graph, 1.0, edge_multiple)
    row, col, val = _coo(graph)
    deg = np.zeros(graph.num_rows, np.float64)
    np.add.at(deg, row, val.astype(np.float64))
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    dinv[deg <= 0] = 0.0
    new_val = (dinv[row] * val * dinv[col]).astype(np.float32)
    return from_edge_index(
        np.stack([col, row]), num_nodes=graph.num_rows, edge_value=new_val,
        edge_multiple=edge_multiple,
    )


def row_normalize(graph: CSRGraph, edge_multiple: int = 512) -> CSRGraph:
    """Â = D^{-1} A (random-walk normalization)."""
    row, col, val = _coo(graph)
    deg = np.zeros(graph.num_rows, np.float64)
    np.add.at(deg, row, val.astype(np.float64))
    dinv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    new_val = (dinv[row] * val).astype(np.float32)
    return from_edge_index(
        np.stack([col, row]), num_nodes=graph.num_rows, edge_value=new_val,
        edge_multiple=edge_multiple,
    )
