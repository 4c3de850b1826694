"""CSRGraph construction invariants."""

import numpy as np
import jax
import pytest

from isplib_tpu import CSRGraph, from_edge_index, from_scipy


def test_padding_and_sentinels(rng):
    src = rng.integers(0, 10, 30)
    dst = rng.integers(0, 10, 30)
    g = from_edge_index(np.stack([src, dst]), num_nodes=10, edge_multiple=64)
    assert g.nnz_padded == 64
    assert g.nnz_padded > g.nnz  # ≥1 pad edge guaranteed (sentinel slot)
    row, col, val = map(np.asarray, (g.row, g.col, g.value))
    assert (row[g.nnz:] == 10).all()
    assert (col[g.nnz:] == 10).all()
    assert (val[g.nnz:] == 0).all()
    # CSR sorted
    assert (np.diff(row[: g.nnz]) >= 0).all()
    # rowptr consistency
    rowptr = np.asarray(g.rowptr)
    assert rowptr[-1] == g.nnz
    for r in range(10):
        assert (row[rowptr[r]:rowptr[r + 1]] == r).all()


def test_csc_view_consistency(rng):
    src = rng.integers(0, 15, 50)
    dst = rng.integers(0, 12, 50)
    g = from_edge_index(np.stack([src, dst]), num_nodes=12,
                        num_src_nodes=15, edge_multiple=64)
    row, col, val = map(np.asarray, (g.row, g.col, g.value))
    cr, cc, cv, perm = map(np.asarray,
                           (g.csc_row, g.csc_col, g.csc_value, g.csc2csr))
    # csc arrays are the CSR arrays permuted (transpose roles swapped)
    assert (cr == col[perm]).all()
    assert (cc == row[perm]).all()
    assert (cv == val[perm]).all()
    # sorted by csc_row (the transpose's rows)
    assert (np.diff(cr[: g.nnz]) >= 0).all()
    # degrees
    deg = np.asarray(g.deg)
    assert deg.sum() == g.nnz
    assert np.asarray(g.deg_t).sum() == g.nnz


def test_with_value_permutes_csc(rng):
    src = rng.integers(0, 9, 25)
    dst = rng.integers(0, 9, 25)
    g = from_edge_index(np.stack([src, dst]), num_nodes=9, edge_multiple=32)
    new_vals = rng.normal(size=g.nnz).astype(np.float32)
    g2 = g.with_value(new_vals)
    val2 = np.asarray(g2.value)
    np.testing.assert_array_equal(val2[: g.nnz], new_vals)
    np.testing.assert_array_equal(val2[g.nnz:], 0)
    np.testing.assert_array_equal(
        np.asarray(g2.csc_value), val2[np.asarray(g.csc2csr)])


def test_from_scipy():
    sp = pytest.importorskip("scipy.sparse")
    m = sp.random(20, 30, density=0.1, format="csr", random_state=0)
    g = from_scipy(m)
    assert g.shape == (20, 30)
    assert g.nnz == m.nnz
    dense = np.zeros((20, 30), np.float32)
    dense[np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz]] = \
        np.asarray(g.value)[: g.nnz]
    np.testing.assert_allclose(dense, m.toarray(), rtol=1e-6)


def test_graph_is_pytree(rng):
    src = rng.integers(0, 8, 20)
    dst = rng.integers(0, 8, 20)
    g = from_edge_index(np.stack([src, dst]), num_nodes=8, edge_multiple=32)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    assert len(leaves) == 11
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.num_rows == g.num_rows and g2.nnz == g.nnz


def test_empty_graph():
    g = from_edge_index(np.zeros((2, 0), np.int64), num_nodes=5,
                        edge_multiple=32)
    assert g.nnz == 0
    assert g.nnz_padded == 32


def test_device_csc_matches_host(rng):
    """graph_from_host_arrays recomputes the CSC view on device with one
    stable sort; it must match the host lexsort bit-for-bit (plans built
    from the host CSC arrays index into the device CSC view)."""
    from isplib_tpu.sparse.graph import (_build_arrays,
                                         graph_from_host_arrays)
    n = 400
    e = 5000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    # inject duplicate edges to exercise stable tie-breaking
    row[:100] = row[100:200]
    col[:100] = col[100:200]
    val = rng.normal(size=e).astype(np.float32)
    arrays = _build_arrays(row, col, val, n, n, 256)
    g = graph_from_host_arrays(arrays)
    for k in ("csc_row", "csc_col", "csc_value", "csc2csr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g, k)), arrays[k], err_msg=k)
