"""Native (C++/OpenMP) preprocessing vs the numpy reference paths."""

import numpy as np
import pytest

from isplib_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library not built (python -m isplib_tpu.native.build)")


def test_sort_csr_matches_lexsort(rng):
    nnz = 5000
    row = rng.integers(0, 300, nnz).astype(np.int64)
    col = rng.integers(0, 400, nnz).astype(np.int64)
    order, rowptr = native.sort_csr(row, col, 300, 400)
    want = np.lexsort((col, row))
    # stable sorts agree exactly
    np.testing.assert_array_equal(order, want)
    counts = np.bincount(row, minlength=300)
    np.testing.assert_array_equal(np.diff(rowptr), counts)


def test_graph_build_native_vs_numpy(rng, monkeypatch):
    from isplib_tpu.sparse import graph as graph_mod
    src = rng.integers(0, 150, 2000)
    dst = rng.integers(0, 150, 2000)
    vals = rng.normal(size=2000).astype(np.float32)

    g_native = graph_mod.from_edge_index(
        np.stack([src, dst]), num_nodes=150, edge_value=vals,
        edge_multiple=256)
    monkeypatch.setattr(native, "available", lambda: False)
    g_numpy = graph_mod.from_edge_index(
        np.stack([src, dst]), num_nodes=150, edge_value=vals,
        edge_multiple=256)

    for field in ("rowptr", "row", "col", "value", "csc_colptr", "csc_row",
                  "csc_col", "csc_value", "csc2csr", "deg", "deg_t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_native, field)),
            np.asarray(getattr(g_numpy, field)), err_msg=field)


def test_plan_native_vs_numpy(rng, monkeypatch):
    from isplib_tpu.sparse import graph as graph_mod
    from isplib_tpu.sparse.tiling import build_tiling_from_numpy
    src = rng.integers(0, 300, 4000)
    dst = rng.integers(0, 300, 4000)
    arrays = graph_mod._build_arrays(dst, src, None, 300, 300, 256)
    g = graph_mod.CSRGraph(**graph_mod._to_device(arrays))

    tg_native = build_tiling_from_numpy(g, arrays, rb=128, ct=128, eb=128,
                                        version=1)
    monkeypatch.setattr(native, "available", lambda: False)
    tg_numpy = build_tiling_from_numpy(g, arrays, rb=128, ct=128, eb=128,
                                       version=1)

    pn, pp = tg_native.fwd, tg_numpy.fwd
    assert pn.nc == pp.nc
    np.testing.assert_array_equal(np.asarray(pn.chunk_starts),
                                  np.asarray(pp.chunk_starts))
    np.testing.assert_array_equal(np.asarray(pn.rb_ids),
                                  np.asarray(pp.rb_ids))
    # chunk contents may order pad slots identically too (both stable)
    np.testing.assert_array_equal(np.asarray(pn.edges),
                                  np.asarray(pp.edges))
    np.testing.assert_array_equal(np.asarray(pn.ct_ids),
                                  np.asarray(pp.ct_ids))


def test_rmat_native_shape_and_determinism():
    s1, d1 = native.rmat(10000, 1024, seed=7)
    s2, d2 = native.rmat(10000, 1024, seed=7)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)
    assert s1.min() >= 0 and s1.max() < 1024
    # power-law-ish: max degree far above mean
    deg = np.bincount(d1, minlength=1024)
    assert deg.max() > 5 * deg.mean()


def test_plan_v2_native_vs_numpy(rng, monkeypatch):
    from isplib_tpu.sparse import graph as graph_mod
    from isplib_tpu.sparse.tiling_v2 import build_plan_v2_arrays
    if not (native.available() and native.has_plan_v2()):
        pytest.skip("native v2 plan builder not built")
    src = rng.integers(0, 700, 6000)
    dst = rng.integers(0, 700, 6000)
    arrays = graph_mod._build_arrays(dst, src, None, 700, 700, 256)
    nnz = 6000
    row = arrays["row"][:nnz].astype(np.int64)
    col = arrays["col"][:nnz].astype(np.int64)
    val = arrays["value"][:nnz].astype(np.float32)

    pn = build_plan_v2_arrays(row, col, val, 700, 700, rb=128, ct=128,
                              eb=128, k=16, vmem_out_bytes=2 * 32 * 128 * 4)
    monkeypatch.setattr(native, "available", lambda: False)
    pp = build_plan_v2_arrays(row, col, val, 700, 700, rb=128, ct=128,
                              eb=128, k=16, vmem_out_bytes=2 * 32 * 128 * 4)
    assert pn.nc == pp.nc and pn.n_super == pp.n_super
    np.testing.assert_array_equal(np.asarray(pn.cell_starts),
                                  np.asarray(pp.cell_starts))
    np.testing.assert_array_equal(np.asarray(pn.rb_locals),
                                  np.asarray(pp.rb_locals))
    np.testing.assert_array_equal(np.asarray(pn.edges),
                                  np.asarray(pp.edges))
