"""v4 row-stream plan + kernel vs the XLA oracle (interpret mode on CPU;
the same code path compiles to Mosaic on a real chip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu import from_edge_index, spmm
from isplib_tpu.kernels.spmm_pallas_v4 import spmm_stream_v4
from isplib_tpu.ops import xla_backend
from isplib_tpu.ops.semiring import Reduce
from isplib_tpu.sparse.tiling import build_tiling_from_numpy
from isplib_tpu.sparse.tiling_v4 import (StreamPlanV4, build_plan_v4_arrays,
                                         materialize_v4_edges_device)


def assert_close_bf16(got, want):
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)


def make_coo(rng, num_rows, num_cols, nnz):
    row = rng.integers(0, num_rows, size=nnz).astype(np.int64)
    col = rng.integers(0, num_cols, size=nnz).astype(np.int64)
    val = rng.normal(size=nnz).astype(np.float32)
    return row, col, val


def dense_oracle(row, col, val, num_rows, num_cols, x):
    a = np.zeros((num_rows, num_cols), np.float64)
    np.add.at(a, (row, col), val)
    return a @ np.asarray(x, np.float64)


@pytest.mark.parametrize("rb", [128, 256])
@pytest.mark.parametrize("shape,nnz", [((300, 280), 2000), ((513, 130), 700)])
def test_v4_plan_invariants(rng, rb, shape, nnz):
    num_rows, num_cols = shape
    row, col, val = make_coo(rng, num_rows, num_cols, nnz)
    plan = build_plan_v4_arrays(row, col, val, num_rows, num_cols, rb=rb)

    edges = np.asarray(plan.edges)
    base = np.asarray(plan.group_base)
    bs = np.asarray(plan.block_starts)
    assert bs[-1] == plan.ng
    cols_l = edges[:, 0, 0]
    vals_p = edges[:, 1, 0].view(np.float32)
    rows_l = edges[:, 2, 0]
    assert (rows_l >= 0).all() and (rows_l < rb).all()
    # every real edge appears exactly once with its value
    assert (vals_p != 0).sum() == nnz - (val == 0).sum()
    # reconstruct global COO: group g belongs to block b where
    # bs[b] <= g < bs[b+1]; col = base[g]*128 + local
    blk_of_group = np.searchsorted(bs, np.arange(plan.ng), side="right") - 1
    got = []
    for g in range(plan.ng):
        live = vals_p[g] != 0
        gr = blk_of_group[g] * rb + rows_l[g][live]
        gc = base[g] * 128 + cols_l[g][live]
        assert (cols_l[g][live] >= 0).all()
        assert (cols_l[g][live] < plan.S * 128).all()
        got.extend(zip(gr.tolist(), gc.tolist(), vals_p[g][live].tolist()))
    want = sorted(zip(row.tolist(), col.tolist(), val.tolist()))
    assert sorted(got) == [w for w in want if w[2] != 0]


@pytest.mark.parametrize("rb", [128, 256])
@pytest.mark.parametrize("k", [32, 48])
def test_v4_kernel_vs_oracle(rng, rb, k):
    num_rows, num_cols, nnz = 500, 420, 6000
    row, col, val = make_coo(rng, num_rows, num_cols, nnz)
    plan = build_plan_v4_arrays(row, col, val, num_rows, num_cols, rb=rb)
    x = rng.normal(size=(num_cols, k)).astype(np.float32)
    got = spmm_stream_v4(plan, jnp.asarray(x))
    want = dense_oracle(row, col, val, num_rows, num_cols, x)
    assert got.shape == (num_rows, k)
    assert_close_bf16(got, want)


def test_v4_empty_blocks_and_hubs(rng):
    """Rows 128..255 empty; one hub column catches half the edges."""
    num_rows, num_cols, nnz = 400, 300, 3000
    row = np.concatenate([rng.integers(0, 128, nnz // 2),
                          rng.integers(256, 400, nnz - nnz // 2)])
    col = np.concatenate([np.full(nnz // 2, 7),
                          rng.integers(0, 300, nnz - nnz // 2)])
    val = rng.normal(size=nnz).astype(np.float32)
    plan = build_plan_v4_arrays(row, col, val, num_rows, num_cols, rb=128)
    x = rng.normal(size=(num_cols, 32)).astype(np.float32)
    got = spmm_stream_v4(plan, jnp.asarray(x))
    want = dense_oracle(row, col, val, num_rows, num_cols, x)
    assert_close_bf16(got, want)


def test_v4_deferred_matches_host_packed(rng):
    num_rows = num_cols = 350
    nnz = 4000
    row, col, val = make_coo(rng, num_rows, num_cols, nnz)
    host = build_plan_v4_arrays(row, col, val, num_rows, num_cols, rb=128)
    deferred = build_plan_v4_arrays(row, col, val, num_rows, num_cols,
                                    rb=128, defer_edges=True)
    assert deferred.edges is None
    mat = materialize_v4_edges_device(
        deferred, jnp.asarray(row.astype(np.int32)),
        jnp.asarray(col.astype(np.int32)), jnp.asarray(val))
    np.testing.assert_array_equal(np.asarray(mat.edges),
                                  np.asarray(host.edges))


def test_v4_through_spmm_dispatch(rng):
    """version=4 TiledGraph: forward + backward through spmm()."""
    num_rows = num_cols = 260
    nnz = 2500
    src = rng.integers(0, num_cols, size=nnz)
    dst = rng.integers(0, num_rows, size=nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    g = from_edge_index(np.stack([src, dst]), num_nodes=num_rows,
                        edge_value=vals, edge_multiple=256)
    from isplib_tpu.sparse.graph import host_arrays
    arrays = host_arrays(g)
    tg = build_tiling_from_numpy(g, arrays, rb=128, version=4,
                                 device=False)
    assert isinstance(tg.fwd, StreamPlanV4)
    assert isinstance(tg.bwd, StreamPlanV4)
    x = jnp.asarray(rng.normal(size=(num_cols, 32)).astype(np.float32))
    got = spmm(tg, x, reduce="sum", backend="pallas")
    want = xla_backend.spmm_raw(g.row, g.col, g.value, g.deg, x,
                                g.num_rows, Reduce.SUM)
    assert_close_bf16(got, np.asarray(want))

    # backward grad_x runs the transpose v4 plan
    f = lambda x_: jnp.sum(spmm(tg, x_, reduce="sum", backend="pallas") ** 2)
    fx = lambda x_: jnp.sum(spmm(g, x_, reduce="sum", backend="xla") ** 2)
    gx = jax.grad(f)(x)
    gw = jax.grad(fx)(x)
    assert_close_bf16(gx, np.asarray(gw))
