"""v5 hybrid (BSR2 + static-S stream) vs the XLA oracle (interpret mode
on CPU; the same code path compiles to Mosaic on a real chip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu import from_edge_index, spmm
from isplib_tpu.kernels.spmm_bsr2 import spmm_bsr2, spmm_hybrid_v5
from isplib_tpu.ops import xla_backend
from isplib_tpu.ops.semiring import Reduce
from isplib_tpu.sparse.tiling import build_tiling_from_numpy
from isplib_tpu.sparse.tiling_v5 import (HybridPlanV5,
                                         build_plan_v5_arrays,
                                         materialize_v5_device)


def assert_close_bf16(got, want):
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)


def dense_oracle(row, col, val, num_rows, num_cols, x):
    a = np.zeros((num_rows, num_cols), np.float64)
    np.add.at(a, (row, col), val)
    return a @ np.asarray(x, np.float64)


def make_hub_coo(rng, num_rows, num_cols, nnz, hub_frac=0.5):
    """Half the edges land in a dense corner (gets densified), half
    spread uniformly (stays in the stream residual)."""
    nh = int(nnz * hub_frac)
    row = np.concatenate([rng.integers(0, min(256, num_rows), nh),
                          rng.integers(0, num_rows, nnz - nh)])
    col = np.concatenate([rng.integers(0, min(256, num_cols), nh),
                          rng.integers(0, num_cols, nnz - nh)])
    val = rng.normal(size=nnz).astype(np.float32)
    return row.astype(np.int64), col.astype(np.int64), val


@pytest.mark.parametrize("thr", [64, 600])
def test_v5_hybrid_vs_oracle(rng, thr):
    num_rows, num_cols, nnz = 500, 460, 8000
    row, col, val = make_hub_coo(rng, num_rows, num_cols, nnz)
    plan = build_plan_v5_arrays(row, col, val, num_rows, num_cols,
                                rb=128, dense_threshold=thr, S=2, g=4)
    assert plan.dense_edges + plan.sparse_edges == nnz
    if thr == 600:  # hub corner dense, uniform tail sparse
        assert plan.dense_edges > 0 and plan.sparse_edges > 0
    x = rng.normal(size=(num_cols, 32)).astype(np.float32)
    got = spmm_hybrid_v5(plan, jnp.asarray(x))
    want = dense_oracle(row, col, val, num_rows, num_cols, x)
    assert got.shape == (num_rows, 32)
    assert_close_bf16(got, want)


def test_v5_stripes(rng):
    """Tiny x_vmem budget forces multiple column stripes."""
    num_rows, num_cols, nnz = 300, 1500, 6000
    row, col, val = make_hub_coo(rng, num_rows, num_cols, nnz)
    plan = build_plan_v5_arrays(row, col, val, num_rows, num_cols,
                                rb=128, dense_threshold=32, S=2, g=4,
                                x_vmem_bytes=32 * 512 * 4)
    assert len(plan.stripe_bounds) >= 2
    x = rng.normal(size=(num_cols, 32)).astype(np.float32)
    got = spmm_hybrid_v5(plan, jnp.asarray(x))
    want = dense_oracle(row, col, val, num_rows, num_cols, x)
    assert_close_bf16(got, want)


def test_v5_all_dense_and_all_sparse(rng):
    num_rows = num_cols = 256
    nnz = 4000
    row = rng.integers(0, num_rows, nnz).astype(np.int64)
    col = rng.integers(0, num_cols, nnz).astype(np.int64)
    val = rng.normal(size=nnz).astype(np.float32)
    x = rng.normal(size=(num_cols, 32)).astype(np.float32)
    want = dense_oracle(row, col, val, num_rows, num_cols, x)
    for thr in (1, 10 ** 9):  # everything dense / everything sparse
        plan = build_plan_v5_arrays(row, col, val, num_rows, num_cols,
                                    rb=128, dense_threshold=thr, S=2, g=4)
        got = spmm_hybrid_v5(plan, jnp.asarray(x))
        assert_close_bf16(got, want)
    empty = build_plan_v5_arrays(
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.float32), num_rows, num_cols, rb=128)
    out = spmm_hybrid_v5(empty, jnp.asarray(x))
    assert np.allclose(np.asarray(out), 0.0)


def test_v5_deferred_matches_host(rng):
    num_rows = num_cols = 384
    nnz = 5000
    row, col, val = make_hub_coo(rng, num_rows, num_cols, nnz)
    order = np.lexsort((col, row))
    row, col, val = row[order], col[order], val[order]
    host = build_plan_v5_arrays(row, col, val, num_rows, num_cols,
                                rb=128, dense_threshold=16, S=2, g=4)
    deferred = build_plan_v5_arrays(row, col, val, num_rows, num_cols,
                                    rb=128, dense_threshold=16, S=2, g=4,
                                    defer_edges=True)
    mat = materialize_v5_device(
        deferred, jnp.asarray(row.astype(np.int32)),
        jnp.asarray(col.astype(np.int32)), jnp.asarray(val))
    x = rng.normal(size=(num_cols, 32)).astype(np.float32)
    got_h = spmm_hybrid_v5(host, jnp.asarray(x))
    got_d = spmm_hybrid_v5(mat, jnp.asarray(x))
    # blocks: bf16 rounding identical on both paths; edges: exact
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(got_d),
                               rtol=1e-5, atol=1e-5)


def test_v5_through_spmm_dispatch(rng):
    """version=5 TiledGraph: forward + backward through spmm()."""
    num_rows = num_cols = 300
    nnz = 4000
    src = rng.integers(0, num_cols, size=nnz)
    dst = rng.integers(0, num_rows, size=nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    g = from_edge_index(np.stack([src, dst]), num_nodes=num_rows,
                        edge_value=vals, edge_multiple=256)
    from isplib_tpu.sparse.graph import host_arrays
    arrays = host_arrays(g)
    tg = build_tiling_from_numpy(g, arrays, rb=128, version=5,
                                 device=False, dense_threshold=16, S=2)
    assert isinstance(tg.fwd, HybridPlanV5)
    x = jnp.asarray(rng.normal(size=(num_cols, 32)).astype(np.float32))
    got = spmm(tg, x, reduce="sum", backend="pallas")
    want = xla_backend.spmm_raw(g.row, g.col, g.value, g.deg, x,
                                g.num_rows, Reduce.SUM)
    assert_close_bf16(got, np.asarray(want))

    f = lambda x_: jnp.sum(spmm(tg, x_, reduce="sum", backend="pallas") ** 2)
    fx = lambda x_: jnp.sum(spmm(g, x_, reduce="sum", backend="xla") ** 2)
    gx = jax.grad(f)(x)
    gw = jax.grad(fx)(x)
    assert_close_bf16(gx, np.asarray(gw))
