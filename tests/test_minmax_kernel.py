"""In-kernel max/min SpMM with arg outputs vs the XLA oracle.

Matches the reference's AOP_MAX/AOP_MIN + z_arg contract
(``/root/reference/csrc/fusedmm.cpp:397-407``): lowest-edge-id
tie-break, sentinel ``nnz_padded - 1`` for empty rows, 0 output for
empty rows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu.ops.semiring import Reduce
from isplib_tpu.ops import xla_backend
from isplib_tpu.ops.spmm import spmm
from isplib_tpu.sparse.graph import from_edge_index
from isplib_tpu.sparse.tiling import build_tiling
from isplib_tpu.kernels.spmm_minmax import spmm_minmax_tiled


def _graph(seed=0, n=300, e=6000, with_empty_rows=True, tie_values=False):
    rng = np.random.default_rng(seed)
    hi = n - 40 if with_empty_rows else n  # leave rows [n-40, n) empty
    dst = rng.integers(0, hi, e)
    src = rng.integers(0, n, e)
    if tie_values:
        val = np.ones(e, np.float32)  # ties everywhere → arg stress
    else:
        val = rng.normal(size=e).astype(np.float32)
    g = from_edge_index(np.stack([src, dst]), num_nodes=n, edge_value=val)
    return g


@pytest.mark.parametrize("reduce", ["max", "min"])
@pytest.mark.parametrize("ties", [False, True])
def test_minmax_kernel_vs_oracle(reduce, ties):
    g = _graph(tie_values=ties)
    tg = build_tiling(g, rb=128, ct=128, eb=256, build_minmax=True)
    rng = np.random.default_rng(1)
    k = 32
    x = jnp.asarray(rng.normal(size=(g.num_cols, k)).astype(np.float32))
    if ties:
        # quantized features → frequent value ties across edges
        x = jnp.round(x)

    want, want_arg = xla_backend.spmm_arg_raw(
        g.row, g.col, g.value, g.deg, x, g.num_rows, Reduce.of(reduce))
    got, got_arg = spmm_minmax_tiled(tg.fwd_arg, x, reduce,
                                     g.nnz_padded - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    # args must agree exactly (incl. the lowest-edge-id tie-break)
    np.testing.assert_array_equal(np.asarray(got_arg), np.asarray(want_arg))


def test_minmax_empty_rows_sentinel():
    g = _graph(with_empty_rows=True)
    tg = build_tiling(g, rb=128, ct=128, eb=256, build_minmax=True)
    x = jnp.asarray(np.random.default_rng(2)
                    .normal(size=(g.num_cols, 8)).astype(np.float32))
    got, got_arg = spmm_minmax_tiled(tg.fwd_arg, x, "max", g.nnz_padded - 1)
    deg = np.asarray(g.deg)
    empty = deg == 0
    assert empty.any()
    assert np.all(np.asarray(got)[empty] == 0.0)
    assert np.all(np.asarray(got_arg)[empty] == g.nnz_padded - 1)


@pytest.mark.parametrize("k", [8, 40, 300])
def test_minmax_k_widths(k):
    g = _graph(e=3000)
    tg = build_tiling(g, rb=128, ct=128, eb=256, build_minmax=True)
    x = jnp.asarray(np.random.default_rng(3)
                    .normal(size=(g.num_cols, k)).astype(np.float32))
    want, want_arg = xla_backend.spmm_arg_raw(
        g.row, g.col, g.value, g.deg, x, g.num_rows, Reduce.MAX)
    got, got_arg = spmm_minmax_tiled(tg.fwd_arg, x, "max", g.nnz_padded - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(got_arg), np.asarray(want_arg))


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_minmax_grad_through_dispatch(reduce):
    """spmm(tg, x, 'max', backend='pallas') forwards through the kernel
    and backwards through the saved args — gradient must equal the XLA
    path's."""
    g = _graph(e=4000)
    tg = build_tiling(g, rb=128, ct=128, eb=256, build_minmax=True)
    x = jnp.asarray(np.random.default_rng(4)
                    .normal(size=(g.num_cols, 16)).astype(np.float32))

    out_k = spmm(tg, x, reduce=reduce, backend="pallas")
    out_x = spmm(g, x, reduce=reduce, backend="xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=5e-3, atol=5e-3)

    f = lambda graph, xx: (spmm(graph, xx, reduce=reduce,
                                backend="pallas") ** 2).sum()
    gx = jax.grad(f, argnums=1)(tg, x)
    gx_ref = jax.grad(
        lambda xx: (spmm(g, xx, reduce=reduce, backend="xla") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=5e-3, atol=5e-3)
