"""r5 train-structured max/min kernel vs the XLA oracle.

Covers the class-depth train plans (:mod:`isplib_tpu.sparse.tiling_v4mm`)
and :func:`isplib_tpu.kernels.spmm_minmax_v4.spmm_minmax_v4`: exact f32
values, exact lowest-edge-id args (torch_scatter contract), hub rows
(deep vertical folds), deferred on-device packing, column stripes, and
runtime value substitution.  Reference contract:
``/root/reference/csrc/fusedmm.cpp:386-518,397-407``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu.ops.semiring import Reduce
from isplib_tpu.ops import xla_backend
from isplib_tpu.sparse.graph import from_edge_index
from isplib_tpu.sparse.tiling_v4mm import (build_minmax_stripes,
                                           materialize_v4mm_edges_device,
                                           replace_plan_values)
from isplib_tpu.kernels.spmm_minmax_v4 import spmm_minmax_v4


def _graph(seed=0, n=300, e=6000, ties=False, hub=False, empty=True):
    rng = np.random.default_rng(seed)
    hi = n - 40 if empty else n
    dst = rng.integers(0, hi, e)
    src = rng.integers(0, n, e)
    if hub:  # route half the edges into 3 hub destination rows
        m = rng.random(e) < 0.5
        dst[m] = rng.integers(0, 3, m.sum())
    val = (np.ones(e, np.float32) if ties
           else rng.normal(size=e).astype(np.float32))
    return from_edge_index(np.stack([src, dst]), num_nodes=n,
                           edge_value=val), rng


def _check(g, plans, rng, red="max", k=32, ties=False, rtol=1e-6):
    x = jnp.asarray(rng.normal(size=(g.num_cols, k)).astype(np.float32))
    if ties:
        x = jnp.round(x)
    want, want_arg = xla_backend.spmm_arg_raw(
        g.row, g.col, g.value, g.deg, x, g.num_rows, Reduce.of(red))
    got, got_arg = spmm_minmax_v4(plans, x, red, g.nnz_padded - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=rtol)
    np.testing.assert_array_equal(np.asarray(got_arg),
                                  np.asarray(want_arg))


@pytest.mark.parametrize("red", ["max", "min"])
@pytest.mark.parametrize("ties", [False, True])
def test_train_kernel_vs_oracle(red, ties):
    g, rng = _graph(ties=ties)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=32)
    _check(g, plans, rng, red=red, ties=ties)


def test_train_kernel_hub_rows_deferred():
    """Power-law hubs exercise the high-D vertical classes; deferred
    plans pack every plane on device."""
    g, rng = _graph(seed=12, hub=True, ties=True)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=32,
                                 defer_edges=True)
    assert any(p.D >= 16 for p in plans)
    plans = tuple(materialize_v4mm_edges_device(p, g.row, g.col, g.value)
                  for p in plans)
    _check(g, plans, rng, ties=True)


def test_train_kernel_stripes():
    g, rng = _graph(seed=15, n=2000, e=30000)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=32,
                                 x_vmem_bytes=4 * 128 * 32 * 2)
    assert len({p.col_offset for p in plans}) > 1  # really striped
    _check(g, plans, rng)


@pytest.mark.parametrize("k", [8, 40, 300])
def test_train_kernel_k_widths(k):
    g, rng = _graph(seed=4, e=3000)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=k)
    _check(g, plans, rng, k=k)


def test_train_kernel_value_substitution():
    """replace_plan_values re-packs ONLY the value plane — the max over
    substituted scalars must match the oracle on a graph with those
    values (the fused AOP_MAX route's mechanism)."""
    g, rng = _graph(seed=9)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=16,
                                 defer_edges=True)
    plans = tuple(materialize_v4mm_edges_device(p, g.row, g.col, g.value)
                  for p in plans)
    s = jnp.asarray(
        rng.normal(size=(g.nnz_padded,)).astype(np.float32))
    s = jnp.where(jnp.arange(g.nnz_padded) < g.nnz, s, 0.0)
    plans2 = tuple(replace_plan_values(p, s) for p in plans)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 16)).astype(np.float32))
    want, want_arg = xla_backend.spmm_arg_raw(
        g.row, g.col, s, g.deg, x, g.num_rows, Reduce.MAX)
    got, got_arg = spmm_minmax_v4(plans2, x, "max", g.nnz_padded - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_arg),
                                  np.asarray(want_arg))


def test_train_kernel_empty_rows_sentinel():
    g, rng = _graph(seed=2)
    base = np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz], \
        np.asarray(g.value)[: g.nnz]
    plans = build_minmax_stripes(*base, g.num_rows, g.num_cols, k=8)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 8)).astype(np.float32))
    got, got_arg = spmm_minmax_v4(plans, x, "max", g.nnz_padded - 1)
    deg = np.asarray(g.deg)
    empty = deg == 0
    assert empty.any()
    assert np.all(np.asarray(got)[empty] == 0.0)
    assert np.all(np.asarray(got_arg)[empty] == g.nnz_padded - 1)
