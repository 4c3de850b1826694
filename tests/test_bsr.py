"""v3 hybrid (BSR dense blocks + v2 residual) kernel vs the dense oracle.

The reference has no analog (FusedMM is one CSR kernel); the hybrid
replaces its build-time kernel-variant autotuning
(``/root/reference/configure``) with per-block densify-vs-stream routing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from isplib_tpu.sparse.tiling_v3 import build_plan_v3_arrays
from isplib_tpu.kernels.spmm_bsr import spmm_hybrid, spmm_bsr


def _mk(seed=0, R=500, C=400, E=20000):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, R, E)
    col = rng.integers(0, C, E)
    # concentrate half the edges in one 128x128 corner → mixed density
    row[: E // 2] = rng.integers(0, 128, E // 2)
    col[: E // 2] = rng.integers(0, 128, E // 2)
    val = rng.normal(size=E).astype(np.float32)
    order = np.lexsort((col, row))
    row, col, val = row[order], col[order], val[order]
    dense = np.zeros((R, C))
    np.add.at(dense, (row, col), val)
    return row, col, val, dense


@pytest.mark.parametrize("thr,expect", [
    (1, "dense_only"), (700, "mixed"), (10**9, "residual_only")])
def test_hybrid_matches_oracle(thr, expect):
    R, C, K = 500, 400, 32
    row, col, val, dense = _mk()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(C, K)).astype(np.float32)
    want = dense @ x

    plan = build_plan_v3_arrays(row, col, val, R, C, k=K,
                                dense_threshold=thr)
    if expect == "dense_only":
        assert plan.bsr is not None and plan.sparse_edges == 0
    elif expect == "residual_only":
        assert plan.bsr is None and plan.residual is not None
    else:
        assert plan.bsr is not None and plan.residual is not None

    got = np.asarray(spmm_hybrid(plan, jnp.asarray(x)))
    assert got.shape == want.shape
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-2, f"relerr {err}"  # bf16 block accuracy contract


@pytest.mark.parametrize("k", [7, 48, 300])
def test_hybrid_k_widths(k):
    R, C = 500, 400
    row, col, val, dense = _mk()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(C, k)).astype(np.float32)
    want = dense @ x
    plan = build_plan_v3_arrays(row, col, val, R, C, k=k,
                                dense_threshold=64)
    got = np.asarray(spmm_hybrid(plan, jnp.asarray(x)))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-2, f"K={k} relerr {err}"


def test_bsr_duplicate_edges_accumulate():
    # duplicate (r, c) pairs must add into the densified block
    row = np.array([3, 3, 3, 120], dtype=np.int64)
    col = np.array([5, 5, 9, 100], dtype=np.int64)
    val = np.array([1.0, 2.0, 4.0, 8.0], dtype=np.float32)
    plan = build_plan_v3_arrays(row, col, val, 128, 128, k=8,
                                dense_threshold=1)
    x = np.eye(128, 8, dtype=np.float32)
    out = np.asarray(spmm_bsr(plan.bsr, jnp.asarray(x)))
    assert out[3, 5] == pytest.approx(3.0)


def test_hybrid_through_spmm_dispatch():
    """version=3 TiledGraph flows through spmm() with correct grads."""
    import jax
    from isplib_tpu.sparse.graph import from_edge_index
    from isplib_tpu.sparse.tiling import build_tiling
    from isplib_tpu.ops.spmm import spmm

    row, col, val, dense = _mk(R=300, C=300, E=8000)
    ei = np.stack([col, row])  # from_edge_index: (src, dst)
    g = from_edge_index(ei, num_nodes=300, edge_value=val)
    tg = build_tiling(g, rb=128, ct=128, eb=256, version=3)
    x = np.random.default_rng(3).normal(size=(300, 16)).astype(np.float32)
    want = dense @ x
    got = np.asarray(spmm(tg, jnp.asarray(x), backend="pallas"))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    # grad_x via the bwd plan matches the XLA-path gradient
    f = lambda graph, xx: (spmm(graph, xx, backend="pallas") ** 2).sum()
    gx = jax.grad(f, argnums=1)(tg, jnp.asarray(x))
    gx_ref = jax.grad(
        lambda xx: (spmm(g, xx, backend="xla") ** 2).sum())(jnp.asarray(x))
    err = np.abs(np.asarray(gx) - np.asarray(gx_ref)).max()
    assert err / (np.abs(np.asarray(gx_ref)).max() + 1e-9) < 2e-2


def test_deferred_blocks_match_eager(rng):
    """Deferred plans (blocks scattered on device from the resident edge
    arrays) must produce bit-identical bf16 blocks to the host densify."""
    import jax.numpy as jnp
    from isplib_tpu.sparse.tiling_v3 import (build_plan_v3_arrays,
                                             materialize_blocks_device)
    n = 1500
    e = 60000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    row[:20000] //= 3
    col[:20000] //= 3
    order = np.lexsort((col, row))
    row, col = row[order].astype(np.int64), col[order].astype(np.int64)
    val = rng.normal(size=e).astype(np.float32)
    kw = dict(rb=128, ct=128, eb=128, k=32, dense_threshold=64, g=4)
    eager = build_plan_v3_arrays(row, col, val, n, n, **kw)
    deferred = build_plan_v3_arrays(row, col, val, n, n,
                                    defer_blocks=True, **kw)
    assert eager.bsr is not None and deferred.bsr.blocks is None
    assert eager.dense_edges == deferred.dense_edges
    got = materialize_blocks_device(
        deferred, jnp.asarray(row.astype(np.int32)),
        jnp.asarray(col.astype(np.int32)), jnp.asarray(val))
    a = np.asarray(got.bsr.blocks, np.float32)
    b = np.asarray(eager.bsr.blocks, np.float32)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
    # residuals agree too
    assert (deferred.residual is None) == (eager.residual is None)
    if eager.residual is not None:
        assert np.array_equal(np.asarray(deferred.residual.edges),
                              np.asarray(eager.residual.edges))
    assert deferred.sparse_edges == eager.sparse_edges
