"""Multi-device SpMM: 8-virtual-device CPU mesh vs single-device oracle.

The reference cannot check us here — it has no distributed path at all
(/root/reference/tests/dist is single-process; SURVEY.md §2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from isplib_tpu import from_edge_index, spmm
from isplib_tpu.dist import partition_rows, spmm_sharded


def make_coo(rng, n=500, nnz=4000):
    src = rng.integers(0, n, nnz)
    dst = rng.integers(0, n, nnz)
    pairs = np.unique(np.stack([dst, src]), axis=1)
    dst, src = pairs[0], pairs[1]
    vals = rng.normal(size=dst.shape[0]).astype(np.float32)
    return dst, src, vals, n


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("data",))


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_sharded_vs_single(rng, mesh, reduce):
    row, col, vals, n = make_coo(rng)
    g = from_edge_index(np.stack([col, row]), num_nodes=n, edge_value=vals,
                        edge_multiple=64)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    want = spmm(g, x, reduce=reduce, backend="xla")
    got = spmm_sharded(sg, x, reduce=reduce, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_grad(rng, mesh):
    row, col, vals, n = make_coo(rng, n=320, nnz=2000)
    g = from_edge_index(np.stack([col, row]), num_nodes=n, edge_value=vals,
                        edge_multiple=64)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    def loss_sharded(x_):
        return jnp.sum(spmm_sharded(sg, x_, mesh=mesh) * probe)

    def loss_single(x_):
        return jnp.sum(spmm(g, x_, backend="xla") * probe)

    got = jax.grad(loss_sharded)(x)
    want = jax.grad(loss_single)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_jit_and_shapes(rng, mesh):
    row, col, vals, n = make_coo(rng, n=200, nnz=1000)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    f = jax.jit(lambda x_: spmm_sharded(sg, x_, mesh=mesh))
    out = f(x)
    assert out.shape == (n, 8)
    # second call: no retrace errors, stable values
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(out))


def test_halo_is_small(rng, mesh):
    """Halo size must track boundary nodes, not the whole graph."""
    # ring graph: each shard only needs 1-2 remote nodes
    n = 512
    src = np.arange(n)
    dst = (src + 1) % n
    sg = partition_rows(dst, src, None, n, num_shards=8, edge_multiple=64,
                        halo_multiple=8)
    assert sg.halo <= 8  # one boundary node per pair, padded to 8
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    got = spmm_sharded(sg, x, mesh=mesh)
    want = jnp.asarray(np.asarray(x)[(np.arange(n) - 1) % n])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_gcn_learns(rng, mesh):
    """End-to-end: 2-layer GCN trained entirely through the sharded SpMM
    path reaches the same quality as single-device training."""
    import dataclasses
    from isplib_tpu.data import sbm_dataset
    from isplib_tpu.nn import GCN
    from isplib_tpu.nn.transforms import gcn_norm
    from isplib_tpu.dist.spmm_dist import set_mesh
    from isplib_tpu.train import train_node_classifier

    ds = sbm_dataset(num_nodes=400, num_classes=4, num_features=16,
                     avg_degree=8.0, homophily=0.9, noise=2.0, seed=1)
    g = gcn_norm(ds.graph, edge_multiple=64)
    row = np.asarray(g.row)[: g.nnz]
    col = np.asarray(g.col)[: g.nnz]
    val = np.asarray(g.value)[: g.nnz]
    from isplib_tpu.dist import partition_rows
    sg = partition_rows(row, col, val, 400, num_shards=8, edge_multiple=64,
                        halo_multiple=16)
    set_mesh(mesh)
    try:
        ds_sharded = dataclasses.replace(ds, graph=sg)
        model = GCN(hidden=16, num_classes=4, dropout_rate=0.0)
        res = train_node_classifier(model, ds_sharded, epochs=30)
        assert res.test_acc > 0.7, f"sharded GCN failed: {res.test_acc}"
    finally:
        set_mesh(None)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_sharded_tiled_vs_single(rng, mesh, reduce):
    """tiling=... routes the shard-local halves through the Pallas v2
    kernels (interpret mode on CPU) — parity with the XLA oracle.
    max/min run the in-kernel arg kernels with a presence-aware
    local/halo combine (VERDICT r3 next #6)."""
    row, col, vals, n = make_coo(rng, n=600, nnz=5000)
    g = from_edge_index(np.stack([col, row]), num_nodes=n, edge_value=vals,
                        edge_multiple=64)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16,
                        tiling=dict(rb=128, ct=128, eb=128, k=16))
    assert sg.plans is not None
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    want = np.asarray(spmm(g, x, reduce=reduce, backend="xla"))
    got = np.asarray(spmm_sharded(sg, x, reduce=reduce, mesh=mesh))
    # bf16 accuracy contract of the tiled kernels
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)


def test_sharded_tiled_grad(rng, mesh):
    row, col, vals, n = make_coo(rng, n=320, nnz=2500)
    g = from_edge_index(np.stack([col, row]), num_nodes=n, edge_value=vals,
                        edge_multiple=64)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16,
                        tiling=dict(rb=128, ct=128, eb=128, k=8))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    def loss_sharded(x_):
        return jnp.sum(spmm_sharded(sg, x_, mesh=mesh) * probe)

    def loss_single(x_):
        return jnp.sum(spmm(g, x_, backend="xla") * probe)

    got = np.asarray(jax.grad(loss_sharded)(x))
    want = np.asarray(jax.grad(loss_single)(x))
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)


def test_sharded_tiled_jit(rng, mesh):
    row, col, vals, n = make_coo(rng, n=200, nnz=1500)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16,
                        tiling=dict(rb=128, ct=128, eb=128, k=8))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    f = jax.jit(lambda x_: spmm_sharded(sg, x_, mesh=mesh))
    out = f(x)
    assert out.shape == (n, 8)
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(out))


def test_partition_d64_build_time(rng):
    """Pod-scale partition build: d=64 over a 5.7M-edge power-law graph
    in <5s host time (VERDICT r3 next #5 — the r3 implementation's
    O(d^2) per-pair np.unique took ~18s here)."""
    import time
    from isplib_tpu.data.synthetic import rmat_edges

    ei = rmat_edges(52092, 5_730_794, 7)
    # first call pays one-time page-fault/allocator costs on this host
    # (~8s of cold mmap for the big temporaries); the algorithmic claim
    # is about the warm build
    partition_rows(ei[1], ei[0], None, 52092, num_shards=64, device=False)
    t0 = time.time()
    sg = partition_rows(ei[1], ei[0], None, 52092, num_shards=64,
                        verbose=True, device=False)
    dt = time.time() - t0
    assert dt < 5.0, f"d=64 partition took {dt:.1f}s"
    assert sg.num_shards == 64
    assert sg.local_edges + sg.halo_edges == sg.nnz
    # all shards' send lists reference only locally-owned rows (or pad)
    send = np.asarray(sg.send_ids)
    assert send.min() >= 0 and send.max() <= sg.rows_per_shard


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_sharded_tiled_minmax_grad(rng, mesh, reduce):
    """Gradients through the tiled sharded max/min route only through
    the winning edges (parity with the single-device arg backward)."""
    row, col, vals, n = make_coo(rng, n=320, nnz=2500)
    g = from_edge_index(np.stack([col, row]), num_nodes=n, edge_value=vals,
                        edge_multiple=64)
    sg = partition_rows(row, col, vals, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16,
                        tiling=dict(rb=128, ct=128, eb=128, k=16))
    assert sg.plans_mm is not None
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    def loss_sharded(x_):
        return jnp.sum(spmm_sharded(sg, x_, reduce=reduce, mesh=mesh)
                       * probe)

    def loss_single(x_):
        return jnp.sum(spmm(g, x_, reduce=reduce, backend="xla") * probe)

    got = np.asarray(jax.grad(loss_sharded)(x))
    want = np.asarray(jax.grad(loss_single)(x))
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * scale)
