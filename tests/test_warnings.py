"""Loud-failure contracts for silent slow/wrong paths (VERDICT r3 #8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from isplib_tpu import from_edge_index, spmm


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("data",))


def test_untuned_jit_graph_warns_once(rng, monkeypatch, capsys):
    """A large untuned tracer graph inside jit must warn before landing
    on the XLA fallback."""
    import isplib_tpu.sparse.tiling as tiling
    from isplib_tpu.tune import autotune

    monkeypatch.setattr(tiling, "AUTO_TILE_MIN_NNZ", 100)
    monkeypatch.setattr(autotune, "_warned_untuned", set())

    nnz, n = 500, 64
    src = rng.integers(0, n, nnz)
    dst = rng.integers(0, n, nnz)
    g = from_edge_index(np.stack([src, dst]), num_nodes=n,
                        edge_multiple=128)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    @jax.jit
    def f(x_, g_):
        return spmm(g_, x_, backend="auto")

    f(x, g)  # traces: graph leaves are tracers -> warn path
    err = capsys.readouterr().err
    assert "UNTUNED" in err and "XLA segment-sum" in err

    f(x, g)  # cached trace: no second warning
    autotune.lookup_backend(g, x)
    assert "UNTUNED" not in capsys.readouterr().err


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs an 8-device mesh (virtual CPU devices)")
def test_sharded_tiled_edge_value_grad_raises(rng, mesh):
    """Differentiating w.r.t. a sharded graph's edge values through the
    tiled route must raise (values are baked into the shard plans)."""
    from isplib_tpu.dist.partition import partition_rows
    from isplib_tpu.dist.spmm_dist import spmm_sharded
    import dataclasses

    n, nnz = 128, 900
    row = rng.integers(0, n, nnz).astype(np.int64)
    col = rng.integers(0, n, nnz).astype(np.int64)
    val = rng.normal(size=nnz).astype(np.float32)
    sg = partition_rows(row, col, val, n, num_shards=8, edge_multiple=64,
                        halo_multiple=16,
                        tiling=dict(rb=128, ct=128, eb=128, k=8))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    def loss(v):
        sg2 = dataclasses.replace(sg, val_loc=v)
        return jnp.sum(spmm_sharded(sg2, x, mesh=mesh))

    with pytest.raises(ValueError, match="baked into the per-shard"):
        jax.grad(loss)(sg.val_loc)

    # the plain forward still runs
    out = spmm_sharded(sg, x, mesh=mesh)
    assert out.shape == (n, 8)
