"""Checked-in REAL graphs (data/real/*.mtx) through the .mtx ingestion
path — the reference autotuner's input format (README.md:147-168).

These are the only genuinely real-world datasets loadable in this
network-less environment (networkx's embedded classics); they validate
the loader path end-to-end: MatrixMarket → CSRGraph → SpMM parity →
GCN training on real labels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from isplib_tpu import spmm
from isplib_tpu.data.loaders import REAL_BUILTIN, load


@pytest.mark.parametrize("name", REAL_BUILTIN)
def test_real_mtx_loads_and_spmm_matches_dense(name):
    ds = load(name)
    g = ds.graph
    assert g.num_rows == ds.x.shape[0]
    assert g.nnz > 0
    # dense oracle from the padded COO
    a = np.zeros((g.num_rows, g.num_cols), np.float32)
    np.add.at(a, (np.asarray(g.row)[: g.nnz], np.asarray(g.col)[: g.nnz]),
              np.asarray(g.value)[: g.nnz])
    # adjacency symmetry of the undirected source graphs
    np.testing.assert_allclose(a, a.T, rtol=1e-6)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_cols, 8)).astype(np.float32))
    got = np.asarray(spmm(g, x, backend="xla"))
    np.testing.assert_allclose(got, a @ np.asarray(x), rtol=1e-4,
                               atol=1e-4)


def test_karate_gcn_learns_real_factions():
    """2-layer GCN on Zachary's karate club must recover the real club
    split — the smallest end-to-end accuracy check on real data (the
    reference's correctness story is accuracy on real datasets,
    run_test.sh:5-16)."""
    import dataclasses
    from isplib_tpu.nn import GCN, gcn_norm
    from isplib_tpu.train import train_node_classifier

    ds = load("karate")
    ds = dataclasses.replace(
        ds, graph=gcn_norm(ds.graph, edge_multiple=128))
    model = GCN(hidden=8, num_classes=ds.num_classes, dropout_rate=0.0,
                backend="xla")
    res = train_node_classifier(model, ds, epochs=60)
    assert res.train_acc > 0.9, res.train_acc
    assert res.test_acc > 0.8, res.test_acc
