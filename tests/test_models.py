"""Layer & model tests: shapes, gradient flow, end-to-end learnability.

End-to-end accuracy on an SBM graph is the analog of the reference's
accuracy-table A/B methodology (``/root/reference/tests/cpu/run_test.sh``):
a GCN must beat a graph-blind baseline, proving aggregation works.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu.data import sbm_dataset
from isplib_tpu.nn import GCN, GIN, GraphSAGE, GCNConv, SAGEConv, gcn_norm
from isplib_tpu.train import train_node_classifier


@pytest.fixture(scope="module")
def small_ds():
    return sbm_dataset(num_nodes=400, num_classes=4, num_features=16,
                       avg_degree=8.0, homophily=0.9, noise=2.0, seed=1)


def test_gcnconv_shapes(small_ds):
    ds = small_ds
    layer = GCNConv(8)
    params = layer.init(jax.random.PRNGKey(0), ds.graph, jnp.asarray(ds.x))
    out = layer.apply(params, ds.graph, jnp.asarray(ds.x))
    assert out.shape == (ds.num_nodes, 8)
    assert jnp.isfinite(out).all()


@pytest.mark.parametrize("aggr", ["sum", "mean", "max", "min"])
def test_sageconv_all_aggrs(small_ds, aggr):
    ds = small_ds
    layer = SAGEConv(8, aggr=aggr)
    x = jnp.asarray(ds.x)
    params = layer.init(jax.random.PRNGKey(0), ds.graph, x)
    out, grads = jax.value_and_grad(
        lambda p: jnp.sum(layer.apply(p, ds.graph, x) ** 2))(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(g).all() for g in flat)
    # gradient must actually reach every parameter
    assert all(float(jnp.abs(g).max()) > 0 for g in flat)


@pytest.mark.parametrize("model_name", ["gcn", "sage", "gin"])
def test_models_forward(small_ds, model_name):
    ds = small_ds
    from isplib_tpu.nn import MODEL_REGISTRY
    kwargs = dict(hidden=16, num_classes=ds.num_classes)
    model = MODEL_REGISTRY[model_name](**kwargs)
    x = jnp.asarray(ds.x)
    variables = model.init(jax.random.PRNGKey(0), ds.graph, x,
                           training=False)
    out = model.apply(variables, ds.graph, x, training=False)
    assert out.shape == (ds.num_nodes, ds.num_classes)
    assert jnp.isfinite(out).all()


def test_gcn_learns_sbm(small_ds):
    """A GCN on a homophilous SBM should clearly beat chance (25%)."""
    ds = small_ds
    g = gcn_norm(ds.graph, edge_multiple=64)
    import dataclasses
    ds = dataclasses.replace(ds, graph=g)
    model = GCN(hidden=16, num_classes=ds.num_classes, dropout_rate=0.0)
    res = train_node_classifier(model, ds, epochs=30, lr=0.01)
    assert res.test_acc > 0.7, f"GCN failed to learn: {res.test_acc}"
    assert res.train_time_avg > 0


def test_training_protocol_table(small_ds):
    ds = small_ds
    model = GCN(hidden=8, num_classes=ds.num_classes)
    res = train_node_classifier(model, ds, epochs=2)
    tbl = res.table()
    assert "TRG_TM" in tbl and "TST_ACC" in tbl
    assert len(res.epoch_times) == 2
