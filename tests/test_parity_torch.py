"""Per-layer activation parity vs a torch dense oracle.

BASELINE.md requires matching the reference's GCN/SAGE/GIN downstream
behavior ("per-layer activations allclose vs reference CPU runs").  The
reference's own correctness check is an A/B accuracy table against
torch_sparse (``/root/reference/tests/cpu/run_test.sh:5-16``); here we go
stronger: the SAME weights are loaded into an explicit torch *dense*
formulation of each architecture (``A @ x`` with a materialized
adjacency) and every layer's activations must match elementwise.

torch is CPU-only in this image; both sides run f32 (conftest sets
HIGHEST matmul precision), so tolerances are tight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from isplib_tpu.data import sbm_dataset
from isplib_tpu.nn import GCN, GIN, GraphSAGE, gcn_norm


def _dense_adj(graph) -> np.ndarray:
    """Materialize the (R, C) adjacency from the padded COO arrays."""
    a = np.zeros((graph.num_rows, graph.num_cols), np.float32)
    row = np.asarray(graph.row)[: graph.nnz]
    col = np.asarray(graph.col)[: graph.nnz]
    val = np.asarray(graph.value)[: graph.nnz]
    np.add.at(a, (row, col), val)
    return a


def _t(x) -> "torch.Tensor":
    return torch.from_numpy(np.asarray(x, np.float32).copy())


@pytest.fixture(scope="module")
def ds():
    return sbm_dataset(num_nodes=300, num_classes=5, num_features=16,
                       avg_degree=8.0, seed=1, edge_multiple=128)


def _intermediates(model, variables, graph, x):
    out, state = model.apply(variables, graph, x, training=False,
                             capture_intermediates=True,
                             mutable=["intermediates"])
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + (k,), v)
        else:
            flat["/".join(p for p in prefix if p != "__call__")] = node[0]
    walk((), state["intermediates"])
    return out, flat


def _close(got_torch, want_jax, tol=2e-4):
    got = got_torch.detach().numpy()
    want = np.asarray(want_jax)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol * scale)


def test_gcn_layer_parity(ds):
    graph = gcn_norm(ds.graph, edge_multiple=128)
    x = jnp.asarray(ds.x)
    model = GCN(hidden=8, num_classes=ds.num_classes, dropout_rate=0.5,
                backend="xla")
    variables = model.init(jax.random.PRNGKey(0), graph, x, training=False)
    out, inter = _intermediates(model, variables, graph, x)

    p = variables["params"]
    a = _t(_dense_adj(graph))
    xt = _t(ds.x)
    h1 = a @ (xt @ _t(p["conv1"]["kernel"])) + _t(p["conv1"]["bias"])
    _close(h1, inter["conv1"])
    h = torch.relu(h1)  # dropout is inert in eval mode
    h2 = a @ (h @ _t(p["conv2"]["kernel"])) + _t(p["conv2"]["bias"])
    _close(h2, inter["conv2"])
    _close(torch.log_softmax(h2, dim=-1), out)


@pytest.mark.parametrize("aggr", ["sum", "mean"])
def test_sage_layer_parity(ds, aggr):
    graph = ds.graph
    x = jnp.asarray(ds.x)
    model = GraphSAGE(hidden=8, num_classes=ds.num_classes, aggr=aggr,
                      dropout_rate=0.5, backend="xla")
    variables = model.init(jax.random.PRNGKey(1), graph, x, training=False)
    out, inter = _intermediates(model, variables, graph, x)

    p = variables["params"]
    a = _t(_dense_adj(graph))
    deg = _t(np.asarray(graph.deg)).clamp(min=1.0)[:, None]

    def sage_layer(pp, xin):
        agg = a @ xin
        if aggr == "mean":
            agg = agg / deg
        out_ = agg @ _t(pp["lin_l"]["kernel"]) + _t(pp["lin_l"]["bias"])
        return out_ + xin @ _t(pp["lin_r"]["kernel"])

    h1 = sage_layer(p["conv1"], _t(ds.x))
    _close(h1, inter["conv1"])
    h2 = sage_layer(p["conv2"], torch.relu(h1))
    _close(h2, inter["conv2"])
    _close(torch.log_softmax(h2, dim=-1), out)


def test_gin_layer_parity(ds):
    graph = ds.graph
    x = jnp.asarray(ds.x)
    model = GIN(hidden=8, num_classes=ds.num_classes, backend="xla")
    variables = model.init(jax.random.PRNGKey(2), graph, x, training=False)
    out, inter = _intermediates(model, variables, graph, x)

    p = variables["params"]
    bs = variables["batch_stats"]
    a = _t(_dense_adj(graph))

    def gin_conv(pp, xin):
        h = xin + a @ xin  # eps = 0
        mlp = pp["_GINMLP_0"]
        h = torch.relu(h @ _t(mlp["Dense_0"]["kernel"])
                       + _t(mlp["Dense_0"]["bias"]))
        return h @ _t(mlp["Dense_1"]["kernel"]) + _t(mlp["Dense_1"]["bias"])

    def bn_eval(name, xin):
        mean = _t(bs[name]["mean"])
        var = _t(bs[name]["var"])
        scale = _t(p[name]["scale"])
        bias = _t(p[name]["bias"])
        return (xin - mean) / torch.sqrt(var + 1e-5) * scale + bias

    h = gin_conv(p["conv1"], _t(ds.x))
    _close(h, inter["conv1"])
    h = bn_eval("bn1", h)
    h = gin_conv(p["conv2"], h)
    _close(h, inter["conv2"])
    h = bn_eval("bn2", h)
    h = torch.relu(h @ _t(p["fc1"]["kernel"]) + _t(p["fc1"]["bias"]))
    logits = h @ _t(p["fc2"]["kernel"]) + _t(p["fc2"]["bias"])
    _close(logits, out)
