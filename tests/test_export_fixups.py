"""Execute scripts/export_dataset.py's per-dataset fixup branches against
synthetic fixtures shaped like the real data (VERDICT r3 next #7: the
amazon/protein/mag fixups were dead code — no environment with network +
PyG + OGB exists here, so the PyG/OGB modules are faked in sys.modules).

Fixup semantics under test mirror the reference loader:
  amazon  multihot y -> argmax     /root/reference/tests/cpu/dataset_loader.py:76-80
  protein y = row-sum, x = scatter_add(edge_attr)            (:117-133)
  product y squeeze + OGB split -> boolean masks             (:96-106)
  mag     paper-cites-paper subgraph + per-'paper' split     (:38-53)
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _fake_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _Data(types.SimpleNamespace):
    pass


def _install_pyg(monkeypatch, datasets=None, ogb_dataset=None):
    """Install the minimal module graph export_dataset imports."""
    tg = _fake_module("torch_geometric")
    tgt = _fake_module("torch_geometric.transforms")
    tgd = _fake_module("torch_geometric.datasets", **(datasets or {}))
    monkeypatch.setitem(sys.modules, "torch_geometric", tg)
    monkeypatch.setitem(sys.modules, "torch_geometric.transforms", tgt)
    monkeypatch.setitem(sys.modules, "torch_geometric.datasets", tgd)
    if ogb_dataset is not None:
        ogb = _fake_module("ogb")
        npp = _fake_module("ogb.nodeproppred",
                           PygNodePropPredDataset=ogb_dataset)
        monkeypatch.setitem(sys.modules, "ogb", ogb)
        monkeypatch.setitem(sys.modules, "ogb.nodeproppred", npp)

    def scatter_add(src, index, dim=0, dim_size=None):
        assert dim == 0
        out = torch.zeros((dim_size,) + tuple(src.shape[1:]),
                          dtype=src.dtype)
        out.index_add_(0, index, src)
        return out

    monkeypatch.setitem(sys.modules, "torch_scatter",
                        _fake_module("torch_scatter",
                                     scatter_add=scatter_add))


def _rng_graph(rng, n=50, e=300):
    ei = torch.tensor(
        np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]),
        dtype=torch.long)
    return ei


def test_amazon_multihot_argmax(rng, monkeypatch, tmp_path):
    n, c = 60, 7
    y_multihot = torch.zeros(n, c)
    true = rng.integers(0, c, n)
    y_multihot[torch.arange(n), torch.tensor(true)] = 1.0
    data = _Data(edge_index=_rng_graph(rng, n),
                 x=torch.randn(n, 16), y=y_multihot,
                 train_mask=torch.ones(n, dtype=torch.bool),
                 val_mask=torch.zeros(n, dtype=torch.bool),
                 test_mask=torch.zeros(n, dtype=torch.bool))

    class AmazonProducts:
        def __init__(self, root):
            pass

        def __getitem__(self, i):
            return data

    _install_pyg(monkeypatch, datasets=dict(AmazonProducts=AmazonProducts))
    import export_dataset
    path = export_dataset.export("amazon", str(tmp_path), str(tmp_path))
    with np.load(path) as z:
        np.testing.assert_array_equal(z["y"], true)
        assert z["x"].dtype == np.float32


def _ogb_fixture(data, n):
    idx = {"train": np.arange(0, n // 2),
           "valid": np.arange(n // 2, 3 * n // 4),
           "test": np.arange(3 * n // 4, n)}

    class DS:
        def __init__(self, name=None, root=None):
            pass

        def __getitem__(self, i):
            return data

        def get_idx_split(self):
            return idx

    return DS, idx


def test_protein_scatter_features_and_sum_labels(rng, monkeypatch,
                                                 tmp_path):
    n, e, d = 40, 200, 8
    ei = _rng_graph(rng, n, e)
    edge_attr = torch.randn(e, d)
    y = torch.tensor(rng.integers(0, 2, (n, 112)).astype(np.float32))
    data = _Data(edge_index=ei, edge_attr=edge_attr, y=y, num_nodes=n)
    DS, idx = _ogb_fixture(data, n)
    _install_pyg(monkeypatch, ogb_dataset=DS)
    import export_dataset
    path = export_dataset.export("protein", str(tmp_path), str(tmp_path))
    with np.load(path) as z:
        # y = row-sum of the multihot species matrix
        np.testing.assert_array_equal(
            z["y"], np.asarray(y.sum(dim=1), np.int32))
        # x = scatter_add of edge_attr over source nodes
        want = np.zeros((n, d), np.float32)
        np.add.at(want, np.asarray(ei[0]), np.asarray(edge_attr))
        np.testing.assert_allclose(z["x"], want, rtol=1e-6)
        assert z["train_mask"].sum() == n // 2
        assert not (z["train_mask"] & z["test_mask"]).any()


def test_product_squeeze_and_masks(rng, monkeypatch, tmp_path):
    n = 32
    y = torch.tensor(rng.integers(0, 5, (n, 1)))
    data = _Data(edge_index=_rng_graph(rng, n), x=torch.randn(n, 4),
                 y=y, num_nodes=n)
    DS, idx = _ogb_fixture(data, n)
    _install_pyg(monkeypatch, ogb_dataset=DS)
    import export_dataset
    path = export_dataset.export("product", str(tmp_path), str(tmp_path))
    with np.load(path) as z:
        assert z["y"].shape == (n,)
        np.testing.assert_array_equal(z["y"], np.asarray(y[:, 0]))
        got_train = np.flatnonzero(z["train_mask"])
        np.testing.assert_array_equal(got_train, idx["train"])


def test_mag_paper_subgraph(rng, monkeypatch, tmp_path):
    n_paper, n_author = 30, 20
    pp = _rng_graph(rng, n_paper, 100)
    ap = _rng_graph(rng, n_author, 50)
    data0 = _Data(
        edge_index_dict={("paper", "cites", "paper"): pp,
                         ("author", "writes", "paper"): ap},
        x_dict={"paper": torch.randn(n_paper, 6)},
        y_dict={"paper": torch.tensor(
            rng.integers(0, 4, (n_paper, 1)))},
    )
    idx = {k: {"paper": v} for k, v in
           {"train": np.arange(0, 15), "valid": np.arange(15, 22),
            "test": np.arange(22, 30)}.items()}

    class DS:
        def __init__(self, name=None, root=None):
            pass

        def __getitem__(self, i):
            return data0

        def get_idx_split(self):
            return idx

    _install_pyg(monkeypatch, ogb_dataset=DS)
    import export_dataset
    path = export_dataset.export("mag", str(tmp_path), str(tmp_path))
    with np.load(path) as z:
        # only the paper-cites-paper edges survive
        np.testing.assert_array_equal(z["edge_index"], np.asarray(pp))
        assert z["x"].shape == (n_paper, 6)
        assert z["y"].shape == (n_paper,)
        assert z["test_mask"].sum() == 8


def test_export_roundtrips_through_loader(rng, monkeypatch, tmp_path):
    """The exported npz loads through data.loaders into a NodeDataset."""
    n = 48
    data = _Data(edge_index=_rng_graph(rng, n), x=torch.randn(n, 8),
                 y=torch.tensor(rng.integers(0, 3, (n, 1))), num_nodes=n)
    DS, _ = _ogb_fixture(data, n)
    _install_pyg(monkeypatch, ogb_dataset=DS)
    import export_dataset
    export_dataset.export("product", str(tmp_path), str(tmp_path))

    from isplib_tpu.data import loaders
    monkeypatch.setattr(loaders, "DATA_DIR", str(tmp_path))
    ds = loaders._load_npz("product", edge_multiple=64)
    assert ds.x.shape == (n, 8)
    assert ds.num_classes == int(np.asarray(data.y).max()) + 1
    assert ds.graph.num_rows == n
