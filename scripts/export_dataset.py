#!/usr/bin/env python
"""Export a PyG/OGB dataset to the plain .npz format isplib_tpu loads.

Run this ON A MACHINE WITH NETWORK + torch_geometric + ogb (this repo's
environment has neither), then copy the .npz into $ISPLIB_DATA.

Reproduces the per-dataset fixups of the reference loader
(``/root/reference/tests/cpu/dataset_loader.py``):
  * reddit/reddit2: stock masks                       (:8-33)
  * amazon(-products): multihot labels → scalar       (:67-80)
  * ogbn-proteins: y = edge-species sum, features = scatter_add of
    edge_attr                                         (:111-133)
  * ogbn-products / ogbn-mag: OGB split → boolean masks (:96-106),
    mag restricted to the paper-cites-paper subgraph  (:38-53)

Usage: python export_dataset.py <reddit|reddit2|amazon|protein|product|mag>
                                [--root DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _ogb_masks(split_idx, num_nodes):
    masks = {}
    for name in ("train", "valid", "test"):
        m = np.zeros(num_nodes, bool)
        m[np.asarray(split_idx[name])] = True
        masks[name] = m
    return masks["train"], masks["valid"], masks["test"]


def export(name: str, root: str, out_dir: str) -> str:
    import torch
    import torch_geometric.transforms as T  # noqa: F401

    if name == "reddit":
        from torch_geometric.datasets import Reddit
        data = Reddit(root=f"{root}/Reddit")[0]
    elif name == "reddit2":
        from torch_geometric.datasets import Reddit2
        data = Reddit2(root=f"{root}/Reddit2")[0]
    elif name == "amazon":
        from torch_geometric.datasets import AmazonProducts
        data = AmazonProducts(root=f"{root}/AmazonProducts")[0]
        # multihot → scalar class id (dataset_loader.py:76-80)
        data.y = data.y.argmax(dim=1)
    elif name == "protein":
        from ogb.nodeproppred import PygNodePropPredDataset
        from torch_scatter import scatter_add
        dataset = PygNodePropPredDataset(name="ogbn-proteins",
                                         root=f"{root}/ogbn-proteins")
        data = dataset[0]
        # multihot → scalar via row-sum (dataset_loader.py:117-118)
        data.y = data.y.sum(dim=1).long()
        # node features = aggregated edge features (:131-133)
        row = data.edge_index[0]
        data.x = scatter_add(data.edge_attr, row, dim=0,
                             dim_size=data.num_nodes)
        tr, va, te = _ogb_masks(dataset.get_idx_split(), data.num_nodes)
        data.train_mask, data.val_mask, data.test_mask = map(
            torch.from_numpy, (tr, va, te))
    elif name == "product":
        from ogb.nodeproppred import PygNodePropPredDataset
        dataset = PygNodePropPredDataset(name="ogbn-products",
                                         root=f"{root}/ogbn-products")
        data = dataset[0]
        data.y = data.y.squeeze(1)
        tr, va, te = _ogb_masks(dataset.get_idx_split(), data.num_nodes)
        data.train_mask, data.val_mask, data.test_mask = map(
            torch.from_numpy, (tr, va, te))
    elif name == "mag":
        from ogb.nodeproppred import PygNodePropPredDataset
        dataset = PygNodePropPredDataset(name="ogbn-mag",
                                         root=f"{root}/ogbn-mag")
        data0 = dataset[0]
        # paper-cites-paper subgraph (dataset_loader.py:38-53)
        import types
        data = types.SimpleNamespace()
        data.edge_index = data0.edge_index_dict[
            ("paper", "cites", "paper")]
        data.x = data0.x_dict["paper"]
        data.y = data0.y_dict["paper"].squeeze(1)
        data.num_nodes = data.x.shape[0]
        split = dataset.get_idx_split()
        split = {k: v["paper"] for k, v in split.items()}
        tr, va, te = _ogb_masks(split, data.num_nodes)
        data.train_mask, data.val_mask, data.test_mask = map(
            torch.from_numpy, (tr, va, te))
    else:
        raise KeyError(name)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(
        path,
        edge_index=np.asarray(data.edge_index),
        x=np.asarray(data.x, dtype=np.float32),
        y=np.asarray(data.y, dtype=np.int32),
        train_mask=np.asarray(data.train_mask, dtype=bool),
        val_mask=np.asarray(data.val_mask, dtype=bool),
        test_mask=np.asarray(data.test_mask, dtype=bool),
    )
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--root", default="./datasets")
    ap.add_argument("--out", default=os.environ.get(
        "ISPLIB_DATA", os.path.expanduser("~/datasets/isplib")))
    a = ap.parse_args()
    print(export(a.dataset, a.root, a.out))
