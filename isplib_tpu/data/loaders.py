"""Dataset loaders for the six reference benchmark datasets.

The reference loads these through PyG/OGB downloaders with per-dataset
label/mask/feature fixups (``/root/reference/tests/cpu/dataset_loader.py``).
This environment has no network and no PyG, so loading is two-stage:

1. ``scripts/export_dataset.py`` (run once on any machine with PyG+OGB)
   converts a PyG dataset into a plain ``.npz`` with keys
   ``edge_index (2,E) | x (N,F) | y (N,) | train_mask | val_mask | test_mask``.
2. These loaders read the ``.npz`` from ``$ISPLIB_DATA`` (default
   ``~/datasets/isplib``) and reproduce the reference's per-dataset
   semantics (multihot label collapsing, OGB split→mask conversion,
   feature padding) — cited per loader below.

When the file is missing, ``load(name)`` falls back to a size-matched
synthetic RMAT dataset (``<name>-sim``) so benchmarks always run; the
substitution is reported loudly.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..sparse.graph import from_edge_index, from_scipy
from .synthetic import NodeDataset, rmat_dataset, _split_masks

__all__ = ["load", "load_mtx", "loader_dict", "DATASET_STATS",
           "REAL_BUILTIN", "pad_features", "get_padding_size"]

DATA_DIR = os.environ.get(
    "ISPLIB_DATA", os.path.join(os.path.expanduser("~"), "datasets", "isplib")
)

# (num_nodes, num_edges_directed, num_features, num_classes) — used to
# size synthetic stand-ins; values match the reference's datasets
# (README.md:53, dataset_loader.py:162-169).
DATASET_STATS = {
    "reddit": (232_965, 114_615_892, 602, 41),
    "reddit2": (232_965, 23_213_838, 602, 41),
    "amazon": (1_569_960, 264_339_468, 200, 107),
    "protein": (132_534, 79_122_504, 8, 112),
    "product": (2_449_029, 123_718_280, 100, 47),
    "mag": (736_389, 10_832_542, 128, 349),
}


def _npz_path(name: str) -> str:
    return os.path.join(DATA_DIR, f"{name}.npz")


def _load_npz(name: str, edge_multiple: int = 4096,
              tiling=None) -> NodeDataset:
    with np.load(_npz_path(name)) as z:
        edge_index = z["edge_index"]
        x = z["x"].astype(np.float32)
        y = z["y"].astype(np.int32)
        train_mask = z["train_mask"].astype(bool)
        val_mask = z["val_mask"].astype(bool)
        test_mask = z["test_mask"].astype(bool)
    num_nodes = x.shape[0]
    graph = from_edge_index(edge_index, num_nodes=num_nodes,
                            edge_multiple=edge_multiple, tiling=tiling)
    return NodeDataset(
        name=name, graph=graph, x=x, y=y,
        train_mask=train_mask, val_mask=val_mask, test_mask=test_mask,
        num_classes=int(y.max()) + 1,
    )


def get_padding_size(n: int, multiple: int = 128) -> int:
    """Features padded to a lane multiple — generalizes the reference's
    SIMD padding-to-16 (``dataset_loader.py:145-152``) to the TPU lane
    width of 128."""
    return ((n + multiple - 1) // multiple) * multiple


def pad_features(ds: NodeDataset, multiple: int = 128) -> NodeDataset:
    """Zero-pad the feature dim (``dataset_loader.py:154-160`` analog)."""
    f = ds.x.shape[1]
    target = get_padding_size(f, multiple)
    if target == f:
        return ds
    x = np.concatenate(
        [ds.x, np.zeros((ds.x.shape[0], target - f), ds.x.dtype)], axis=1)
    import dataclasses
    return dataclasses.replace(ds, x=x)


def _synthetic_standin(name: str, scale: float = 1.0,
                       tiling=None) -> NodeDataset:
    n, e, f, c = DATASET_STATS[name]
    n, e = int(n * scale), int(e * scale)
    return rmat_dataset(
        num_nodes=n, num_edges=e, num_features=f, num_classes=c,
        name=f"{name}-sim", seed=hash(name) % (2**31),
        undirected=False, tiling=tiling,
    )


# Small REAL graphs checked into the repo (data/real/*.mtx — networkx's
# embedded classics, exported by scripts/export_real_mtx.py).  They
# exercise the reference's .mtx ingestion path (README.md:147-168) with
# genuinely real adjacency + labels in this network-less environment.
REAL_BUILTIN = ("karate", "lesmis")
_REAL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "real")


def load_mtx(path: str, labels_npz: str | None = None,
             name: str | None = None, edge_multiple: int = 128,
             tiling=None, train_frac: float = 0.5,
             seed: int = 0, max_onehot_nodes: int = 4096) -> NodeDataset:
    """Load a MatrixMarket adjacency (the reference autotuner's input
    format) + optional labels into a NodeDataset.

    Features are one-hot node ids (the standard featureless-graph
    convention) up to ``max_onehot_nodes`` — one-hot features are O(n²)
    memory (ADVICE r3: a 100k-node .mtx would allocate ~40 GB).  Larger
    graphs fall back to 128-dim random features (fixed seed)."""
    import scipy.io

    mat = scipy.io.mmread(path).tocoo()
    graph = from_scipy(mat, edge_multiple=edge_multiple, tiling=tiling)
    n = graph.num_rows
    if labels_npz is not None:
        with np.load(labels_npz) as z:
            y = z["y"].astype(np.int32)
    else:
        y = np.zeros(n, np.int32)
    if n <= max_onehot_nodes:
        x = np.eye(n, dtype=np.float32)
    else:
        x = np.random.default_rng(seed).normal(
            size=(n, 128)).astype(np.float32)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    train = np.zeros(n, bool)
    train[perm[: int(train_frac * n)]] = True
    return NodeDataset(
        name=name or os.path.basename(path),
        graph=graph, x=x, y=y,
        train_mask=train, val_mask=~train, test_mask=~train,
        num_classes=int(y.max()) + 1)


def _load_real_builtin(name: str, tiling=None) -> NodeDataset:
    return load_mtx(
        os.path.join(_REAL_DIR, f"{name}.mtx"),
        labels_npz=os.path.join(_REAL_DIR, f"{name}_labels.npz"),
        name=name, tiling=tiling)


def load(name: str, allow_synthetic: bool = True,
         scale: float = 1.0, tiling=None) -> NodeDataset:
    """Load one of the six reference datasets (or ``<name>-sim`` to force
    the synthetic stand-in; ``scale`` shrinks stand-ins for smoke tests),
    or one of the checked-in real graphs (karate, lesmis).

    ``tiling=(rb, ct, eb)`` attaches Pallas plans during construction —
    always pass it here rather than calling build_tiling on the loaded
    graph (which would read arrays back through the slow TPU tunnel)."""
    if name in REAL_BUILTIN:
        return _load_real_builtin(name, tiling=tiling)
    force_sim = name.endswith("-sim")
    base = name[:-4] if force_sim else name
    if base not in DATASET_STATS:
        raise KeyError(
            f"unknown dataset {name!r}; known: "
            f"{sorted(DATASET_STATS) + list(REAL_BUILTIN)}")
    if not force_sim and os.path.exists(_npz_path(base)):
        return _load_npz(base, tiling=tiling)
    if not (allow_synthetic or force_sim):
        raise FileNotFoundError(
            f"{_npz_path(base)} not found — export it with "
            f"scripts/export_dataset.py on a machine with PyG/OGB, or pass "
            f"allow_synthetic=True for a size-matched RMAT stand-in.")
    if not force_sim:
        print(f"[isplib_tpu.data] {base}: no exported .npz at "
              f"{_npz_path(base)} — using size-matched synthetic stand-in")
    return _synthetic_standin(base, scale, tiling=tiling)


loader_dict: dict[str, Callable[[], NodeDataset]] = {
    name: (lambda n=name: load(n)) for name in DATASET_STATS
}
