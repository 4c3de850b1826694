"""Synthetic graph generators — RMAT (power-law) and SBM (learnable).

Two roles:

* Benchmarking without network access: size-matched stand-ins for the
  reference's six datasets (``/root/reference/tests/cpu/dataset_loader.py``),
  with the same node/edge/feature/class counts, generated deterministically.
  RMAT reproduces the skewed degree distributions that stress SpMM.
* End-to-end training tests: SBM community graphs with class-correlated
  features, where a working GCN must reach high accuracy — giving the
  accuracy-based correctness signal the reference gets from real datasets
  (``/root/reference/tests/cpu/run_test.sh``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..sparse.graph import CSRGraph, from_edge_index

__all__ = ["NodeDataset", "rmat_edges", "sbm_dataset", "rmat_dataset"]


@dataclasses.dataclass(frozen=True)
class NodeDataset:
    """A full-batch node-classification dataset (reference ``(dataset,
    data)`` tuple equivalent, dataset_loader.py:8-169)."""

    name: str
    graph: CSRGraph
    x: np.ndarray            # (N, F) float32
    y: np.ndarray            # (N,) int32
    train_mask: np.ndarray   # (N,) bool
    val_mask: np.ndarray
    test_mask: np.ndarray
    num_classes: int

    @property
    def num_features(self) -> int:
        return int(self.x.shape[1])

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])


def rmat_edges(
    num_nodes: int,
    num_edges: int,
    seed: int = 0,
    a: float = 0.57, b: float = 0.19, c: float = 0.19,
) -> np.ndarray:
    """Vectorized R-MAT edge generator (power-law degree distribution).

    Returns (2, E) int64 [src; dst] with self-loops removed and duplicates
    allowed (like real social graphs; callers may dedupe).
    """
    from .. import native
    if native.available():
        src, dst = native.rmat(num_edges, num_nodes, seed, a, b, c)
        keep = src != dst
        return np.stack([src[keep].astype(np.int64),
                         dst[keep].astype(np.int64)])

    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(max(num_nodes, 2))))
    n = num_edges
    src = np.zeros(n, np.int64)
    dst = np.zeros(n, np.int64)
    pa, pb, pc = a, b, c
    for _ in range(scale):
        r = rng.random(n)
        # quadrant choice: a | b | c | d
        go_right = (r >= pa) & (r < pa + pb) | (r >= pa + pb + pc)
        go_down = r >= pa + pb
        src = src * 2 + go_down
        dst = dst * 2 + go_right
    src %= num_nodes
    dst %= num_nodes
    keep = src != dst
    return np.stack([src[keep], dst[keep]])


def rmat_dataset(
    num_nodes: int,
    num_edges: int,
    num_features: int,
    num_classes: int,
    name: str = "rmat",
    seed: int = 0,
    edge_multiple: int = 4096,
    undirected: bool = True,
    feature_dtype=np.float32,
    tiling: Optional[tuple[int, int, int]] = None,
) -> NodeDataset:
    """Size-matched benchmark dataset: RMAT structure + SBM-style learnable
    signal (community-biased extra edges and class-correlated features)."""
    rng = np.random.default_rng(seed + 1)
    ei = rmat_edges(num_nodes, num_edges, seed)
    if undirected:
        ei = np.concatenate([ei, ei[::-1]], axis=1)
    graph = from_edge_index(ei, num_nodes=num_nodes,
                            edge_multiple=edge_multiple, tiling=tiling)

    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    centers = rng.normal(size=(num_classes, num_features)).astype(np.float32)
    x = centers[y] + rng.normal(
        scale=2.0, size=(num_nodes, num_features)).astype(feature_dtype)

    masks = _split_masks(num_nodes, rng)
    return NodeDataset(name, graph, x.astype(np.float32), y, *masks,
                       num_classes=num_classes)


def sbm_dataset(
    num_nodes: int = 2000,
    num_classes: int = 7,
    num_features: int = 64,
    avg_degree: float = 10.0,
    homophily: float = 0.8,
    noise: float = 1.0,
    seed: int = 0,
    edge_multiple: int = 512,
    name: str = "sbm",
    tiling: Optional[tuple[int, int, int]] = None,
) -> NodeDataset:
    """Stochastic-block-model dataset where neighborhood aggregation is
    genuinely informative — a trained GCN separates classes that raw
    features cannot (features are noisy class centroids)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)

    num_edges = int(num_nodes * avg_degree)
    src = rng.integers(0, num_nodes, size=3 * num_edges)
    dst_same = rng.integers(0, num_nodes, size=3 * num_edges)
    # rejection-match: keep intra-class pairs with prob `homophily`
    same = y[src] == y[dst_same]
    use = rng.random(3 * num_edges) < np.where(same, homophily,
                                               1.0 - homophily)
    src, dst = src[use][:num_edges], dst_same[use][:num_edges]
    keep = src != dst
    ei = np.stack([src[keep], dst[keep]])
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    graph = from_edge_index(ei, num_nodes=num_nodes,
                            edge_multiple=edge_multiple, tiling=tiling)

    centers = rng.normal(size=(num_classes, num_features)).astype(np.float32)
    x = (centers[y] + noise * rng.normal(
        size=(num_nodes, num_features))).astype(np.float32)

    masks = _split_masks(num_nodes, rng)
    return NodeDataset(name, graph, x, y, *masks, num_classes=num_classes)


def _split_masks(num_nodes: int, rng) -> tuple[np.ndarray, ...]:
    """60/20/20 random split (reference datasets ship their own splits;
    synthetic ones use this)."""
    perm = rng.permutation(num_nodes)
    train = np.zeros(num_nodes, bool)
    val = np.zeros(num_nodes, bool)
    test = np.zeros(num_nodes, bool)
    n_train = int(0.6 * num_nodes)
    n_val = int(0.2 * num_nodes)
    train[perm[:n_train]] = True
    val[perm[n_train:n_train + n_val]] = True
    test[perm[n_train + n_val:]] = True
    return train, val, test
