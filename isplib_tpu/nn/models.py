"""Benchmark model zoo — architectures match the reference's test models
exactly so accuracy tables are directly comparable.

* GCN  — ``/root/reference/tests/cpu/gcn-sparse.py:55-68``
* SAGE — ``/root/reference/tests/cpu/graphSAGE-sparse.py:65-78``
* GIN  — ``/root/reference/tests/cpu/gin-sparse.py:59-78``
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sparse.graph import CSRGraph
from .conv import GCNConv, GINConv, SAGEConv

__all__ = ["GCN", "GraphSAGE", "GIN", "MODEL_REGISTRY"]


class GCN(nn.Module):
    """2-layer GCN → log_softmax (reference gcn-sparse.py:55-68)."""

    hidden: int = 32
    num_classes: int = 41
    dropout_rate: float = 0.5
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array, *,
                 training: bool = False) -> jax.Array:
        x = GCNConv(self.hidden, backend=self.backend, name="conv1")(graph, x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = GCNConv(self.num_classes, backend=self.backend,
                    name="conv2")(graph, x)
        return nn.log_softmax(x, axis=-1)


class GraphSAGE(nn.Module):
    """2-layer GraphSAGE with sum|mean aggregation
    (reference graphSAGE-sparse.py:65-78)."""

    hidden: int = 32
    num_classes: int = 41
    aggr: str = "mean"
    dropout_rate: float = 0.5
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array, *,
                 training: bool = False) -> jax.Array:
        x = SAGEConv(self.hidden, aggr=self.aggr, backend=self.backend,
                     name="conv1")(graph, x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = SAGEConv(self.num_classes, aggr=self.aggr, backend=self.backend,
                     name="conv2")(graph, x)
        return nn.log_softmax(x, axis=-1)


class _GINMLP(nn.Module):
    width: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width)(x)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


class GIN(nn.Module):
    """2 GIN convs (2-layer MLPs) + batchnorm + 2 FC heads, logits output
    (trained with cross-entropy; reference gin-sparse.py:59-78,100)."""

    hidden: int = 32
    num_classes: int = 41
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array, *,
                 training: bool = False) -> jax.Array:
        x = GINConv(partial(_GINMLP, self.hidden, self.hidden),
                    backend=self.backend, name="conv1")(graph, x)
        x = nn.BatchNorm(use_running_average=not training, name="bn1")(x)
        x = GINConv(partial(_GINMLP, self.hidden, self.hidden),
                    backend=self.backend, name="conv2")(graph, x)
        x = nn.BatchNorm(use_running_average=not training, name="bn2")(x)
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)


MODEL_REGISTRY = {
    "gcn": GCN,
    "sage": GraphSAGE,
    "gin": GIN,
}
