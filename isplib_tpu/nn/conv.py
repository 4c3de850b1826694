"""Message-passing layers (flax.linen) — the native layer API that replaces
the reference's PyG monkey-patch integration.

The reference accelerates stock PyG layers by hijacking
``torch_sparse.matmul`` (``/root/reference/isplib/__init__.py:173-178``).
JAX has no global dispatch to patch — and doesn't need one: these layers
call :func:`isplib_tpu.spmm` directly.  Module structures mirror the PyG
layers the reference benchmarks use, so parameters map 1:1:

* ``GCNConv``  ≡ PyG GCNConv(cached=True, normalize=False)
  (``/root/reference/tests/cpu/gcn-sparse.py:58-60``)
* ``SAGEConv`` ≡ PyG SAGEConv(aggr=sum|mean, normalize=False)
  (``/root/reference/tests/cpu/graphSAGE-sparse.py:67-69``)
* ``GINConv``  ≡ PyG GINConv(nn) (``/root/reference/tests/cpu/gin-sparse.py:62-68``)
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spmm import spmm
from ..sparse.graph import CSRGraph

__all__ = ["GCNConv", "SAGEConv", "GINConv"]

# Matmul dtype for layer weights: bf16 accumulate-to-f32 is the MXU native
# mode; parameters stay f32 and are cast per-call.
_DEFAULT_DTYPE = jnp.float32


class GCNConv(nn.Module):
    """x' = Â · (x W) + b.

    With ``normalize=False`` (the reference benchmark setting) Â is the
    graph as given; apply :func:`isplib_tpu.nn.transforms.gcn_norm` once,
    offline, for symmetric normalization (PyG's cached=True behavior).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (x.shape[-1], self.features),
            _DEFAULT_DTYPE,
        )
        dtype = self.dtype or x.dtype
        # Dense transform first (shrinks the SpMM width when features < in).
        h = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        out = spmm(graph, h, reduce="sum", backend=self.backend)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), _DEFAULT_DTYPE)
            out = out + bias.astype(out.dtype)
        return out


class SAGEConv(nn.Module):
    """x' = W_l · aggr_{neigh}(x) + W_r · x  (+ b), aggr ∈ sum|mean|max|min."""

    features: int
    aggr: str = "mean"
    use_bias: bool = True
    root_weight: bool = True
    dtype: Optional[jnp.dtype] = None
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array) -> jax.Array:
        dtype = self.dtype or x.dtype
        agg = spmm(graph, x, reduce=self.aggr, backend=self.backend)
        out = nn.Dense(self.features, use_bias=self.use_bias,
                       param_dtype=_DEFAULT_DTYPE, dtype=dtype,
                       name="lin_l")(agg)
        if self.root_weight:
            out = out + nn.Dense(self.features, use_bias=False,
                                 param_dtype=_DEFAULT_DTYPE, dtype=dtype,
                                 name="lin_r")(x)
        return out


class GINConv(nn.Module):
    """x' = mlp((1 + eps) · x + sum_{neigh}(x)).

    ``mlp`` is any flax module factory; ``train_eps`` makes eps learnable
    (PyG default is fixed 0, which the reference uses).
    """

    mlp: Callable[[], nn.Module]
    eps: float = 0.0
    train_eps: bool = False
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, graph: CSRGraph, x: jax.Array) -> jax.Array:
        agg = spmm(graph, x, reduce="sum", backend=self.backend)
        if self.train_eps:
            eps = self.param("eps", nn.initializers.constant(self.eps), ())
        else:
            eps = self.eps
        h = (1.0 + eps) * x + agg
        return self.mlp()(h)
