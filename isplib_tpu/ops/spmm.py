"""The public SpMM op: dispatch + full custom autograd.

Replaces the reference's four ``torch::autograd::Function`` subclasses
(``/root/reference/csrc/fusedmm.cpp:210-518``) with a single
``jax.custom_vjp`` over the graph pytree and the dense operand.  Improvements
over the reference autograd:

* **grad_value (SDDMM) exists for sum and mean** — the reference returns an
  empty Variable there (``csrc/fusedmm.cpp:268-272,349-353``), so learnable
  edge weights silently get no gradient.  Here ``jax.grad`` w.r.t. the graph
  returns a ``CSRGraph`` cotangent whose ``.value`` field is the true
  edge-weight gradient.
* The transpose operands (CSC view) are precomputed once in the graph
  container instead of cached per-data_ptr in Python dicts
  (``/root/reference/isplib/__init__.py:66-99``).

Backward formulas (matching ``csrc/fusedmm.cpp`` where it has them):

  sum : grad_x = SpMM(Aᵀ, g)                        (fusedmm.cpp:274-286)
        grad_w[e] = <g[row[e]], x[col[e]]>          (SDDMM — ref gap)
  mean: grad_x = SpMM(Aᵀ, g / max(deg,1))           (fusedmm.cpp:340-383)
        grad_w[e] = <g[row[e]], x[col[e]]> / deg[row[e]]
  max/min (fusedmm.cpp:410-451): gradients route only through the winning
        edge per (row, feature), via the saved arg indices:
        grad_x[col[arg[r,k]], k] += value[arg] * g[r,k]
        grad_w[arg[r,k]]        += x[col[arg], k] * g[r,k]
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.graph import CSRGraph
from ..sparse.tiling import TiledGraph, base_graph
from .semiring import Reduce
from . import xla_backend

__all__ = ["spmm", "sddmm", "set_default_backend"]

_DEFAULT_BACKEND = "auto"


def set_default_backend(name: str) -> None:
    """Set the process-wide default compute backend: auto|xla|pallas."""
    global _DEFAULT_BACKEND
    assert name in ("auto", "xla", "pallas")
    _DEFAULT_BACKEND = name


def _zero_graph_cotangent(graph: CSRGraph) -> CSRGraph:
    """A cotangent pytree for CSRGraph: float leaves → zeros, int leaves →
    float0 (JAX's unit cotangent type for non-differentiable dtypes)."""

    def z(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(z, graph)


def _forward(graph, x: jax.Array, reduce: Reduce, backend: str):
    if backend == "pallas":
        from ..kernels import spmm_pallas  # deferred: optional path
        return spmm_pallas.spmm_forward(graph, x, reduce)
    base = base_graph(graph)
    return xla_backend.spmm_raw(
        base.row, base.col, base.value, base.deg, x,
        base.num_rows, reduce,
    )


def _transpose_spmm(graph, g: jax.Array, backend: str):
    """SpMM with Aᵀ using the precomputed CSC view (always sum-reduce)."""
    if backend == "pallas":
        from ..kernels import spmm_pallas
        return spmm_pallas.spmm_transpose_sum(graph, g)
    base = base_graph(graph)
    return xla_backend.spmm_raw(
        base.csc_row, base.csc_col, base.csc_value, base.deg_t, g,
        base.num_cols, Reduce.SUM,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spmm(graph: CSRGraph, x: jax.Array, reduce: str, backend: str):
    return _forward(graph, x, Reduce.of(reduce), backend)


def _spmm_fwd(graph, x: jax.Array, reduce: str, backend: str):
    r = Reduce.of(reduce)
    if r in (Reduce.MAX, Reduce.MIN):
        base = base_graph(graph)
        if (backend == "pallas" and isinstance(graph, TiledGraph)
                and getattr(graph, "fwd_mm", None) is not None):
            # r5 row-stream max/min with arg outputs (ref parity:
            # /root/reference/csrc/fusedmm.cpp:397-407)
            from ..kernels.spmm_minmax_v4 import spmm_minmax_v4
            out, arg = spmm_minmax_v4(
                graph.fwd_mm, x, r.value, base.nnz_padded - 1)
            out = out.astype(x.dtype)
        elif (backend == "pallas" and isinstance(graph, TiledGraph)
                and graph.fwd_arg is not None):
            # legacy v2-cell in-kernel max/min
            from ..kernels.spmm_minmax import spmm_minmax_tiled
            out, arg = spmm_minmax_tiled(
                graph.fwd_arg, x, r.value, base.nnz_padded - 1)
            out = out.astype(x.dtype)
        else:
            out, arg = xla_backend.spmm_arg_raw(
                base.row, base.col, base.value, base.deg, x,
                base.num_rows, r,
            )
        return out, (graph, x, arg)
    out = _forward(graph, x, r, backend)
    return out, (graph, x, None)


def _spmm_bwd(reduce: str, backend: str, res, g):
    graph, x, arg = res
    base = base_graph(graph)
    r = Reduce.of(reduce)

    if r in (Reduce.SUM, Reduce.MEAN):
        if r is Reduce.MEAN:
            g_eff = g / jnp.maximum(base.deg, 1.0)[:, None].astype(g.dtype)
        else:
            g_eff = g
        grad_x = _transpose_spmm(graph, g_eff, backend)
        grad_value = _sddmm_grad_value(graph, base, g_eff, x, backend)
    else:
        # arg: (R, K) winning edge ids (sentinel = pad edge nnz_padded-1).
        num_cols, k = base.num_cols, x.shape[1]
        col_of_arg = jnp.take(base.col, arg, axis=0)           # (R, K)
        val_of_arg = jnp.take(base.value, arg, axis=0)         # (R, K)
        feat = jax.lax.broadcasted_iota(jnp.int32, arg.shape, 1)
        grad_x = (
            jnp.zeros((num_cols + 1, k), g.dtype)
            .at[col_of_arg, feat]
            .add(val_of_arg.astype(g.dtype) * g)[:num_cols]
        )
        # x[col[arg[r,k]], k] — elementwise 2-D gather, no (R,K,K) blowup.
        x_pad = jnp.concatenate([x, jnp.zeros((1, k), x.dtype)], axis=0)
        x_sel = x_pad[col_of_arg, feat]
        grad_value = (
            jnp.zeros((base.nnz_padded,), g.dtype)
            .at[arg.reshape(-1)]
            .add((x_sel * g).reshape(-1))
        )
        # Pad/sentinel edges must not carry gradient.
        grad_value = grad_value.at[base.nnz_padded - 1].set(0.0)

    cot = _zero_graph_cotangent(graph)
    grad_value = grad_value.astype(base.value.dtype)
    if grad_value.shape[0] > base.nnz:
        mask = jnp.arange(grad_value.shape[0]) < base.nnz
        grad_value = jnp.where(mask, grad_value, 0.0)
    if isinstance(graph, TiledGraph):
        cot = dataclasses.replace(
            cot, graph=dataclasses.replace(cot.graph, value=grad_value))
    else:
        cot = dataclasses.replace(cot, value=grad_value)
    return cot, grad_x.astype(x.dtype)


def _sddmm_grad_value(graph, base, g_eff: jax.Array, x: jax.Array,
                      backend: str) -> jax.Array:
    """grad_value = per-edge <g_eff[row], x[col]> (SDDMM).

    Tiled graphs with a with-eids plan use the Pallas SDDMM kernel
    (tile-streaming; VERDICT r2 next #6) instead of the XLA path's two
    (E, K) gathers."""
    if (backend == "pallas" and isinstance(graph, TiledGraph)
            and graph.fwd_arg is not None
            and graph.fwd_arg.edges.shape[1] == 4):
        from ..kernels.sddmm_pallas import sddmm_tiled
        return sddmm_tiled(graph.fwd_arg, g_eff, x, base.nnz_padded)
    return xla_backend.sddmm_dot_raw(base.row, base.col, g_eff, x)


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(
    graph: CSRGraph,
    x: jax.Array,
    reduce: str | Reduce = "sum",
    backend: str | None = None,
) -> jax.Array:
    """Sparse-dense matmul ``out = reduce(A ⊙ x)`` with full autograd.

    Drop-in functional equivalent of the reference's patched
    ``torch_sparse.matmul(adj_t, x, reduce)``
    (``/root/reference/isplib/__init__.py:140-155``).

    Args:
      graph: CSR adjacency (R × C).
      x: dense operand, (C, K).
      reduce: one of sum | mean | max | min.
      backend: xla | pallas | auto (None → process default).
    """
    from ..dist.partition import ShardedGraph
    if isinstance(graph, ShardedGraph):
        # Sharded graphs run through plain JAX AD: the halo all_to_all and
        # local gather both have transposes, so no custom_vjp is needed.
        from ..dist.spmm_dist import spmm_sharded
        return spmm_sharded(graph, x, reduce=reduce)
    backend = backend or _DEFAULT_BACKEND
    if backend == "auto":
        graph, backend = _auto_route(graph, x)
    reduce = Reduce.of(reduce).value
    return _spmm(graph, x, reduce, backend)


def _auto_route(graph, x: jax.Array):
    """Backend (and possibly graph) for ``backend='auto'``.

    TiledGraph → pallas.  A plain *concrete* CSRGraph large enough to
    deserve the kernel is upgraded in place via
    :func:`isplib_tpu.sparse.tiling.auto_tile` (one-time plan build,
    memoized per graph) — an untuned user with a 100M-edge graph must
    not silently stay on segment-sum.  Inside a jit trace the graph
    leaves are tracers, so the decision falls back to the measured tune
    cache (static lookup): pre-build or tune before jitting for the
    kernel path there.
    """
    if isinstance(graph, TiledGraph):
        return graph, "pallas"
    if not isinstance(graph.col, jax.core.Tracer):
        from ..sparse.tiling import auto_tile
        upgraded = auto_tile(graph, k=int(x.shape[-1]))
        if isinstance(upgraded, TiledGraph):
            return upgraded, "pallas"
    from ..tune import autotune
    return graph, autotune.lookup_backend(graph, x)


@jax.custom_vjp
def _sddmm_op(graph, a: jax.Array, b: jax.Array) -> jax.Array:
    base = base_graph(graph)
    if (isinstance(graph, TiledGraph) and graph.fwd_arg is not None
            and graph.fwd_arg.edges.shape[1] == 4):
        # tile-streaming Pallas kernel (VERDICT r2 next #6)
        from ..kernels.sddmm_pallas import sddmm_tiled
        out = sddmm_tiled(graph.fwd_arg, a, b, base.nnz_padded)
    else:
        out = xla_backend.sddmm_dot_raw(base.row, base.col, a, b)
    if base.nnz_padded > base.nnz:
        mask = jnp.arange(base.nnz_padded) < base.nnz
        out = jnp.where(mask, out, 0.0)
    return out


def _sddmm_op_fwd(graph, a, b):
    return _sddmm_op(graph, a, b), (graph, a, b)


def _sddmm_op_bwd(res, gbar):
    """SDDMM transposes to two SpMMs with the cotangent as edge values:
    grad_a[r] = Σ_{e: row=r} ḡ_e · b[col_e],  grad_b symmetrically via
    the CSC view (the Pallas forward kernel has no AD, so the backward
    is spelled out here; the XLA path would derive the same)."""
    graph, a, b = res
    base = base_graph(graph)
    gbar = gbar.astype(jnp.float32)
    if base.nnz_padded > base.nnz:
        gbar = jnp.where(jnp.arange(base.nnz_padded) < base.nnz, gbar, 0.0)
    grad_a = xla_backend.spmm_raw(
        base.row, base.col, gbar, base.deg, b.astype(jnp.float32),
        base.num_rows, Reduce.SUM)
    grad_b = xla_backend.spmm_raw(
        base.csc_row, base.csc_col, gbar[base.csc2csr], base.deg_t,
        a.astype(jnp.float32), base.num_cols, Reduce.SUM)
    return (_zero_graph_cotangent(graph), grad_a.astype(a.dtype),
            grad_b.astype(b.dtype))


_sddmm_op.defvjp(_sddmm_op_fwd, _sddmm_op_bwd)


def sddmm(
    graph,
    a: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Sampled dense-dense matmul: per-edge ``<a[row[e]], b[col[e]]>``.

    Returns a (nnz_padded,) vector in CSR edge order (pad entries 0);
    combine with ``graph.with_value`` for attention-style edge weights.
    Differentiable (custom VJP: the backward is two SpMMs).  Tiled
    graphs carrying a with-eids plan run the Pallas SDDMM kernel.
    """
    return _sddmm_op(graph, a, b)
