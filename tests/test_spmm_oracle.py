"""SpMM oracle correctness vs dense formulations + autograd checks.

This is the unit-test layer the reference lacks entirely (its only
correctness signal is end-to-end accuracy A/B against torch_sparse,
``/root/reference/tests/cpu/run_test.sh:5-16``).  The dense oracle here is
plain numpy; gradients are checked against jax.grad of the dense
formulation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isplib_tpu import CSRGraph, from_edge_index, spmm, sddmm


def random_graph(rng, num_rows=57, num_cols=43, nnz=300, with_values=True,
                 edge_multiple=64, self_loops_only=False):
    src = rng.integers(0, num_cols, size=nnz)
    dst = rng.integers(0, num_rows, size=nnz)
    # dedupe (r, c) pairs so dense comparison is unambiguous for max/min ties
    pairs = np.unique(np.stack([dst, src]), axis=1)
    dst, src = pairs[0], pairs[1]
    vals = rng.normal(size=dst.shape[0]).astype(np.float32) if with_values \
        else None
    g = from_edge_index(
        np.stack([src, dst]), num_nodes=num_rows, num_src_nodes=num_cols,
        edge_value=vals, edge_multiple=edge_multiple,
    )
    return g


def dense_of(graph: CSRGraph) -> np.ndarray:
    a = np.zeros((graph.num_rows, graph.num_cols), np.float32)
    row = np.asarray(graph.row)[: graph.nnz]
    col = np.asarray(graph.col)[: graph.nnz]
    val = np.asarray(graph.value)[: graph.nnz]
    a[row, col] = val
    return a


def dense_spmm(a, x, reduce):
    """Numpy oracle with PyG semantics (empty rows → 0)."""
    mask = a != 0
    if reduce == "sum":
        return a @ x
    if reduce == "mean":
        deg = np.maximum(mask.sum(1, keepdims=True), 1)
        return (a @ x) / deg
    big = np.where(mask[:, :, None], a[:, :, None] * x[None, :, :], np.nan)
    with np.errstate(all="ignore"):
        out = np.nanmax(big, 1) if reduce == "max" else np.nanmin(big, 1)
    out = np.where(mask.any(1, keepdims=True), out, 0.0)
    return np.nan_to_num(out, nan=0.0)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
@pytest.mark.parametrize("with_values", [True, False])
def test_forward_vs_dense(rng, reduce, with_values):
    g = random_graph(rng, with_values=with_values)
    x = rng.normal(size=(g.num_cols, 16)).astype(np.float32)
    out = spmm(g, jnp.asarray(x), reduce=reduce)
    ref = dense_spmm(dense_of(g), x, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_forward_jit(rng, reduce):
    g = random_graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 8)).astype(np.float32))
    f = jax.jit(lambda g_, x_: spmm(g_, x_, reduce=reduce))
    np.testing.assert_allclose(
        np.asarray(f(g, x)), np.asarray(spmm(g, x, reduce=reduce)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_grad_x_vs_dense(rng, reduce):
    g = random_graph(rng, num_rows=23, num_cols=19, nnz=80)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    def loss(x_):
        return jnp.sum(spmm(g, x_, reduce=reduce) * w)

    a = dense_of(g)

    def dense_loss(x_):
        return jnp.sum(
            jnp.asarray(dense_spmm_jax(a, x_, reduce)) * w
        )

    got = jax.grad(loss)(x)
    want = jax.grad(dense_loss)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def dense_spmm_jax(a, x, reduce):
    """Differentiable dense formulation for gradient oracles."""
    a = jnp.asarray(a)
    mask = a != 0
    if reduce == "sum":
        return a @ x
    if reduce == "mean":
        deg = jnp.maximum(mask.sum(1, keepdims=True), 1)
        return (a @ x) / deg
    neutral = -jnp.inf if reduce == "max" else jnp.inf
    big = jnp.where(mask[:, :, None], a[:, :, None] * x[None, :, :], neutral)
    out = big.max(1) if reduce == "max" else big.min(1)
    return jnp.where(mask.any(1, keepdims=True), out, 0.0)


def test_grad_value_vs_dense(rng):
    """Edge-weight gradients via differentiating the whole graph pytree —
    implemented for ALL reductions (the reference skips sum/mean,
    /root/reference/csrc/fusedmm.cpp:268-272)."""
    reduce = "sum"
    g = random_graph(rng, num_rows=23, num_cols=19, nnz=80)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 6)).astype(np.float32))

    def loss(g_):
        return jnp.sum(spmm(g_, x, reduce=reduce) ** 2)

    cot = jax.grad(loss, allow_int=True)(g)
    grad_value = np.asarray(cot.value)[: g.nnz]

    # dense oracle: differentiate wrt the nnz values
    row = np.asarray(g.row)[: g.nnz]
    col = np.asarray(g.col)[: g.nnz]

    def dense_loss(vals):
        a = jnp.zeros((g.num_rows, g.num_cols)).at[row, col].set(vals)
        return jnp.sum(dense_spmm_jax_traced(a, x, reduce) ** 2)

    want = jax.grad(dense_loss)(jnp.asarray(np.asarray(g.value)[: g.nnz]))
    np.testing.assert_allclose(grad_value, np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def dense_spmm_jax_traced(a, x, reduce):
    # like dense_spmm_jax but mask must come from structure, not value
    # (a traced zero value still is a real edge)
    if reduce == "sum":
        return a @ x
    raise NotImplementedError


@pytest.mark.parametrize("reduce", ["mean", "max", "min"])
def test_grad_value_fd(rng, reduce):
    """Finite-difference check of grad_value for mean/max/min (dense
    structural oracle is awkward there)."""
    g = random_graph(rng, num_rows=17, num_cols=13, nnz=60)
    x = jnp.asarray(rng.normal(size=(g.num_cols, 4)).astype(np.float32))
    probe = jnp.asarray(
        rng.normal(size=(g.num_rows, 4)).astype(np.float32))

    def loss_from_vals(vals):
        g2 = g.with_value(vals)
        return jnp.sum(spmm(g2, x, reduce=reduce) * probe)

    v0 = jnp.asarray(np.asarray(g.value)[: g.nnz])
    got = jax.grad(loss_from_vals)(v0)

    eps = 1e-3
    d = np.asarray(rng.normal(size=v0.shape).astype(np.float32))
    f_p = loss_from_vals(v0 + eps * d)
    f_m = loss_from_vals(v0 - eps * d)
    fd = (f_p - f_m) / (2 * eps)
    analytic = jnp.sum(got * d)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2,
                               atol=2e-2)


def test_sddmm_vs_dense(rng):
    g = random_graph(rng, num_rows=23, num_cols=19, nnz=80)
    a = rng.normal(size=(g.num_rows, 6)).astype(np.float32)
    b = rng.normal(size=(g.num_cols, 6)).astype(np.float32)
    out = np.asarray(sddmm(g, jnp.asarray(a), jnp.asarray(b)))
    row = np.asarray(g.row)[: g.nnz]
    col = np.asarray(g.col)[: g.nnz]
    want = np.einsum("ek,ek->e", a[row], b[col])
    np.testing.assert_allclose(out[: g.nnz], want, rtol=1e-5, atol=1e-5)
    assert np.all(out[g.nnz:] == 0)


def test_empty_rows_and_isolated_nodes(rng):
    # rows 0..4 have no edges at all
    src = np.array([0, 1, 2])
    dst = np.array([7, 8, 9])
    g = from_edge_index(np.stack([src, dst]), num_nodes=12)
    x = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    for reduce in ["sum", "mean", "max", "min"]:
        out = np.asarray(spmm(g, x, reduce=reduce))
        np.testing.assert_array_equal(out[0:5], 0.0)


def test_transpose_roundtrip(rng):
    g = random_graph(rng)
    gt = g.transpose()
    np.testing.assert_allclose(dense_of(gt), dense_of(g).T)
    x = jnp.asarray(rng.normal(size=(g.num_rows, 8)).astype(np.float32))
    out = spmm(gt, x, reduce="sum")
    np.testing.assert_allclose(
        np.asarray(out), dense_of(g).T @ np.asarray(x), rtol=1e-5, atol=1e-5)
