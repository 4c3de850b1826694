"""Torch-bridge tests: the patched-PyG surface (SURVEY C1) against dense
torch oracles with torch autograd end to end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import scipy.sparse as sp  # noqa: E402

from isplib_tpu.interop import (  # noqa: E402
    iSpLibPlugin,
    isplib_autotune,
    spmm_autotuned,
    torch_spmm,
    clear_cache,
)

R, C, K = 48, 40, 8


def _random_csr(seed=0, ensure_nonempty=True):
    rng = np.random.default_rng(seed)
    dense = (rng.random((R, C)) < 0.15).astype(np.float32)
    if ensure_nonempty:
        dense[np.arange(R), rng.integers(0, C, R)] = 1.0
    vals = rng.normal(size=(R, C)).astype(np.float32)
    a = dense * vals
    return sp.csr_matrix(a), a


def _torch_csr(mat: sp.csr_matrix):
    return torch.sparse_csr_tensor(
        torch.from_numpy(mat.indptr.astype(np.int64)),
        torch.from_numpy(mat.indices.astype(np.int64)),
        torch.from_numpy(mat.data.astype(np.float32)),
        size=mat.shape,
    )


def _dense_oracle(a: np.ndarray, x: torch.Tensor, reduce: str):
    at = torch.from_numpy(a)
    mask = torch.from_numpy((a != 0))
    if reduce == "sum":
        return at @ x
    if reduce == "mean":
        deg = mask.sum(1, keepdim=True).clamp(min=1).float()
        return (at @ x) / deg
    big = at[:, :, None] * x[None, :, :]
    big = torch.where(mask[:, :, None], big,
                      torch.tensor(-np.inf if reduce == "max" else np.inf))
    out = big.amax(1) if reduce == "max" else big.amin(1)
    return torch.where(torch.isfinite(out), out, torch.zeros(()))


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_cache()
    yield
    clear_cache()
    iSpLibPlugin.unpatch_pyg()


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_forward_matches_dense(reduce):
    mat, a = _random_csr()
    src = _torch_csr(mat)
    x = torch.from_numpy(
        np.random.default_rng(1).normal(size=(C, K)).astype(np.float32))
    out = torch_spmm(src, x, reduce=reduce)
    ref = _dense_oracle(a, x, reduce)
    assert out.shape == (R, K)
    np.testing.assert_allclose(out.numpy(), ref.numpy(), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_backward_matches_dense(reduce):
    mat, a = _random_csr(seed=2)
    src = _torch_csr(mat)
    xv = np.random.default_rng(3).normal(size=(C, K)).astype(np.float32)
    w = np.random.default_rng(4).normal(size=(R, K)).astype(np.float32)
    wt = torch.from_numpy(w)

    x1 = torch.tensor(xv, requires_grad=True)
    (torch_spmm(src, x1, reduce=reduce) * wt).sum().backward()

    x2 = torch.tensor(xv, requires_grad=True)
    (_dense_oracle(a, x2, reduce) * wt).sum().backward()

    np.testing.assert_allclose(x1.grad.numpy(), x2.grad.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_graph_cache_hit():
    from isplib_tpu.interop import torch_bridge
    mat, _ = _random_csr()
    src = _torch_csr(mat)
    x = torch.zeros((C, K))
    torch_spmm(src, x)
    assert len(torch_bridge._graph_cache) == 1
    torch_spmm(src, x, reduce="mean")
    assert len(torch_bridge._graph_cache) == 1  # same adjacency, one entry


def test_patch_torch_sparse_mm():
    mat, a = _random_csr(seed=5)
    coo = mat.tocoo()
    src = torch.sparse_coo_tensor(
        np.stack([coo.row, coo.col]).astype(np.int64),
        coo.data.astype(np.float32), size=mat.shape)
    x = torch.from_numpy(
        np.random.default_rng(6).normal(size=(C, K)).astype(np.float32))

    orig = torch.sparse.mm
    iSpLibPlugin.patch_pyg()
    try:
        assert torch.sparse.mm is not orig
        out = torch.sparse.mm(src, x)
    finally:
        iSpLibPlugin.unpatch_pyg()
    assert torch.sparse.mm is orig

    np.testing.assert_allclose(out.numpy(), (a @ x.numpy()),
                               rtol=2e-5, atol=2e-5)


def test_autotune_decorator_restores():
    orig = torch.sparse.mm
    seen = {}

    @isplib_autotune
    def body():
        seen["patched"] = torch.sparse.mm is not orig
        return 7

    assert body() == 7
    assert seen["patched"]
    assert torch.sparse.mm is orig


def test_spmm_autotuned_alias():
    mat, a = _random_csr(seed=7)
    src = _torch_csr(mat)
    x = torch.from_numpy(
        np.random.default_rng(8).normal(size=(C, K)).astype(np.float32))
    out = spmm_autotuned(src, x, reduce="add")  # torch_sparse alias
    np.testing.assert_allclose(out.numpy(), a @ x.numpy(), rtol=2e-5,
                               atol=2e-5)
