"""PyTorch / PyG interoperability — the reference's plugin surface.

The reference's headline feature is transparently rerouting existing PyG
models through its native kernel by monkey-patching ``torch_sparse.matmul``
and ``torch.sparse.mm`` (``/root/reference/isplib/__init__.py:42-210``).
This package provides the same surface — ``iSpLibPlugin.patch_pyg()`` /
``unpatch_pyg()`` / ``@isplib_autotune`` / ``spmm_autotuned`` — with the
compute rerouted to this framework's TPU kernels through a
``torch.autograd.Function`` bridge.
"""

from .torch_bridge import (
    iSpLibPlugin,
    isplib_autotune,
    spmm_autotuned,
    torch_spmm,
    clear_cache,
)

__all__ = [
    "iSpLibPlugin",
    "isplib_autotune",
    "spmm_autotuned",
    "torch_spmm",
    "clear_cache",
]
