"""Host→device transfer helpers for tunneled TPU runtimes.

On this environment's tunneled TPU, a single large ``jax.device_put``
intermittently degrades to <1 MB/s (measured: an 8 MB first transfer can
take minutes), while a sequence of ≤8 MB transfers runs at 60–85 MB/s.
``chunked_device_put`` splits large host arrays into lane-aligned chunks,
uploads them individually, and reassembles on device with one concatenate
— turning a pathological minutes-long upload into seconds.

The reference never needs this (CPU-only, zero transfer cost); it is the
TPU-environment analog of its SIMD-friendly feature padding
(``/root/reference/tests/cpu/dataset_loader.py:145-160``): shaping data
movement to what the hardware path handles well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chunked_device_put", "tree_device_put"]

# ≤ this many bytes go up in one transfer; measured sweet spot on the
# tunnel is 4–16 MB per transfer.
_CHUNK_BYTES = 8 << 20


def chunked_device_put(a, chunk_bytes: int = _CHUNK_BYTES) -> jax.Array:
    """``jax.device_put`` that splits large host arrays into chunks.

    Splitting happens along a flattened view; the device reassembles with
    a single reshape(concatenate(...)).  Small arrays pass straight
    through.  Device arrays are returned unchanged.
    """
    if isinstance(a, jax.Array):
        return a
    a = np.asarray(a)
    if a.nbytes <= chunk_bytes:
        return jax.device_put(a)
    flat = a.reshape(-1)
    n = max(1, chunk_bytes // max(a.dtype.itemsize, 1))
    parts = [jax.device_put(flat[i:i + n]) for i in range(0, flat.shape[0], n)]
    return jnp.concatenate(parts).reshape(a.shape)


def tree_device_put(tree, chunk_bytes: int = _CHUNK_BYTES):
    """Upload every numpy leaf of a pytree via :func:`chunked_device_put`."""
    return jax.tree.map(
        lambda leaf: chunked_device_put(leaf, chunk_bytes)
        if isinstance(leaf, np.ndarray) else leaf, tree)
