"""Pure-XLA SpMM / SDDMM — the correctness oracle and small-graph backend.

This is the compute path everything else is tested against: gather +
``jax.ops.segment_*`` formulations that XLA compiles natively.  The Pallas
kernels in ``isplib_tpu.kernels`` must match these bit-for-bit (sum order
aside).

Semantics mirror the reference C++ driver ``fusedmm_spmm_fw``
(``/root/reference/csrc/fusedmm.cpp:113-203``):

  out[r] = reduce_{e : row[e]==r} value[e] * x[col[e]]        (sum/max/min)
  out[r] = (1/max(deg[r],1)) * sum_{e} value[e] * x[col[e]]   (mean — the
            degree clamp matches ``/root/reference/isplib/__init__.py:88``)

with two deviations, both deliberate:

* empty rows produce 0 for max/min (torch_sparse / PyG semantics) rather
  than float-lowest (the reference's raw kernel init,
  ``csrc/fusedmm.cpp:147-152`` — its Python layer never exposes those rows
  because benchmark graphs have no isolated nodes);
* argmax/argmin ties resolve to the lowest edge id (torch_scatter parity).

All arrays are the *padded* forms from :class:`isplib_tpu.sparse.CSRGraph`:
pad edges carry row == num_rows (dump row, sliced off) and col == num_cols
(phantom zero-feature node), so no masking is needed anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .semiring import Reduce

__all__ = ["spmm_raw", "spmm_arg_raw", "sddmm_dot_raw", "gather_rows"]


def _pad_x(x: jax.Array) -> jax.Array:
    """Append the phantom zero row addressed by pad column ids."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)


def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x is (N, K); idx may address row N (phantom zero row)."""
    return jnp.take(_pad_x(x), idx, axis=0, indices_are_sorted=False,
                    unique_indices=False)


def spmm_raw(
    row: jax.Array,
    col: jax.Array,
    value: jax.Array,
    deg: jax.Array,
    x: jax.Array,
    num_rows: int,
    reduce: Reduce,
    empty_to_zero: bool = True,
) -> jax.Array:
    """SpMM forward on raw padded COO arrays (CSR-sorted rows).

    ``empty_to_zero=False`` keeps the ±inf reduction identity on empty
    rows for max/min — used by the distributed path to combine partial
    local/halo aggregates before the final clamp.
    """
    reduce = Reduce.of(reduce)
    msg = gather_rows(x, col)  # (E, K)
    num_segments = num_rows + 1  # + dump row for pad edges

    if reduce in (Reduce.SUM, Reduce.MEAN):
        contrib = value[:, None].astype(msg.dtype) * msg
        out = jax.ops.segment_sum(contrib, row, num_segments=num_segments,
                                  indices_are_sorted=True)[:num_rows]
        if reduce is Reduce.MEAN:
            out = out / jnp.maximum(deg, 1.0)[:, None].astype(out.dtype)
        return out

    contrib = value[:, None].astype(msg.dtype) * msg
    if reduce is Reduce.MAX:
        out = jax.ops.segment_max(contrib, row, num_segments=num_segments,
                                  indices_are_sorted=True)[:num_rows]
    else:
        out = jax.ops.segment_min(contrib, row, num_segments=num_segments,
                                  indices_are_sorted=True)[:num_rows]
    if not empty_to_zero:
        return out
    # Empty rows: segment_max identity is -inf; clamp to 0 (PyG semantics).
    return jnp.where((deg > 0)[:, None], out, jnp.zeros_like(out))


def spmm_arg_raw(
    row: jax.Array,
    col: jax.Array,
    value: jax.Array,
    deg: jax.Array,
    x: jax.Array,
    num_rows: int,
    reduce: Reduce,
) -> tuple[jax.Array, jax.Array]:
    """Max/min SpMM that also returns per-(row, feature) winning edge ids.

    Mirrors the reference's ``z_arg`` argmax output
    (``/root/reference/csrc/fusedMM.h:96-99``, ``csrc/fusedmm.cpp:397-407``).
    Sentinel for rows with no edges: ``len(col) - 1`` — guaranteed to be a
    pad edge (value 0, col == num_cols), so gradients routed through the
    sentinel land on the phantom row and vanish.
    """
    reduce = Reduce.of(reduce)
    assert reduce in (Reduce.MAX, Reduce.MIN)
    nnz_padded = col.shape[0]
    num_segments = num_rows + 1

    msg = gather_rows(x, col)
    contrib = value[:, None].astype(msg.dtype) * msg
    if reduce is Reduce.MIN:
        contrib_cmp = -contrib
    else:
        contrib_cmp = contrib

    best = jax.ops.segment_max(contrib_cmp, row, num_segments=num_segments,
                               indices_are_sorted=True)
    # Winner edge id: lowest edge id attaining the max in its row.  Pad
    # edges have value 0 ⇒ contrib 0; rows with real edges of contrib < 0
    # could falsely tie with nothing (pad edges live in the dump row, so no
    # interference).  Ties → segment_min over edge ids.
    is_best = contrib_cmp == jnp.take(best, row, axis=0)
    eid = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
    eid_masked = jnp.where(is_best, eid, jnp.int32(nnz_padded - 1))
    arg = jax.ops.segment_min(eid_masked, row, num_segments=num_segments,
                              indices_are_sorted=True)[:num_rows]

    out = (-best if reduce is Reduce.MIN else best)[:num_rows]
    valid = (deg > 0)[:, None]
    out = jnp.where(valid, out, jnp.zeros_like(out))
    arg = jnp.where(valid, arg, jnp.int32(nnz_padded - 1))
    return out, arg


def sddmm_dot_raw(
    row: jax.Array,
    col: jax.Array,
    a: jax.Array,
    b: jax.Array,
    scale: jax.Array | None = None,
) -> jax.Array:
    """Per-edge dot product: out[e] = scale[e] * <a[row[e]], b[col[e]]>.

    This is the SDDMM used for ``grad_value`` — the gradient the reference
    never implemented for sum/mean (``/root/reference/csrc/fusedmm.cpp:268-272``).
    ``a`` may have num_rows rows (row side) — pad row ids address the
    appended phantom zero row, so pad edges yield 0.
    """
    av = gather_rows(a, row)
    bv = gather_rows(b, col)
    out = jnp.sum(av * bv, axis=-1)
    if scale is not None:
        out = out * scale.astype(out.dtype)
    return out
