"""Pallas TPU SDDMM — per-edge ``<a[row[e]], b[col[e]]>`` over a tiled plan.

This is the kernel behind ``grad_value`` (the edge-weight gradient of
SpMM) and the DOT/NORM2 stages of the generalized FusedMM pipeline
(``/root/reference/csrc/fusedMM.h:32-43`` — VOP/ROP stages).  The
reference computes no grad_value for sum/mean at all
(``csrc/fusedmm.cpp:268-272``); our XLA fallback
(:func:`isplib_tpu.ops.xla_backend.sddmm_dot_raw`) materializes two
(E, K) gathers per call — ~2·E·K·4 bytes of HBM traffic.  This kernel
instead streams the plan's edge chunks and x/g *tiles* exactly like the
v2 forward kernel, so per-edge traffic drops to the ~16 B of packed
metadata (VERDICT r2 next #6).

Consumes the **with-eids v2 plan** (``TiledGraph.fwd_arg`` — 4th edge
plane = original edge id), because the output must land in original
CSR edge order: the kernel emits dots in plan order ``(nc, eb)`` and a
single XLA scatter places them at their edge ids.

Grid: ``(nc, n_kt)`` — one step per (chunk, K-tile), K fastest, the
``(1, sub, 128)`` output block revisited across K-tiles.  Inputs are
pipelined BlockSpecs (no manual DMA): consecutive chunks of one
(superblock, col-tile) cell reuse the same aᵀ/bᵀ tiles, which Pallas
detects via unchanged block indices and skips the copies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v2 import TiledPlanV2
from .spmm_pallas_v2 import _gather_x

__all__ = ["sddmm_tiled", "sddmm_dots_tiled"]

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sddmm_kernel(
    # scalar prefetch
    rb_locals_ref, sid_ref, ct_ref,
    # tensor inputs (pipelined VMEM blocks)
    edges_ref, at_ref, bt_ref,
    # output block (VMEM, revisited across K-tiles)
    out_ref,
    *,
    rb: int, ct: int, eb: int,
):
    kk = pl.program_id(1)
    del kk  # output accumulates across the K grid axis (zeroed at step 0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    ci = pl.program_id(0)
    rbl = rb_locals_ref[ci]

    cols = edges_ref[0, 0]                       # (sub, 128) local cols
    rows = edges_ref[0, 2]                       # (sub, 128) local rows
    kt = bt_ref.shape[0]

    a_tile = at_ref[rbl]                         # (kt, rb)
    b_tile = bt_ref[...]                         # (kt, ct)
    bg = _gather_x(b_tile, cols, kt, ct, eb)     # per group: (kt, 128)
    ag = _gather_x(a_tile, rows, kt, rb, eb)

    parts = []
    for eg in range(eb // _LANE):
        d = jnp.sum(ag[eg] * bg[eg], axis=0, keepdims=True)   # (1, 128)
        parts.append(d)
    out_ref[0] += jnp.concatenate(parts, axis=0)  # (sub, 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sddmm_call(plan: TiledPlanV2, a: jax.Array, b: jax.Array,
                interpret: bool) -> jax.Array:
    """Dots in plan order: (nc, eb) float32."""
    k = a.shape[1]
    rb, ct, eb = plan.rb, plan.ct, plan.eb
    nct, n_super, nrb_s = plan.nct, plan.n_super, plan.nrb_s
    sub = eb // _LANE
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt

    # aᵀ in the kernel's blocked layout (nrb, k_pad, rb) — the inverse of
    # the v2 output unblocking
    a_pad = jnp.zeros((plan.r_padded, k_pad), jnp.float32)
    a_pad = jax.lax.dynamic_update_slice(
        a_pad, a.astype(jnp.float32), (0, 0))
    at = a_pad.reshape(plan.nrb, rb, k_pad).transpose(0, 2, 1)

    bt = jnp.zeros((k_pad, plan.c_padded), jnp.float32)
    bt = jax.lax.dynamic_update_slice(bt, b.astype(jnp.float32).T, (0, 0))

    # per-chunk cell → (superblock, col-tile) for the tile index maps
    cells = jnp.searchsorted(
        plan.cell_starts,
        jnp.arange(plan.nc, dtype=plan.cell_starts.dtype), side="right") - 1
    sid = (cells // nct).astype(jnp.int32)
    ctid = (cells % nct).astype(jnp.int32)

    kernel = functools.partial(_sddmm_kernel, rb=rb, ct=ct, eb=eb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.nc, n_kt),
        in_specs=[
            pl.BlockSpec((1, plan.edges.shape[1], sub, _LANE),
                         lambda ci, kk, rbl, s, c: (ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),               # edges
            pl.BlockSpec((nrb_s, kt, rb),
                         lambda ci, kk, rbl, s, c: (s[ci], kk, 0),
                         memory_space=pltpu.VMEM),               # aᵀ tile
            pl.BlockSpec((kt, ct),
                         lambda ci, kk, rbl, s, c: (kk, c[ci]),
                         memory_space=pltpu.VMEM),               # bᵀ tile
        ],
        out_specs=pl.BlockSpec((1, sub, _LANE),
                               lambda ci, kk, rbl, s, c: (ci, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    flops = 2 * plan.nc * eb * k_pad
    bytes_accessed = (plan.nc * plan.edges.shape[1] * eb * 4
                      + n_super * nct * (ct + nrb_s * rb) * k_pad * 4
                      + plan.nc * eb * 4)

    dots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nc, sub, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(plan.rb_locals, sid, ctid, plan.edges, at, bt)
    return dots.reshape(plan.nc, eb)


def sddmm_dots_tiled(plan: TiledPlanV2, a: jax.Array, b: jax.Array
                     ) -> jax.Array:
    """Per-edge dots in PLAN order, (nc, eb) f32 (pad slots garbage —
    callers scatter by edge id and mask)."""
    return _sddmm_call(plan, a, b, _interpret())


def sddmm_tiled(plan: TiledPlanV2, a: jax.Array, b: jax.Array,
                nnz_padded: int) -> jax.Array:
    """Per-edge ``<a[row[e]], b[col[e]]>`` in original CSR edge order.

    Returns (nnz_padded,) f32 with zero pad slots.  Placement uses the
    plan's precomputed edge-id→plan-slot gather (``eid_pos``) — a
    random-index scatter would serialize on TPU (measured: minutes for
    millions of updates).
    """
    assert plan.edges.shape[1] == 4, \
        "sddmm kernel needs a plan built with with_eids=True"
    dots = sddmm_dots_tiled(plan, a, b).reshape(-1)
    if plan.eid_pos is not None:
        vals = jnp.take(dots, plan.eid_pos)
        out = jnp.zeros((nnz_padded,), jnp.float32)
        return jax.lax.dynamic_update_slice(out, vals, (0,))
    # legacy plans without eid_pos: scatter by edge id (fine in interpret/
    # CPU runs, slow on real TPU)
    eids = plan.edges[:plan.nc, 3].reshape(-1)
    tgt = jnp.where(eids >= 0, eids, nnz_padded - 1)
    out = jnp.zeros((nnz_padded,), jnp.float32).at[tgt].set(
        dots, mode="drop")
    return out.at[nnz_padded - 1].set(0.0)
