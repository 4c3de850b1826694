"""Pallas TPU BSR2 SpMM — globally-streamed dense blocks over resident x.

Consumes :class:`isplib_tpu.sparse.tiling_v5.BSR2Plan`.  Grid =
(K-tile, superblock); per superblock the kernel streams that
superblock's dense bf16 Aᵀ block groups HBM→VMEM (double-buffered) and
for each member block:

    out[rbl_b] (kt, 128) += x[:, bc_b·128 : +128] (kt, 128) · blockᵀ

with the x tile taken as a *dynamic lane-offset slice* of the fully
VMEM-resident x (bc from scalar prefetch).  This removes the v3 BSR
kernel's (superblock, block-col) cell grid and its per-cell padding of
block lists to the DMA group size — the r3 density-rep build carried
23232 padded vs 11975 real blocks, i.e. ~2x the HBM bytes, and the
mostly-empty cells burned a grid step each (scripts/ablate_v3.py).

Reference lineage: the dense-region half of FusedMM's CSR loop
(``/root/reference/csrc/fusedMM.h:77-99``) — dense-ish 128×128 regions
skip per-edge work entirely and ride the MXU at full tile shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v5 import BSR2Plan, HybridPlanV5

__all__ = ["spmm_bsr2", "spmm_hybrid_v5"]

_BS = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bsr2_kernel(
    # scalar prefetch
    super_starts_ref, rbl_ref, bc_ref,
    # tensor inputs
    blocks_hbm, x_ref,
    # output block
    out_ref,
    # scratch
    blk_buf, blk_sems,
    *,
    g: int, kt: int,
):
    s = pl.program_id(1)
    j0 = super_starts_ref[s]
    j1 = super_starts_ref[s + 1]
    n_groups = j1 - j0

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def dma(slot, j):
        return pltpu.make_async_copy(blocks_hbm.at[j0 + j],
                                     blk_buf.at[slot], blk_sems.at[slot])

    @pl.when(n_groups > 0)
    def _():
        dma(0, 0).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_groups)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()

        # all g members of a group share one output row-block (the plan
        # pads block-row runs to g multiples), so the g member matmuls
        # fuse into ONE deep (kt, g·128)×(g·128, 128) MXU contraction
        # and ONE dynamic-offset accumulate — the per-member RMW was the
        # measured r4 bottleneck.  Pad members are zero blocks reading
        # x tile 0 (inert).
        b0 = (j0 + j) * g
        rbl = rbl_ref[b0]
        xs = jnp.concatenate(
            [x_ref[:, pl.ds(bc_ref[b0 + m] * _BS, _BS)]
             for m in range(g)], axis=1).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            xs, blk_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (kt, 128)
        out_ref[rbl] += part
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr2_call(plan: BSR2Plan, x: jax.Array, interpret: bool) -> jax.Array:
    # K wider than the plan's kt runs as an OUTER loop of single-K-tile
    # launches — a K grid axis makes Pallas double-buffer the resident-x
    # block (observed compile-time VMEM OOM at K=41 on the full graph).
    k = x.shape[1]
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    if n_kt > 1:
        outs = []
        for t in range(n_kt):
            k0 = t * kt
            xs = jax.lax.dynamic_slice_in_dim(
                x, k0, min(kt, x.shape[1] - k0), axis=1)
            outs.append(_bsr2_one(plan, xs, interpret))
        return jnp.concatenate(outs, axis=1)[:, :k]
    return _bsr2_one(plan, x, interpret)


def _bsr2_one(plan: BSR2Plan, x: jax.Array, interpret: bool) -> jax.Array:
    k = x.shape[1]
    g, nrb_s, n_super = plan.g, plan.nrb_s, plan.n_super
    kt = _round_up(k, 32)

    xt = jnp.zeros((kt, plan.c_padded), jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x.T.astype(jnp.float32), (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1, n_super),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # blocks (HBM)
            pl.BlockSpec((kt, plan.c_padded),
                         lambda kk, s, ss, rbl, bc: (kk, 0),
                         memory_space=pltpu.VMEM),          # resident x
        ],
        out_specs=pl.BlockSpec(
            (nrb_s, kt, _BS), lambda kk, s, ss, rbl, bc: (s, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, g * _BS, _BS), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    nb = plan.nb
    flops = 2 * nb * _BS * _BS * kt
    bytes_accessed = (nb * _BS * _BS * 2
                      + plan.c_padded * kt * 4
                      + plan.r_padded * kt * 4)

    out = pl.pallas_call(
        functools.partial(_bsr2_kernel, g=g, kt=kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super * nrb_s, kt, _BS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(plan.super_starts, plan.rb_locals, plan.bcs, plan.blocks, xt)

    return (out.transpose(0, 2, 1)
            .reshape(n_super * nrb_s * _BS, kt)[: plan.num_rows, :k])


def spmm_bsr2(plan: BSR2Plan, x: jax.Array) -> jax.Array:
    """Sum-reduce SpMM over the densified blocks of a BSR2 plan.

    ``x`` must already be sliced to the plan's column stripe."""
    return _bsr2_call(plan, x, _interpret())


def spmm_hybrid_v5(plan: HybridPlanV5, x: jax.Array) -> jax.Array:
    """Sum-reduce SpMM over a v5 plan: Σ stripes (BSR2 + stream)."""
    from .spmm_pallas_v4 import spmm_stream_v4

    out = None
    for (c0, c1), bsr, stream in zip(plan.stripe_bounds, plan.bsr2s,
                                     plan.streams):
        xs = jax.lax.slice_in_dim(x, c0, c1, axis=0)
        if bsr is not None:
            r = spmm_bsr2(bsr, xs)
            out = r if out is None else out + r
        if stream is not None:
            r = spmm_stream_v4(stream, xs)
            out = r if out is None else out + r
    if out is None:
        out = jnp.zeros((plan.num_rows, x.shape[1]), jnp.float32)
    return out
