"""Pallas TPU BSR SpMM — densified 128×128 block matmuls.

Consumes :class:`isplib_tpu.sparse.tiling_v3.BSRPlan`.  Per grid cell
(superblock, K-tile, block-col) the kernel streams that cell's dense bf16
Aᵀ blocks HBM→VMEM (double-buffered) and accumulates

    out[rb_local] (kt, 128) += xᵀ_tile (kt, 128) · blockᵀ (128, 128)

into a VMEM-resident (nrb_s, kt, 128) superblock output, zeroed at the
first block-col step and flushed when the superblock advances — the same
output-revisiting pattern as the v2 edge kernel, so the two halves of a
hybrid plan share layout conventions and their results add directly.

This is the high-density half of the role played by the reference's
FusedMM OpenMP loop (``/root/reference/csrc/fusedMM.h``): where FusedMM
vectorizes the K loop per edge with AVX, dense-ish regions here skip
per-edge work entirely and ride the MXU at full tile shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v3 import BSRPlan, HybridPlanV3

__all__ = ["spmm_bsr", "spmm_hybrid"]

_BS = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bsr_kernel(
    # scalar prefetch
    cell_starts_ref, rb_locals_ref,
    # tensor inputs
    blocks_hbm, x_ref,
    # output block (VMEM, revisited across block-col steps)
    out_ref,
    # scratch
    blk_buf, blk_sems,
    *,
    n_bc: int, g: int, n_cells: int, cross: bool,
):
    s = pl.program_id(0)
    c = pl.program_id(2)  # grid = (superblock, k-tile, block-col)
    cell = s * n_bc + c
    start = cell_starts_ref[cell]
    end = cell_starts_ref[cell + 1]
    n_groups = end - start

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def blk_dma(slot, bi):
        return pltpu.make_async_copy(blocks_hbm.at[bi], blk_buf.at[slot],
                                     blk_sems.at[slot])

    if cross:
        # Cross-cell prefetch: groups are globally consecutive across
        # grid cells, so slot parity = global index % 2 stays consistent
        # and each iteration prefetches the next GLOBAL group — cells
        # with 1-2 groups (the common case at fine block-col granularity)
        # no longer stall on a cold DMA at every cell boundary.
        total = cell_starts_ref[n_cells]

        @pl.when((s == 0) & (c == 0) & (total > 0))
        def _():
            blk_dma(0, 0).start()
    else:
        @pl.when(n_groups > 0)
        def _():
            blk_dma(0, start).start()

    xt = x_ref[...].astype(jnp.bfloat16)                    # (kt, 128)

    def body(j, carry):
        if cross:
            gi = start + j
            slot = jax.lax.rem(gi, 2)
            nslot = 1 - slot

            @pl.when(gi + 1 < total)
            def _():
                blk_dma(nslot, gi + 1).start()
        else:
            slot = jax.lax.rem(j, 2)
            nslot = 1 - slot

            @pl.when(j + 1 < n_groups)
            def _():
                blk_dma(nslot, start + j + 1).start()

        blk_dma(slot, start + j).wait()

        # one wide matmul covers the g member blocks of the group.
        # precision pinned to DEFAULT — a global highest setting would
        # request fp32 contract precision on bf16 operands, which
        # crashes the Mosaic compiler (observed on v5e).
        part = jax.lax.dot_general(
            xt, blk_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)            # (kt, g·128)
        for m in range(g):
            rbl = rb_locals_ref[(start + j) * g + m]
            out_ref[rbl] += part[:, m * _BS:(m + 1) * _BS]
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_call(plan: BSRPlan, x: jax.Array, interpret: bool) -> jax.Array:
    k = x.shape[1]
    n_bc, nrb_s, n_super = plan.n_bc, plan.nrb_s, plan.n_super
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt

    xt = jnp.zeros((k_pad, plan.c_padded), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))

    g = plan.g
    # cross-cell prefetch needs each group DMA'd exactly once in global
    # order — true only when the K grid axis doesn't revisit groups
    cross = n_kt == 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_kt, n_bc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # blocks (HBM)
            pl.BlockSpec((kt, _BS), lambda s, kk, c, cs, rbl: (kk, c),
                         memory_space=pltpu.VMEM),          # xᵀ tile
        ],
        out_specs=pl.BlockSpec(
            (nrb_s, kt, _BS), lambda s, kk, c, cs, rbl: (s, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _BS, g * _BS), jnp.bfloat16),    # group buffers
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    nb = plan.nb
    flops = 2 * nb * _BS * _BS * k_pad
    bytes_accessed = (nb * n_kt * _BS * _BS * 2
                      + n_super * n_bc * _BS * k_pad * x.dtype.itemsize
                      + plan.r_padded * k_pad * 4)

    out = pl.pallas_call(
        functools.partial(_bsr_kernel, n_bc=n_bc, g=g,
                          n_cells=n_super * n_bc, cross=cross),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super * nrb_s, k_pad, _BS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(plan.cell_starts, plan.rb_locals, plan.blocks, xt)

    return (out.transpose(0, 2, 1)
            .reshape(n_super * nrb_s * _BS, k_pad)[: plan.num_rows, :k])


def spmm_bsr(plan: BSRPlan, x: jax.Array) -> jax.Array:
    """Sum-reduce SpMM over the densified blocks of a BSR plan."""
    return _bsr_call(plan, x, _interpret())


def spmm_hybrid(plan: HybridPlanV3, x: jax.Array) -> jax.Array:
    """Sum-reduce SpMM over a hybrid v3 plan: dense half + residual half."""
    from .spmm_pallas_v2 import spmm_tiled_v2

    out = None
    if plan.bsr is not None:
        out = spmm_bsr(plan.bsr, x)
    if plan.residual is not None:
        r = spmm_tiled_v2(plan.residual, x)
        out = r if out is None else out + r
    if out is None:
        out = jnp.zeros((plan.num_rows, x.shape[1]), jnp.float32)
    return out
