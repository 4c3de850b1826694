"""Pallas TPU SpMM v2 — column-major streaming with VMEM-resident output.

Fixes the two measured bottlenecks of the v1 row-block kernel (see
:mod:`isplib_tpu.sparse.tiling_v2` for the ablation numbers):

* **Gather** uses the VPU's native ``dynamic_gather`` (via
  ``jnp.take_along_axis`` over 128-lane source groups) instead of a
  materialized (ct, eb) one-hot matmul operand — ~3x fewer VPU ops at
  K=32 and no MXU work on the gather side.
* **Scatter** stays a one-hot matmul (the MXU is idle anyway), but the
  one-hot is built by a single broadcast-compare against rows stored in
  the (eb, 1) sublane layout — no concats or lane↔sublane relayouts.
* **x traffic**: the (K, ct) x tile is a pipelined BlockSpec input,
  fetched once per (superblock, col-tile) grid cell instead of once per
  edge chunk (v1 re-fetched it ~600x).
* **Output** lives in VMEM as a (nrb_s, K, rb) block revisited across
  all col-tile steps of a superblock; per-chunk partials accumulate into
  it by dynamic first-dim index, and row blocks with no edges are covered
  by the step-0 zero fill (v1 burned all-pad chunks on them).

Reference lineage: this plays the role of FusedMM's OpenMP CSR kernel
(``/root/reference/csrc/fusedMM.h``, linked at ``setup.py:124-128``) —
the parallelization axis is the (superblock × col-tile) grid plus MXU
systolic parallelism instead of OpenMP threads × AVX lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v2 import TiledPlanV2

__all__ = ["spmm_tiled_v2"]

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_x(x, cols, k_pad: int, ct: int, eb: int):
    """list of (k_pad, 128) groups = x[:, cols] via grouped dynamic_gather.

    x: (k_pad, ct) f32; cols: (eb/128, 128) int32 in [0, ct).  Mosaic's
    dynamic_gather is limited to a single source vreg along the gather
    dim, so the gather decomposes into (eb/128 × ct/128) unit gathers
    with a validity select chain (exactly one source group matches).
    Lane groups are sublane slices of cols — lane-offset slicing is not
    layout-normalizable in Mosaic.
    """
    outs = []
    for eg in range(eb // _LANE):
        cols_g = cols[eg]                                      # (128,)
        idx = jnp.broadcast_to(cols_g[None, :], (k_pad, _LANE))
        if ct == _LANE:
            # single source group: indices are already in range — one
            # dynamic_gather, no select chain (the ct>128 general case
            # costs ct/128 gathers + selects per group).
            outs.append(jnp.take_along_axis(x, idx, axis=1))
            continue
        g = jnp.zeros((k_pad, _LANE), x.dtype)
        for cg in range(ct // _LANE):
            src = x[:, cg * _LANE:(cg + 1) * _LANE]            # (k_pad, 128)
            local = idx - cg * _LANE
            # wrap = local mod 128 (bitwise; negative two's-complement
            # wraps into range too) — always a safe gather index, and one
            # VPU op vs. two for clip
            gi = jnp.take_along_axis(src, local & (_LANE - 1), axis=1)
            # single unsigned compare replaces (>= 0) & (< 128)
            valid = local.astype(jnp.uint32) < _LANE
            g = jnp.where(valid, gi, g)
        outs.append(g)
    return outs


def _spmm_v2_kernel(
    # scalar prefetch
    cell_starts_ref, rb_locals_ref,
    # tensor inputs
    edges_hbm, x_ref,
    # output block (VMEM, revisited across col-tile steps)
    out_ref,
    # scratch
    edges_buf, edge_sems,
    *,
    rb: int, ct: int, eb: int, nct: int, compute_dtype, gd: int,
    n_cells: int, cross: bool,
):
    s = pl.program_id(0)
    c = pl.program_id(2)  # grid = (superblock, k-tile, col-tile)
    cell = s * nct + c
    start = cell_starts_ref[cell]
    end = cell_starts_ref[cell + 1]
    n_chunks = end - start
    # grouped DMA: one descriptor covers gd consecutive chunks (a cell's
    # chunks are contiguous; the plan's inert tail makes the final
    # overread safe) — amortizes the ~0.35 µs DMA-issue cost that
    # dominates low-fill plans.
    n_groups = jax.lax.div(n_chunks + (gd - 1), gd)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def edge_dma(slot, gi):
        return pltpu.make_async_copy(
            edges_hbm.at[pl.ds(start + gi * gd, gd)], edges_buf.at[slot],
            edge_sems.at[slot])

    def edge_dma_abs(slot, ci):
        return pltpu.make_async_copy(
            edges_hbm.at[pl.ds(ci, gd)], edges_buf.at[slot],
            edge_sems.at[slot])

    if cross:
        # Cross-cell prefetch (gd == 1): chunks are globally consecutive
        # across grid cells, so slot parity = global chunk index % 2 is
        # consistent and every iteration prefetches the next GLOBAL
        # chunk — cells with 1-3 chunks (low-occupancy graphs) no longer
        # stall on a cold DMA at every cell boundary.
        total = cell_starts_ref[n_cells]

        @pl.when((s == 0) & (c == 0) & (total > 0))
        def _():
            edge_dma_abs(0, 0).start()
    else:
        @pl.when(n_groups > 0)
        def _():
            edge_dma(0, 0).start()

    k_pad = x_ref.shape[0]
    # Scatter one-hot is built TRANSPOSED — (rb, 128) with rb on sublanes,
    # compared against the row lane vector — and contracted on dim 1 of
    # both operands, so no lane↔sublane relayout is ever needed.
    rb_iota_t = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANE), 0)

    def body(j, carry):
        if cross:
            gi = start + j
            slot = jax.lax.rem(gi, 2)
            nslot = 1 - slot

            @pl.when(gi + 1 < total)
            def _():
                edge_dma_abs(nslot, gi + 1).start()

            edge_dma_abs(slot, gi).wait()
        else:
            slot = jax.lax.rem(j, 2)
            nslot = 1 - slot

            @pl.when(j + 1 < n_groups)
            def _():
                edge_dma(nslot, j + 1).start()

            edge_dma(slot, j).wait()

        for m in range(gd):
            # trailing group members past the cell's end carry another
            # cell's (or the inert tail's) data — skip them entirely
            @pl.when(j * gd + m < n_chunks)
            def _(m=m):
                cols = edges_buf[slot, m, 0]                    # (sub, 128)
                vals = pltpu.bitcast(edges_buf[slot, m, 1],
                                     jnp.float32)               # (sub, 128)
                rows = edges_buf[slot, m, 2]                    # (sub, 128)
                gathered = _gather_x(x_ref[...], cols, k_pad, ct, eb)

                # per-group scatter matmuls (measured FASTER than one
                # chunk-wide lane-concat matmul on v5e — the concat's
                # vreg moves cost more than the saved MXU issues)
                part = None
                for eg in range(eb // _LANE):
                    vals_g = vals[eg][None, :]                  # (1, 128)
                    wg = (gathered[eg] * vals_g).astype(
                        compute_dtype)                          # (k_pad,128)
                    oh_t = (rb_iota_t == rows[eg][None, :]).astype(
                        compute_dtype)                          # (rb, 128)
                    # precision pinned to DEFAULT: the operands are
                    # already the chosen compute dtype, and a global
                    # jax_default_matmul_precision=highest (tests set it
                    # for their DENSE oracles) otherwise leaks in and
                    # crashes the Mosaic compiler on bf16 matmuls with
                    # fp32 contract precision (observed on v5e).
                    pg = jax.lax.dot_general(
                        wg, oh_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)    # (k_pad,rb)
                    part = pg if part is None else part + pg

                rbl = rb_locals_ref[start + j * gd + m]
                out_ref[rbl] += part
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret"))
def _spmm_v2_call(plan: TiledPlanV2, x: jax.Array, compute_dtype,
                  interpret: bool) -> jax.Array:
    k = x.shape[1]
    rb, ct, eb = plan.rb, plan.ct, plan.eb
    nct, n_super, nrb_s = plan.nct, plan.n_super, plan.nrb_s
    sub = eb // _LANE
    # K grid axis: runtime K may differ from the plan's expected K (layers
    # of one model share a graph but not a width), so tile at
    # kt = min(plan.kt, k_pad) — VMEM use depends only on plan.kt.
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt

    xt = jnp.zeros((k_pad, plan.c_padded), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))

    gd = plan.gd
    # cross-cell prefetch requires globally-consecutive single-chunk
    # groups visited exactly once (no K-axis revisits)
    cross = gd == 1 and n_kt == 1
    kernel = functools.partial(
        _spmm_v2_kernel, rb=rb, ct=ct, eb=eb, nct=nct,
        compute_dtype=compute_dtype, gd=gd,
        n_cells=n_super * nct, cross=cross)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_kt, nct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # edges
            pl.BlockSpec((kt, ct), lambda s, kk, c, cs, rbl: (kk, c),
                         memory_space=pltpu.VMEM),              # x tile
        ],
        out_specs=pl.BlockSpec(
            (nrb_s, kt, rb), lambda s, kk, c, cs, rbl: (s, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            # plane count follows the plan (3, or 4 when built with_eids)
            pltpu.VMEM((2, gd, plan.edges.shape[1], sub, _LANE),
                       jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    nc = plan.nc
    flops = 2 * nc * eb * k_pad * rb
    bytes_accessed = (nc * n_kt * (3 * eb * 4)
                      + n_super * nct * ct * k_pad * x.dtype.itemsize
                      + plan.r_padded * k_pad * 4)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nrb, k_pad, rb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(plan.cell_starts, plan.rb_locals, plan.edges, xt)

    return (out.transpose(0, 2, 1)
            .reshape(plan.nrb * rb, k_pad)[: plan.num_rows, :k])


def spmm_tiled_v2(plan: TiledPlanV2, x: jax.Array,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Sum-reduce SpMM over a v2 plan.  Same bf16 accuracy contract as
    :func:`isplib_tpu.kernels.spmm_pallas.spmm_tiled`."""
    return _spmm_v2_call(plan, x, compute_dtype, _interpret())
