"""Pallas TPU SpMM v4 — row-stream kernel with dynamic gather windows.

Consumes :class:`isplib_tpu.sparse.tiling_v4.StreamPlanV4`.  Grid =
(K-tile, row block); per row block the kernel streams that block's
128-edge lane groups (grouped DMA, double-buffered) and for each group:

1. unrolls S static gather visits over the group's S·128-col window of
   the fully VMEM-resident x (dynamic lane-offset slice per visit,
   gather + select on the VPU).  S is static by necessity: Mosaic
   lowers dynamic-trip loops to scalar-serialized while-loops costing
   ~200 ns + ~76 ns/iteration (scripts/ablate_v4.py);
2. builds the scatter one-hot with edge values folded into the select
   (``where(iota == rows, vals, 0)``) — no separate value multiply;
3. accumulates the (kt, rb) partial via one MXU matmul into a loop
   carry, written to the output block once per grid step.

Group padding is inert by construction (pad values are 0 and the
group-valid flag is folded into the one-hot), so the inner loop needs no
predication and trailing DMA overreads are harmless.

Reference lineage: the sparse-regime half of FusedMM's OpenMP CSR loop
(``/root/reference/csrc/fusedMM.h:77-99``); dense regions ride the v3
BSR kernel instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v4 import StreamPlanV4

__all__ = ["spmm_stream_v4"]

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _v4_kernel(
    # scalar prefetch
    block_starts_ref, base_ref,
    # tensor inputs
    edges_hbm, x_ref,
    # output block
    out_ref,
    # scratch
    ebuf, esem,
    *,
    rb: int, S: int, gd: int, kt: int, compute_dtype,
):
    i = pl.program_id(1)
    g0 = block_starts_ref[i]
    g1 = block_starts_ref[i + 1]
    n_groups = g1 - g0
    n_dma = jax.lax.div(n_groups + (gd - 1), gd)

    def dma(slot, j):
        return pltpu.make_async_copy(
            edges_hbm.at[pl.ds(g0 + j * gd, gd)], ebuf.at[slot],
            esem.at[slot])

    @pl.when(n_dma > 0)
    def _():
        dma(0, 0).start()

    rb_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANE), 0)

    def body(j, acc):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_dma)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()

        for m in range(gd):
            gidx = g0 + j * gd + m
            cols = ebuf[slot, m, 0]                        # (1, 128) i32
            vals = pltpu.bitcast(ebuf[slot, m, 1], jnp.float32)
            rows = ebuf[slot, m, 2]                        # (1, 128) i32
            base = base_ref[gidx]

            g = jnp.zeros((kt, _LANE), jnp.float32)
            for s in range(S):                    # static unrolled visits
                src = x_ref[:, pl.ds((base + s) * _LANE, _LANE)]
                local = cols - s * _LANE                   # (1, 128)
                idx = jnp.broadcast_to(local & (_LANE - 1), (kt, _LANE))
                gi = jnp.take_along_axis(src, idx, axis=1)
                ok = jnp.broadcast_to(
                    local.astype(jnp.uint32) < _LANE, (kt, _LANE))
                g = jnp.where(ok, gi, g)

            # one-hot scatter with values folded into the select — pad
            # groups carry value 0 and each block's group list is padded
            # to a gd multiple at plan time, so no per-group validity
            # predication is needed (it cost an (rb, 128)-wide AND).
            # NOTE: select in f32 then convert — an i1 mask selecting
            # bf16 directly trips a Mosaic relayout bug ((8,128) mask
            # tiling vs (16,128) bf16 tiling, observed on v5e).
            oh = jnp.where(rb_iota == rows, vals,
                           0.0).astype(compute_dtype)      # (rb, 128)
            part = jax.lax.dot_general(
                g.astype(compute_dtype), oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)       # (kt, rb)
            acc = acc + part
        return acc

    acc = jax.lax.fori_loop(
        0, n_dma, body, jnp.zeros((kt, rb), jnp.float32))
    out_ref[0] = acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _spmm_v4_call(plan: StreamPlanV4, x: jax.Array, compute_dtype,
                  interpret: bool) -> jax.Array:
    # K wider than the plan's kt runs as an OUTER loop of single-K-tile
    # kernel launches: a K grid axis would make Pallas double-buffer the
    # (kt, C_pad) resident-x block — 2x its VMEM at reddit scale
    # (observed compile-time VMEM OOM at K=41 on the full graph).
    k = x.shape[1]
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    if n_kt > 1:
        outs = []
        for t in range(n_kt):
            k0 = t * kt
            xt_slice = jax.lax.dynamic_slice_in_dim(
                x, k0, min(kt, x.shape[1] - k0), axis=1)
            outs.append(_spmm_v4_one(plan, xt_slice, compute_dtype,
                                     interpret))
        return jnp.concatenate(outs, axis=1)[:, :k]
    return _spmm_v4_one(plan, x, compute_dtype, interpret)


def _spmm_v4_one(plan: StreamPlanV4, x: jax.Array, compute_dtype,
                 interpret: bool) -> jax.Array:
    k = x.shape[1]
    rb, gd = plan.rb, plan.gd
    kt = _round_up(k, 32)

    xt = jnp.zeros((kt, plan.c_padded), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, x.T.astype(jnp.float32), (0, 0))

    kernel = functools.partial(
        _v4_kernel, rb=rb, S=plan.S, gd=gd, kt=kt,
        compute_dtype=compute_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, plan.nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # edges (HBM)
            pl.BlockSpec((kt, plan.c_padded),
                         lambda kk, i, bs, gb: (kk, 0),
                         memory_space=pltpu.VMEM),         # resident x
        ],
        out_specs=pl.BlockSpec(
            (1, kt, rb), lambda kk, i, bs, gb: (i, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, gd, 3, 1, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    flops = 2 * (plan.ng + plan.nrb * gd) * _LANE * kt * rb
    bytes_accessed = (plan.ng * 3 * _LANE * 4
                      + plan.c_padded * kt * 4
                      + plan.r_padded * kt * 4)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nrb, kt, rb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(plan.block_starts, plan.group_base, plan.edges, xt)

    return (out.transpose(0, 2, 1)
            .reshape(plan.nrb * rb, kt)[: plan.num_rows, :k])


def spmm_stream_v4(plan: StreamPlanV4, x: jax.Array,
                   compute_dtype=jnp.bfloat16) -> jax.Array:
    """Sum-reduce SpMM over a v4 row-stream plan.  Same bf16 accuracy
    contract as the v1/v2 kernels (one-hot operands in bf16, f32
    accumulate on the MXU)."""
    return _spmm_v4_call(plan, x, compute_dtype, _interpret())
