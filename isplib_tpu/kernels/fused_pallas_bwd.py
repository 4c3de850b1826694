"""Pallas TPU backward for the generalized FusedMM pipeline (r5).

The r4 fused path's backward replayed the (E, K)-materializing XLA
formulation (``ops/fused.py`` — VERDICT r4 weak #4 / next #6).  This
kernel computes grad_x and grad_y in TWO streaming passes over the v4
row-stream plans, recomputing the pipeline per 128-edge lane group and
applying the stage chain rules in-register:

    v  = VOP(xv, yv);  t = ROP(v);  s = SOP(t)·val;  out += s·m
    a  = Σ_k ḡ·m                      (per-edge cotangent scalar)
    ŝ  = a · val · SOP'(t)            (SOP' via jax.vjp of the traced
                                       callable — elementwise)
    ĝv = [m is v] s·ḡ + dROP/dv(ŝ)    (DOT: +ŝ; NORM2: +2ŝ·v)
    grad_x += dVOP/dx ᵀ ĝv            (pass A: forward plan, row scatter
                                       via the one-hot MXU matmul)
    grad_y += [m is yv] s·ḡ + dVOP/dy ᵀ ĝv
                                      (pass B: TRANSPOSE plan — rows of
                                       Aᵀ are the y rows)

Pass A gathers (x, ḡ) from the output-row slab and y from the resident
window; pass B swaps roles: (ḡ, x) ride the resident window of the
transpose plan and y the slab.  Stacking the pairs along the K
(sublane) axis lets one gather serve both.

The value cotangent is NOT produced here — ``fused_mm`` routes
value-differentiating traces to the XLA replay (same loud-guard pattern
as the sharded tiled path).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.semiring import ReduceOp, ScaleOp, VectorOp
from ..sparse.tiling_v4 import StreamPlanV4

__all__ = ["fused_bwd_pass"]

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sop_grad(sop: Optional[Callable], t: jax.Array, cot: jax.Array):
    """cot · d SOP/dt, elementwise on (1, 128)."""
    if sop is None:
        return cot
    _, vjp = jax.vjp(sop, t)
    (dt,) = vjp(cot)
    return dt


def _fused_bwd_kernel(
    # scalar prefetch
    block_starts_ref, base_ref,
    # tensor inputs
    edges_hbm, res_ref, slab_ref,
    # output block
    out_ref,
    # scratch
    ebuf, esem,
    *,
    rb: int, S: int, gd: int, kt: int, compute_dtype,
    vop: VectorOp, rop: ReduceOp, sop: Optional[Callable],
    vsc: ScaleOp, msg_rhs: bool, emit_x: bool, swap: bool,
):
    """One backward pass.  ``swap=False`` (pass A, forward plan): the
    resident window holds y, the slab holds (x ; ḡ) stacked on K, and
    the row scatter emits grad_x.  ``swap=True`` (pass B, transpose
    plan): the resident window holds (ḡ ; x) stacked, the slab holds y,
    and the row scatter emits grad_y."""
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

    def gather_res(cols, base, rows_k):
        g = jnp.zeros((rows_k, _LANE), jnp.float32)
        for s_ in range(S):
            src = res_ref[:, pl.ds((base + s_) * _LANE, _LANE)]
            local = cols - s_ * _LANE
            idx = jnp.broadcast_to(local & (_LANE - 1), (rows_k, _LANE))
            gi = jnp.take_along_axis(src, idx, axis=1)
            ok = jnp.broadcast_to(
                local.astype(jnp.uint32) < _LANE, (rows_k, _LANE))
            g = jnp.where(ok, gi, g)
        return g

    def gather_slab(rows, rows_k):
        g = jnp.zeros((rows_k, _LANE), jnp.float32)
        ridx = jnp.broadcast_to(rows & (_LANE - 1), (rows_k, _LANE))
        for s_ in range(rb // _LANE):
            src = slab_ref[:, s_ * _LANE:(s_ + 1) * _LANE]
            gi = jnp.take_along_axis(src, ridx, axis=1)
            ok = jnp.broadcast_to(
                (rows >= s_ * _LANE) & (rows < (s_ + 1) * _LANE),
                (rows_k, _LANE))
            g = jnp.where(ok, gi, g)
        return g

    def body(j, acc):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_dma)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()

        for m_i in range(gd):
            gidx = g0 + j * gd + m_i
            cols = ebuf[slot, m_i, 0]                      # (1, 128)
            vals = pltpu.bitcast(ebuf[slot, m_i, 1], jnp.float32)
            rows = ebuf[slot, m_i, 2]                      # (1, 128)
            base = base_ref[gidx]

            if swap:
                both = gather_res(cols, base, 2 * kt)      # (2kt, 128)
                gv, xv = both[:kt], both[kt:]
                yv = gather_slab(rows, kt)
            else:
                yv = gather_res(cols, base, kt)
                both = gather_slab(rows, 2 * kt)
                xv, gv = both[:kt], both[kt:]

            # forward stages (recompute)
            if vop is VectorOp.COPY_RHS:
                v = yv
            elif vop is VectorOp.COPY_LHS:
                v = xv
            elif vop is VectorOp.ADD:
                v = xv + yv
            elif vop is VectorOp.SUB:
                v = xv - yv
            elif vop is VectorOp.MUL:
                v = xv * yv
            elif vop is VectorOp.MAX:
                v = jnp.maximum(xv, yv)
            elif vop is VectorOp.MIN:
                v = jnp.minimum(xv, yv)
            else:
                raise ValueError(vop)
            if rop is ReduceOp.DOT:
                t = jnp.sum(v, axis=0, keepdims=True)
            elif rop is ReduceOp.NORM2:
                t = jnp.sum(v * v, axis=0, keepdims=True)
            else:
                t = jnp.ones((1, _LANE), jnp.float32)
            s_raw = sop(t) if sop is not None else t
            if vsc is ScaleOp.NONE:
                w = (vals != 0.0).astype(jnp.float32)
            else:
                w = vals                       # VSC_MUL (MEAN pre-folded)
            s = s_raw * w

            msg = yv if msg_rhs else v
            a = jnp.sum(gv * msg, axis=0, keepdims=True)   # (1, 128)
            gv_v = jnp.zeros((kt, _LANE), jnp.float32)
            gyv = jnp.zeros((kt, _LANE), jnp.float32)
            if msg_rhs:
                gyv = gyv + s * gv
            else:
                gv_v = gv_v + s * gv
            if rop is not ReduceOp.NOOP and (sop is not None
                                             or rop is not None):
                shat = _sop_grad(sop, t, a * w)            # (1, 128)
                if rop is ReduceOp.DOT:
                    gv_v = gv_v + shat
                elif rop is ReduceOp.NORM2:
                    gv_v = gv_v + 2.0 * shat * v

            # VOP chain into the emitted side
            if emit_x:
                if vop is VectorOp.COPY_LHS or vop is VectorOp.ADD:
                    ge = gv_v
                elif vop is VectorOp.SUB:
                    ge = gv_v
                elif vop is VectorOp.MUL:
                    ge = gv_v * yv
                elif vop in (VectorOp.MAX, VectorOp.MIN):
                    take = (xv > yv) if vop is VectorOp.MAX else (xv < yv)
                    ge = jnp.where(take, gv_v, 0.0)
                else:  # COPY_RHS: no x dependence
                    ge = jnp.zeros((kt, _LANE), jnp.float32)
            else:
                ge = gyv
                if vop is VectorOp.COPY_RHS or vop is VectorOp.ADD:
                    ge = ge + gv_v
                elif vop is VectorOp.SUB:
                    ge = ge - gv_v
                elif vop is VectorOp.MUL:
                    ge = ge + gv_v * xv
                elif vop in (VectorOp.MAX, VectorOp.MIN):
                    take = (yv >= xv) if vop is VectorOp.MAX \
                        else (yv <= xv)
                    ge = ge + jnp.where(take, gv_v, 0.0)

            # one-hot row scatter (0/1 operand; values already in ge)
            oh = (rb_iota == rows).astype(compute_dtype)   # (rb, 128)
            part = jax.lax.dot_general(
                ge.astype(compute_dtype), oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)       # (kt, rb)
            acc = acc + part
        return acc

    acc = jax.lax.fori_loop(
        0, n_dma, body, jnp.zeros((kt, rb), jnp.float32))
    out_ref[0] = acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("vop", "rop", "sop", "vsc", "msg_rhs", "emit_x",
                     "swap", "interpret"))
def _fused_bwd_call(plan: StreamPlanV4, res: jax.Array, slab: jax.Array,
                    vop, rop, sop, vsc, msg_rhs: bool, emit_x: bool,
                    swap: bool, interpret: bool):
    """``res``: (res_k, num_cols-ish) features living in the plan's
    window space (pre-transposed); ``slab``: (slab_k, num_rows-ish)
    features in the plan's row space (pre-transposed)."""
    rb, gd = plan.rb, plan.gd
    kt = (res.shape[0] // 2) if swap else res.shape[0]

    rt = jnp.zeros((res.shape[0], plan.c_padded), jnp.float32)
    rt = jax.lax.dynamic_update_slice(rt, res, (0, 0))
    st = jnp.zeros((slab.shape[0], plan.nrb * rb), jnp.float32)
    st = jax.lax.dynamic_update_slice(st, slab, (0, 0))

    kernel = functools.partial(
        _fused_bwd_kernel, rb=rb, S=plan.S, gd=gd, kt=kt,
        compute_dtype=jnp.bfloat16, vop=vop, rop=rop, sop=sop, vsc=vsc,
        msg_rhs=msg_rhs, emit_x=emit_x, swap=swap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, plan.nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # edges (HBM)
            pl.BlockSpec((res.shape[0], plan.c_padded),
                         lambda kk, i, bs, gb: (kk, 0),
                         memory_space=pltpu.VMEM),         # resident
            pl.BlockSpec((slab.shape[0], rb),
                         lambda kk, i, bs, gb: (kk, i),
                         memory_space=pltpu.VMEM),         # row slab
        ],
        out_specs=pl.BlockSpec(
            (1, kt, rb), lambda kk, i, bs, gb: (i, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, gd, 3, 1, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nrb, kt, rb), jnp.float32),
        interpret=interpret,
    )(plan.block_starts, plan.group_base, plan.edges, rt, st)
    return out.transpose(0, 2, 1).reshape(plan.nrb * rb, kt)


def fused_bwd_pass(plan: StreamPlanV4, res: jax.Array, slab: jax.Array,
                   op, *, emit_x: bool, swap: bool) -> jax.Array:
    """Run one backward pass; returns the scattered gradient in the
    plan's padded row space (caller slices to num_rows)."""
    msg_rhs = op.vop is VectorOp.COPY_RHS
    return _fused_bwd_call(plan, res, slab, op.vop, op.rop, op.sop,
                           op.vsc, msg_rhs, emit_x, swap, _interpret())
