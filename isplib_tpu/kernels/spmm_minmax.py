"""Pallas TPU SpMM max/min with in-kernel argmax/argmin edge-id outputs.

Plays the role of FusedMM's AOP_MAX/AOP_MIN accumulators with the
``z_arg`` winner-edge-id output (``/root/reference/csrc/fusedmm.cpp:397-407``,
``csrc/fusedMM.h:96-99``) — the one semiring the r1 kernels left on the
XLA path.

Max has no sum semiring, so the MXU one-hot *scatter-add* trick can't
accumulate it directly.  The kernel instead reduces each 128-edge lane
group to *one representative per row segment* on the VPU, then scatters
the representatives with an ordinary one-hot **sum** matmul — exact,
because each row has at most one selected lane per group:

1. gather + weight edges exactly like the v2 sum kernel (pad lanes get
   value −FLT_MAX and slot id −1);
2. **segmented first-max scan** across lanes (7 ``pltpu.roll`` steps):
   ``take = same_row & lane≥d & (rolled_w ≥ w)`` — the ``≥`` keeps the
   *earlier* lane on ties, which is the lowest-edge-id contract
   (torch_scatter parity) since plan order is ascending edge id for
   (row, col)-sorted CSR input;
3. lanes that end their row segment are selected; their (value, slot+1)
   pair is scattered via two one-hot matmuls (the slot plane runs at
   HIGHEST precision — small-int exactness);
4. group→chunk→cell accumulation keeps the *first* strict maximum, again
   preserving the lowest-edge-id tie-break because chunks and column
   tiles are visited in ascending-edge-id order.

Winner identity is tracked as (chunk+1, slot+1) planes — f32-exact — and
resolved to the original edge id after the kernel by indexing the plan's
edge-id plane.  Rows with no edges produce out 0 / arg ``sentinel``
(matching :func:`isplib_tpu.ops.xla_backend.spmm_arg_raw`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.tiling_v2 import TiledPlanV2
from .spmm_pallas_v2 import _gather_x

__all__ = ["spmm_minmax_tiled"]

_LANE = 128
_NEG = float(jnp.finfo(jnp.float32).min)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _exact_onehot_move(v: jax.Array, oh_t: jax.Array,
                       terms: int) -> jax.Array:
    """Move f32 values through a 0/1 one-hot matmul EXACTLY at DEFAULT
    (bf16) matmul precision: split v into ``terms`` bf16 components
    (v = Σ bf16_i, 8 mantissa bits each) and sum the per-term products.
    Exact because each output element is a single-term sum (≤ one
    selected lane per row) and the one-hot operand is 0/1."""
    out = None
    rem = v
    for t in range(terms):
        hi = rem.astype(jnp.bfloat16)
        if t + 1 < terms:
            rem = rem - hi.astype(jnp.float32)
        p = jax.lax.dot_general(
            hi, oh_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        out = p if out is None else out + p
    return out


def _minmax_kernel(
    # scalar prefetch
    cell_starts_ref, rb_locals_ref,
    # tensor inputs
    edges_hbm, x_ref,
    # output blocks (VMEM, revisited across col-tile steps)
    out_ref, lo_ref, hi_ref,
    # scratch
    edges_buf, edge_sems,
    *,
    rb: int, ct: int, eb: int, nct: int, negate: bool,
):
    s = pl.program_id(0)
    c = pl.program_id(2)  # grid = (superblock, k-tile, col-tile)
    cell = s * nct + c
    start = cell_starts_ref[cell]
    end = cell_starts_ref[cell + 1]
    n_chunks = end - start

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, _NEG, out_ref.dtype)
        lo_ref[...] = jnp.zeros(lo_ref.shape, lo_ref.dtype)   # 0 = absent
        hi_ref[...] = jnp.zeros(hi_ref.shape, hi_ref.dtype)

    def edge_dma(slot, ci):
        return pltpu.make_async_copy(edges_hbm.at[ci], edges_buf.at[slot],
                                     edge_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        edge_dma(0, start).start()

    k_pad = x_ref.shape[0]
    rb_iota_t = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANE), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)
        nslot = 1 - slot

        @pl.when(j + 1 < n_chunks)
        def _():
            edge_dma(nslot, start + j + 1).start()

        edge_dma(slot, start + j).wait()

        cols = edges_buf[slot, 0]                               # (sub, 128)
        vals = pltpu.bitcast(edges_buf[slot, 1], jnp.float32)   # (sub, 128)
        rows = edges_buf[slot, 2]                               # (sub, 128)
        eids = edges_buf[slot, 3]                               # (sub, 128)
        gathered = _gather_x(x_ref[...], cols, k_pad, ct, eb)

        cw = clo = None
        for eg in range(eb // _LANE):
            rows_g = rows[eg][None, :]                          # (1, 128)
            valid = (eids[eg] >= 0)[None, :]                    # (1, 128)
            w = gathered[eg] * vals[eg][None, :]                # (k_pad,128)
            if negate:
                w = -w
            w = jnp.where(valid, w, _NEG)
            sid = jnp.where(valid, lane_iota + eg * _LANE, -1)  # (1, 128)
            sid = jnp.broadcast_to(sid, (k_pad, _LANE))

            # segmented first-max scan (inclusive, left→right)
            for d in (1, 2, 4, 8, 16, 32, 64):
                rw = pltpu.roll(w, d, axis=1)
                rs = pltpu.roll(sid, d, axis=1)
                rrow = pltpu.roll(rows_g, d, axis=1)
                take = ((rrow == rows_g) & (lane_iota >= d)) & (rw >= w)
                w = jnp.where(take, rw, w)
                sid = jnp.where(take, rs, sid)

            # segment-final lanes (last lane of the group is always one)
            nrow = pltpu.roll(rows_g, _LANE - 1, axis=1)  # lane e ← e+1
            is_last = (rows_g != nrow) | (lane_iota == _LANE - 1)
            selk = is_last & (sid >= 0)                         # (k_pad,128)

            oh_t = (rb_iota_t == rows_g).astype(jnp.bfloat16)   # (rb, 128)
            valw = jnp.where(selk, w, 0.0)
            low = jnp.where(selk, (sid + 1).astype(jnp.float32), 0.0)
            # EXACT f32 movement at DEFAULT precision: the winner values
            # feed cross-group / cross-chunk comparisons and the slots
            # must stay integer-exact (lowest-edge-id contract, ADVICE
            # r2 #1).  Each output row receives at most ONE selected
            # lane, so the one-hot matmul is a single-term move — a
            # 3-term bf16 decomposition of the f32 operand reassembles
            # it exactly (8+8+8 mantissa bits), at 3 DEFAULT passes
            # instead of HIGHEST's 6-pass split of both operands (the
            # one-hot side is exact in bf16 already).  Measured ~2x the
            # whole kernel (scripts/ablate_minmax.py).
            gw = _exact_onehot_move(valw, oh_t, 3)              # (k_pad,rb)
            glo = _exact_onehot_move(low, oh_t, 2)  # ints < 2^16: 2 terms
            if cw is None:
                cw, clo = gw, glo
            else:
                # ascending slot order ⇒ strict > keeps the earlier winner
                tk = (glo > 0) & ((clo == 0) | (gw > cw))
                cw = jnp.where(tk, gw, cw)
                clo = jnp.where(tk, glo, clo)

        rbl = rb_locals_ref[start + j]
        cur_w = out_ref[rbl]
        cur_lo = lo_ref[rbl]
        tk = (clo > 0) & ((cur_lo == 0) | (cw > cur_w))
        out_ref[rbl] = jnp.where(tk, cw, cur_w)
        lo_ref[rbl] = jnp.where(tk, clo, cur_lo)
        hi_ref[rbl] = jnp.where(tk, (start + j + 1).astype(jnp.float32),
                                hi_ref[rbl])
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(
    jax.jit, static_argnames=("negate", "sentinel", "interpret"))
def _minmax_call(plan: TiledPlanV2, x: jax.Array, negate: bool,
                 sentinel: int, interpret: bool):
    assert plan.edges.shape[1] == 4, \
        "max/min kernel needs a plan built with with_eids=True"
    # winner chunk ids live in an f32 plane — integer-exact only < 2^24
    # (ADVICE r2 #3: fail loudly, never corrupt args at extreme scale)
    assert plan.nc < (1 << 24), \
        f"max/min arg tracking needs nc < 2^24, got nc={plan.nc}"
    # the 2-term bf16 decomposition of slot ids (_exact_onehot_move(low,
    # oh_t, 2)) is exact only while slot+1 <= 2^16 (ADVICE r4 low #5)
    assert plan.eb < (1 << 16), \
        f"max/min arg tracking needs eb < 2^16, got eb={plan.eb}"
    k = x.shape[1]
    rb, ct, eb = plan.rb, plan.ct, plan.eb
    nct, n_super, nrb_s = plan.nct, plan.n_super, plan.nrb_s
    sub = eb // _LANE
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt

    xt = jnp.zeros((k_pad, plan.c_padded), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))

    kernel = functools.partial(
        _minmax_kernel, rb=rb, ct=ct, eb=eb, nct=nct, negate=negate)

    obs = pl.BlockSpec((nrb_s, kt, rb), lambda s, kk, c, cs, rbl: (s, kk, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_kt, nct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # edges
            pl.BlockSpec((kt, ct), lambda s, kk, c, cs, rbl: (kk, c),
                         memory_space=pltpu.VMEM),              # x tile
        ],
        out_specs=(obs, obs, obs),
        scratch_shapes=[
            pltpu.VMEM((2, 4, sub, _LANE), jnp.int32),          # edge planes
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    oshape = jax.ShapeDtypeStruct((plan.nrb, k_pad, rb), jnp.float32)
    out, lo, hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(plan.cell_starts, plan.rb_locals, plan.edges, xt)

    def unblock(a):
        return (a.transpose(0, 2, 1)
                .reshape(plan.nrb * rb, k_pad)[: plan.num_rows, :k])

    out, lo, hi = unblock(out), unblock(lo), unblock(hi)
    present = lo > 0
    out = jnp.where(present, -out if negate else out, 0.0)
    # resolve (chunk+1, slot+1) → plan position → original edge id
    pos = ((hi.astype(jnp.int32) - 1) * eb + (lo.astype(jnp.int32) - 1))
    pos = jnp.clip(pos, 0, plan.nc * eb - 1)
    eid_lookup = plan.edges[:plan.nc, 3].reshape(plan.nc * eb)
    arg = jnp.take(eid_lookup, pos, axis=0)
    arg = jnp.where(present, arg, jnp.int32(sentinel))
    return out, arg


def spmm_minmax_tiled(plan: TiledPlanV2, x: jax.Array, reduce: str,
                      sentinel: int):
    """Max/min SpMM over a with-eids v2 plan → (out, arg).

    ``sentinel``: arg value for empty rows (the dispatcher passes
    ``nnz_padded - 1``, a pad edge — gradients through it vanish).
    Values follow the bf16 matmul accuracy contract of the sum kernel.
    """
    negate = reduce == "min"
    return _minmax_call(plan, x, negate, sentinel, _interpret())
