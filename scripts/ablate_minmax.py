"""Ablate the max/min arg kernel's stages (it runs ~100x slower than the
sum path — find where the ~1.3-3 us/chunk goes).

Modes: full | noscan (skip the 7-step roll scan) | defprec (DEFAULT-
precision matmuls) | normw (single out RMW at j==0) | nogather |
dmaonly.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isplib_tpu.sparse.tiling_v2 import TiledPlanV2
from isplib_tpu.kernels.spmm_pallas_v2 import _gather_x
from isplib_tpu.kernels.spmm_minmax import _round_up, _cdiv, _NEG
from isplib_tpu.utils.timing import chain_time

_LANE = 128


def _kernel(cell_starts_ref, rb_locals_ref, edges_hbm, x_ref,
            out_ref, lo_ref, hi_ref, edges_buf, edge_sems,
            *, rb, ct, eb, nct, mode):
    s = pl.program_id(0)
    c = pl.program_id(2)
    cell = s * nct + c
    start = cell_starts_ref[cell]
    end = cell_starts_ref[cell + 1]
    n_chunks = end - start

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, _NEG, out_ref.dtype)
        lo_ref[...] = jnp.zeros(lo_ref.shape, lo_ref.dtype)
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
    prec = (jax.lax.Precision.DEFAULT if mode == "defprec"
            else jax.lax.Precision.HIGHEST)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_chunks)
        def _():
            edge_dma(1 - slot, start + j + 1).start()

        edge_dma(slot, start + j).wait()

        if mode == "dmaonly":
            out_ref[0, 0:1, 0:_LANE] += edges_buf[
                slot, 0, 0:1, :].astype(jnp.float32)
            return carry

        cols = edges_buf[slot, 0]
        vals = pltpu.bitcast(edges_buf[slot, 1], jnp.float32)
        rows = edges_buf[slot, 2]
        eids = edges_buf[slot, 3]
        if mode == "nogather":
            gathered = [x_ref[:, :_LANE] for _ in range(eb // _LANE)]
        else:
            gathered = _gather_x(x_ref[...], cols, k_pad, ct, eb)

        cw = clo = None
        for eg in range(eb // _LANE):
            rows_g = rows[eg][None, :]
            valid = (eids[eg] >= 0)[None, :]
            w = gathered[eg] * vals[eg][None, :]
            w = jnp.where(valid, w, _NEG)
            sid = jnp.where(valid, lane_iota + eg * _LANE, -1)
            sid = jnp.broadcast_to(sid, (k_pad, _LANE))

            if mode != "noscan":
                for d in (1, 2, 4, 8, 16, 32, 64):
                    rw = pltpu.roll(w, d, axis=1)
                    rs = pltpu.roll(sid, d, axis=1)
                    rrow = pltpu.roll(rows_g, d, axis=1)
                    take = ((rrow == rows_g) & (lane_iota >= d)) & (rw >= w)
                    w = jnp.where(take, rw, w)
                    sid = jnp.where(take, rs, sid)

            nrow = pltpu.roll(rows_g, _LANE - 1, axis=1)
            is_last = (rows_g != nrow) | (lane_iota == _LANE - 1)
            selk = is_last & (sid >= 0)

            oh_t = (rb_iota_t == rows_g).astype(jnp.float32)
            valw = jnp.where(selk, w, 0.0)
            low = jnp.where(selk, (sid + 1).astype(jnp.float32), 0.0)
            gw = jax.lax.dot_general(
                valw, oh_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            glo = jax.lax.dot_general(
                low, oh_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if cw is None:
                cw, clo = gw, glo
            else:
                tk = (glo > 0) & ((clo == 0) | (gw > cw))
                cw = jnp.where(tk, gw, cw)
                clo = jnp.where(tk, glo, clo)

        rbl = rb_locals_ref[start + j]
        if mode == "normw":
            @pl.when(j == 0)
            def _():
                out_ref[rbl] = cw
                lo_ref[rbl] = clo
        else:
            cur_w = out_ref[rbl]
            cur_lo = lo_ref[rbl]
            tk = (clo > 0) & ((cur_lo == 0) | (cw > cur_w))
            out_ref[rbl] = jnp.where(tk, cw, cur_w)
            lo_ref[rbl] = jnp.where(tk, clo, cur_lo)
            hi_ref[rbl] = jnp.where(tk, (start + j + 1).astype(jnp.float32),
                                    hi_ref[rbl])
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("mode",))
def _call(plan: TiledPlanV2, x, mode):
    k = x.shape[1]
    rb, ct, eb = plan.rb, plan.ct, plan.eb
    nct, n_super, nrb_s = plan.nct, plan.n_super, plan.nrb_s
    sub = eb // _LANE
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt
    xt = jnp.zeros((k_pad, plan.c_padded), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))
    kernel = functools.partial(_kernel, rb=rb, ct=ct, eb=eb, nct=nct,
                               mode=mode)
    obs = pl.BlockSpec((nrb_s, kt, rb), lambda s, kk, c, cs, rbl: (s, kk, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_kt, nct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, ct), lambda s, kk, c, cs, rbl: (kk, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(obs, obs, obs),
        scratch_shapes=[
            pltpu.VMEM((2, 4, sub, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    oshape = jax.ShapeDtypeStruct((plan.nrb, k_pad, rb), jnp.float32)
    out, lo, hi = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=(oshape, oshape, oshape),
    )(plan.cell_starts, plan.rb_locals, plan.edges, xt)
    return out.transpose(0, 2, 1).reshape(plan.nrb * rb, k_pad)[
        : plan.num_rows, :k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--rb", type=int, default=256)
    ap.add_argument("--ct", type=int, default=128)
    ap.add_argument("--eb", type=int, default=512)
    args = ap.parse_args()

    cache = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _load_or_gen, _to_graph, gen_rmat_graph
    from isplib_tpu.sparse.tiling_v2 import (build_plan_v2_arrays,
                                             materialize_v2_edges_device)
    n, e = 11648, 5730794
    tag = "reddit_s0.05_m4096"
    dnp = _load_or_gen(tag, lambda: gen_rmat_graph(
        n, e, zlib.crc32(b"reddit") & 0x7FFFFFFF, 4096))
    g = _to_graph(dnp)
    nnz = g.nnz
    row = dnp["row"][:nnz].astype(np.int64)
    col = dnp["col"][:nnz].astype(np.int64)
    val = dnp["value"][:nnz].astype(np.float32)
    plan = build_plan_v2_arrays(row, col, val, n, n, rb=args.rb,
                                ct=args.ct, eb=args.eb, k=32,
                                with_eids=True, vmem_out_bytes=2 << 20,
                                defer_edges=True)
    plan = materialize_v2_edges_device(plan, g.row, g.col, g.value)
    print(f"plan: nc={plan.nc} fill={plan.fill:.2f}", file=sys.stderr)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, 32)).astype(np.float32))
    for mode in ("full", "noscan", "defprec", "normw", "nogather",
                 "dmaonly"):
        t = chain_time(lambda x_: _call(plan, x_, mode), x, args.iters)
        print(f"{mode:9s}: {t*1e3:8.3f} ms {t/plan.nc*1e9:8.1f} ns/chunk "
              f"{nnz/t/1e9:.3f} Ge/s", flush=True)


if __name__ == "__main__":
    main()
