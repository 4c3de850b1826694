"""On-chip ablation of the v2 streaming kernel in the density-representative
regime (VERDICT r3 weak #1: 0.66 us/chunk of unexplained per-iteration cost).

Clones the v2 kernel with knobs that disable one stage at a time; the
difference between consecutive modes attributes the per-chunk time:

    full      — the production kernel
    nogather  — gather replaced by a static x slice (keeps matmul shapes)
    noonehot  — one-hot build replaced by a constant operand
    nomatmul  — scatter matmuls replaced by a broadcast
    noaccum   — out_ref accumulate only on iteration 0
    dmaonly   — DMA wait + one cheap reduction, no compute
    empty     — loop body does nothing but count

Usage: python scripts/ablate_v2.py [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isplib_tpu.sparse.tiling_v2 import TiledPlanV2
from isplib_tpu.kernels.spmm_pallas_v2 import _gather_x, _round_up, _cdiv
from isplib_tpu.utils.timing import chain_time

_LANE = 128


def _kernel(cell_starts_ref, rb_locals_ref, edges_hbm, x_ref, out_ref,
            edges_buf, edge_sems, *, rb, ct, eb, nct, compute_dtype, gd,
            n_cells, mode):
    s = pl.program_id(0)
    c = pl.program_id(2)
    cell = s * nct + c
    start = cell_starts_ref[cell]
    end = cell_starts_ref[cell + 1]
    n_chunks = end - start
    n_groups = jax.lax.div(n_chunks + (gd - 1), gd)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def edge_dma(slot, gi):
        return pltpu.make_async_copy(
            edges_hbm.at[pl.ds(start + gi * gd, gd)], edges_buf.at[slot],
            edge_sems.at[slot])

    if mode != "empty":
        @pl.when(n_groups > 0)
        def _():
            edge_dma(0, 0).start()

    k_pad = x_ref.shape[0]
    rb_iota_t = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANE), 0)

    def body(j, carry):
        if mode == "empty":
            out_ref[0, 0:1, 0:_LANE] += 1.0
            return carry
        slot = jax.lax.rem(j, 2)
        nslot = 1 - slot

        @pl.when(j + 1 < n_groups)
        def _():
            edge_dma(nslot, j + 1).start()

        edge_dma(slot, j).wait()

        if mode == "dmaonly":
            out_ref[0, 0:1, 0:_LANE] += edges_buf[
                slot, 0, 0, 0:1, :].astype(jnp.float32)
            return carry

        for m in range(gd):
            @pl.when(j * gd + m < n_chunks)
            def _(m=m):
                cols = edges_buf[slot, m, 0]
                vals = pltpu.bitcast(edges_buf[slot, m, 1], jnp.float32)
                rows = edges_buf[slot, m, 2]
                if mode == "nogather":
                    gathered = [x_ref[:, :_LANE] for _ in range(eb // _LANE)]
                else:
                    gathered = _gather_x(x_ref[...], cols, k_pad, ct, eb)

                part = None
                for eg in range(eb // _LANE):
                    vals_g = vals[eg][None, :]
                    wg = (gathered[eg] * vals_g).astype(compute_dtype)
                    if mode == "nomatmul":
                        pg = jnp.broadcast_to(
                            wg[:, :1], (k_pad, rb)).astype(jnp.float32)
                    else:
                        if mode == "noonehot":
                            oh_t = jnp.full((rb, _LANE), 0.5, compute_dtype)
                        else:
                            oh_t = (rb_iota_t == rows[eg][None, :]).astype(
                                compute_dtype)
                        pg = jax.lax.dot_general(
                            wg, oh_t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    part = pg if part is None else part + pg

                rbl = rb_locals_ref[start + j * gd + m]
                if mode == "noaccum":
                    @pl.when(j == 0)
                    def _():
                        out_ref[rbl] += part
                else:
                    out_ref[rbl] += part
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0)


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
    gd = plan.gd
    kernel = functools.partial(
        _kernel, rb=rb, ct=ct, eb=eb, nct=nct,
        compute_dtype=jnp.bfloat16, gd=gd,
        n_cells=n_super * nct, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_kt, nct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, ct), lambda s, kk, c, cs, rbl: (kk, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nrb_s, kt, rb), lambda s, kk, c, cs, rbl: (s, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, gd, plan.edges.shape[1], sub, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nrb, k_pad, rb), jnp.float32),
    )(plan.cell_starts, plan.rb_locals, plan.edges, xt)
    return out.transpose(0, 2, 1).reshape(plan.nrb * rb, k_pad)[
        : plan.num_rows, :k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--gd", type=int, default=8)
    ap.add_argument("--rb", type=int, default=512)
    ap.add_argument("--ct", type=int, default=1024)
    ap.add_argument("--eb", type=int, default=512)
    args = ap.parse_args()

    cache = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _load_or_gen, _to_graph, gen_rmat_graph
    import zlib
    n_dens, e = 52092, 5730794
    dtag = f"reddit_dens{n_dens}_e{e}_m4096"
    dnp = _load_or_gen(dtag, lambda: gen_rmat_graph(
        n_dens, e, (zlib.crc32(b"reddit") & 0x7FFFFFFF) + 7, 4096))
    dgraph = _to_graph(dnp)

    from isplib_tpu.sparse.tiling import build_tiling_from_numpy
    t0 = time.time()
    tiled = build_tiling_from_numpy(
        dgraph, dnp, k=32, build_backward=False, cache_tag=dtag,
        rb=args.rb, ct=args.ct, eb=args.eb, version=2, gd=args.gd)
    plan = tiled.fwd
    print(f"plan: nc={plan.nc} fill={plan.fill:.3f} gd={plan.gd} "
          f"n_super={plan.n_super} nct={plan.nct} nrb_s={plan.nrb_s} "
          f"cells={plan.n_super * plan.nct} [{time.time()-t0:.1f}s]",
          file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(dgraph.num_cols, 32)).astype(np.float32))

    ref = None
    for mode in ("full", "nogather", "noonehot", "nomatmul", "noaccum",
                 "dmaonly", "empty"):
        f = lambda x_: _call(plan, x_, mode)
        t = chain_time(f, x, args.iters)
        per_chunk = t / plan.nc * 1e9
        ge = dgraph.nnz / t / 1e9
        note = ""
        if mode == "full":
            ref = _call(plan, x, mode)
        print(f"{mode:9s}: {t*1e3:8.3f} ms  {per_chunk:7.1f} ns/chunk "
              f"{ge:6.3f} Ge/s{note}", flush=True)


if __name__ == "__main__":
    main()
