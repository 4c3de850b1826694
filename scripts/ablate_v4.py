"""Ablate the v4 kernel's inner stages to find the per-group cost.

Modes:
  full     — production kernel (dynamic fori over span)
  span1    — exactly one visit, called directly (no inner loop)
  span1b   — fori_loop(0, 1, visit) (static trip, loop construct cost)
  span1dyn — fori_loop(0, min(span,1)...) dynamic trip capped at 1
  novisit  — skip gather entirely (g = x slice at base)
  noslice  — visit uses a STATIC x slice (gather cost, no dynamic ds)
  noonehot — one-hot replaced with constant
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

from isplib_tpu.sparse.tiling_v4 import StreamPlanV4
from isplib_tpu.kernels.spmm_pallas_v4 import _round_up, _cdiv
from isplib_tpu.utils.timing import chain_time

_LANE = 128


def _kernel(block_starts_ref, base_ref, span_ref, edges_hbm, x_ref,
            out_ref, ebuf, esem, *, rb, gd, kt, mode):
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
            valid_g = (j * gd + m) < n_groups
            cols = ebuf[slot, m, 0]
            vals = pltpu.bitcast(ebuf[slot, m, 1], jnp.float32)
            rows = ebuf[slot, m, 2]
            base = base_ref[gidx]
            span = span_ref[gidx]

            def visit(s, g, cols=cols):
                if mode == "noslice":
                    src = x_ref[:, 0:_LANE]
                else:
                    src = x_ref[:, pl.ds((base + s) * _LANE, _LANE)]
                local = cols - s * _LANE
                idx = jnp.broadcast_to(local & (_LANE - 1), (kt, _LANE))
                gi = jnp.take_along_axis(src, idx, axis=1)
                ok = jnp.broadcast_to(
                    local.astype(jnp.uint32) < _LANE, (kt, _LANE))
                return jnp.where(ok, gi, g)

            zero = jnp.zeros((kt, _LANE), jnp.float32)
            if mode == "novisit":
                g = x_ref[:, 0:_LANE]
            elif mode == "span1":
                g = visit(0, zero)
            elif mode == "span1b":
                g = jax.lax.fori_loop(0, 1, visit, zero)
            elif mode == "span1dyn":
                g = jax.lax.fori_loop(
                    0, jnp.minimum(span, 1), visit, zero)
            else:
                g = jax.lax.fori_loop(0, span, visit, zero)

            if mode == "noonehot":
                oh = jnp.full((rb, _LANE), 0.5, jnp.bfloat16)
            else:
                oh = jnp.where((rb_iota == rows) & valid_g, vals,
                               0.0).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                g.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = acc + part
        return acc

    acc = jax.lax.fori_loop(
        0, n_dma, body, jnp.zeros((kt, rb), jnp.float32))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("mode",))
def _call(plan: StreamPlanV4, x, mode):
    k = x.shape[1]
    rb, gd = plan.rb, plan.gd
    kt = min(plan.kt, _round_up(k, 32))
    n_kt = _cdiv(_round_up(k, 32), kt)
    k_pad = n_kt * kt
    xt = jnp.zeros((k_pad, plan.c_padded), jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x.T.astype(jnp.float32), (0, 0))
    kernel = functools.partial(_kernel, rb=rb, gd=gd, kt=kt, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_kt, plan.nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, plan.c_padded),
                         lambda kk, i, bs, gb, gs: (kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, kt, rb), lambda kk, i, bs, gb, gs: (i, kk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, gd, 3, 1, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nrb, k_pad, rb), jnp.float32),
    )(plan.block_starts, plan.group_base, plan.group_span, plan.edges, xt)
    return out.transpose(0, 2, 1).reshape(plan.nrb * rb, k_pad)[
        : plan.num_rows, :k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rb", type=int, default=256)
    ap.add_argument("--gd", type=int, default=8)
    args = ap.parse_args()

    cache = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _load_or_gen, _to_graph, gen_rmat_graph
    n, e = 52092, 5730794
    tag = f"reddit_dens{n}_e{e}_m4096"
    dnp = _load_or_gen(tag, lambda: gen_rmat_graph(
        n, e, (zlib.crc32(b"reddit") & 0x7FFFFFFF) + 7, 4096))
    dgraph = _to_graph(dnp)

    from isplib_tpu.sparse.tiling import build_tiling_from_numpy
    tiled = build_tiling_from_numpy(
        dgraph, dnp, k=32, build_backward=False, cache_tag=tag,
        rb=args.rb, version=4, gd=args.gd)
    plan = tiled.fwd
    print(f"plan: ng={plan.ng} visits/grp={plan.n_visits/plan.ng:.2f}",
          file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(dgraph.num_cols, 32)).astype(np.float32))
    for mode in ("full", "span1", "span1b", "span1dyn", "noslice",
                 "novisit", "noonehot"):
        f = lambda x_: _call(plan, x_, mode)
        t = chain_time(f, x, args.iters)
        print(f"{mode:9s}: {t*1e3:8.3f} ms  {t/plan.ng*1e9:7.1f} ns/grp "
              f"{dgraph.nnz/t/1e9:6.3f} Ge/s", flush=True)


if __name__ == "__main__":
    main()
