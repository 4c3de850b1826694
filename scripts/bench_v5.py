"""On-chip v5 hybrid check: correctness vs XLA oracle + speed on the
density-rep and headline graphs across (threshold, rb, S, g) configs."""
from __future__ import annotations

import argparse
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isplib_tpu.utils.timing import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--graph", default="dens", choices=["dens", "headline"])
    ap.add_argument("--configs",
                    default="64:512:8:8,64:256:8:8,96:512:8:8,128:512:8:8")
    args = ap.parse_args()

    cache = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _load_or_gen, _to_graph, gen_rmat_graph
    if args.graph == "dens":
        n, e = 52092, 5730794
        tag = f"reddit_dens{n}_e{e}_m4096"
        seed = (zlib.crc32(b"reddit") & 0x7FFFFFFF) + 7
    else:
        n, e = 11648, 5730794
        tag = "reddit_s0.05_m4096"
        seed = zlib.crc32(b"reddit") & 0x7FFFFFFF
    dnp = _load_or_gen(tag, lambda: gen_rmat_graph(n, e, seed, 4096))
    dgraph = _to_graph(dnp)
    nnz = dgraph.nnz

    from isplib_tpu.sparse.tiling import build_tiling_from_numpy
    from isplib_tpu.kernels.spmm_bsr2 import spmm_hybrid_v5
    from isplib_tpu.ops import xla_backend
    from isplib_tpu.ops.semiring import Reduce

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(dgraph.num_cols, 32)).astype(np.float32))
    want = np.asarray(xla_backend.spmm_raw(
        dgraph.row, dgraph.col, dgraph.value, dgraph.deg, x,
        dgraph.num_rows, Reduce.SUM))

    jf = jax.jit(lambda x_, p_: spmm_hybrid_v5(p_, x_) * 1e-3)
    for cfg in args.configs.split(","):
        thr, rb, S, g = (int(v) for v in cfg.split(":"))
        t0 = time.time()
        tiled = build_tiling_from_numpy(
            dgraph, dnp, k=32, build_backward=False, cache_tag=tag,
            rb=rb, version=5, dense_threshold=thr, S=S, g=g, gd=8)
        plan = tiled.fwd
        tb = time.time() - t0
        nb = sum(p.nb for p in plan.bsr2s if p is not None)
        ng = sum(p.ng for p in plan.streams if p is not None)
        got = np.asarray(spmm_hybrid_v5(plan, x))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        t = chain_time(lambda x_: jf(x_, plan), x, args.iters)
        print(f"thr={thr} rb={rb} S={S} g={g}: nb={nb} "
              f"({nb * 32768 / 1e6:.0f}MB) dense_e={plan.dense_edges} "
              f"ng={ng} fill={plan.fill:.3f} | {t*1e3:7.3f} ms "
              f"{nnz/t/1e9:6.3f} Ge/s relerr={err:.1e} "
              f"[plan {tb:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
