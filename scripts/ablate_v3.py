"""Time the two halves of the v3 hybrid plan separately on the
density-representative graph (VERDICT r3 weak #1 diagnosis)."""
from __future__ import annotations

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
    cache = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _load_or_gen, _to_graph, gen_rmat_graph
    n_dens, e = 52092, 5730794
    dtag = f"reddit_dens{n_dens}_e{e}_m4096"
    dnp = _load_or_gen(dtag, lambda: gen_rmat_graph(
        n_dens, e, (zlib.crc32(b"reddit") & 0x7FFFFFFF) + 7, 4096))
    dgraph = _to_graph(dnp)

    from isplib_tpu.sparse.tiling import build_tiling_from_numpy
    tiled = build_tiling_from_numpy(
        dgraph, dnp, k=32, build_backward=False, cache_tag=dtag,
        rb=256, ct=512, eb=512, version=3, dense_threshold=96, g=32, gd=4,
        max_block_bytes=384 << 20)
    plan = tiled.fwd
    b, r = plan.bsr, plan.residual
    print(f"bsr: nb={b.nb} g={b.g} n_bc={b.n_bc} n_super={b.n_super} "
          f"nrb_s={b.nrb_s} grid_cells={b.n_super * b.n_bc} "
          f"groups={-(-b.nb // b.g)}", file=sys.stderr)
    print(f"res: nc={r.nc} fill={r.fill:.3f} gd={r.gd} "
          f"cells={r.n_super * r.nct} nrb_s={r.nrb_s}", file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(dgraph.num_cols, 32)).astype(np.float32))

    from isplib_tpu.kernels.spmm_bsr import spmm_bsr, spmm_hybrid
    from isplib_tpu.kernels.spmm_pallas_v2 import spmm_tiled_v2

    jbsr = jax.jit(lambda x_, p_: spmm_bsr(p_, x_) * 1e-3)
    jres = jax.jit(lambda x_, p_: spmm_tiled_v2(p_, x_) * 1e-3)
    jhyb = jax.jit(lambda x_, p_: spmm_hybrid(p_, x_) * 1e-3)
    for name, f in (
            ("bsr-only", lambda x_: jbsr(x_, b)),
            ("res-only", lambda x_: jres(x_, r)),
            ("hybrid", lambda x_: jhyb(x_, plan))):
        t = chain_time(f, x, 30)
        print(f"{name:9s}: {t*1e3:8.3f} ms  "
              f"({dgraph.nnz / t / 1e9:.3f} Ge/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
