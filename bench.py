"""Benchmark driver — reproduces the reference protocol on TPU.

Headline metric (BASELINE.md targets): SpMM edges/s/chip on a Reddit-sized
power-law graph at K=32, plus the 2-layer GCN epoch time.  Prints exactly
ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` = measured edges/s divided by the single-chip HBM-roofline
bound (fraction of speed-of-light; the reference publishes only relative
CPU speedups, so the roofline is the honest absolute yardstick).

Usage:
    python bench.py                       # full reddit-sim, K=32
    python bench.py --scale 0.1 --epochs 2   # smoke test
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def hbm_bandwidth_bytes() -> float:
    """Best-effort HBM bandwidth of the attached chip for the roofline."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 819e9, "v5e": 819e9, "v5litepod": 819e9,
        "v4": 1228e9, "v5p": 2765e9, "v6 lite": 1640e9, "v6e": 1640e9,
        "cpu": 50e9,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819e9


def roofline_edges_per_s(k: int, bw: float, dtype_bytes: int = 4) -> float:
    """Bandwidth-bound SpMM edges/s: each edge moves ~one K-vector of x
    from HBM (gather misses dominate on power-law graphs) + 8B of
    (col, value) metadata; output writes amortize over degree."""
    bytes_per_edge = k * dtype_bytes + 8
    return bw / bytes_per_edge


def _cached_graph(name: str, scale: float, edge_multiple: int):
    """Generate (or load cached) benchmark graph + features."""
    from isplib_tpu.data import load

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"{name}_s{scale}_m{edge_multiple}"
    path = os.path.join(cache_dir, f"bench_{tag}.npz")
    from isplib_tpu.sparse.graph import CSRGraph
    import jax.numpy as jnp

    if os.path.exists(path):
        log(f"loading cached bench graph {path}")
        with np.load(path) as z:
            arrays = {k: jnp.asarray(z[k]) for k in z.files
                      if k not in ("num_rows", "num_cols", "nnz", "x", "y",
                                   "train_mask", "test_mask")}
            graph = CSRGraph(**arrays, num_rows=int(z["num_rows"]),
                             num_cols=int(z["num_cols"]), nnz=int(z["nnz"]))
            return graph, z["x"], z["y"], z["train_mask"], z["test_mask"]

    t0 = time.time()
    ds = load(name, scale=scale)
    log(f"generated {ds.name}: {ds.num_nodes} nodes, {ds.graph.nnz} edges "
        f"in {time.time() - t0:.1f}s")
    g = ds.graph
    np.savez(
        path,
        **{f: np.asarray(getattr(g, f)) for f in (
            "rowptr", "row", "col", "value", "csc_colptr", "csc_row",
            "csc_col", "csc_value", "csc2csr", "deg", "deg_t")},
        num_rows=g.num_rows, num_cols=g.num_cols, nnz=g.nnz,
        x=ds.x, y=ds.y, train_mask=ds.train_mask, test_mask=ds.test_mask,
    )
    return g, ds.x, ds.y, ds.train_mask, ds.test_mask


def bench_spmm(graph, k: int, iters: int, backend: str, reduce: str = "sum",
               with_grad: bool = False) -> float:
    """Median seconds per SpMM call."""
    import jax
    import jax.numpy as jnp
    from isplib_tpu import spmm

    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(graph.num_cols, k)).astype(np.float32))

    if with_grad:
        f = jax.jit(jax.grad(
            lambda x_: spmm(graph, x_, reduce=reduce, backend=backend).sum()))
    else:
        f = jax.jit(lambda x_: spmm(graph, x_, reduce=reduce,
                                    backend=backend))
    out = jax.block_until_ready(f(x))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        times.append(time.perf_counter() - t0)
    del out
    return float(np.median(times))


def bench_gcn_epoch(graph, x, y, train_mask, epochs: int,
                    backend: str) -> tuple[float, float]:
    import jax.numpy as jnp
    import dataclasses
    from isplib_tpu.data.synthetic import NodeDataset
    from isplib_tpu.nn import GCN
    from isplib_tpu.train import train_node_classifier

    num_classes = int(y.max()) + 1
    ds = NodeDataset(
        name="bench", graph=graph, x=x, y=y,
        train_mask=train_mask, val_mask=train_mask, test_mask=train_mask,
        num_classes=num_classes)
    model = GCN(hidden=32, num_classes=num_classes, backend=backend)
    res = train_node_classifier(model, ds, epochs=epochs)
    return res.train_time_avg, res.test_acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--edge-multiple", type=int, default=4096)
    ap.add_argument("--skip-gcn", action="store_true")
    args = ap.parse_args()

    import jax
    log(f"devices: {jax.devices()}")

    graph, x, y, train_mask, test_mask = _cached_graph(
        args.dataset, args.scale, args.edge_multiple)
    log(f"graph: {graph.shape}, nnz={graph.nnz}")

    t_spmm = bench_spmm(graph, args.k, args.iters, args.backend)
    edges_per_s = graph.nnz / t_spmm
    bw = hbm_bandwidth_bytes()
    roof = roofline_edges_per_s(args.k, bw)
    log(f"SpMM(sum, K={args.k}): {t_spmm * 1e3:.3f} ms → "
        f"{edges_per_s / 1e9:.3f} Ge/s ({100 * edges_per_s / roof:.1f}% of "
        f"roofline {roof / 1e9:.2f} Ge/s)")

    t_bwd = bench_spmm(graph, args.k, max(2, args.iters // 2), args.backend,
                       with_grad=True)
    log(f"SpMM fwd+bwd: {t_bwd * 1e3:.3f} ms")

    if not args.skip_gcn:
        # features capped at K for epoch benchmark comparability
        xk = x[:, : args.k] if x.shape[1] >= args.k else x
        epoch_s, acc = bench_gcn_epoch(graph, xk.astype(np.float32), y,
                                       train_mask, args.epochs, args.backend)
        log(f"GCN epoch: {epoch_s:.4f}s (acc {acc:.3f})")

    print(json.dumps({
        "metric": f"spmm_sum_edges_per_s_k{args.k}_{args.dataset}",
        "value": edges_per_s,
        "unit": "edges/s/chip",
        "vs_baseline": edges_per_s / roof,
    }), flush=True)


if __name__ == "__main__":
    main()
