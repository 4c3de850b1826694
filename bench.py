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

from isplib_tpu.utils.timing import chain_time


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

    if not os.path.exists(path):
        # Generate on host and persist the raw numpy forms.  We regenerate
        # the dataset with the graph kept OFF-device (device→host readback
        # through the TPU tunnel is pathologically slow), so cache-building
        # goes through from_edge_index's host arrays.
        t0 = time.time()
        from isplib_tpu.data.loaders import DATASET_STATS
        from isplib_tpu.sparse.graph import _build_arrays
        from isplib_tpu.data.synthetic import rmat_edges, _split_masks
        base = name[:-4] if name.endswith("-sim") else name
        n, e, f, c = DATASET_STATS[base]
        n, e = int(n * scale), int(e * scale)
        rng = np.random.default_rng((hash(base) % (2**31)) + 1)
        ei = rmat_edges(n, e, hash(base) % (2**31))
        arrays = _build_arrays(ei[1], ei[0], None, n, n, edge_multiple)
        y = rng.integers(0, c, size=n).astype(np.int32)
        centers = rng.normal(size=(c, f)).astype(np.float32)
        x = (centers[y] + rng.normal(scale=2.0, size=(n, f))
             ).astype(np.float32)
        masks = _split_masks(n, rng)
        log(f"generated {base}-sim: {n} nodes, {arrays['nnz']} edges "
            f"in {time.time() - t0:.1f}s")
        np.savez(path, **arrays, x=x, y=y, train_mask=masks[0],
                 test_mask=masks[2])

    log(f"loading bench graph {path}")
    with np.load(path) as z:
        np_arrays = {k: z[k] for k in z.files}
    aux = {k: np_arrays.pop(k) for k in ("x", "y", "train_mask",
                                         "test_mask")}
    np_arrays["num_rows"] = int(np_arrays["num_rows"])
    np_arrays["num_cols"] = int(np_arrays["num_cols"])
    np_arrays["nnz"] = int(np_arrays["nnz"])
    graph = CSRGraph(**{
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in np_arrays.items()})
    return (graph, np_arrays, aux["x"], aux["y"], aux["train_mask"],
            aux["test_mask"])


def bench_spmm(graph, k: int, iters: int, backend: str, reduce: str = "sum",
               with_grad: bool = False) -> float:
    """Seconds per SpMM call (chained measurement)."""
    import jax
    import jax.numpy as jnp
    from isplib_tpu import spmm

    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(graph.num_cols, k)).astype(np.float32))

    # ×1e-3 keeps chained magnitudes bounded (sum-reduce amplifies by the
    # average degree per iteration; bench graphs are square so shapes chain).
    # graph is a jit ARGUMENT — closing over it would embed the tiling plan
    # (hundreds of MB) as HLO constants and overflow the remote-compile
    # request limit on tunneled TPU runtimes (observed HTTP 413).
    if with_grad:
        jf = jax.jit(jax.grad(
            lambda x_, g_: spmm(g_, x_, reduce=reduce,
                                backend=backend).sum() * 1e-3))
    else:
        jf = jax.jit(lambda x_, g_: spmm(g_, x_, reduce=reduce,
                                         backend=backend) * 1e-3)
    f = lambda x_: jf(x_, graph)
    return chain_time(f, x, iters)


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
    # Default scale 0.05 (~5.7M edges): host→device transfer through this
    # environment's TPU tunnel runs at ~1-2 MB/s, so a full 115M-edge graph
    # (GBs of arrays) cannot be uploaded in a reasonable bench budget.
    # Edges/s throughput is scale-insensitive once the kernel saturates.
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--edge-multiple", type=int, default=4096)
    ap.add_argument("--skip-gcn", action="store_true")
    ap.add_argument("--rb", type=int, default=256)
    ap.add_argument("--ct", type=int, default=128)
    ap.add_argument("--eb", type=int, default=512)
    ap.add_argument("--version", type=int, default=3,
                    help="plan version: 3=hybrid BSR, 2=edge streaming")
    ap.add_argument("--dense-threshold", type=int, default=64)
    ap.add_argument("--g", type=int, default=32,
                    help="BSR blocks per DMA group (version 3)")
    ap.add_argument("--tune", action="store_true",
                    help="autotune (rb, ct, eb, backend) before benching")
    args = ap.parse_args()

    import jax
    log(f"devices: {jax.devices()}")

    graph, np_arrays, x, y, train_mask, test_mask = _cached_graph(
        args.dataset, args.scale, args.edge_multiple)
    log(f"graph: {graph.shape}, nnz={graph.nnz}")

    if args.tune:
        from isplib_tpu.tune.autotune import tune_spmm
        best, tiled = tune_spmm(graph, np_arrays, k=args.k)
        if tiled is not None:
            graph = tiled
    elif args.backend in ("pallas", "auto"):
        from isplib_tpu.sparse.tiling import build_tiling_from_numpy
        t0 = time.time()
        kw = {}
        if args.version == 3:
            kw = dict(dense_threshold=args.dense_threshold, g=args.g)
        graph = build_tiling_from_numpy(graph, np_arrays, rb=args.rb,
                                        ct=args.ct, eb=args.eb, k=args.k,
                                        version=args.version, **kw)
        extra = (f", dense_e={graph.fwd.dense_edges}"
                 if args.version == 3 else "")
        log(f"tiling plan built in {time.time() - t0:.1f}s: "
            f"nc={graph.fwd.nc}, fill={graph.fwd.fill_fraction:.2f}{extra}")

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
